package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedSetOps

/** The sorted-set primitives must agree exactly with the built-in set
  * algebra they replace (array_intersect / array_distinct semantics on
  * distinct values), on duplicate-bearing sorted inputs, and the bounded
  * distinct-set aggregate must match distinct-count-filtered collect_set
  * including across-partition merges and the saturation path.
  */
class SortedSetOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sortedset-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("intersectCount/distinctCount match built-in set algebra on random sorted arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicates both within and across: values drawn from a small range
    val rows = (0 until 300).map { i =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("got_i", SortedSetOps.intersectCount(col("a"), col("b")))
      .withColumn("want_i", size(array_intersect(col("a"), col("b"))).cast("long"))
      .withColumn("got_d", SortedSetOps.distinctCount(col("a")))
      .withColumn("want_d", size(array_distinct(col("a"))).cast("long"))
    assert(df.where(col("got_i") =!= col("want_i") || col("got_d") =!= col("want_d")).count() === 0)
    // empty arrays
    val e = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      .select(SortedSetOps.intersectCount(col("a"), col("b")).as("i"),
        SortedSetOps.distinctCount(col("a")).as("d"))
      .head()
    assert(e.getLong(0) === 0L && e.getLong(1) === 0L)
  }

  test("NULL array elements fail loudly in every long-array expression") {
    import graft.functions.{DotProductQ, SqDistQ}
    import spark.implicits._
    val df = Seq(1).toDF("x")
      .select(
        array(lit(1L), lit(null).cast("long"), lit(3L)).as("bad"),
        array(lit(1L), lit(2L), lit(3L)).as("ok"))
    def boom(c: org.apache.spark.sql.Column): Unit = {
      val e = intercept[Exception](df.select(c).collect())
      def hasNullMsg(t: Throwable): Boolean =
        t != null && (String.valueOf(t.getMessage).contains("null-free") || hasNullMsg(t.getCause))
      assert(hasNullMsg(e), s"expected the null-free guard, got: $e")
    }
    boom(SortedSetOps.intersectCount(col("bad"), col("ok")))
    boom(SortedSetOps.distinctCount(col("bad")))
    boom(SqDistQ(col("ok"), col("bad")))
    boom(DotProductQ(col("bad"), col("ok")))
    // null-free inputs are untouched
    assert(df.select(SortedSetOps.intersectCount(col("ok"), col("ok"))).head().getLong(0) == 3L)
  }

  test("boundedDistinctSet: sorted distinct sets, null outside [2, maxDf], merge-safe") {
    import spark.implicits._
    val maxDf = 4
    // group g1: 3 distinct (dup'd), g2: 1 distinct, g3: exactly maxDf,
    // g4: maxDf+1 -> saturated/null, g5: way past the cap (hot key)
    val rows =
      Seq.fill(3)(("g1", 10L)) ++ Seq(("g1", 11L), ("g1", 12L)) ++
        Seq(("g2", 7L), ("g2", 7L)) ++
        (1 to maxDf).map(i => ("g3", i.toLong)) ++
        (1 to maxDf + 1).map(i => ("g4", i.toLong)) ++
        (1 to 100).flatMap(i => Seq(("g5", (i % 20).toLong)))
    // repartition so every group spans partitions -> merge() is exercised
    val got = rows.toDF("g", "id").repartition(4)
      .groupBy(col("g"))
      .agg(SortedSetOps.boundedDistinctSet(col("id"), maxDf).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got("g1").contains(Seq(10L, 11L, 12L)))
    assert(got("g2").isEmpty) // < 2 distinct
    assert(got("g3").contains((1 to maxDf).map(_.toLong)))
    assert(got("g4").isEmpty) // saturated
    assert(got("g5").isEmpty) // hot key saturates map-side
  }

  test("boundedDistinctSet equals the unfused df-count + collect_set plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val maxDf = 8
    val rows = (0 until 5000).map(_ => (rnd.nextInt(400).toLong, rnd.nextInt(60).toLong))
    val df = rows.toDF("g", "id").repartition(7)
    val got = df.groupBy(col("g"))
      .agg(SortedSetOps.boundedDistinctSet(col("id"), maxDf).as("ids"))
      .where(col("ids").isNotNull)
      .select(col("g"), col("ids"))
    val want = df.groupBy(col("g"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")).between(2, maxDf))
      .select(col("g"), col("ids"))
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }
}
