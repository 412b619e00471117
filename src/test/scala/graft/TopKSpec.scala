package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopK

/** The custom GroupedTopK operator must be a drop-in replacement for the
  * row_number-window idiom: identical rows AND ranks on every input,
  * while planning as the bounded-heap exec (no WindowExec, no sort of
  * the input).
  */
class TopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-topk-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample = {
    import spark.implicits._
    // duplicate scores force the tie-break path; key 99 has < k rows
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      (i.toLong % 13, rnd.nextInt(40).toLong, i.toLong)
    } :+ ((99L, 5L, 9999L))
    rows.toDF("key", "score", "id")
  }

  test("perKey matches the row_number window exactly, ranks included") {
    import spark.implicits._
    val df = sample
    val got = TopK.perKey(df, Seq("key"), Seq(("score", true), ("id", false)), 3)
      .select($"key", $"score", $"id", $"rk")
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 3)
      .select($"key", $"score", $"id", $"rk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    // the undersized group keeps its single row at rank 1
    assert(got.exists { case (k, _, id, rk) => k == 99L && id == 9999L && rk == 1L })
  }

  test("plans as GroupedTopKExec with no WindowExec and no input sort") {
    val plan = TopK.perKey(sample, Seq("key"), Seq(("score", true), ("id", false)), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK")) // SparkPlan.nodeName strips "Exec"
    assert(!plan.contains("Window"))
    assert(!plan.contains("Sort "))
  }

  test("high key cardinality (keys ≈ rows): correct at the memory contract's worst case") {
    import spark.implicits._
    // every key has exactly 2 rows — per-task heap state approaches a
    // copy of the partition, the degenerate shape the exec's scaladoc
    // documents; output must still match the window exactly
    val df = (0 until 20000).map(i => (i.toLong / 2, i.toLong % 7, i.toLong))
      .toDF("key", "score", "id")
    val got = TopK.perKey(df, Seq("key"), Seq(("score", true), ("id", false)), 1)
      .select($"key", $"score", $"id", $"rk")
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 1)
      .select($"key", $"score", $"id", $"rk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want && got.size == 10000)
  }

  test("spill path: keys ≈ rows at 1M+ under a tiny threshold spills, no OOM, window-exact output") {
    import spark.implicits._
    // 1.2M rows, 600k keys of 2 rows each — the degenerate shape where
    // retained state approaches a copy of the partition. A 256 KiB
    // per-task threshold forces many spill cycles; the merged output
    // must equal the window form exactly (compared via count + an
    // order-insensitive checksum, not a 600k-row driver collect).
    spark.conf.set("spark.graft.topk.spill.threshold.bytes", (256 * 1024).toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false") // walkable executed plan
    try {
      val df = spark.range(1200000L)
        .select((col("id") / 2).cast("long").as("key"),
          (col("id") % 7).as("score"), col("id"))
      val q = TopK.perKey(df, Seq("key"), Seq(("score", true), ("id", false)), 1)
      val gotSum = q.agg(
        count(lit(1)).as("n"),
        sum(xxhash64(col("key"), col("score"), col("id"), col("rk"))).as("h"))
        .collect().head
      val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
      val wantSum = df.withColumn("rk", row_number().over(w).cast("long"))
        .where($"rk" <= 1)
        .agg(count(lit(1)).as("n"),
          sum(xxhash64(col("key"), col("score"), col("id"), col("rk"))).as("h"))
        .collect().head
      assert(gotSum == wantSum)
      assert(gotSum.getLong(0) == 600000L)
      // the run REALLY spilled (metrics are accumulators — visible after
      // the action); rerun the plan to read its own exec node's metrics
      val q2 = TopK.perKey(df, Seq("key"), Seq(("score", true), ("id", false)), 1)
      q2.queryExecution.toRdd.count()
      val exec = q2.queryExecution.executedPlan.collectFirst {
        case g: graft.plans.GroupedTopKExec => g
      }.get
      assert(exec.metrics("numSpills").value > 0, "expected the tiny threshold to force spills")
      assert(exec.metrics("spilledRows").value > 0)
    } finally {
      spark.conf.unset("spark.graft.topk.spill.threshold.bytes")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("WindowTopKRewrite: the plain row_number SQL idiom plans as the bounded heap") {
    // expected result computed in Scala — the session-global rewrite is
    // installed before any comparison query could run through WindowExec
    val df = sample
    val expected = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._2, t._3)).take(3).zipWithIndex
          .map { case ((k, s, i), idx) => (k, s, i, idx + 1) }.toSeq
      }.toSet
    val s = spark
    TopK.installRewrite(s)
    df.createOrReplaceTempView("topk_rewrite_in")
    val q = s.sql(
      """SELECT key, score, id, rk FROM (
        |  SELECT key, score, id,
        |         row_number() OVER (PARTITION BY key ORDER BY score DESC, id) AS rk
        |  FROM topk_rewrite_in) t
        |WHERE rk <= 3""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan.take(1200))
    assert(!plan.contains("Window"), plan.take(1200))
    import org.apache.spark.sql.types.IntegerType
    assert(q.schema("rk").dataType == IntegerType) // row_number's own type survives
    val got = q.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("WindowTopKRewrite: residual predicates survive above the heap; non-matching shapes keep WindowExec") {
    val s = spark
    TopK.installRewrite(s)
    sample.createOrReplaceTempView("topk_rewrite_in2")
    // conjunction: the rank bound is consumed, the rest filters above
    val q = s.sql(
      """SELECT key, id, rk FROM (
        |  SELECT key, score, id,
        |         row_number() OVER (PARTITION BY key ORDER BY score DESC, id) AS rk
        |  FROM topk_rewrite_in2) t
        |WHERE rk <= 2 AND key % 2 = 0""".stripMargin)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("GroupedTopK") && !p.contains("Window"), p.take(1200))
    assert(q.collect().forall(r => r.getLong(0) % 2 == 0 && r.getInt(2) <= 2))
    // rank() is NOT row_number — must stay a window
    val rankQ = s.sql(
      """SELECT key, id FROM (
        |  SELECT key, id, rank() OVER (PARTITION BY key ORDER BY score DESC) AS rk
        |  FROM topk_rewrite_in2) t WHERE rk <= 2""".stripMargin)
    assert(rankQ.queryExecution.executedPlan.toString.contains("Window"))
    // global top-k (no partition) — must stay out of the heap path
    val globalQ = s.sql(
      """SELECT id FROM (
        |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rk
        |  FROM topk_rewrite_in2) t WHERE rk <= 2""".stripMargin)
    assert(!globalQ.queryExecution.executedPlan.toString.contains("GroupedTopK"))
    assert(globalQ.collect().length == 2)
  }

  test("SQL-extension injection plans the operator too") {
    // a fresh session wired via GraftExtensions (config-time hook)
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    import s2.implicits._
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L)).toDF("key", "score", "id")
    val out = TopK.perKey(df, Seq("key"), Seq(("score", true), ("id", false)), 2)
      .select($"id", $"rk").as[(Long, Long)].collect().toSet
    assert(out == Set((3L, 1L), (2L, 2L)))
  }
}
