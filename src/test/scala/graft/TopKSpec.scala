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
