package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Graph, Stages}

/** Stages.mat is the ONE materialization point of every multi-consumer
  * operator stage: the default (`local`) mode must behave exactly like
  * the historical eager localCheckpoint (lineage truncated, same rows),
  * and the deployment modes (`reliable`, `persist`) must return the
  * same rows with their advertised fault-tolerance properties.
  */
class StagesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stages-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("stages-ckpt").toString)
    s
  }

  private def sample = spark.range(0, 1000)
    .select(col("id"), (col("id") * 7 % 13).as("v"))
    .groupBy(col("v")).agg(count(lit(1)).as("n"), sum(col("id")).as("s"))

  private def rows = sample.orderBy(col("v")).collect().toSeq

  private def withMode[T](mode: String)(f: => T): T = {
    spark.conf.set(Stages.ModeConf, mode)
    try f finally spark.conf.unset(Stages.ModeConf)
  }

  private def isTruncated(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case _: org.apache.spark.sql.execution.LogicalRDD => ()
    }.isDefined

  test("local mode (default): lineage truncated, rows identical") {
    val m = Stages.mat(sample)
    assert(isTruncated(m), m.queryExecution.analyzed.toString)
    assert(m.orderBy(col("v")).collect().toSeq == rows)
  }

  test("reliable mode: checkpoint files land in the checkpoint dir, rows identical") {
    withMode(Stages.Reliable) {
      val m = Stages.mat(sample)
      assert(isTruncated(m), m.queryExecution.analyzed.toString)
      // the materialization went to the RELIABLE checkpoint path (the
      // executor-loss-safe one), not the block manager
      assert(m.rdd.toDebugString.contains("ReliableCheckpoint"),
        m.rdd.toDebugString)
      assert(m.orderBy(col("v")).collect().toSeq == rows)
    }
  }

  test("persist mode: lineage KEPT (recomputable on block loss), cache built eagerly, rows identical") {
    withMode(Stages.Persist) {
      val m = Stages.mat(sample)
      assert(!isTruncated(m), m.queryExecution.analyzed.toString)
      assert(m.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      assert(m.orderBy(col("v")).collect().toSeq == rows)
      m.unpersist()
      ()
    }
  }

  test("matTruncating: persist mode still truncates (promoted to reliable checkpoint)") {
    withMode(Stages.Persist) {
      val m = Stages.matTruncating(sample)
      assert(isTruncated(m), m.queryExecution.analyzed.toString)
      assert(m.orderBy(col("v")).collect().toSeq == rows)
    }
  }

  test("connectedComponents labels identical across all three modes") {
    import spark.implicits._
    // two chains and a singleton-free triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L)).toDF("a", "b")
    def labels = Graph.connectedComponents(pairs, "a", "b")
      .orderBy(col("id")).collect().toSeq
    val base = labels
    val rel = withMode(Stages.Reliable)(labels)
    val per = withMode(Stages.Persist)(labels)
    assert(rel == base && per == base)
  }
}
