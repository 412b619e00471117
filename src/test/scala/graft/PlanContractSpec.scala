package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape contracts: the scale properties PLANS.md claims, asserted
  * against the actual physical plans so a refactor cannot silently
  * reintroduce a window sort, an unpushed scan filter, or a cartesian.
  * (`sparkPlan` is the pre-AQE physical plan — inspecting it runs no
  * job.)
  */
class PlanContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-contract-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan.toString

  test("store cutout pushes morton/t predicates into the parquet scan") {
    val p = plan("q50_store_roundtrip")
    assert(p.contains("PushedFilters"))
    // the morton range + membership predicates must reach the scan, not
    // sit in a post-scan Filter only
    assert("PushedFilters: \\[[^\\]]*morton".r.findFirstIn(p).isDefined, p.take(800))
  }

  test("ANN reranks use the bounded-heap exec, never a window sort") {
    for (q <- Seq("q39_ann_topk", "q40_ann_lsh", "q55_ann_ivf", "q70_stratified_sample")) {
      val p = plan(q)
      // the exec node prints as "GroupedTopK" (Spark strips the Exec suffix)
      assert(p.contains("GroupedTopK"), s"$q lost the bounded-heap rank")
      // a window ranked on the rerank score would sort every candidate
      // per query again — the IVF paths may keep their nprobe-selection
      // window (bounded at nlist rows per query), which ranks on cdist
      assert("windowspecdefinition\\([^)]*dot#".r.findFirstIn(p).isEmpty,
        s"$q reranks through a window:\n${p.take(600)}")
    }
  }

  test("dedup candidate generation: fused bounded-set aggregate, no cartesian anywhere") {
    val p54 = plan("q54_ngram_jaccard")
    assert(p54.contains("BoundedDistinctSetAgg") || p54.contains("boundeddistinctsetagg"),
      "q54 lost the fused postings aggregate")
    for (q <- Seq("q32_near_dup_pairs", "q54_ngram_jaccard", "q49_embedding_near_dup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q grew an all-pairs join")
    }
  }

  test("winnowing has no window and no key-partitioned shuffle") {
    val df: DataFrame = graft.functions.TextOps.winnowFromText(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val p = df.queryExecution.sparkPlan.toString
    // Par.fanOut's round-robin exchange is allowed (it carries no keys
    // and disappears on well-split sources); hash/range partitioning or
    // a window would mean the per-doc computation left the row again
    assert(!p.contains("Window"), p.take(600))
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"), p.take(600))
  }

  test("relational scans prune columns (no full-width reads for narrow projections)") {
    val p = plan("q01_pricing_summary")
    // lineitem has 16 columns; the pricing summary needs 5
    assert("ReadSchema: [^\\n]*l_returnflag".r.findFirstIn(p).isDefined)
    assert(!p.contains("l_comment"), "q01 scan reads unneeded columns")
  }
}
