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

  test("lexical retrieval: no token-keyed corpus exchange, broadcast weights, heap rerank") {
    val p = plan("q114_tfidf_topk")
    // no corpus-wide window sort and no token-keyed shuffle: the only
    // exchanges are the (q_id, doc_id) score aggregate, the small top-k
    // repartition and the final presentation sort
    assert(!p.contains("WindowExec"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), "query weights must broadcast")
    assert(p.contains("GroupedTopK"), "rerank must be the bounded heap")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(800))
    val exchanges = "Exchange hashpartitioning\\(([^,]+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(!exchanges.exists(_.startsWith("tok")),
      s"corpus shuffled on a token key: $exchanges")
  }

  test("BPE encode and video stats are pure per-row maps: no exchange anywhere") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // encode under a fixed merge list (training is a separate eager
    // aggregate whose TakeOrdered caps the driver; the ENCODE plan is
    // the 100 TB-shape claim)
    val enc = graft.functions.Bpe.encode(docs, "doc_id", "text", Seq(("t", "h"), ("th", "e")))
    val pe = enc.queryExecution.sparkPlan.toString
    assert(!pe.contains("Exchange"), "BPE encode must not shuffle:\n" + pe.take(600))
    assert(pe.contains("MapPartitions"), pe.take(300))
    val vs = graft.functions.Multimodal.videoStats(
      docs.select(col("doc_id"), col("text").cast("binary").as("blob")), "doc_id", "blob")
    val pv = vs.queryExecution.sparkPlan.toString
    assert(!pv.contains("Exchange"), "videoStats must not shuffle:\n" + pv.take(600))
  }

  test("heavy hitters verify pass: candidates broadcast, two-phase agg, no wide join") {
    // q132's returned plan is the VERIFY pass (pass 1 is the eager
    // treeAggregate with O(k) driver state): the candidate set must
    // broadcast onto the gram stream and the exact count must partial-
    // aggregate before its exchange, so the only shuffle moves <= 2k
    // map-combined rows per partition no matter the corpus size.
    val p = plan("q132_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), "candidates must broadcast:\n" + p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("partial_count"), "exact count must map-side combine:\n" + p.take(600))
  }

  test("radix quantiles: every executed pass is sort-free and window-free") {
    import scala.collection.mutable
    val seen = mutable.Buffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        seen.synchronized { seen += qe.executedPlan.toString; () }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      import spark.implicits._
      val out = graft.functions.Quantiles.radixQuantiles(
        (1L to 5000L).map(i => i * 2654435761L % 100003L - 50000L).toDF("v"),
        "v", Seq(25, 50, 90, 99), 100)
      out.collect()
      // QueryExecutionListener delivery is async (listener bus) — poll
      // for the 4 digit-pass plans rather than reaching into private API
      val deadline = System.nanoTime() + 5000000000L
      while (seen.synchronized(seen.count(_.contains("HashAggregate"))) < 4
          && System.nanoTime() < deadline) Thread.sleep(50)
      val passes = seen.synchronized(seen.filter(_.contains("HashAggregate")).toList)
      assert(passes.nonEmpty, "histogram passes not observed")
      passes.foreach { p =>
        assert(!p.contains("SortExec") && !p.contains("WindowExec"),
          "a radix pass sorted or windowed:\n" + p.take(600))
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("hash-index build scans the corpus ONCE: the write reads the sized aggregate's cache") {
    import scala.collection.mutable
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("hidx-onescan").toString
    (0L until 500L).map(i => (i, s"text ${i % 400}")).toDF("doc_id", "text")
      .write.parquet(s"$base/docs")
    val seen = mutable.Buffer.empty[SparkPlan]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        seen.synchronized { seen += qe.executedPlan; () }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    // typed walk: innerChildren (a cached relation's stored plan) are
    // NOT traversed, so a FileSourceScanExec found here really executed
    // in THIS action
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    spark.listenerManager.register(listener)
    try {
      graft.functions.Dedup.writeHashIndex(
        spark.read.parquet(s"$base/docs"), "doc_id", "text", s"$base/idx")
      val deadline = System.nanoTime() + 5000000000L
      // match the INDEX write specifically: the listener bus is async, so
      // earlier writes (this test's own fixture, other suites') can land
      // in the buffer after registration
      def writes = seen.synchronized(
        seen.filter { p =>
          val s = p.toString
          s.contains("InsertIntoHadoopFsRelation") && s.contains("idx/hashes")
        }.toList)
      while (writes.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val w = writes
      assert(w.nonEmpty, "hashes/ write not observed")
      // the adaptive sizing already counted (and cached) the dedup
      // aggregate — the write must read that cache, not re-scan the
      // corpus through a second dedup
      w.foreach { p =>
        assert(scans(p).isEmpty,
          "the index write re-scanned the corpus instead of reusing the " +
            "sized aggregate's cache:\n" + p.toString.take(800))
        assert(p.toString.contains("InMemoryTableScan"),
          "write plan should read the cached aggregate:\n" + p.toString.take(800))
      }
    } finally spark.listenerManager.unregister(listener)
  }

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

  test("dedup candidate generation: fused bounded-set aggregate, ONE corpus-sized exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = graft.functions.Dedup.ngramCandidates(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BoundedDistinctSetAgg") || p.contains("boundeddistinctsetagg"),
      "candgen lost the fused postings aggregate")
    // exactly one exchange keyed on the gram (the corpus-sized shuffle;
    // map-side combine via the bounded aggregate) and one keyed on the
    // candidate pair (candidate-sized) — a third hash exchange means the
    // fused aggregate was unwound into distinct+join
    val gramEx = "Exchange hashpartitioning\\(g#".r.findAllIn(p).size
    val allEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(gramEx == 1, s"expected 1 gram exchange, got $gramEx:\n${p.take(900)}")
    assert(allEx == 2, s"expected 2 hash exchanges total, got $allEx:\n${p.take(900)}")
  }

  test("dedup verification: codegen'd sorted-merge intersections, no explode-join, no cartesian") {
    for (q <- Seq("q32_near_dup_pairs", "q54_ngram_jaccard")) {
      val p = plan(q)
      assert(p.toLowerCase.contains("sortedintersectcount"),
        s"$q lost the sorted-merge verification")
      assert(!p.toLowerCase.contains("array_intersect"),
        s"$q re-grew a quadratic per-row intersect")
    }
    // q54's returned plan is the verification stage alone (candgen is
    // checkpointed): a Generate here would mean gram arrays exploded
    // back into the pair join
    assert(!plan("q54_ngram_jaccard").contains("Generate"), "q54 verification explodes grams")
    for (q <- Seq("q32_near_dup_pairs", "q54_ngram_jaccard", "q49_embedding_near_dup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q grew an all-pairs join")
    }
  }

  test("indexed near-dup probe: band scan prunes to the batch's bucket footprint") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("plan-sigidx").toString
    graft.functions.Dedup.writeSignatureIndex(
      docs.where(col("doc_id") % 7 =!= 0), "doc_id", "text", dir)
    // materialize = false: production checkpoints the batch hash pass and
    // the candidate set (stage boundaries invisible to the caller's
    // plan); the lazy form inlines those exact subtrees into ONE plan so
    // the pruning/no-cartesian contract stays assertable
    val p = graft.functions.Dedup.nearDupAgainstIndexedImpl(
      docs.where(col("doc_id") % 7 === 0), "doc_id", "text", dir,
      k = 3, numHashes = 8, buckets = 0, materialize = false)
      .queryExecution.sparkPlan.toString
    // the batch's bk footprint must reach the bands scan as a PARTITION
    // filter (pruned directories), not a post-scan Filter
    assert("PartitionFilters: \\[[^\\]]*bk".r.findFirstIn(p).isDefined, p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // verification still runs on the fused sorted-merge expression
    assert(p.toLowerCase.contains("sortedintersectcount"))
  }

  test("heavy hitters: verify exchange moves candidate-bounded rows, not the gram space") {
    import spark.implicits._
    // the operator's core claim at RUNTIME: with a near-unique gram
    // space (one planted heavy), the verify pass's shuffles carry rows
    // bounded by candidates × partitions — never one row per distinct
    // gram, which is what the direct groupBy plan would move
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rnd = new scala.util.Random(7)
      val docs = (0L until 400L).map { i =>
        val noise = Seq.fill(30)(s"u${rnd.nextInt(100000)}").mkString(" ")
        (i, s"hot gram one $noise")
      }.toDF("doc_id", "text")
      val k = 150
      val out = graft.functions.HeavyHitters.frequentGrams(
        docs.repartition(4), "text", gramLen = 3, shareDen = 50, k = k)
      out.queryExecution.toRdd.count()
      val shuffled = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.metrics.collect {
            case (name, m) if name.toLowerCase.contains("recordswritten") => m.value
          }.sum
      }.sum
      val grams = 400L * 31L // ~distinct gram count (noise is near-unique)
      assert(shuffled > 0, "expected at least one exchange to execute")
      assert(shuffled <= 2L * k * 4 + 100,
        s"verify pass shuffled $shuffled rows — candidate bound exceeded")
      assert(shuffled < grams / 4,
        s"verify pass shuffled $shuffled rows — approaching the $grams-gram key space")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("curation chain: no window function, dedup aggregate map-side combined") {
    // q135's scale claim: the whole chain is projections + filters; the
    // only corpus-keyed exchanges are the dedup hash aggregate (partial
    // before exchange — a viral duplicate costs a counter per partition)
    // and the rep join-back. A window over the hash groups would sort
    // whole duplicate groups in one task and must never reappear.
    val p = plan("q135_curation_e2e")
    assert(!p.contains("WindowExec"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "dedup aggregate must map-side combine:\n" + p.take(800))
  }

  test("exact-dedup hash-index probe: hashes scan prunes to the batch's bucket footprint") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("plan-hashidx").toString
    graft.functions.Dedup.writeHashIndex(
      docs.where(col("doc_id") % 7 =!= 0), "doc_id", "text", dir)
    val p = graft.functions.Dedup.exactDupsAgainstIndexed(
      docs.where(col("doc_id") % 7 === 0).limit(5), "doc_id", "text", dir)
      .queryExecution.sparkPlan.toString
    // the batch's hb footprint must reach the hashes scan as a PARTITION
    // filter (pruned directories), not a post-scan Filter — the q134
    // gate's O(batch + matches) claim against any standing corpus
    assert("PartitionFilters: \\[[^\\]]*hb".r.findFirstIn(p).isDefined, p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("span-index probe prunes bucket directories (hb PartitionFilters), no pair product") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, (0 to 11).map(j => s"t${(i * 7 + j) % 30}").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("plan-spanidx").toString
    graft.functions.TextOps.writeSpanIndex(
      docs.where(col("doc_id") % 7 =!= 0), "doc_id", "text", dir)
    val p = graft.functions.TextOps.duplicatedSpansAgainstIndex(
        docs.where(col("doc_id") % 7 === 0), "doc_id", "text", dir)
      .queryExecution.sparkPlan.toString
    // the batch's hb footprint must reach the whs scan as a PARTITION
    // filter — the steady-state O(batch windows + matches) claim
    assert("PartitionFilters: \\[[^\\]]*hb".r.findFirstIn(p).isDefined, p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("embedding near-dup: banded join keys, no vector across the band join, banded candidate volume") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = graft.functions.Similarity.embeddingNearDups(
      emb, "vec_id", "embedding", 64, tauNum = 3, tauDen = 10)
    val p = q.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // candidate generation joins on the (band, sig) key pair — never a
    // single fixed bucket column
    assert("band#\\d+L?, sig#\\d+L?".r.findFirstIn(p).isDefined, p.take(1500))
    // the banded frame crossing the self-join carries (id, band, sig)
    // ONLY: no join key list may include the quantized vector
    val joinKeyLists = "Join.*\\[(band|sig)[^\\]]*\\]".r.findAllIn(p).toList
    assert(joinKeyLists.nonEmpty && !joinKeyLists.exists(_.contains("qe")), p.take(1500))
    // data contract: at the 8×16 default, per-key bucket volume is a
    // banded fraction — Σ n·(n-1)/2 over every (band, sig) bucket must be
    // far below the old fixed-16-bucket floor of ~N²/16 candidates
    import org.apache.spark.sql.functions.{col, count, explode, lit, posexplode, sum}
    val n = emb.count()
    val qv = emb.select(col("vec_id"),
      graft.functions.Similarity.quantize(col("embedding")).as("qe"))
    val vol = qv.select(posexplode(
        graft.functions.BandSigs(col("qe"), 64, 8, 16)).as(Seq("band", "sig")))
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("c"))
      .agg(sum((col("c") * (col("c") - 1) / 2).cast("long"))).collect()(0).getLong(0)
    assert(vol < n * n / 64,
      s"banded candidate volume $vol not a banded fraction of n²=${n * n}")
  }

  test("q113: the SQL window idiom plans as the bounded heap through the optimizer rule") {
    val p = plan("q113_window_topk_sql")
    assert(p.contains("GroupedTopK"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
  }

  test("semantic dedup: cell-key pair join, no cartesian, components never span cells") {
    import org.apache.spark.sql.functions.{col, countDistinct, max}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = graft.functions.Similarity.semanticDedup(
      emb, "vec_id", "embedding", 64, tauNum = 3, tauDen = 10)
    val p = q.queryExecution.sparkPlan.toString
    // the only pair-generating join keys on the CELL (vectors ride the
    // join deliberately — cell-mates need the dot gate); no all-pairs
    // shape may appear anywhere
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert("cell#\\d+".r.findFirstIn(p).isDefined, p.take(1500))
    // data contract: edges only ever connect cell-mates, so every
    // component is cell-homogeneous — the property that keeps the
    // closure and the pick cell-bounded at any scale
    val span = q.groupBy(col("comp"))
      .agg(countDistinct(col("cell")).as("nc"))
      .agg(max(col("nc"))).collect()(0).getLong(0)
    assert(span == 1L, s"a component spans $span cells")
  }

  test("indexed IVF probe: cells scan prunes to the probed-cell union, queries broadcast") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("plan-ivfidx").toString
    graft.functions.Similarity.writeIvfIndex(emb, "vec_id", "embedding", dir)
    val p = graft.functions.Similarity.ivfTopKIndexed(
      emb.where(col("vec_id") < 10), "vec_id", "embedding", dir, 5)
      .queryExecution.sparkPlan.toString
    // the probed-cell union must reach the cells scan as a PARTITION
    // filter (unprobed cell directories never listed)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined, p.take(1200))
    // the per-query (query, cell) set is broadcast onto the cells scan,
    // and the rerank is the bounded-heap operator, not a window sort
    assert(p.contains("BroadcastHashJoin"), "qCells not broadcast onto the cells scan")
    assert(p.contains("GroupedTopK"), "rerank is not the bounded-heap operator")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("decontamination: benchmark grams broadcast, ONE doc-keyed exchange") {
    // executedPlan: exchanges are inserted by EnsureRequirements, which
    // sparkPlan has not run yet
    val p = SparkEntry.queries("q88_decontamination")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "benchmark gram set not broadcast")
    // the only hash exchange is the doc-keyed counter aggregate (plus the
    // bench side's own distinct, which is benchmark-sized, not corpus-sized)
    val docEx = "Exchange hashpartitioning\\(doc_id#".r.findAllIn(p).size
    assert(docEx == 1, s"expected 1 doc-keyed exchange, got $docEx:\n${p.take(900)}")
    assert(!p.contains("SortMergeJoin"), "corpus-sized gram join fell back to sort-merge")
  }

  test("connected-components propagation pass: key joins only, never a cartesian") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "component")
    val p = graft.functions.Graph.propagateOnce(edges, labels)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"propagation pass plans an all-pairs join:\n${p.take(900)}")
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

  test("facade tight bbox: store scan pushes the LOOSE box's morton bounds (index-first)") {
    import spark.implicits._
    import graft.core.{Morton, Region, Resource, VoxelType}
    val db = new graft.GraftDB(
      spark, Resource.fixture(VoxelType.UInt64),
      java.nio.file.Files.createTempDirectory("plan-bbox").toString,
      Region.CuboidDims(8, 8, 4))
    // id 7 lives in cuboids (0,0,0) and (2,0,0); everything else is id 9
    // far away at (63,63,15) — a full-channel scan would cover its morton
    db.writeCuboid(Seq(
      (0L, 1L, 1L, 1L, 7L), (0L, 17L, 1L, 1L, 7L), (0L, 63L, 63L, 15L, 9L))
      .toDF("t", "x", "y", "z", "value"))
    val p = db.getBoundingBox(7L, tight = true).queryExecution.sparkPlan.toString
    assert("PushedFilters: \\[[^\\]]*morton".r.findFirstIn(p).isDefined, p.take(800))
    // the scan admits EXACTLY the loose box's covering cuboids — id 9's
    // far-corner cuboid (morton 255), which a full-extent scan would have
    // to include, is outside the membership list
    val looseCover = Region.coveringMortons(
      Region.Box(0, 24, 0, 8, 0, 4), Region.CuboidDims(8, 8, 4))
    assert(looseCover == Seq(Morton.encode(0, 0, 0), Morton.encode(1, 0, 0), Morton.encode(2, 0, 0)))
    val inList = ("morton#\\d+L IN \\(" + looseCover.mkString(",") + "\\)").r
    assert(inList.findFirstIn(p).isDefined, p.take(1200))
  }

  test("chain read for a write's keys pushes the key footprint into every version scan") {
    import spark.implicits._
    import graft.core.{Morton, Region, Resource, VoxelType}
    import graft.storage.VersionedStore
    val db = new graft.GraftDB(
      spark, Resource.fixture(VoxelType.UInt64),
      java.nio.file.Files.createTempDirectory("plan-rfk").toString,
      Region.CuboidDims(8, 8, 4))
    db.writeCuboid(Seq((0L, 1L, 1L, 1L, 7L), (0L, 63L, 63L, 15L, 9L))
      .toDF("t", "x", "y", "z", "value"))
    db.writeCuboid(Seq((0L, 2L, 2L, 2L, 8L)).toDF("t", "x", "y", "z", "value"))
    val keys = Seq((db.resource.lookupKey, 0, 0, Morton.encode(0L, 0L, 0L)))
      .toDF("lookupKey", "res", "t", "morton")
    val p = VersionedStore.readForKeys(spark, db.storeRoot, keys)
      .queryExecution.sparkPlan.toString
    // EVERY chain-member scan (full snapshot and delta alike) must carry
    // the literal morton footprint as a data filter and (lookupKey, res)
    // as partition filters — the semi-join alone reaches neither, and
    // without them a write-sized chain read scans a store-sized snapshot
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).toList
    assert(pushed.size >= 2, p.take(1500)) // chain depth 2: both scans
    assert(pushed.forall(_.contains("morton")), p.take(1500))
    assert("PartitionFilters: \\[[^\\]]*res".r.findFirstIn(p).isDefined, p.take(1500))
  }

  test("chain-read file count grows with versions touched, not store size (runtime numFiles bound)") {
    import spark.implicits._
    import graft.core.{Morton, Region, Resource, VoxelType}
    import graft.storage.{VersionedStore, VolumeGen}
    import org.apache.spark.sql.execution.FileSourceScanExec
    val db = new graft.GraftDB(
      spark, Resource.fixture(VoxelType.UInt64),
      java.nio.file.Files.createTempDirectory("plan-chainfiles").toString,
      Region.CuboidDims(8, 8, 4))
    // v0: a 256-cuboid snapshot (several parquet files after clustering)
    db.writeCuboid(VolumeGen.voxels(spark, db.resource.lookupKey, 0,
      Region.Box(0, 64, 0, 64, 0, 16), 0 until 1, VoxelType.UInt64, seed = 11).toDF())
    // every patch rewrites the SAME probed cuboid, so each new version
    // genuinely participates in the one-key chain read below
    def patch(i: Int): Unit =
      db.writeCuboid(Seq((0L, (i % 8).toLong, 1L, 1L, 100L + i))
        .toDF("t", "x", "y", "z", "value"))
    // physical files the one-key chain read opens, from the executed
    // scans' numFiles metric (AQE off so the executed tree is walkable)
    def filesForOneKey(): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val keys = Seq((db.resource.lookupKey, 0, 0, Morton.encode(0L, 0L, 0L)))
          .toDF("lookupKey", "res", "t", "morton")
        val df = VersionedStore.readForKeys(spark, db.storeRoot, keys)
        // execute THIS QueryExecution (df.count() would plan a separate
        // aggregate query and leave these scan nodes' metrics at zero)
        df.queryExecution.toRdd.count()
        df.queryExecution.executedPlan
          .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    (1 to 3).foreach(patch)
    val f3 = filesForOneKey()
    (4 to 12).foreach(patch)
    val f12 = filesForOneKey()
    // the bound: 9 extra chain versions may add ≤ 2 files each (the
    // delta's own data file + slack for a split), and NEVER re-open the
    // snapshot's file set per version — the O(store × depth) failure this
    // contract exists to catch
    assert(f3 > 0, "chain read opened no files — probe key missed the store")
    assert(f12 - f3 <= 2L * 9, s"one-key chain read grew $f3 -> $f12 files over 9 extra versions")
  }

  test("relational scans prune columns (no full-width reads for narrow projections)") {
    val p = plan("q01_pricing_summary")
    // lineitem has 16 columns; the pricing summary needs 5
    assert("ReadSchema: [^\\n]*l_returnflag".r.findFirstIn(p).isDefined)
    assert(!p.contains("l_comment"), "q01 scan reads unneeded columns")
  }

  test("bigram LM: no window, no cartesian, map-side combined model aggregates") {
    val p = plan("q136_bigram_lm")
    assert(!p.contains("WindowExec") && !p.contains("CartesianProduct"), p.take(800))
    // both model aggregates (bigram counts, doc re-agg) combine map-side
    assert(p.contains("partial_count"), "model aggregates must be two-phase")
    // every exchange is keyed on model/doc keys — the text column never
    // shuffles (exchanges exist only post-EnsureRequirements)
    val pe = SparkEntry.queries("q136_bigram_lm")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(pe).map(_.group(1)).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")),
      s"document text crossed an exchange: $exchanges")
  }

  test("table profile: ONE scan feeds the whole multi-column profile") {
    val p = plan("q137_table_profile")
    // the single-aggregate claim: one FileScan, Expand carries the
    // multi-distinct, no join between per-column passes
    val scans = "FileScan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"profile scanned the table $scans times:\n${p.take(600)}")
    assert(p.contains("Expand"), "multi-distinct should plan as Expand")
    assert(!p.contains("Join"), "profile must not join per-column passes")
  }

  test("group sample: plans as the bounded heap, no window, no sort") {
    val p = plan("q139_group_sample")
    assert(p.contains("GroupedTopK"), "sampling must run through the bounded heap")
    assert(!p.contains("WindowExec"), p.take(600))
  }

  test("shard shuffle: one shard-keyed exchange + in-shard sort, nothing corpus-wide") {
    import graft.functions.TextOps
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = TextOps.shardShuffle(docs, "doc_id", numShards = 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange (\\w+partitioning\\([^)]*\\))".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.size == 1 && exchanges.head.startsWith("hashpartitioning(shard"),
      s"expected exactly the shard repartition, got: $exchanges")
    assert(p.contains("Window"), "rank must come from the per-shard window")
    assert(!p.contains("rangepartitioning"),
      "a global sort crept into the shuffle plan")
  }

  test("hashed bigram LM: every exchange moves hash/doc keys, never token strings") {
    val pe = SparkEntry.queries("q141_bigram_lm_hashed")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!pe.contains("CartesianProduct") && !pe.contains("WindowExec"))
    // the whole point of q141: the count shuffle and the join-back are
    // keyed on (long, long) portable hashes — no token-string column
    // (w1/w2/b struct, text) may appear in any exchange key
    val keys = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(pe).flatMap(m => "(\\w+)#\\d+".r
        .findAllMatchIn(m.group(1)).map(_.group(1))).toSet
    assert(keys.nonEmpty)
    assert(keys.subsetOf(Set("w1h", "bh", "doc_id")),
      s"a non-hash key crossed an exchange: $keys")
  }

  test("sketch profile: ONE scan, register-keyed exchange, no join, no raw-value shuffle") {
    val p = plan("q142_profile_sketch")
    val scans = "FileScan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"sketch profile scanned the table $scans times:\n${p.take(600)}")
    assert(!p.contains("Join"), "profile must not join per-column passes")
    // registers combine map-side: distinct state per task is <=64 rows/col
    assert(p.contains("partial_max"), "register aggregate must be two-phase")
    val keys = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(p).flatMap(m => "(\\w+)#\\d+".r
        .findAllMatchIn(m.group(1)).map(_.group(1))).toSet
    assert(keys.subsetOf(Set("ci", "bucket")),
      s"a raw value column crossed an exchange: $keys")
  }

  test("DSIR select: bounded-heap rank, no window, text never crosses an exchange") {
    val p = plan("q143_dsir_select")
    assert(p.contains("GroupedTopK"), "selection must run through the bounded heap")
    assert(!p.contains("WindowExec") && !p.contains("CartesianProduct"), p.take(800))
    // one shared count aggregate builds both models: map-side combined
    assert(p.contains("partial_count"), "model aggregate must be two-phase")
    val pe = SparkEntry.queries("q143_dsir_select")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(pe).map(_.group(1)).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")),
      s"document text crossed an exchange: $exchanges")
  }

  test("semantic decontamination: eval set broadcasts, one max exchange, fused dot") {
    val pe = SparkEntry.queries("q152_semantic_decontam")(spark, sf)
      .queryExecution.executedPlan.toString
    // the eval sweep IS a broadcast nested-loop (no join key by design —
    // every corpus row scores against every eval vector); the corpus
    // side must never shuffle for it
    assert(pe.contains("BroadcastNestedLoopJoin"), pe.take(600))
    assert(pe.toLowerCase.contains("dotproductq"), "dot must be the fused codegen loop")
    val keys = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(pe).flatMap(m => "(\\w+)#\\d+".r
        .findAllMatchIn(m.group(1)).map(_.group(1))).toSet
    assert(keys.subsetOf(Set("vec_id")),
      s"only the per-id max agg may shuffle: $keys")
  }

  test("DSIR hashed: bucket-int exchanges only, bounded model, bounded heap") {
    val p = plan("q150_dsir_hashed")
    assert(p.contains("GroupedTopK"), "selection must run through the bounded heap")
    assert(!p.contains("WindowExec") && !p.contains("CartesianProduct"), p.take(800))
    val pe = SparkEntry.queries("q150_dsir_hashed")(spark, sf)
      .queryExecution.executedPlan.toString
    val keys = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(pe).flatMap(m => "(\\w+)#\\d+".r
        .findAllMatchIn(m.group(1)).map(_.group(1))).toSet
    assert(keys.nonEmpty)
    // fb = feature bucket (long), doc/is_t re-agg, g = heap key — no
    // token string ever crosses an exchange
    assert(keys.subsetOf(Set("fb", "doc_id", "is_t", "g")),
      s"a non-bucket key crossed an exchange: $keys")
  }

  test("image near-dup: banded equi-join candidates, never a pair product") {
    val p = plan("q144_image_near_dup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // exactly ONE join in the whole pipeline: the (band_idx, band_val)
    // candidate join — Hamming verify rides the joined band arrays, it
    // must not join back to the hash table
    val joins = "HashJoin|SortMergeJoin".r.findAllMatchIn(p).length
    assert(joins == 1, s"expected the single band join, found $joins:\n${p.take(800)}")
    assert(!p.contains("WindowExec"), p.take(600))
  }

  test("indexed image near-dup: band scan prunes to the batch's bucket footprint") {
    val p = plan("q146_image_near_dup_indexed")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("WindowExec"), p.take(600))
    // the bk pruning contract is asserted on the shared engine's lazy
    // plan (production checkpoints the candidate stage, hiding the bands
    // scan from the query-level plan) — one engine serves all three
    // media modalities, so this covers q146/q156/q157
    import spark.implicits._
    def bandsOf(i: Int) = Array.tabulate(8)(j => (i * 37L + j * 11L) % 256L)
    val dir = java.nio.file.Files.createTempDirectory("plan-fpidx").toString
    graft.functions.Multimodal.writeFingerprintIndex(
      (1L to 20L).map(i => (i, bandsOf(i.toInt))).toDF("id", "bands"), dir)
    val pp = graft.functions.Multimodal.nearDupAgainstFingerprintIndexImpl(
        (21L to 23L).map(i => (i, bandsOf(i.toInt % 5))).toDF("id", "bands"),
        dir, maxHamming = 3, numBands = 4, buckets = 0, materialize = false)
      .queryExecution.sparkPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bk".r.findFirstIn(pp).isDefined, pp.take(1200))
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"), pp.take(800))
  }

  test("html extract: pure per-row codegen chain — no shuffle, no join, no window") {
    val p = plan("q147_html_extract")
    assert(!p.contains("Exchange hashpartitioning"),
      s"a per-row extraction shuffled:\n${p.take(600)}")
    assert(!p.contains("Join") && !p.contains("WindowExec"), p.take(600))
  }

  test("url canonicalization: pure per-row chain — no shuffle, no join, no window") {
    val p = plan("q154_canonical_url")
    assert(!p.contains("Exchange hashpartitioning"),
      s"a per-row normalization shuffled:\n${p.take(600)}")
    assert(!p.contains("Join") && !p.contains("WindowExec"), p.take(600))
  }

  test("paragraph scrub: counting shuffles line hashes, hot-set join is AQE's call, one text rebuild") {
    // The hot set is NOT hint-forced (unbounded on boilerplate-heavy
    // crawls — round-13 ADVICE): at this SF it is runtime-tiny, so AQE
    // must still CHOOSE broadcast once sizes are known. Execute, then
    // read the final adaptive plan.
    val df = SparkEntry.queries("q148_paragraph_scrub")(spark, sf)
    df.collect()
    val pe = df.queryExecution.executedPlan.toString
    assert(pe.contains("BroadcastHashJoin"),
      s"AQE should broadcast the runtime-tiny hot set:\n${pe.take(900)}")
    assert(!pe.contains("CartesianProduct") && !pe.contains("WindowExec"))
    // every exchange key is the line hash or the doc id — paragraph TEXT
    // never shuffles for counting (only the irreducible doc rebuild
    // carries it, keyed on doc_id)
    val keys = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(pe).flatMap(m => "(\\w+)#\\d+".r
        .findAllMatchIn(m.group(1)).map(_.group(1))).toSet
    assert(keys.nonEmpty)
    assert(keys.subsetOf(Set("lh", "doc_id")),
      s"unexpected exchange key: $keys")
  }

  test("indexed audio near-dup: band scan prunes to the batch's bucket footprint") {
    // bk pruning is pinned on the shared engine's lazy plan in the
    // indexed-image test (one engine under q146/q156/q157); here we pin
    // the audio query's own plan shape
    val p = plan("q156_audio_near_dup_indexed")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("WindowExec"), p.take(600))
  }

  test("indexed video near-dup: band scan prunes to the batch's bucket footprint") {
    // bk pruning pinned on the shared engine — see the indexed-image test
    val p = plan("q157_video_near_dup_indexed")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("WindowExec"), p.take(600))
  }

  test("audio near-dup: same banded single-join contract as the image path") {
    val p = plan("q145_audio_near_dup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    val joins = "HashJoin|SortMergeJoin".r.findAllMatchIn(p).length
    assert(joins == 1, s"expected the single band join, found $joins:\n${p.take(800)}")
    assert(!p.contains("WindowExec"), p.take(600))
  }

  test("video near-dup: same banded single-join contract as the other modalities") {
    val p = plan("q149_video_near_dup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    val joins = "HashJoin|SortMergeJoin".r.findAllMatchIn(p).length
    assert(joins == 1, s"expected the single band join, found $joins:\n${p.take(800)}")
    assert(!p.contains("WindowExec"), p.take(600))
  }
}
