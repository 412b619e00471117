package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Graph, HeavyHitters, Similarity, TextOps}

/** Training-data-pipeline stress run: multiplies the sf0.1 corpus to
  * `mult` × 5,000 documents and `embMult` × 2,000 embeddings, then times
  * every pipeline family end to end and writes one BENCH-style JSON line
  * (stress.json) — the committed scale evidence that the dedup / ANN /
  * cluster shapes hold far past the driver's sf0.1 bench.
  *
  * Copy structure: copies are salted in GROUPS OF 4 (every token carries
  * the group id), so all grams/shingles have document frequency ≤ 4 —
  * near-dups exist only within a group, and the PRODUCTION df-cap
  * (maxDf = 16) runs unchanged at any multiplier. Within a group, each
  * copy perturbs two token positions, so the 4 members are near- but not
  * exact dups; group count scales with the corpus while per-gram postings
  * stay bounded — exactly the regime the bounded-set aggregate is built
  * for. (An earlier scheme made every copy a near-dup of copy 0: at
  * 200× that turns every gram into a 200-document stop-gram, which the
  * production cap correctly suppresses to zero pairs — skew-safe, but it
  * stress-tests nothing downstream of candgen.)
  * Usage: runMain graft.PipelineStress [mult] [embMult] [onlyStages]
  * `onlyStages` (comma-separated stage names) reruns a subset at the
  * same multipliers and MERGES its timings into the existing
  * stress.json — adding a stage doesn't cost a full re-sweep.
  */
object PipelineStress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(200)
    val embMult = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val only: Set[String] =
      args.drop(2).headOption.map(_.split(",").toSet).getOrElse(Set.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(f: => T): Option[T] =
      if (only.nonEmpty && !only(name)) None
      else {
        // GC barrier outside the clock: lets ContextCleaner reclaim the
        // previous stage's broadcasts/shuffles so its cleanup storm can't
        // land inside this stage's window (r11: ivf_index_build 46 s
        // in-sweep vs 23.5-26.0 s isolated). Standing fixtures (docs/emb
        // persists) are strongly referenced and survive.
        System.gc()
        Thread.sleep(200)
        val t0 = System.nanoTime(); val r = f
        val sec = (System.nanoTime() - t0) / 1e9
        stages(name) = math.rint(sec * 100) / 100
        println(f"[stress] $name%-34s $sec%8.2f s"); Some(r)
      }
    // Honest forcing: `count()` on a projection-only frame lets Spark
    // skip the projection entirely (rows are countable from the source),
    // recording ~0 s for stages that would really cost minutes.
    // Executing the physical plan's RDD evaluates every expression.
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // group = copy/4: the group id salts EVERY token (bounded df); the
    // copy id perturbs two positions (intra-group near-dups)
    val docs = base
      .crossJoin(spark.range(mult).select(col("id").as("copy")))
      .select(
        (col("doc_id") * mult + col("copy")).as("doc_id"),
        concat_ws(" ", expr(
          """transform(split(text, ' '), (tk, i) ->
            |  CASE WHEN copy % 4 > 0 AND i = (7*(copy % 4)) % 13
            |         THEN concat('v', copy % 4, tk, copy div 4)
            |       WHEN copy % 4 > 0 AND i = (7*(copy % 4) + 1) % 17
            |         THEN concat(tk, '_', copy % 4, '_', copy div 4)
            |       ELSE concat(tk, copy div 4) END)""".stripMargin)).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    println(s"[stress] corpus: $n docs (${mult}x sf0.1, near-dup groups of 4)")

    timed("exact_dedup") {
      force(Dedup.exactDedup(docs, "doc_id", "text"))
    }
    timed("minhash_signatures") {
      force(TextOps.minhashSignatures(
        TextOps.shingles(docs, "doc_id", "text"), "doc_id"))
    }
    val lshPairs = Dedup.nearDupPairs(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("lsh_near_dup_pairs") { lshPairs.count() }
      .foreach(n => println(s"[stress]   LSH near-dup pairs found: $n"))
    // the q81 shape at scale: transitive closure over the pair graph —
    // min-label propagation + pointer jumping, driver sees only counts
    timed("duplicate_clusters") {
      force(Graph.connectedComponents(lshPairs, "doc_a", "doc_b"))
    }
    // resolve + keep-best (q103): CC over the persisted pair frame plus
    // the quality-ranked window pick; lshPairs is forced OUTSIDE the
    // timed block so subset reruns time the same work as full sweeps —
    // but only when this stage will run at all (an unguarded force cost
    // every unrelated scoped rerun ~200 s)
    if (only.isEmpty || only("canonical_pick")) lshPairs.count()
    timed("canonical_pick") {
      val cc = Graph.connectedComponents(lshPairs, "doc_a", "doc_b")
      val scored = TextOps.qualityScore(
        docs.withColumn("n_chars", length(col("text"))), "doc_id", "text", "n_chars")
        .select(col("doc_id"), col("score"))
      force(Dedup.canonicalPickFromCc(scored, "doc_id", "score", cc))
    }
    lshPairs.unpersist()
    // incremental ingest shape: a ~1% "new batch" against the standing
    // corpus — the per-batch cost of a continuously-fed pipeline (q86)
    timed("incremental_near_dup_1pct") {
      force(Dedup.nearDupAgainst(
        docs.where(col("doc_id") % 101 === 0),
        docs.where(col("doc_id") % 101 =!= 0),
        "doc_id", "text"))
    }.foreach(n => println(s"[stress]   incremental near-dup pairs: $n"))
    // ...and the same batch against a MATERIALIZED signature index: the
    // index build is the once-amortized standing cost; the probe is what
    // each ingest batch pays in steady state (signs only the batch,
    // partition-prunes the band table, fetches stored arrays)
    val idxDir = Files.createTempDirectory("graft-stress-sigidx").toString
    timed("signature_index_build") {
      Dedup.writeSignatureIndex(
        docs.where(col("doc_id") % 101 =!= 0), "doc_id", "text", idxDir)
    }
    timed("incremental_near_dup_indexed") {
      force(Dedup.nearDupAgainstIndexed(
        docs.where(col("doc_id") % 101 === 0), "doc_id", "text", idxDir))
    }.foreach(n => println(s"[stress]   indexed-probe near-dup pairs: $n"))
    // PRODUCTION df-cap: group salting keeps every gram's df ≤ 4, so
    // maxDf = 16 runs unchanged at 1M docs (the 100 TB configuration)
    // Profile split: candidate generation (gram hashing + ONE corpus
    // exchange + pair aggregation) timed alone, so ngram_jaccard_pairs
    // minus this ≈ the exact-verification tail (semi-join-shrunk gram
    // arrays + sorted-merge intersections) — which of the two dominates
    // decides where any future optimization effort goes.
    // MEASURED (1M docs, 200×, 2026-08): with the unfused per-position
    // substring+xxhash64 grams, candidates were 1135 s vs 956 s for the
    // full stage (candidates-only ran first and absorbed warmup) —
    // candgen ~90% of the stage, the df-capped verification join skewless
    // (≤ maxDf postings per gram, ≤ 4 per group under the salting
    // scheme), so no salted join applies. ACTED ON: the one-pass rolling
    // NgramHashes expression cut candidates to 272.7 s (4.2×) and the
    // full stage to 298.3 s (3.2×), with identical candidate (208,300)
    // and verified-pair (43,060) counts.
    timed("ngram_candidates_only") {
      force(Dedup.ngramCandidates(docs, "doc_id", "text"))
    }.foreach(n => println(s"[stress]   ngram candidate pairs: $n"))
    timed("ngram_jaccard_pairs") {
      force(Dedup.ngramJaccardPairs(docs, "doc_id", "text"))
    }.foreach(n => println(s"[stress]   ngram near-dup pairs found: $n"))
    timed("simhash") {
      force(TextOps.simhash(docs, "doc_id", "text"))
    }
    timed("lang_id") {
      force(TextOps.langId(docs, "doc_id", "text"))
    }
    timed("quality_score") {
      force(TextOps.qualityScore(docs.withColumn("n_chars", length(col("text"))),
        "doc_id", "text", "n_chars"))
    }
    timed("token_counts") {
      force(TextOps.tokenCounts(docs, "doc_id", "text"))
    }
    timed("winnowing_fingerprints") {
      force(TextOps.winnowFromText(docs, "doc_id", "text"))
    }
    // heavy hitters (q132) A/B: the sketch-guided two-pass vs the direct
    // full-key groupBy. Both scan the corpus twice (the direct plan needs
    // the total-gram count for the share threshold too); the difference
    // is the exchange — the direct plan shuffles every distinct salted
    // trigram, the sketch plan shuffles <= 2k candidate rows per
    // partition. At 100 TB the distinct-gram space is ~10^11 keys and
    // the direct exchange is the query; here it's measurable already.
    timed("heavy_hitters_exact_groupby") {
      val g = docs
        .select(TextOps.tokens(col("text")).as("tk"))
        .where(size(col("tk")) >= 3)
        .select(explode(TextOps.shingleArr(3)).as("gram"))
      val total = g.count()
      force(g.groupBy(col("gram")).agg(count(lit(1)).as("n"))
        .where(col("n") * 5000L >= total))
    }
    timed("heavy_hitters_sketch") {
      force(HeavyHitters.frequentGrams(docs, "text"))
    }
    // ...and at 5-grams, where the distinct-key space balloons (every
    // 5-gram is near-unique in the salted corpus): the direct plan's
    // exchange grows with the key space, the sketch plan's stays <= 2k
    // rows/partition — the ratio here IS the 100 TB argument.
    timed("heavy_hitters_exact_5gram") {
      val g = docs
        .select(TextOps.tokens(col("text")).as("tk"))
        .where(size(col("tk")) >= 5)
        .select(explode(TextOps.shingleArr(5)).as("gram"))
      val total = g.count()
      force(g.groupBy(col("gram")).agg(count(lit(1)).as("n"))
        .where(col("n") * 5000L >= total))
    }
    timed("heavy_hitters_sketch_5gram") {
      force(HeavyHitters.frequentGrams(docs, "text", gramLen = 5))
    }
    // the q135 composed curation chain at 1M docs: clean → lang-ID →
    // quality → gate → exact dedup on cleaned text → split. Per-row
    // codegen end to end; the only exchanges are the dedup hash
    // aggregate and the rep join-back.
    timed("curation_e2e") {
      val cleaned = TextOps.cleanText(docs, "doc_id", "text")
      val lang = TextOps.langId(cleaned, "doc_id", "text_clean")
        .select(col("doc_id"), col("pred_lang"))
      val qual = TextOps.qualityScore(
          cleaned.withColumn("n_chars", length(col("text_clean")).cast("long")),
          "doc_id", "text_clean", "n_chars")
        .select(col("doc_id"), col("score"))
      val f = cleaned.select(col("doc_id"), col("text_clean"))
        .join(lang, Seq("doc_id")).join(qual, Seq("doc_id"))
        .where(col("pred_lang") =!= "und" && col("score") >= 150)
      val kept = Dedup.exactDedup(f, "doc_id", "text_clean")
      force(TextOps.splitAssign(
        kept.join(f.select(col("doc_id"), col("pred_lang"), col("score")), Seq("doc_id")),
        "doc_id"))
    }.foreach(n => println(s"[stress]   curated docs kept: $n"))
    // The md5 ORACLE TAX, quantified: the hash-dense stages re-timed
    // under the production xxhash64 family (graft.hash.family) — same
    // plans, same shuffles, only the per-shingle hash changes. The delta
    // is what a deployment that needs no external oracle saves.
    System.setProperty(TextOps.HashFamilyProp, "xxhash64")
    try {
      timed("minhash_signatures_xx") {
        force(TextOps.minhashSignatures(
          TextOps.shingles(docs, "doc_id", "text"), "doc_id"))
      }
      timed("lsh_near_dup_pairs_xx") {
        force(Dedup.nearDupPairs(docs, "doc_id", "text"))
      }
      timed("winnowing_fingerprints_xx") {
        force(TextOps.winnowFromText(docs, "doc_id", "text"))
      }
    } finally System.clearProperty(TextOps.HashFamilyProp)
    // sub-document exact-dedup signal (q105): the corpus-wide window
    // count exchange at 1M docs — hash rows only, never the text
    timed("dup_window_stats") {
      force(TextOps.dupWindowStats(docs, "doc_id", "text"))
    }
    // ...and the actionable scrub (q110): same counts plus the doc-keyed
    // text rebuild — the one exchange here that must carry text
    timed("dup_window_scrub") {
      force(TextOps.dupWindowScrub(docs, "doc_id", "text"))
    }
    // LM-filter stand-in (q111): corpus count aggregate + token-keyed
    // join-back at 1M docs
    timed("surprisal_score") {
      force(TextOps.surprisalScore(docs, "doc_id", "text"))
    }
    // bigram-LM perplexity bands (q136): the conditional upgrade of the
    // surprisal stage — the salted corpus has ~one distinct bigram per
    // token instance, so this pins the worst-case model-exchange volume
    timed("bigram_lm") {
      force(TextOps.bigramLmScore(docs, "doc_id", "text"))
    }
    // ...and the hash-keyed 100 TB path (q141): exchanges move
    // (long, long) keys instead of string pairs — md5 first (the oracle
    // family), then the production xxhash64 family (the real cost)
    timed("bigram_lm_hashed") {
      force(TextOps.bigramLmScoreHashed(docs, "doc_id", "text"))
    }
    System.setProperty(TextOps.HashFamilyProp, "xxhash64")
    try timed("bigram_lm_hashed_xx") {
      force(TextOps.bigramLmScoreHashed(docs, "doc_id", "text"))
    } finally System.clearProperty(TextOps.HashFamilyProp)
    // DSIR importance selection (q143): q111's plan shape at 1M docs —
    // the salted corpus makes the model exchange worst-case (~one
    // distinct token per instance); target = ~1% of docs, k=1000
    timed("dsir_select") {
      force(TextOps.dsirSelect(
        docs.withColumn("is_t", col("doc_id") % 97 === 0L),
        "doc_id", "text", "is_t", k = 1000))
    }
    // ...and the hashed-feature variant (q150): the model is BOUNDED at
    // 8192 bucket rows where dsir_select's string model carries the full
    // salted vocabulary — the delta is what the bounded model buys
    timed("dsir_hashed") {
      force(TextOps.dsirSelectHashed(
        docs.withColumn("is_t", col("doc_id") % 97 === 0L),
        "doc_id", "text", "is_t", k = 1000))
    }
    System.setProperty(TextOps.HashFamilyProp, "xxhash64")
    try timed("dsir_hashed_xx") {
      force(TextOps.dsirSelectHashed(
        docs.withColumn("is_t", col("doc_id") % 97 === 0L),
        "doc_id", "text", "is_t", k = 1000))
    } finally System.clearProperty(TextOps.HashFamilyProp)
    // epoch shard shuffle (q138): the one shard-keyed exchange +
    // in-shard sort at 1M docs (64 shards ≈ 16k docs/shard sort)
    timed("shard_shuffle") {
      force(TextOps.shardShuffle(docs, "doc_id", numShards = 64))
    }
    // one-scan profile (q137): Expand-multiplied exact distincts over
    // (id, text) — the ANALYZE cost at 1M docs
    timed("table_profile") {
      force(graft.functions.Profile.tableProfile(docs, Seq("doc_id", "text")))
    }
    // tokenizer-encode (q112): ranked-vocab broadcast + ordered per-doc
    // id-sequence rebuild at 1M docs
    timed("token_ids") {
      force(TextOps.tokenIds(docs, "doc_id", "text"))
    }
    // vocab coverage (q106): the token-count exchange + broadcast-vocab
    // join-back at 1M docs
    timed("oov_stats") {
      force(TextOps.oovStats(docs, "doc_id", "text", vocabSize = 1000))
    }
    // per-row privacy/split passes (q101/q102): pure map stages — the
    // numbers here pin that they stay IO-bound at 1M docs
    timed("pii_scrub") {
      force(TextOps.piiScrub(docs, "doc_id", "text"))
    }
    timed("split_assign") {
      force(TextOps.splitAssign(docs, "doc_id"))
    }
    // domain balancing (q104): 1000 synthetic domains of ~1000 docs —
    // the per-domain window at real group sizes
    timed("source_cap") {
      force(TextOps.capPerGroup(
        docs.withColumn("source", concat(lit("src"), col("doc_id") % 1000)),
        "doc_id", "source", cap = 100))
    }

    // text normalization scrub (q116): NFC + control strip + squash —
    // a pure per-row codegen chain, the cheapest possible shape
    timed("clean_text") {
      force(TextOps.cleanText(docs, "doc_id", "text"))
    }
    // html extraction (q147): the raw-ingest front door — per-row
    // regexp chain over full synthetic pages at 1M docs
    timed("html_extract") {
      val pages = docs.select(col("doc_id"), concat(
        lit("<html><head><title>D</title><style>p{x}</style>" +
          "<script>var x = 1 < 2 && \"</div>\";</script></head><body><p>"),
        col("text"),
        lit(" &amp;lt; &quot;q&quot;</p><div>t &amp; &lt;e&gt;</div></body></html>"))
        .as("html"))
      force(TextOps.htmlExtract(pages, "doc_id", "html"))
    }
    // paragraph boilerplate scrub (q148): 8-token lines + a planted
    // newsletter header/footer at 1M docs — the count exchange moves
    // line hashes, the rebuild is the one text exchange
    timed("paragraph_scrub") {
      val lined = docs.withColumn("tk", split(col("text"), " "))
        .select(col("doc_id"), concat(
          lit("subscribe to newsletter variant "),
          (col("doc_id") % 3).cast("string"), lit("\n"),
          expr("array_join(transform(sequence(0, " +
            "greatest(1, cast(ceil(size(tk)/8.0) as int)) - 1), " +
            "i -> array_join(slice(tk, i*8+1, 8), ' ')), '\n')"))
          .as("text2"))
      force(TextOps.paragraphScrub(lined, "doc_id", "text2"))
    }
    // exact substring-dup spans (q162): ~130M rolling window hashes
    // (lead-based fold over token hashes), one compact wh-keyed df
    // aggregate, islands merge over the duplicated subset — the group-
    // of-4 corpus guarantees long cross-doc token runs
    timed("substring_dup_spans") {
      force(TextOps.duplicatedSpans(docs, "doc_id", "text"))
    }
    // the removal half (q163): same model + the per-doc rebuild — the
    // delta over substring_dup_spans is the cover explode + the one
    // irreducible text-carrying exchange
    timed("substring_dup_scrub") {
      force(TextOps.scrubDuplicatedSpans(docs, "doc_id", "text"))
    }
    // the STEADY-STATE half (q168/q169): build the window-hash span
    // index over the standing split once, then time what an ingest
    // batch (1/16 of the corpus) actually pays — batch-only window
    // hashing + the bucket-pruned (wh, wmin, df) model probe. The
    // per-batch stages must come in far under the full-corpus model
    // recompute above (the q87-vs-q86 argument at window granularity).
    val spanIdxDir = java.nio.file.Files.createTempDirectory("stress-spanidx").toString
    val spanBatch = docs.where(pmod(col("doc_id"), lit(16)) === 0)
    timed("span_index_build") {
      TextOps.writeSpanIndex(
        docs.where(pmod(col("doc_id"), lit(16)) =!= 0), "doc_id", "text", spanIdxDir)
    }
    // scoped reruns may skip the build stage — the standing index is a
    // precondition for the probe stages, not a timing dependency
    if (Seq("span_dup_indexed_batch", "span_scrub_indexed_batch")
          .exists(n => only.isEmpty || only(n))
        && !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$spanIdxDir/whs")))
      TextOps.writeSpanIndex(
        docs.where(pmod(col("doc_id"), lit(16)) =!= 0), "doc_id", "text", spanIdxDir)
    timed("span_dup_indexed_batch") {
      force(TextOps.duplicatedSpansAgainstIndex(
        spanBatch, "doc_id", "text", spanIdxDir))
    }
    timed("span_scrub_indexed_batch") {
      force(TextOps.scrubSpansAgainstIndex(
        spanBatch, "doc_id", "text", spanIdxDir))
    }
    // BPE tokenizer (q123): train on the capped word-frequency model
    // (the salted corpus has ~250k distinct words — the cap IS the
    // scale guard), then the per-row merge-application encode map
    timed("bpe_encode") {
      force(graft.functions.Bpe.trainEncode(docs, "doc_id", "text"))
    }
    // BPE at production merge counts (round-12): rank-priority encode is
    // O(len log len) per token INDEPENDENT of merge-table size, so the
    // 4096-merge encode must clock ~the 8-merge encode (the pre-r12
    // sequential-application encode was O(numMerges) passes per token —
    // ~500× at 4096). Training sustains 4096 merges on a wordCap=8192
    // model; incremental pair counts keep the driver loop per-step cost
    // at O(words containing the merged pair), not O(wordCap).
    def willRun(name: String) = only.isEmpty || only(name)
    val merges8 =
      if (willRun("bpe_encode_8merges"))
        graft.functions.Bpe.trainMerges(docs, "doc_id", "text")
      else Seq.empty
    val merges4k = timed("bpe_train_4096") {
      graft.functions.Bpe.trainMerges(docs, "doc_id", "text",
        numMerges = 4096, wordCap = 8192)
    }.getOrElse(
      if (willRun("bpe_encode_4096merges"))
        graft.functions.Bpe.trainMerges(docs, "doc_id", "text",
          numMerges = 4096, wordCap = 8192)
      else Seq.empty)
    timed("bpe_encode_8merges") {
      force(graft.functions.Bpe.encode(docs, "doc_id", "text", merges8))
    }
    timed("bpe_encode_4096merges") {
      force(graft.functions.Bpe.encode(docs, "doc_id", "text", merges4k))
    }
    // raw-corpus ingest (q125/q126) at 1M docs: fixtures are built
    // DISTRIBUTED (one JSONL part per task; one gzip-member-per-record
    // WARC archive per task — the q-def fixture's driver-side builder is
    // an sf-scale convenience, not this), then each reader is timed end
    // to end over ~shuffle-width archives
    val rawDir = Files.createTempDirectory("graft-stress-raw").toString
    if (willRun("jsonl_ingest") || willRun("warc_ingest")) {
      docs.select(expr("to_json(struct(doc_id, text))").as("value"))
        .write.mode("overwrite").text(s"$rawDir/jsonl")
      Files.createDirectories(Paths.get(s"$rawDir/warc"))
      docs.select(col("doc_id"), col("text"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val fos = new java.io.FileOutputStream(s"$rawDir/warc/part-$pid.warc.gz")
            try it.foreach { r =>
              val body = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
              val rec = new java.io.ByteArrayOutputStream()
              rec.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
                s"WARC-Record-ID: <urn:graft:${r.getLong(0)}>\r\n" +
                s"WARC-Target-URI: http://graft.test/doc/${r.getLong(0)}\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n")
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              rec.write(body)
              rec.write("\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
              val gz = new java.util.zip.GZIPOutputStream(fos)
              gz.write(rec.toByteArray)
              gz.finish()
            } finally fos.close()
          }
        }
    }
    timed("jsonl_ingest") {
      force(graft.sources.RawCorpus.readJsonlDocs(spark, s"$rawDir/jsonl"))
    }
    timed("warc_ingest") {
      force(graft.sources.RawCorpus.warcDocs(
        graft.sources.RawCorpus.readWarc(spark, s"$rawDir/warc")))
    }

    // image near-dup (q144): 200k synthetic PNGs through the REAL
    // ImageIO encode+decode path — 40k groups of 5 sharing a base image
    // (each member perturbs one unsampled pixel, so groups collapse to
    // identical hashes: the worst-case candidate fan-in for the band
    // join is the group size, never the corpus)
    timed("image_near_dup_200k") {
      import spark.implicits._
      val blobs = spark.range(200000L).select(col("id"))
        .as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map { id =>
            val gid = id / 5
            val w = (gid % 13 + 16).toInt
            val h = (gid % 11 + 16).toInt
            val nx = (id % w).toInt
            val ny = (id * 3 % h).toInt
            (id, graft.functions.Multimodal.encodeGrayPng(w, h, (x, y) => {
              val base =
                {
                  val b = ((gid + 1L) * 2654435761L +
                    (x * 29L + y * 13L + 7L) * 40503L) / 8192L % 65536L
                  (b * b / 64L % 256L).toInt
                }
              if (x == nx && y == ny) ((base + id) % 256).toInt else base
            }))
          }
        }.toDF("doc_id", "blob")
      force(graft.functions.Multimodal.imageNearDupPairs(
        blobs, "doc_id", "blob"))
    }

    // video near-dup (q149): 100k synthetic AVI clips (8-12 DIB frames)
    // through the real container parse — only the 8 sampled frames of
    // each clip decode, one at a time
    timed("video_near_dup_100k") {
      import spark.implicits._
      val blobs = spark.range(100000L).select(col("id"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val gid = id / 5
            val w = (18 + gid % 9).toInt
            val h = (12 + gid % 7).toInt
            val nf = (8 + gid % 5).toInt
            val pf = (id % nf).toInt
            val px = (id % w).toInt
            val py = (id * 3 % h).toInt
            val frames = (0 until nf).map { f =>
              Array.tabulate(w * h) { k =>
                val (x, y) = (k % w, k / w)
                val b = ((gid + 1L) * 2654435761L +
                  (f * 1009L + x * 29L + y * 13L + 7L) * 40503L) / 8192L % 65536L
                val base = (b * b / 64L % 256L).toInt
                (if (f == pf && x == px && y == py) ((base + id) % 256).toInt
                 else base).toByte
              }
            }
            (id, graft.functions.Multimodal.encodeAviDib(w, h, frames))
          }
        }.toDF("doc_id", "blob")
      force(graft.functions.Multimodal.videoNearDupPairs(
        blobs, "doc_id", "blob"))
    }

    // persistent fingerprint index (q146): the steady-state split —
    // index build is the once-amortized standing cost; the probe is what
    // each ingest batch (1% = 2k images) pays: decode+hash the batch,
    // partition-pruned band scan, Hamming verify vs stored arrays
    def stressImages(pred: Long => Boolean) = {
      import spark.implicits._
      spark.range(200000L).select(col("id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.filter(pred).map { id =>
            val gid = id / 5
            val w = (gid % 13 + 16).toInt
            val h = (gid % 11 + 16).toInt
            val nx = (id % w).toInt
            val ny = (id * 3 % h).toInt
            (id, graft.functions.Multimodal.encodeGrayPng(w, h, (x, y) => {
              val base = {
                val b = ((gid + 1L) * 2654435761L +
                  (x * 29L + y * 13L + 7L) * 40503L) / 8192L % 65536L
                (b * b / 64L % 256L).toInt
              }
              if (x == nx && y == ny) ((base + id) % 256).toInt else base
            }))
          }
        }.toDF("doc_id", "blob")
    }
    val fpDir = Files.createTempDirectory("graft-stress-fpidx").toString
    timed("fp_index_build_200k") {
      graft.functions.Multimodal.writeImageFingerprintIndex(
        stressImages(_ % 101 != 0), "doc_id", "blob", fpDir)
    }
    timed("image_near_dup_indexed_1pct") {
      force(graft.functions.Multimodal.imageNearDupAgainstIndex(
        stressImages(_ % 101 == 0), "doc_id", "blob", fpDir))
    }

    // streaming media-ingest gate (q160): the FULL per-micro-batch cost
    // at scale — sniff + real decode + fingerprint + bucket-pruned probe
    // + intra-batch banded pairs + idempotent verdict write + index
    // append — driven directly with a 20k-blob batch (10%) against a
    // 180k-clip standing index (build amortized once, timed separately)
    val smiDir = Files.createTempDirectory("graft-stress-smi").toString
    timed("media_ingest_index_build_180k") {
      graft.functions.Multimodal.writeImageFingerprintIndex(
        stressImages(_ % 10 != 0), "doc_id", "blob", s"$smiDir/idx/image")
    }
    timed("media_ingest_gate_20k") {
      val batch = stressImages(_ % 10 == 0)
        .select(concat(col("doc_id").cast("string"), lit(".png")).as("path"),
          col("blob").as("content"))
      graft.streaming.StreamingMediaIngest.gate(
        batch, 0L, s"$smiDir/idx", s"$smiDir/verdicts", s"$smiDir/quar", 3, 4)
    }

    // audio near-dup (q145): 200k synthetic WAV clips (1152 samples)
    // through the REAL AudioSystem decode — same shared banded-Hamming
    // engine as the image stage, so the delta vs image_near_dup_200k is
    // pure codec cost
    timed("audio_near_dup_200k") {
      import spark.implicits._
      val blobs = spark.range(200000L).select(col("id"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val gid = id / 5
            val n = 1152
            val kp = (id % n).toInt
            val samples = new Array[Short](n)
            var k = 0
            while (k < n) {
              val b = ((gid + 1L) * 2654435761L +
                ((k / 16) + 3L) * 40503L) / 8192L % 65536L
              val v = b * b / 64L % 1000L - 500L
              val p = if (k == kp) id % 300 + 1 else 0L
              samples(k) = (v + p).toShort
              k += 1
            }
            (id, graft.functions.Multimodal.encodeWavPcm16(8000, samples))
          }
        }.toDF("doc_id", "blob")
      force(graft.functions.Multimodal.audioNearDupPairs(
        blobs, "doc_id", "blob"))
    }

    // lexical retrieval (q114): 8 queries over the salted corpus — the
    // term list must hit salted tokens, so derive queries from group-0
    // vocabulary ('tk0' forms survive the copy transform for copy < 4)
    timed("tfidf_topk_8q") {
      force(graft.functions.Retrieval.tfidfTopK(docs, "doc_id", "text",
        (0L until 8L).map(q => q -> s"spark0 join0 merge0 value0 table$q"), k = 10))
    }
    // radix quantiles (q115): 4 exact quantiles of a 64-bit derived
    // value over the full corpus — 4 digit passes, no sort
    timed("radix_quantiles") {
      force(graft.functions.Quantiles.radixQuantiles(
        docs.select(xxhash64(col("text")).as("v")), "v",
        Seq(25, 50, 90, 99), 100))
    }

    // embeddings: embMult x 500 vectors; flip pattern varies with BOTH a
    // coarse (mod 97) and fine (mod 5) copy residue so distinct copies
    // are distinct vectors (no artificial identical-vector cliques)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .crossJoin(spark.range(embMult).select(col("id").as("copy")))
      .select(
        (col("vec_id") * embMult + col("copy")).as("vec_id"),
        expr("""transform(embedding, (v, i) ->
               |  CASE WHEN (i * (1 + copy % 97) + copy) % 5 = 0 THEN -v ELSE v END)""".stripMargin)
          .cast("array<float>").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // force the vector fixture only when some ANN/semantic stage runs —
    // emb is lazy, so text-only scoped reruns skip the ~min-long build
    val nEmb: Long =
      if (only.isEmpty || Seq("ann_lsh_topk_100q", "ann_lsh_multiprobe_100q",
          "embedding_near_dups", "ann_ivf_det_100q", "semantic_dedup_scaled",
          "ivf_index_build", "ann_ivf_indexed_100q", "ivfpq_index_build",
          "ann_ivfpq_indexed_100q", "ann_recall_suite",
          "semantic_decontam_100ev").exists(only)) {
        val c = emb.count()
        println(s"[stress] embeddings: $c vectors")
        c
      } else 0L
    // semantic decontamination (q152): ~100 broadcast eval vectors swept
    // against 400k corpus vectors — 40M fused dots, one max exchange
    timed("semantic_decontam_100ev") {
      force(Similarity.semanticDecontaminate(
        emb, "vec_id", "embedding", col("vec_id") % 4001 === 0, tau = 0L))
    }
    timed("ann_lsh_topk_100q") {
      force(Similarity.lshTopK(emb, "vec_id", "embedding",
        col("vec_id") < 100, 5, 64, 4))
    }
    timed("ann_lsh_multiprobe_100q") {
      force(Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding",
        col("vec_id") < 100, 5, 64, 4))
    }
    timed("embedding_near_dups") {
      force(Similarity.embeddingNearDups(emb, "vec_id", "embedding", 64,
        tauNum = 3, tauDen = 10))
    }
    timed("ann_ivf_det_100q") {
      force(Similarity.ivfTopKDet(emb, "vec_id", "embedding",
        col("vec_id") < 100, 5))
    }
    // SemDeDup at scale: auto nlist (adaptiveNlist: cells track N at
    // ~500 vectors each) keeps the cell-mate pair join near-linear with
    // NO caller tuning; the KMeans coarse quantizer fits on the capped
    // hash-stride sample, assignment is model.transform (no N×nlist
    // fan-out)
    timed("semantic_dedup_scaled") {
      force(Similarity.semanticDedupScaled(emb, "vec_id", "embedding", 64,
        tauNum = 3, tauDen = 10))
    }
    // ...and the same queries against a MATERIALIZED IVF index (q89):
    // the build is the once-amortized standing cost; the probe is what a
    // steady-state ANN service pays per query batch (no training, no
    // corpus re-quantization — only the probed cells' directories read)
    val ivfDir = Files.createTempDirectory("graft-stress-ivfidx").toString
    timed("ivf_index_build") {
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", ivfDir)
    }
    // standing-index preconditions (subset reruns may skip the build
    // stages — the index is then a precondition, not a timing dependency)
    if (willRun("ann_ivf_indexed_100q") &&
        !Files.exists(Paths.get(s"$ivfDir/centroids")))
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", ivfDir)
    timed("ann_ivf_indexed_100q") {
      force(Similarity.ivfTopKIndexed(
        emb.where(col("vec_id") < 100), "vec_id", "embedding", ivfDir, 5))
    }
    // IVF-PQ (q124): the same standing-index economics with the corpus
    // compressed to m=16 6-bit codes/vector (12 logical bytes, ~43× vs
    // the 64×8B quantized rows) — the probe's candidate pass reads codes
    // only; the ADC shortlist is exact-reranked from full-precision cells
    val ivfPqDir = Files.createTempDirectory("graft-stress-ivfpq").toString
    timed("ivfpq_index_build") {
      Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", ivfPqDir)
    }
    if (willRun("ann_ivfpq_indexed_100q") &&
        !Files.exists(Paths.get(s"$ivfPqDir/pq/books")))
      Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", ivfPqDir)
    timed("ann_ivfpq_indexed_100q") {
      force(Similarity.ivfPqTopKIndexed(
        emb.where(col("vec_id") < 100), "vec_id", "embedding", ivfPqDir, 5))
    }
    // The measured cost/recall TABLE for every approximate ANN path:
    // recall@10 vs exact brute force over the same 100 queries, at the
    // shipped knob settings plus the nprobe ladder. `recall_*` entries
    // are PERCENTAGES, not seconds (they ride the stages map so subset
    // reruns merge them like any timing); the paired timings above say
    // what each setting costs, these say what it buys.
    timed("ann_recall_suite") {
      // Recall over CROSS-BASE neighbors: this corpus is near-dup
      // saturated by construction (every vector has embMult−1 close
      // copies of its own base), so plain recall@10 is trivially 100 —
      // a query's whole top-10 is its own copy clique, which every
      // bucket/cell keeps together. The informative regime is the
      // DISCRIMINATIVE one: each method returns its top-`deep`, same-base
      // rows are dropped, and recall@10 is measured on the best 10
      // OTHER-base neighbors — the part of the ranking a curation
      // pipeline actually uses the ANN for. Queries spread across bases
      // (~100, one per ~40th base); ties broken by vec_id on both sides.
      val qPred = pmod(col("vec_id"), lit(3989)) === 0
      val deep = 2 * embMult // past the ≤ embMult same-base rows, depth to spare
      def crossTop10(deepTopK: org.apache.spark.sql.DataFrame) =
        graft.functions.TopK.perKey(
          deepTopK.where(expr(s"query_id div $embMult != vec_id div $embMult"))
            .select(col("query_id"), col("vec_id"), col("dot")),
          Seq("query_id"), Seq(("dot", true), ("vec_id", false)), 10)
      val brute = crossTop10(Similarity.dotTopK(emb, "vec_id", "embedding", qPred, deep))
        .select(col("query_id"), col("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val denom = brute.count().toDouble
      def recallAt10(deepTopK: org.apache.spark.sql.DataFrame): Double = {
        val hits = crossTop10(deepTopK).select(col("query_id"), col("vec_id"))
          .join(brute, Seq("query_id", "vec_id")).count()
        math.rint(10000.0 * hits / denom) / 100
      }
      // subset reruns may skip ivf_index_build — make the standing index
      // a precondition, not a timing dependency
      if (!Files.exists(Paths.get(s"$ivfDir/centroids")))
        Similarity.writeIvfIndex(emb, "vec_id", "embedding", ivfDir)
      Seq(4, 8).foreach { p =>
        stages(s"recall_lsh_p$p") = recallAt10(Similarity.lshTopK(
          emb, "vec_id", "embedding", qPred, deep, 64, p))
        stages(s"recall_lsh_multiprobe_p$p") = recallAt10(Similarity.lshTopKMultiProbe(
          emb, "vec_id", "embedding", qPred, deep, 64, p))
      }
      Seq(1, 2, 4).foreach { np =>
        stages(s"recall_ivf_nprobe$np") = recallAt10(Similarity.ivfTopKIndexed(
          emb.where(qPred), "vec_id", "embedding", ivfDir, deep, nprobe = np))
      }
      // IVF-PQ rows: recall@10 vs ADC shortlist depth, plus the
      // bytes/vector columns of the table (info_* rows ride the stages
      // map but are BYTES, not seconds — excluded from the total like
      // recall_*). shortlist = deep reranks exactly the ADC top-`deep`
      // (pure ADC ranking quality); 4×deep buys back near-exactness.
      if (!Files.exists(Paths.get(s"$ivfPqDir/pq/books")))
        Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", ivfPqDir)
      Seq(deep, 8 * deep, 32 * deep).foreach { sl =>
        stages(s"recall_ivfpq_short${sl / deep}xdeep") = recallAt10(Similarity.ivfPqTopKIndexed(
          emb.where(qPred), "vec_id", "embedding", ivfPqDir, deep,
          nprobe = 4, shortlist = sl))
      }
      stages("info_bytes_per_vec_ivfpq_codes") = 12.0 // m=16 × 6-bit codes
      stages("info_bytes_per_vec_ivf_raw") = 512.0 // dim=64 × int64
      brute.unpersist()
    }
    // subset runs merge into the standing stress.json (prior order kept,
    // rerun stages overwritten, new stages appended)
    val prior: Seq[(String, Double)] =
      if (only.nonEmpty && Files.exists(Paths.get("stress.json")))
        """"([a-z0-9_]+)":([0-9.]+)""".r
          .findAllMatchIn(
            Files.readString(Paths.get("stress.json"))
              .dropWhile(_ != '{').drop(1).dropWhile(_ != '{'))
          .map(m => m.group(1) -> m.group(2).toDouble).toSeq
      else Seq.empty
    val merged = scala.collection.mutable.LinkedHashMap(prior: _*) ++ stages
    // provenance must match the stage data: a scoped rerun that skipped
    // the vector (or doc) fixture carries the PRIOR run's count forward
    // alongside the prior stages it keeps — never a 0 that contradicts
    // the ann_*/recall_* rows still in the file
    def priorMeta(key: String): Option[Long] =
      if (only.nonEmpty && Files.exists(Paths.get("stress.json")))
        (s""""$key":(\\d+)""").r
          .findFirstMatchIn(Files.readString(Paths.get("stress.json")))
          .map(_.group(1).toLong)
      else None
    val docsOut = if (n > 0) n else priorMeta("docs").getOrElse(n)
    val vecsOut = if (nEmb > 0) nEmb else priorMeta("vectors").getOrElse(nEmb)
    // recall_* (percent) and info_* (bytes) entries ride the stages map
    // but are not time — excluded from the total
    val total = math.rint(merged.collect {
      case (k, v) if !k.startsWith("recall_") && !k.startsWith("info_") => v
    }.sum * 100) / 100
    val json =
      s"""{"metric":"pipeline_stress","docs":$docsOut,"vectors":$vecsOut,"unit":"sec","total":$total,""" +
        merged.map { case (k, v) => s""""$k":$v""" }.mkString("\"stages\":{", ",", "}}")
    Files.writeString(Paths.get("stress.json"), json + "\n")
    println(json)
    println(f"[stress] done: $docsOut docs / $vecsOut vectors held all pipeline shapes")
    spark.stop()
  }
}
