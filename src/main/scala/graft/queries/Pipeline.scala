package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, Dedup, Graph, HeavyHitters, Multimodal, Similarity, TextOps, TopK}
import graft.sources.RawCorpus

/** Oracle-checked queries for the training-data pipeline operators
  * (dedup, similarity search, text analysis, multimodal columns) over the
  * driver's `documents` and `embeddings` tables. All scoring arithmetic
  * is integer-exact (portable md5-derived hashes, quantized vectors) so
  * DuckDB reproduces every value bit-for-bit.
  */
object Pipeline {
  import QueryDef.tbl

  private val DIM = 64 // embeddings.embedding length

  /** q114's canned query set (terms from the synthetic docs vocabulary;
    * q1 repeats "fast" to exercise query-term weighting).
    */
  private val RetrievalQueries: Seq[(Long, String)] = Seq(
    0L -> "spark join merge",
    1L -> "vector scan fast fast",
    2L -> "customer order window")

  /** q116's injected mess: decomposed e+COMBINING ACUTE (NFC composes
    * it), a BEL control char (stripped), tab + double-space runs
    * (squashed), trailing space (trimmed).
    */
  private val MessySuffix = "  Cafe\u0301 \u0007 ok\tend "

  /** Materialized LSH signature index over the standing corpus (doc_id %
    * 7 != 0 — the complement of q86/q87's ingest batch), built once per
    * testdata dir and shared across verify/bench passes: the standing
    * state of a continuously-fed pipeline, so q87 times the per-batch
    * probe, not the index build.
    */
  private val sigIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sigIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    sigIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-sigindex").toString
      Dedup.writeSignatureIndex(
        tbl(s, dir, "documents").where(col("doc_id") % 7 =!= 0),
        "doc_id", "text", p)
      p
    })

  /** The q144/q146 image fixture: one synthetic PNG per document id —
    * groups of 5 docs share a middle-square pseudo-random base image,
    * each doc perturbs one pixel — so every hash/band/Hamming step is
    * relationally replayable by the oracle while Spark runs the REAL
    * ImageIO codec on real PNG bytes.
    */
  private def imageBlobs(
      s: org.apache.spark.sql.SparkSession, dir: String,
      pred: org.apache.spark.sql.Column = lit(true)): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // id predicate applied BEFORE the opaque encode mapPartitions — a
    // caller's .where() above it cannot push down, so filtering a split
    // after generation would encode every blob and drop most of them
    graft.functions.Par.fanOut(
        tbl(s, dir, "documents").select(col("doc_id")).where(pred))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val gid = id / 5
          val w = (gid % 13 + 16).toInt
          val h = (gid % 11 + 16).toInt
          val nx = (id % w).toInt
          val ny = (id * 3 % h).toInt
          (id, Multimodal.encodeGrayPng(w, h, (x, y) => {
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

  /** Materialized image-fingerprint index over the standing corpus
    * (doc_id % 7 != 0, the [[sigIndex]] split), built once per testdata
    * dir: q146 times the per-batch decode+hash+pruned-probe, not the
    * index build.
    */
  private val fpIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def fpIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    fpIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-fpindex").toString
      Multimodal.writeImageFingerprintIndex(
        imageBlobs(s, dir, col("doc_id") % 7 =!= 0), "doc_id", "blob", p)
      p
    })

  /** The q145/q156 audio fixture: one synthetic WAV clip per document id
    * — groups of 5 docs share a middle-square pseudo-random 72-slice
    * wave, each doc perturbs ONE sample — so the oracle replays
    * decode + slicing + energy + banding relationally while Spark
    * decodes real WAV bytes.
    */
  private def audioBlobs(
      s: org.apache.spark.sql.SparkSession, dir: String,
      pred: org.apache.spark.sql.Column = lit(true)): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // pred below the encode — the imageBlobs rationale
    graft.functions.Par.fanOut(
        tbl(s, dir, "documents").select(col("doc_id")).where(pred))
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
          (id, Multimodal.encodeWavPcm16(8000, samples))
        }
      }.toDF("doc_id", "blob")
  }

  /** The q149/q157 video fixture: one synthetic AVI clip per document id
    * — groups of 5 docs share a middle-square pseudo-random clip, each
    * doc perturbs ONE pixel of ONE frame — so the oracle replays
    * decode + frame/probe sampling + banding relationally while Spark
    * parses real AVI containers.
    */
  private def videoBlobs(
      s: org.apache.spark.sql.SparkSession, dir: String,
      pred: org.apache.spark.sql.Column = lit(true)): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // pred below the encode — the imageBlobs rationale
    graft.functions.Par.fanOut(
        tbl(s, dir, "documents").select(col("doc_id")).where(pred))
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
              val v = if (f == pf && x == px && y == py)
                ((base + id) % 256).toInt else base
              v.toByte
            }
          }
          (id, Multimodal.encodeAviDib(w, h, frames))
        }
      }.toDF("doc_id", "blob")
  }

  /** Materialized VIDEO fingerprint index (the [[fpIndex]] pattern over
    * the q149 fixture corpus): q157 times the per-batch probe — the
    * fourth modality's steady-state path.
    */
  private val vfpIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def vfpIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    vfpIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-vfpindex").toString
      Multimodal.writeVideoFingerprintIndex(
        videoBlobs(s, dir, col("doc_id") % 7 =!= 0), "doc_id", "blob", p)
      p
    })

  /** Materialized AUDIO fingerprint index (the [[fpIndex]] pattern over
    * the q145 fixture corpus): q156 times the per-batch probe.
    */
  private val afpIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def afpIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    afpIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-afpindex").toString
      Multimodal.writeAudioFingerprintIndex(
        audioBlobs(s, dir, col("doc_id") % 7 =!= 0), "doc_id", "blob", p)
      p
    })

  /** The q162 span universe: documents plus whole-doc re-entries at
    * +10000 for doc_id % 4 == 0 — shared by q162/q163 (full-corpus) and
    * q168/q169 (indexed steady state, split on doc_id % 7). */
  private def spanUniverse(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val base = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    base.unionByName(
      base.where(col("doc_id") % 4 === 0)
        .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text")))
  }

  /** [[spanUniverse]] as a DuckDB table expression. */
  private val SpanUniverseSql: String =
    "(SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 10000, text FROM documents WHERE doc_id % 4 = 0) u"

  /** Materialized window-hash SPAN index over the standing split of the
    * span universe (doc_id % 7 != 0, the [[sigIndex]] convention):
    * q168/q169 time the per-batch probe, not the index build. */
  private val spanIdxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def spanIdx(s: org.apache.spark.sql.SparkSession, dir: String): String =
    spanIdxCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-spanidx").toString
      TextOps.writeSpanIndex(
        spanUniverse(s, dir).where(col("doc_id") % 7 =!= 0), "doc_id", "text", p)
      p
    })

  /** Materialized IVF index over the embeddings table (same standing-
    * state rationale as [[sigIndex]]: q89 times the probe, not the
    * build).
    */
  private val ivfIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    ivfIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-ivfindex").toString
      Similarity.writeIvfIndex(tbl(s, dir, "embeddings"), "vec_id", "embedding", p)
      p
    })

  /** Materialized IVF-PQ index (the [[ivfIndex]] layout plus subspace
    * codebooks + per-vector codes): q124 times the ADC-shortlist +
    * exact-rerank probe against standing compressed state.
    */
  private val ivfPqIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfPqIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    ivfPqIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-ivfpqindex").toString
      Similarity.writeIvfPqIndex(tbl(s, dir, "embeddings"), "vec_id", "embedding", p)
      p
    })

  /** JSONL dump of the documents table (one to_json line per row) —
    * the raw-corpus fixture q125's ingest reader parses back; built once
    * per testdata dir.
    */
  private val jsonlFixtureCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def jsonlFixture(s: org.apache.spark.sql.SparkSession, dir: String): String =
    jsonlFixtureCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
      tbl(s, dir, "documents")
        .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).as("value"))
        .write.mode("overwrite").text(p)
      p
    })

  /** WARC dump of the documents table — 4 archives, one gzip MEMBER per
    * record (the CommonCrawl layout), response records carrying the doc
    * metadata as X-Graft-* headers. Fixture BUILD collects the sf-scale
    * docs table on the driver (bounded by the fixture, not an ingest
    * path — production reads archives that already exist); built once
    * per testdata dir.
    */
  private val warcFixtureCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def warcFixture(s: org.apache.spark.sql.SparkSession, dir: String): String =
    warcFixtureCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-warc").toString
      val rows = tbl(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .collect()
      rows.groupBy(_.getLong(0) % 4).foreach { case (g, rs) =>
        val fos = new java.io.FileOutputStream(s"$p/part-$g.warc.gz")
        try rs.sortBy(_.getLong(0)).foreach { r =>
          val body = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val rec = new java.io.ByteArrayOutputStream()
          rec.write((s"WARC/1.0\r\n" +
            s"WARC-Type: response\r\n" +
            s"WARC-Record-ID: <urn:graft:${r.getLong(0)}>\r\n" +
            s"WARC-Target-URI: http://graft.test/doc/${r.getLong(0)}\r\n" +
            s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
            s"X-Graft-Lang: ${r.getString(2)}\r\n" +
            s"X-Graft-Source: ${r.getString(3)}\r\n" +
            s"X-Graft-NChars: ${r.getLong(4)}\r\n" +
            s"Content-Type: text/plain\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          rec.write(body)
          rec.write("\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // one gzip member per record: finish() flushes the member but
          // keeps the underlying archive stream open for the next one
          val gz = new java.util.zip.GZIPOutputStream(fos)
          gz.write(rec.toByteArray)
          gz.finish()
        } finally fos.close()
      }
      p
    })

  /** IVF-PQ index built on the STANDING corpus (vec_id % 13 != 0) and
    * grown by [[Similarity.appendIvfPqIndex]] — the compressed-index
    * face of [[ivfGrownIndex]], so q131 proves PQ maintenance lands
    * batch rows (cells AND codes) exactly where the frozen models put
    * them.
    */
  private val ivfPqGrownCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfPqGrownIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    ivfPqGrownCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-ivfpqgrown").toString
      val emb = tbl(s, dir, "embeddings")
      Similarity.writeIvfPqIndex(
        emb.where(col("vec_id") % 13 =!= 0), "vec_id", "embedding", p)
      Similarity.appendIvfPqIndex(
        emb.where(col("vec_id") % 13 === 0), "vec_id", "embedding", p)
      p
    })

  /** IVF index built on the STANDING corpus (vec_id % 13 != 0) and then
    * grown by [[Similarity.appendIvfIndex]] with the remaining batch —
    * the maintenance half of a standing ANN service, so q90 probes an
    * index whose cells mix build-time and appended rows under one frozen
    * centroid model.
    */
  private val ivfGrownCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfGrownIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    ivfGrownCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-ivfgrown").toString
      val emb = tbl(s, dir, "embeddings")
      Similarity.writeIvfIndex(
        emb.where(col("vec_id") % 13 =!= 0), "vec_id", "embedding", p)
      Similarity.appendIvfIndex(
        emb.where(col("vec_id") % 13 === 0), "vec_id", "embedding", p)
      p
    })

  /** Resolved near-dup clusters (LSH candgen → verify → CC fixpoint),
    * built once per testdata dir and shared by q85 (dedup resolve) and
    * q103 (canonical pick) — one pipeline resolves clusters once and
    * feeds every downstream consumer from the same result; re-running
    * the candgen per consumer would double the bench's most expensive
    * stage for no coverage. Materialized via count() so the fixpoint's
    * checkpoints are not re-entered concurrently.
    */
  private val dupCcCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def dupCc(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    dupCcCache.computeIfAbsent(dir, _ => {
      val docs = tbl(s, dir, "documents")
      val pairs = Dedup.nearDupPairs(docs, "doc_id", "text").where(col("is_dup"))
      val cc = Graph.connectedComponents(pairs, "doc_a", "doc_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cc.count()
      cc
    })

  val defs: Map[String, QueryDef] = Map(

    // Exact dedup: hash-groupBy, keep lowest doc_id per text group.
    "q30_exact_dedup" -> QueryDef(
      (s, dir) =>
        Dedup.exactDedup(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(Dedup.exactDedupSql("documents", "doc_id", "text") + " ORDER BY doc_id")),

    // MinHash signatures over 3-word shingles (8 hash functions).
    "q31_minhash_sigs" -> QueryDef(
      (s, dir) =>
        TextOps.minhashSignatures(
          TextOps.shingles(tbl(s, dir, "documents"), "doc_id", "text"), "doc_id")
          .orderBy(col("doc_id")),
      Some {
        s"""WITH shr AS (${TextOps.shinglesSql("documents", "doc_id", "text")}),
           |sh AS (SELECT DISTINCT doc_id, sh FROM shr)
           |SELECT doc_id, ${TextOps.minhashAggsSql()} FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // Banded-LSH near-dup candidates + exact Jaccard verification.
    "q32_near_dup_pairs" -> QueryDef(
      (s, dir) =>
        Dedup.nearDupPairs(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b")),
      Some(Dedup.nearDupPairsSql("documents", "doc_id", "text") +
        " ORDER BY 1, 2")),

    // 16-bit SimHash fingerprints.
    "q33_simhash" -> QueryDef(
      (s, dir) =>
        TextOps.simhash(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.simhashSql("documents", "doc_id", "text") + " ORDER BY doc_id")),

    // Corpus profile per (lang, source).
    "q34_text_stats" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars_total"),
            min(col("n_chars")).as("chars_min"),
            max(col("n_chars")).as("chars_max"),
            sum(size(TextOps.tokens(col("text"))).cast("long")).as("tokens_total"))
          .orderBy(col("lang"), col("source")),
      Some("""SELECT lang, source, count(*) AS n_docs,
             |CAST(sum(n_chars) AS BIGINT) AS chars_total,
             |min(n_chars) AS chars_min, max(n_chars) AS chars_max,
             |CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_total
             |FROM documents GROUP BY lang, source
             |ORDER BY lang, source""".stripMargin.replace("\n", " "))),

    // Stopword-profile language ID.
    "q35_lang_id" -> QueryDef(
      (s, dir) =>
        TextOps.langId(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.langIdSql("documents", "doc_id", "text") + " ORDER BY doc_id")),

    // Integer quality-score heuristic.
    "q36_quality_score" -> QueryDef(
      (s, dir) =>
        TextOps.qualityScore(tbl(s, dir, "documents"), "doc_id", "text", "n_chars")
          .orderBy(col("doc_id")),
      Some {
        val stop = TextOps.langProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
        s"""SELECT doc_id, n_tokens, n_uniq, n_stop, n_chars,
           |n_tokens * 2 + n_uniq * 3 + n_stop * 5 - n_chars // 10 AS score FROM (
           |  SELECT doc_id, n_chars,
           |    CAST(len(tk) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
           |    CAST(len(list_filter(tk, t -> t IN ($stop))) AS BIGINT) AS n_stop
           |  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS tk FROM documents) t) s
           |ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // Whitespace + BPE-ish regex token counts.
    "q37_token_count" -> QueryDef(
      (s, dir) =>
        TextOps.tokenCounts(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Sequence packing (concat-then-chunk, GPT-style): every doc lands at
    // a deterministic (shard, pack_id, pack_offset) under the fixed
    // 512-token budget; shard-parallel cumulative sums, never a global
    // window. The oracle replays the identical hash order and running sum.
    "q95_sequence_pack" -> QueryDef(
      (s, dir) =>
        TextOps.packSequences(tbl(s, dir, "documents"), "doc_id", "text",
          maxLen = 512, numShards = 8)
          .orderBy(col("doc_id")),
      Some(s"""WITH tk AS (SELECT doc_id,
              |  ${TextOps.portableHashSql("CAST(doc_id AS VARCHAR)")} AS hv,
              |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
              |c AS (SELECT doc_id, CAST(hv % 8 AS INT) AS shard, n_tokens,
              |  sum(n_tokens) OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id
              |    ROWS UNBOUNDED PRECEDING) AS cum_after FROM tk)
              |SELECT doc_id, shard,
              |       CAST((cum_after - n_tokens) // 512 AS BIGINT) AS pack_id,
              |       CAST((cum_after - n_tokens) % 512 AS BIGINT) AS pack_offset, n_tokens
              |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Sequence packing over the TRAINED BPE tokenizer's piece counts
    // (q95's discipline, q123's tokenizer): pack boundaries and offsets
    // computed from the token counts a model would actually see, not the
    // whitespace proxy. The oracle composes the full q123 recursive-CTE
    // train+encode twin with the q95 packing twin — both halves derived
    // independently in SQL, end to end.
    "q127_pack_bpe" -> QueryDef(
      (s, dir) => {
        val pieces = Bpe.trainEncode(tbl(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"), col("n_pieces"))
        TextOps.packSequencesCounted(pieces, "doc_id", "n_pieces",
          maxLen = 512, numShards = 8)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH bpe AS (${Bpe.trainEncodeSql("documents", "doc_id", "text")}),
              |tk AS (SELECT doc_id,
              |  ${TextOps.portableHashSql("CAST(doc_id AS VARCHAR)")} AS hv,
              |  n_pieces AS n_tokens FROM bpe),
              |c AS (SELECT doc_id, CAST(hv % 8 AS INT) AS shard, n_tokens,
              |  sum(n_tokens) OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id
              |    ROWS UNBOUNDED PRECEDING) AS cum_after FROM tk)
              |SELECT doc_id, shard,
              |       CAST((cum_after - n_tokens) // 512 AS BIGINT) AS pack_id,
              |       CAST((cum_after - n_tokens) % 512 AS BIGINT) AS pack_offset, n_tokens
              |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Token-budget mixture sampling (training-mix step): each language
    // contributes docs in deterministic hash order until its token quota
    // is spent (boundary doc kept). Spark runs the sharded parallel
    // prefix sum; the oracle replays the same (shard, hash, id) order as
    // ONE window per stratum — exact equality proves the hierarchical
    // sum ≡ the sequential definition.
    "q96_token_budget_mix" -> QueryDef(
      (s, dir) =>
        TextOps.tokenBudgetSample(tbl(s, dir, "documents"), "doc_id", "text",
          "lang", budgets = Map("en" -> 9000L, "de" -> 4000L),
          defaultBudget = 2500L, numShards = 8)
          .orderBy(col("doc_id")),
      Some(s"""WITH tk AS (SELECT doc_id, lang AS stratum,
              |  ${TextOps.portableHashSql("CAST(doc_id AS VARCHAR)")} AS hv,
              |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
              |c AS (SELECT doc_id, stratum, n_tokens,
              |  sum(n_tokens) OVER (PARTITION BY stratum ORDER BY hv % 8, hv, doc_id
              |    ROWS UNBOUNDED PRECEDING) AS cum_after FROM tk)
              |SELECT doc_id, stratum, CAST(cum_after - n_tokens AS BIGINT) AS pos, n_tokens,
              |  (cum_after - n_tokens) <
              |    (CASE stratum WHEN 'en' THEN 9000 WHEN 'de' THEN 4000 ELSE 2500 END) AS kept
              |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Token-budget mixture over the TRAINED BPE tokenizer's piece counts
    // (q96's discipline, q123's tokenizer) — quotas spend the tokens a
    // model would see. The oracle composes the q123 train+encode twin
    // with the q96 mixture twin (counts joined back to the stratum
    // column; one co-keyed doc_id exchange on the Spark side).
    "q130_budget_bpe" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val pieces = Bpe.trainEncode(docs, "doc_id", "text")
          .select(col("doc_id"), col("n_pieces"))
        TextOps.tokenBudgetSampleCounted(
          docs.select(col("doc_id"), col("lang")).join(pieces, "doc_id"),
          "doc_id", "lang", "n_pieces",
          budgets = Map("en" -> 40000L, "de" -> 18000L),
          defaultBudget = 12000L, numShards = 8)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH bpe AS (${Bpe.trainEncodeSql("documents", "doc_id", "text")}),
              |tk AS (SELECT d.doc_id, d.lang AS stratum,
              |  ${TextOps.portableHashSql("CAST(d.doc_id AS VARCHAR)")} AS hv,
              |  b.n_pieces AS n_tokens FROM documents d JOIN bpe b USING (doc_id)),
              |c AS (SELECT doc_id, stratum, n_tokens,
              |  sum(n_tokens) OVER (PARTITION BY stratum ORDER BY hv % 8, hv, doc_id
              |    ROWS UNBOUNDED PRECEDING) AS cum_after FROM tk)
              |SELECT doc_id, stratum, CAST(cum_after - n_tokens AS BIGINT) AS pos, n_tokens,
              |  (cum_after - n_tokens) <
              |    (CASE stratum WHEN 'en' THEN 40000 WHEN 'de' THEN 18000 ELSE 12000 END) AS kept
              |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Winnowing document fingerprints (window w=4 over 3-gram hashes).
    "q38_fingerprint_winnow" -> QueryDef(
      (s, dir) =>
        TextOps.winnowFromText(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id"), col("fp")),
      // the min-window must be computed BEFORE the full-window filter
      // (SQL applies WHERE before window functions; Spark's withColumn
      // then where matches the subquery form below)
      Some(s"""WITH shr AS (${TextOps.shinglesSql("documents", "doc_id", "text")}),
              |h AS (SELECT doc_id, pos, ${TextOps.portableHashSql("sh")} AS hv,
              |             count(*) OVER (PARTITION BY doc_id) AS n FROM shr),
              |h2 AS (SELECT doc_id, pos, n,
              |  min(hv) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
              |  FROM h)
              |SELECT DISTINCT doc_id, fp FROM h2 WHERE pos <= n - 4
              |ORDER BY doc_id, fp""".stripMargin.replace("\n", " "))),

    // Brute-force exact ANN baseline: quantized dot, top-5 per query.
    "q39_ann_topk" -> QueryDef(
      (s, dir) =>
        Similarity.dotTopK(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, 5)
          .orderBy(col("query_id"), col("rk")),
      Some(s"""WITH qv AS (SELECT vec_id, ${Similarity.quantizeSql("embedding")} AS qe FROM embeddings),
              |qq AS (SELECT vec_id AS query_id, qe AS q FROM qv WHERE vec_id < 10),
              |d AS (SELECT qq.query_id, qv.vec_id, ${Similarity.dotQSql("qq.q", "qv.qe", DIM)} AS dot
              |      FROM qq CROSS JOIN qv)
              |SELECT query_id, vec_id, dot, rk FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rk FROM d) r
              |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin.replace("\n", " "))),

    // LSH-bucketed ANN (the scale path): 4 hyperplane sign bits, rerank
    // within bucket only.
    "q40_ann_lsh" -> QueryDef(
      (s, dir) =>
        Similarity.lshTopK(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, 5, DIM, 4)
          .orderBy(col("query_id"), col("rk")),
      Some(s"""WITH qv AS (SELECT vec_id, ${Similarity.quantizeSql("embedding")} AS qe FROM embeddings),
              |b AS (SELECT vec_id, qe, ${Similarity.lshBucketSql("qe", DIM, 4)} AS bucket FROM qv),
              |qq AS (SELECT vec_id AS query_id, qe AS q, bucket FROM b WHERE vec_id < 10),
              |d AS (SELECT qq.query_id, b.vec_id, b.bucket, ${Similarity.dotQSql("qq.q", "b.qe", DIM)} AS dot
              |      FROM qq JOIN b ON qq.bucket = b.bucket)
              |SELECT query_id, vec_id, bucket, dot, rk FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rk FROM d) r
              |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin.replace("\n", " "))),

    // Multi-probe LSH ANN: the home bucket plus every single-plane-flip
    // neighbor — recall toward brute force at (numPlanes+1)× QUERY-side
    // fan-out only; the corpus side is identical to q40.
    "q117_ann_lsh_multiprobe" -> QueryDef(
      (s, dir) =>
        Similarity.lshTopKMultiProbe(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, 5, DIM, 4)
          .orderBy(col("query_id"), col("rk")),
      Some("WITH " + Similarity.lshTopKMultiProbeSql("embeddings", "vec_id", "embedding",
        "vec_id < 10", 5, DIM, 4) + " ORDER BY query_id, rk")),

    // Embedding-cosine near-dup: LSH buckets + exact integer squared-cosine
    // threshold (cos >= 0.3), completing the dedup family.
    "q49_embedding_near_dup" -> QueryDef(
      (s, dir) =>
        Similarity.embeddingNearDups(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          DIM, tauNum = 3, tauDen = 10)
          .orderBy(col("id_a"), col("id_b")),
      Some(Similarity.embeddingNearDupsSql("embeddings", "vec_id", "embedding",
        DIM, tauNum = 3, tauDen = 10) + " ORDER BY 1, 2")),

    // Multimodal metadata over an opaque binary column (text bytes stand
    // in for media blobs; decode itself is the tested stub in
    // functions.Multimodal).
    "q41_multimodal_meta" -> QueryDef(
      (s, dir) =>
        Multimodal.blobMeta(
          tbl(s, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("blob")),
          "doc_id", "blob")
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'img'
             |     WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
             |     ELSE 'video' END AS format
             |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Exact character n-gram Jaccard near-dup via a df-capped inverted-
    // index join (the third dedup family next to MinHash-LSH and SimHash).
    "q54_ngram_jaccard" -> QueryDef(
      (s, dir) =>
        Dedup.ngramJaccardPairs(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b")),
      Some("SELECT * FROM (" +
        Dedup.ngramJaccardPairsSql("documents", "doc_id", "text") +
        ") q ORDER BY 1, 2")),

    // Frame sampling over the opaque binary column (video→frames shape):
    // every 4th 64-byte window, identified by md5 so the comparison moves
    // hex strings, not raw bytes. The oracle windows the VARCHAR directly
    // — valid because the corpus is pure ASCII (verified: octet_length
    // == len for every row), so char windows ≡ byte windows.
    "q56_frame_sample" -> QueryDef(
      (s, dir) => {
        val frames = Multimodal.sampleFrames(
          tbl(s, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("blob")),
          "doc_id", "blob")
        frames.toDF()
          .select(col("doc_id"), col("frame_idx"), md5(col("frame_bytes")).as("frame_md5"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""WITH f AS (SELECT doc_id, unnest(range(0, len(text)//64, 4)) AS fi, text FROM documents)
             |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
             |  md5(substring(text, CAST(fi*64+1 AS BIGINT), 64)) AS frame_md5
             |FROM f ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    // Stratified deterministic sampling: k docs per language by portable
    // hash rank — the reproducible per-source quota sampler a training
    // mix needs (same rows on any cluster, any partitioning, any run).
    "q70_stratified_sample" -> QueryDef(
      (s, dir) => {
        // bounded-heap rank, not a lang-partitioned window: a stratum at
        // corpus scale is millions of docs, and WindowExec would sort
        // every one of them to keep 5
        val hashed = tbl(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            TextOps.portableHash(col("doc_id").cast("string")).as("hv"))
        TopK.perKey(hashed, Seq("lang"), Seq(("hv", false), ("doc_id", false)), 5)
          .select(col("lang"), col("rk"), col("doc_id"))
          .orderBy(col("lang"), col("rk"))
      },
      Some(s"""WITH h AS (SELECT lang, doc_id,
             |  ${TextOps.portableHashSql("CAST(doc_id AS VARCHAR)")} AS hv FROM documents),
             |r AS (SELECT lang, doc_id,
             |  row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk FROM h)
             |SELECT lang, rk, doc_id FROM r WHERE rk <= 5
             |ORDER BY lang, rk""".stripMargin.replace("\n", " "))),

    // KMV (bottom-k) distinct-count sketch over user ids: the k smallest
    // portable-hash values. Mergeable (union = k smallest of both sets),
    // tiny (k·8 bytes), and exactly reproducible — the estimate
    // (k-1)·2^60/h_k is asserted in PipelineSpec.
    "q72_kmv_sketch" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        tbl(s, dir, "events")
          .select(col("user_id")).distinct()
          .select(TextOps.portableHash(col("user_id").cast("string")).as("hv"))
          .orderBy(col("hv")).limit(32)
          .withColumn("rk",
            row_number().over(Window.orderBy(col("hv"))).cast("long"))
          .select(col("rk"), col("hv"))
          .orderBy(col("rk"))
      },
      Some(s"""WITH u AS (SELECT DISTINCT user_id FROM events),
             |h AS (SELECT ${TextOps.portableHashSql("CAST(user_id AS VARCHAR)")} AS hv FROM u)
             |SELECT row_number() OVER (ORDER BY hv) AS rk, hv FROM h
             |ORDER BY hv LIMIT 32""".stripMargin.replace("\n", " "))),

    // HLL-style registers (64 buckets, max leading-zero rank of the
    // 54-bit hash remainder): the mergeable distinct sketch itself, as
    // rows — max() makes it distributive, so registers combine map-side
    // and across stores. Estimate accuracy asserted in PipelineSpec.
    "q73_hll_registers" -> QueryDef(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        tbl(s, dir, "events")
          .select(col("user_id")).distinct()
          .select(TextOps.portableHash(col("user_id").cast("string")).as("hv"))
          .select((col("hv") % 64).as("bucket"), expr("hv div 64").as("rest"))
          .select(col("bucket"),
            (lit(55) - length(expr("trim(LEADING '0' FROM bin(rest))"))).cast("long").as("rho"))
          .groupBy(col("bucket"))
          .agg(max(col("rho")).as("max_rho"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH u AS (SELECT DISTINCT user_id FROM events),
             |h AS (SELECT ${TextOps.portableHashSql("CAST(user_id AS VARCHAR)")} AS hv FROM u),
             |b AS (SELECT hv % 64 AS bucket, hv // 64 AS rest FROM h)
             |SELECT bucket, max(55 - length(ltrim(bin(rest), '0'))) AS max_rho
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin.replace("\n", " "))),

    // Duplicate-cluster resolution: connected components over a near-dup
    // pair graph (min-label propagation; the oracle computes the same
    // closure with a recursive CTE) — the step that turns pairwise
    // near-dups into keep-one-per-cluster decisions, and catches chains
    // no single LSH bucket ever joined. Pairs here come from the
    // embedding-cosine detector (the cheapest oracle-checked source);
    // the operator is source-agnostic and union-find-parity-tested on
    // arbitrary graphs in PipelineSpec.
    "q81_dup_clusters" -> QueryDef(
      (s, dir) => {
        // adaptive banding (p ~ log₂ corpus) at 16 bands: bucket
        // granularity tracks the SF so the join stays near-linear at
        // every scale, and the doubled band count buys back the recall
        // the moderate-cosine planted dups need (16 independent
        // collision chances vs the r9 run's fixed 8×8)
        val pairs = Similarity.embeddingNearDups(tbl(s, dir, "embeddings"),
          "vec_id", "embedding", DIM, tauNum = 2, tauDen = 5,
          numBands = 16)
        Graph.connectedComponents(pairs, "id_a", "id_b")
          .orderBy(col("id"))
      },
      Some(s"""WITH RECURSIVE pairs AS (
              |  SELECT id_a, id_b FROM (${Similarity.embeddingNearDupsSql("embeddings",
                   "vec_id", "embedding", DIM, tauNum = 2, tauDen = 5,
                   numBands = 16)}) p),
              |${Graph.connectedComponentsSql("id_a", "id_b")}
              |ORDER BY id""".stripMargin.replace("\n", " "))),

    // The END of the dedup pipeline — what a migrating user actually
    // runs: LSH near-dup pairs (q32) → transitive closure (q81's shape)
    // → one representative per duplicate cluster (min doc_id), every
    // other member marked dropped. One row per document: (doc_id, rep,
    // kept). Oracle = the same closure as a recursive CTE.
    "q85_dedup_resolve" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val cc = dupCc(s, dir)
        docs.select(col("doc_id"))
          .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("rep"),
            (coalesce(col("component"), col("doc_id")) === col("doc_id")).as("kept"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE pairs AS (
              |  SELECT doc_a, doc_b FROM (${Dedup.nearDupPairsSql("documents", "doc_id", "text")}) p
              |  WHERE is_dup),
              |e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              |      UNION SELECT doc_b, doc_a FROM pairs),
              |reach(u, v) AS (
              |  SELECT u, v FROM e
              |  UNION
              |  SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v),
              |cc AS (SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u)
              |SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS rep,
              |       coalesce(cc.component, d.doc_id) = d.doc_id AS kept
              |FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin.replace("\n", " "))),

    // Incremental near-dup: a NEW ingest batch (doc_id % 7 = 0 here)
    // against the EXISTING corpus — the per-batch shape of a
    // continuously-fed pipeline. Bucketed band join across the two
    // sides; the corpus-side band/array projections are what a
    // deployment materializes once as its signature index.
    "q86_near_dup_incremental" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        Dedup.nearDupAgainst(
          docs.where(col("doc_id") % 7 === 0),
          docs.where(col("doc_id") % 7 =!= 0),
          "doc_id", "text")
          .orderBy(col("doc_new"), col("doc_old"))
      },
      Some(Dedup.nearDupAgainstSql("documents", "doc_id", "text", "doc_id % 7 = 0") +
        " ORDER BY 1, 2")),

    // The same ingest batch probed against the MATERIALIZED signature
    // index (bands partitioned by band-key bucket + stored verification
    // arrays): only the batch is signed, the index scan prunes to the
    // batch's bucket footprint, and the oracle is identical to q86 —
    // proving the persistent-index path returns exactly what the
    // self-contained recompute does.
    "q87_near_dup_indexed" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        Dedup.nearDupAgainstIndexed(
          docs.where(col("doc_id") % 7 === 0),
          "doc_id", "text", sigIndex(s, dir))
          .orderBy(col("doc_new"), col("doc_old"))
      },
      Some(Dedup.nearDupAgainstSql("documents", "doc_id", "text", "doc_id % 7 = 0") +
        " ORDER BY 1, 2")),

    // Benchmark decontamination: every training doc scored by distinct
    // 13-gram overlap with a held-out eval set (doc_id % 31 = 0 here) —
    // the pre-training collision check. Benchmark gram set broadcast;
    // one doc-keyed exchange of map-combined counters.
    "q88_decontamination" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        TextOps.contamination(
          docs.where(col("doc_id") % 31 =!= 0),
          docs.where(col("doc_id") % 31 === 0),
          "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(TextOps.contaminationSql("documents", "doc_id", "text", "doc_id % 31 = 0") +
        " ORDER BY doc_id")),

    // Bloom-filter build as rows (4096 bits / 128 32-bit words, k=3
    // salted portable hashes): bit_or is distributive, so words combine
    // map-side and across shards — the mergeable membership sketch a
    // dedup pipeline ships between corpus partitions. Bit-exact across
    // engines (every step is integer hashing and bit arithmetic).
    "q80_bloom_bits" -> QueryDef(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val m = 4096
        val hashes = (0 until 3).map(j =>
          TextOps.portableHash(col("user_id").cast("string"), s"b$j:") % m)
        tbl(s, dir, "events")
          .select(col("user_id")).distinct()
          .select(explode(array(hashes: _*)).as("pos"))
          .select(expr("CAST(pos div 32 AS INT)").as("widx"),
            expr("CAST(pos % 32 AS INT)").as("bit"))
          .groupBy(col("widx"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("word"))
          .orderBy(col("widx"))
      },
      Some {
        val hs = (0 until 3).map(j =>
          s"(${TextOps.portableHashSql("CAST(user_id AS VARCHAR)", s"b$j:")}) % 4096")
        s"""WITH u AS (SELECT DISTINCT user_id FROM events),
           |p AS (SELECT unnest([${hs.mkString(", ")}]) AS pos FROM u)
           |SELECT CAST(pos // 32 AS INT) AS widx,
           |       bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
           |FROM p GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")
      }),

    // Global vocabulary top-k: explode → count → TakeOrdered (no full
    // sort); the heavy-hitters shape of corpus token stats.
    "q74_vocab_topk" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .where(col("tok") =!= "")
          .groupBy(col("tok")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok")).limit(20),
      Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |c AS (SELECT tok, count(*) AS n FROM w WHERE tok <> '' GROUP BY tok)
             |SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 20""".stripMargin.replace("\n", " "))),

    // Gopher-style repetition filter: the most frequent bigram's share of
    // each document's bigrams (per-mille, all-integer — positive `div`
    // and `//` agree). High-repetition docs are the classic boilerplate /
    // template-spam cut in a training-data mix.
    "q76_repetition" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wr = Window.partitionBy(col("doc_id")).orderBy(col("n").desc, col("bg"))
        val wt = Window.partitionBy(col("doc_id"))
        tbl(s, dir, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .where(size(col("tk")) >= 2)
          .select(col("doc_id"),
            explode(expr("transform(sequence(0, size(tk)-2), i -> concat(tk[i], ' ', tk[i+1]))")).as("bg"))
          .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(wr))
          .withColumn("total_n", sum(col("n")).over(wt))
          .where(col("rk") === 1)
          .select(col("doc_id"), col("bg").as("top_bigram"), col("n").as("top_n"),
            col("total_n"), expr("(n * 1000) div total_n").as("rep_permille"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
             |  WHERE len(string_split(text,' ')) >= 2),
             |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg FROM tk),
             |c AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY doc_id, bg),
             |r AS (SELECT doc_id, bg, n,
             |  row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, bg) AS rk,
             |  CAST(sum(n) OVER (PARTITION BY doc_id) AS BIGINT) AS total_n FROM c)
             |SELECT doc_id, bg AS top_bigram, n AS top_n, total_n,
             |  (n * 1000) // total_n AS rep_permille
             |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // IVF ANN with the deterministic integer Lloyd quantizer: the full
    // train → assign → probe → rerank path, oracle-checked end to end
    // (q55 keeps the KMeans variant, rows-only).
    "q75_ann_ivf_det" -> QueryDef(
      (s, dir) =>
        Similarity.ivfTopKDet(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, 5)
          .orderBy(col("query_id"), col("rk")),
      Some(Similarity.ivfTopKDetSql("embeddings", "vec_id", "embedding",
        "vec_id < 10", 5, DIM) + " ORDER BY query_id, rk")),

    // The same ANN queries answered from the MATERIALIZED IVF index
    // (driver-collected centroid model + cell-partitioned quantized
    // corpus): the probe reads only the probed cells' directories and
    // never re-quantizes the corpus, and the oracle is identical to
    // q75 — proving the persistent-index path returns exactly what the
    // self-contained train-assign-probe does.
    "q89_ann_ivf_indexed" -> QueryDef(
      (s, dir) =>
        Similarity.ivfTopKIndexed(
          tbl(s, dir, "embeddings").where(col("vec_id") < 10),
          "vec_id", "embedding", ivfIndex(s, dir), 5)
          .orderBy(col("query_id"), col("rk")),
      Some(Similarity.ivfTopKDetSql("embeddings", "vec_id", "embedding",
        "vec_id < 10", 5, DIM) + " ORDER BY query_id, rk")),

    // PRODUCT-QUANTIZED index probe (IVFADC): candidates scored from the
    // probed cells' m-byte PQ codes via per-query lookup tables, then the
    // ADC shortlist reranked EXACTLY from the full-precision cell rows —
    // so the final top-k is bit-identical to q89's exact probe whenever
    // the shortlist captures the true top-k, which the q89 oracle twin
    // verifies end to end (codebook training, coding, ADC decomposition,
    // and rerank all sit between the same input and the same exact
    // answer). Compression is ~43× (16 6-bit codes = 12 logical bytes vs
    // 64×8B quantized); recall-vs-shortlist at scale rides stress.json.
    "q124_ann_ivfpq" -> QueryDef(
      (s, dir) =>
        Similarity.ivfPqTopKIndexed(
          tbl(s, dir, "embeddings").where(col("vec_id") < 10),
          "vec_id", "embedding", ivfPqIndex(s, dir), 5)
          .orderBy(col("query_id"), col("rk")),
      Some(Similarity.ivfTopKDetSql("embeddings", "vec_id", "embedding",
        "vec_id < 10", 5, DIM) + " ORDER BY query_id, rk")),

    // RAW-CORPUS INGEST, JSONL: the documents table serialized to JSON
    // lines and parsed back through the schema-explicit quarantining
    // reader — the first step of a real curation run, oracle-checked by
    // comparing the ingested rows against the source table in DuckDB.
    "q125_jsonl_ingest" -> QueryDef(
      (s, dir) => {
        val (valid, _) = RawCorpus.partitionValid(
          RawCorpus.readJsonlDocs(s, jsonlFixture(s, dir)))
        valid.orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id")),

    // RAW-CORPUS INGEST, WARC: the documents table laid out as gzip-
    // member-per-record web archives (the CommonCrawl shape), walked by
    // the per-file member parser and projected back onto the documents
    // schema — version line, header block, Content-Length body and
    // member framing all round-trip, or the DuckDB compare fails.
    "q126_warc_ingest" -> QueryDef(
      (s, dir) =>
        RawCorpus.warcDocs(RawCorpus.readWarc(s, warcFixture(s, dir)))
          .orderBy(col("doc_id")),
      Some("SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id")),

    // PQ index MAINTENANCE: the ADC+rerank probe against a PQ index
    // built on the standing corpus and GROWN by appendIvfPqIndex —
    // batch rows enter cells/ under the frozen centroid model and
    // pq/codes/ under the frozen codebooks, and the exact-rerank
    // contract makes the grown compressed index answer bit-identically
    // to q90's uncompressed exact probe (same oracle).
    "q131_ann_ivfpq_append" -> QueryDef(
      (s, dir) =>
        Similarity.ivfPqTopKIndexed(
          tbl(s, dir, "embeddings").where(col("vec_id") < 10),
          "vec_id", "embedding", ivfPqGrownIndex(s, dir), 5)
          .orderBy(col("query_id"), col("rk")),
      Some(Similarity.ivfTopKDetSql("embeddings", "vec_id", "embedding",
        "vec_id < 10", 5, DIM, trainWhereSql = "vec_id % 13 <> 0") +
        " ORDER BY query_id, rk")),

    // Index MAINTENANCE: the same probe against an index built on the
    // standing corpus (vec_id % 13 != 0) and GROWN by appendIvfIndex
    // with the remaining batch — appended rows are assigned by the
    // frozen build-time centroid model, never a retrain. The oracle
    // trains Lloyd on the standing rows only (trainWhereSql) but assigns
    // and probes the full table — bit-for-bit the grown index's state,
    // proving append lands every batch row in the exact cell a fresh
    // assignment under the standing model would choose.
    "q90_ann_ivf_append" -> QueryDef(
      (s, dir) =>
        Similarity.ivfTopKIndexed(
          tbl(s, dir, "embeddings").where(col("vec_id") < 10),
          "vec_id", "embedding", ivfGrownIndex(s, dir), 5)
          .orderBy(col("query_id"), col("rk")),
      Some(Similarity.ivfTopKDetSql("embeddings", "vec_id", "embedding",
        "vec_id < 10", 5, DIM, trainWhereSql = "vec_id % 13 <> 0") +
        " ORDER BY query_id, rk")),

    // The IVF drift-guard statistic itself, oracle-checked: cell
    // occupancy (max, total, nlist) of the append-GROWN index — the
    // number a deployment compares against its rebuild threshold. The
    // oracle replays the standing-corpus Lloyd model and the full-table
    // assignment, so a Spark-side drift in either the frozen model or
    // the append assignment shows up as a mismatched count.
    "q100_ivf_drift" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val (mx, total, nlist) =
          Similarity.ivfIndexSkewRaw(s, ivfGrownIndex(s, dir))
        Seq((mx, total, nlist)).toDF("max_cell", "total_rows", "nlist")
      },
      Some(Similarity.ivfDriftDetSql("embeddings", "vec_id", "embedding", DIM,
        trainWhereSql = "vec_id % 13 <> 0"))),

    // PII detection + redaction over a deterministically-augmented text
    // (the corpus itself is synthetic word salad, so both engines splice
    // in the same doc_id-derived email/IP/phone substrings first): match
    // counts per class and the hash of the scrubbed text. Redaction
    // order is part of the contract (emails first).
    "q101_pii_scrub" -> QueryDef(
      (s, dir) => {
        val aug = tbl(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" reach user"), col("doc_id").cast("string"),
            lit("@ex"), (col("doc_id") % 7).cast("string"), lit(".org from 10."),
            (col("doc_id") % 200).cast("string"), lit(".3."),
            (col("doc_id") % 50).cast("string"),
            when(col("doc_id") % 3 === 0, lit(" tel 555-123-4567")).otherwise(lit("")))
            .as("text"))
        TextOps.piiScrub(aug, "doc_id", "text")
          .select(col("doc_id"), col("email_n"), col("ip_n"), col("phone_n"),
            TextOps.portableHash(col("redacted")).as("redacted_hash"))
          .orderBy(col("doc_id"))
      },
      Some {
        val augExpr = "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@ex' || " +
          "CAST(doc_id % 7 AS VARCHAR) || '.org from 10.' || CAST(doc_id % 200 AS VARCHAR) || " +
          "'.3.' || CAST(doc_id % 50 AS VARCHAR) || " +
          "(CASE WHEN doc_id % 3 = 0 THEN ' tel 555-123-4567' ELSE '' END)"
        s"""WITH aug AS (SELECT doc_id, $augExpr AS text FROM documents),
           |p AS (${TextOps.piiScrubSql("aug", "doc_id", "text")})
           |SELECT doc_id, email_n, ip_n, phone_n,
           |  ${TextOps.portableHashSql("redacted")} AS redacted_hash
           |FROM p ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // Deterministic train/val/test split: hash-bucket assignment that is
    // stable under any partitioning or re-run (the anti-leak property a
    // one-shot 100 TB split must have), rolled up to per-split doc and
    // char totals.
    "q102_split_assign" -> QueryDef(
      (s, dir) =>
        TextOps.splitAssign(tbl(s, dir, "documents"), "doc_id")
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
          .orderBy(col("split")),
      Some(s"""SELECT ${TextOps.splitAssignSql("doc_id")} AS split,
              |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
              |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // Quality-aware canonical selection: q85 keeps each cluster's min-id
    // member; a curation pipeline keeps the BEST one. Same CC replay as
    // q85's oracle, extended with the q36 quality score and an
    // argmax-per-component window (score DESC, id ASC).
    "q103_canonical_pick" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val scored = TextOps.qualityScore(docs, "doc_id", "text", "n_chars")
        Dedup.canonicalPickFromCc(scored, "doc_id", "score", dupCc(s, dir))
          .orderBy(col("doc_id"))
      },
      Some {
        val stop = TextOps.langProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
        s"""WITH RECURSIVE pairs AS (
           |  SELECT doc_a, doc_b FROM (${Dedup.nearDupPairsSql("documents", "doc_id", "text")}) p
           |  WHERE is_dup),
           |${Graph.connectedComponentsSql("doc_a", "doc_b").replaceFirst("SELECT u AS id", ", cc AS (SELECT u AS id")}),
           |q AS (SELECT doc_id,
           |  CAST(len(tk) AS BIGINT) * 2 + CAST(len(list_distinct(tk)) AS BIGINT) * 3 +
           |  CAST(len(list_filter(tk, t -> t IN ($stop))) AS BIGINT) * 5 - n_chars // 10 AS score
           |  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS tk FROM documents) t),
           |m AS (SELECT d.doc_id, q.score, coalesce(cc.component, d.doc_id) AS component
           |      FROM documents d JOIN q USING (doc_id)
           |      LEFT JOIN cc ON cc.id = d.doc_id)
           |SELECT doc_id, component,
           |  first_value(doc_id) OVER (PARTITION BY component ORDER BY score DESC, doc_id ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS canonical,
           |  doc_id = first_value(doc_id) OVER (PARTITION BY component ORDER BY score DESC, doc_id ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS kept
           |FROM m ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // Domain balancing: at most 3 docs per source in deterministic
    // salted-hash order — per-doc rank and kept flag, so the oracle
    // checks the ORDER inside each group, not just the counts.
    "q104_source_cap" -> QueryDef(
      (s, dir) =>
        TextOps.capPerGroup(tbl(s, dir, "documents"), "doc_id", "source", cap = 3)
          .select(col("doc_id"), col("source"), col("rank"), col("kept"))
          .orderBy(col("doc_id")),
      Some(s"""WITH r AS (SELECT doc_id, source,
              |  row_number() OVER (PARTITION BY source ORDER BY
              |    ${TextOps.portableHashSql("CAST(doc_id AS VARCHAR)", "domcap")}, doc_id) AS rank
              |  FROM documents)
              |SELECT doc_id, source, CAST(rank AS BIGINT) AS rank, rank <= 3 AS kept
              |FROM r ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Sub-document exact dedup signal: per doc, how many of its 16-token
    // windows occur elsewhere (other docs OR repeated within the doc) —
    // the boilerplate/template statistic doc-level near-dup misses.
    "q105_dup_windows" -> QueryDef(
      (s, dir) =>
        TextOps.dupWindowStats(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.dupWindowStatsSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // The actionable form of q105: REMOVE the duplicated windows and
    // rebuild each doc's text from the survivors in order — the
    // boilerplate scrub. The oracle rebuilds the same text with an
    // ordered string_agg, so window order and the exact scrub boundary
    // are hash-checked, not just counted.
    "q110_dup_window_scrub" -> QueryDef(
      (s, dir) =>
        TextOps.dupWindowScrub(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.dupWindowScrubSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // Text normalization scrub: NFC composition (codegen Expression —
    // Spark has no built-in) + control-char strip + whitespace squash.
    // The corpus is ASCII-clean, so a messy suffix (decomposed accent,
    // BEL, tab runs) is injected on BOTH sides to make the oracle
    // exercise every branch, not just the identity path.
    "q116_clean_text" -> QueryDef(
      (s, dir) =>
        TextOps.cleanText(
          tbl(s, dir, "documents")
            .select(col("doc_id"), concat(col("text"), lit(MessySuffix)).as("text")),
          "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.cleanTextSql(
        s"(SELECT doc_id, text || '$MessySuffix' AS text FROM documents)",
        "doc_id", "text") + " ORDER BY doc_id")),

    // Sparse lexical retrieval: integer-exact TF-IDF top-k — the
    // curation-side search tool (targeted decontamination, "which
    // training docs look like this prompt"). One corpus pass (array-HOF
    // tf against the broadcast term list, never a (doc, token) explode
    // exchange), a driver-bounded idf model, bounded-heap rerank.
    "q114_tfidf_topk" -> QueryDef(
      (s, dir) =>
        graft.functions.Retrieval.tfidfTopK(
          tbl(s, dir, "documents"), "doc_id", "text", RetrievalQueries, k = 5),
      Some(graft.functions.Retrieval.tfidfTopKSql(
        "documents", "doc_id", "text", RetrievalQueries, k = 5))),

    // Exact quantiles WITHOUT a global sort: 4-pass radix selection
    // (16-bit digits, driver-bounded histograms) — the 100 TB form of
    // q69's window pass; the oracle is the definitional rank-select.
    "q115_radix_quantiles" -> QueryDef(
      (s, dir) =>
        graft.functions.Quantiles.radixQuantiles(
          tbl(s, dir, "events")
            .select(round(col("value").cast("double") * 100).cast("long").as("vc")),
          "vc", pNums = Seq(25, 50, 90, 99), pDen = 100),
      Some(graft.functions.Quantiles.radixQuantilesSql(
        "events", "CAST(round(CAST(value AS DOUBLE)*100) AS BIGINT)",
        Seq(25, 50, 90, 99), 100))),

    // Tokenizer-encode: every doc to its token-ID sequence under the
    // corpus's own ranked vocab (rank = count desc / token asc, OOV =
    // -1) — ID assignment, OOV handling and SEQUENCE ORDER are all
    // hash-checked via the space-joined encoding.
    "q112_token_ids" -> QueryDef(
      (s, dir) =>
        TextOps.tokenIds(tbl(s, dir, "documents"), "doc_id", "text", vocabSize = 100)
          .orderBy(col("doc_id")),
      Some(TextOps.tokenIdsSql("documents", "doc_id", "text", vocabSize = 100) +
        " ORDER BY doc_id")),

    // Integer-exact LM-filtering stand-in: per-doc token surprisal sums
    // (63 − ⌊log₂ corpus-count⌋ per token, bit-length math — no float
    // log in either engine).
    "q111_surprisal" -> QueryDef(
      (s, dir) =>
        TextOps.surprisalScore(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.surprisalScoreSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // Vocabulary coverage: per-doc OOV counts against the corpus's own
    // top-k vocab (deterministic boundary: count desc, token asc) — the
    // tokenizer-sizing / corpus-drift number. Vocab is the model
    // (driver-bounded limit, broadcast back); docs re-aggregate once.
    // k=16 < the corpus's 31 distinct tokens so the OOV tail is real.
    "q106_oov_stats" -> QueryDef(
      (s, dir) =>
        TextOps.oovStats(tbl(s, dir, "documents"), "doc_id", "text", vocabSize = 16)
          .orderBy(col("doc_id")),
      Some(TextOps.oovStatsSql("documents", "doc_id", "text", vocabSize = 16) +
        " ORDER BY doc_id")),

    // The custom GroupedTopK plan operator under a DIRECT oracle: top-3
    // docs per language by (quality score desc, id asc) through the
    // bounded-heap exec (O(groups × k) state, no sort, no window) — the
    // oracle is the row_number window it replaces, so the operator's
    // row_number semantics (incl. rank values) are hash-checked, not
    // just spec-asserted.
    "q107_grouped_topk" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val scored = TextOps.qualityScore(docs, "doc_id", "text", "n_chars")
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .select(col("doc_id"), col("lang"), col("score"))
        graft.functions.TopK.perKey(scored, Seq("lang"),
          Seq(("score", true), ("doc_id", false)), k = 3)
          .orderBy(col("lang"), col("rk"))
      },
      Some {
        val stop = TextOps.langProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
        s"""WITH q AS (SELECT doc_id, lang,
           |  CAST(len(tk) AS BIGINT) * 2 + CAST(len(list_distinct(tk)) AS BIGINT) * 3 +
           |  CAST(len(list_filter(tk, t -> t IN ($stop))) AS BIGINT) * 5 - n_chars // 10 AS score
           |  FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tk FROM documents) t)
           |SELECT doc_id, lang, score, rk FROM (
           |  SELECT doc_id, lang, score,
           |    CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS BIGINT) AS rk
           |  FROM q) r WHERE rk <= 3 ORDER BY lang, rk""".stripMargin.replace("\n", " ")
      }),

    // SemDeDup-style semantic dedup: det-Lloyd cells bound the candidate
    // set (cell-mates only — the clustering plays the LSH-band role with
    // semantically coherent buckets), exact integer cosine gate, CC
    // closure, keep the member CLOSEST TO ITS CENTROID per group (the
    // paper's keep rule — NOT min-id). Oracle replays training,
    // assignment, pairing, the recursive closure and the pick.
    "q108_semantic_dedup" -> QueryDef(
      (s, dir) =>
        Similarity.semanticDedup(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          DIM, tauNum = 3, tauDen = 10)
          .orderBy(col("vec_id")),
      Some(s"""WITH RECURSIVE ${Similarity.semanticDedupSql("embeddings", "vec_id", "embedding",
                DIM, tauNum = 3, tauDen = 10)}
              |ORDER BY vec_id""".stripMargin.replace("\n", " "))),

    // The WindowTopKRewrite optimizer rule under the ORACLE gate: the
    // plain row_number-window SQL idiom (verbatim user SQL, not the
    // TopK.perKey API) is auto-rewritten to the bounded-heap operator
    // and must still hash-match DuckDB's actual window. Runs on an
    // isolated newSession so the rule install never leaks into the rest
    // of the sweep; PlanContractSpec asserts the rewritten plan shape.
    "q113_window_topk_sql" -> QueryDef(
      (s, dir) => {
        val s2 = s.newSession()
        graft.functions.TopK.installRewrite(s2)
        val docs = tbl(s2, dir, "documents")
        val scored = TextOps.qualityScore(docs, "doc_id", "text", "n_chars")
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .select(col("doc_id"), col("lang"), col("score"))
        scored.createOrReplaceTempView("q113_scored")
        s2.sql("""SELECT doc_id, lang, score, CAST(rk AS BIGINT) AS rk FROM (
                 |  SELECT doc_id, lang, score,
                 |         row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rk
                 |  FROM q113_scored) t
                 |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin)
      },
      Some {
        val stop = TextOps.langProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
        s"""WITH q AS (SELECT doc_id, lang,
           |  CAST(len(tk) AS BIGINT) * 2 + CAST(len(list_distinct(tk)) AS BIGINT) * 3 +
           |  CAST(len(list_filter(tk, t -> t IN ($stop))) AS BIGINT) * 5 - n_chars // 10 AS score
           |  FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tk FROM documents) t)
           |SELECT doc_id, lang, score, rk FROM (
           |  SELECT doc_id, lang, score,
           |    CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS BIGINT) AS rk
           |  FROM q) r WHERE rk <= 3 ORDER BY lang, rk""".stripMargin.replace("\n", " ")
      }),

    // Feature extraction over sampled frames: per-frame byte histogram
    // (16 bins) via the partition-batched extractor — the multimodal
    // decode → frames → features chain, oracle-checked end to end (the
    // corpus is pure ASCII, so DuckDB's char-ord histogram over the same
    // windows is byte-exact).
    "q79_frame_features" -> QueryDef(
      (s, dir) => {
        val frames = Multimodal.sampleFrames(
          tbl(s, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("blob")),
          "doc_id", "blob")
        Multimodal.extractFeatures(frames)
          .orderBy(col("doc_id"), col("frame_idx"), col("bin"))
      },
      Some("""WITH f AS (SELECT doc_id, unnest(range(0, len(text)//64, 4)) AS fi, text FROM documents),
             |fr AS (SELECT doc_id, CAST(fi AS INT) AS frame_idx,
             |       substring(text, CAST(fi*64+1 AS BIGINT), 64) AS s FROM f),
             |b AS (SELECT doc_id, frame_idx,
             |       unnest(list_transform(range(len(s)), i -> ord(substr(s, CAST(i+1 AS BIGINT), 1)) // 16)) AS bin
             |       FROM fr)
             |SELECT doc_id, frame_idx, CAST(bin AS INT) AS bin, count(*) AS n
             |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin.replace("\n", " "))),

    // REAL image decode (JDK ImageIO, no stub): deterministic grayscale
    // PNGs are encoded per doc (width/height/pixels all formula-derived),
    // then decoded back through the actual PNG codec — dimensions and the
    // exact pixel sum must survive the round trip. The oracle computes
    // the same formula relationally, so a decode bug (stride, band
    // order, color model) breaks the hash.
    "q84_image_decode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val blobs = graft.functions.Par.fanOut(tbl(s, dir, "documents").select(col("doc_id")))
          .as[Long]
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            it.map { id =>
              val w = (id % 31 + 2).toInt
              val h = (id % 17 + 2).toInt
              (id, Multimodal.encodeGrayPng(w, h, (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
            }
          }.toDF("doc_id", "blob")
        Multimodal.imageStats(blobs, "doc_id", "blob").orderBy(col("doc_id"))
      },
      Some("""WITH ids AS (SELECT doc_id, doc_id % 31 + 2 AS w, doc_id % 17 + 2 AS h FROM documents),
             |px AS (SELECT i.doc_id, i.w, i.h, (i.doc_id*31 + x.r*7 + y.r*13) % 256 AS p
             |       FROM ids i JOIN range(0, 32) x(r) ON x.r < i.w JOIN range(0, 18) y(r) ON y.r < i.h)
             |SELECT doc_id, 'png' AS format, w AS width, h AS height, CAST(sum(p) AS BIGINT) AS px_sum
             |FROM px GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // REAL audio decode (JDK javax.sound, no stub): 16-bit mono WAVs are
    // encoded per doc by the hand-rolled RIFF writer (rate/length/samples
    // all formula-derived), then decoded back through the actual JDK
    // codec — rate, frame count and the exact signed sample sum must
    // survive the round trip. The audio analog of q84: two independent
    // implementations of the format meet in the middle, and the oracle
    // recomputes the formula relationally.
    "q109_audio_decode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val blobs = graft.functions.Par.fanOut(tbl(s, dir, "documents").select(col("doc_id")))
          .as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val rate = (8000 + (id % 4) * 4000).toInt
              val n = (40 + id % 17).toInt
              val samples = Array.tabulate(n)(i =>
                ((id * 31 + i * 7) % 4096 - 2048).toShort)
              (id, Multimodal.encodeWavPcm16(rate, samples))
            }
          }.toDF("doc_id", "blob")
        Multimodal.audioStats(blobs, "doc_id", "blob").orderBy(col("doc_id"))
      },
      Some("""WITH ids AS (SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS rate,
             |            40 + doc_id % 17 AS n FROM documents),
             |sm AS (SELECT i.doc_id, i.rate, i.n,
             |       (i.doc_id*31 + x.r*7) % 4096 - 2048 AS v
             |       FROM ids i JOIN range(0, 57) x(r) ON x.r < i.n)
             |SELECT doc_id, 'wav' AS format, rate AS sample_rate, n AS n_frames,
             |       CAST(sum(v) AS BIGINT) AS amp_sum
             |FROM sm GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // BPE subword tokenizer, trained AND applied on both engines
    // independently: merges learned from the corpus's capped
    // word-frequency model (driver-bounded, the q106/q112 vocab pattern),
    // then every document re-written to BPE pieces by exhaustive
    // left-to-right application in training order. The oracle derives
    // the merge table from its own corpus scan (per-step pair-count
    // aggregates + per-word recursive-CTE application), so merge
    // selection, tie-breaks, application order and the final piece
    // streams are all hash-checked.
    "q123_bpe_tokenize" -> QueryDef(
      (s, dir) =>
        Bpe.trainEncode(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(Bpe.trainEncodeSql("documents", "doc_id", "text") + " ORDER BY doc_id")),

    // VIDEO decode round trip: per doc, a deterministic multi-frame
    // uncompressed-DIB AVI (hand-rolled RIFF encoder) decoded back
    // through the pure-JVM AVI parser — true dimensions, frame count,
    // and the decoded-pixel sum, all integer-exact (each gray value
    // lands as 3 identical BGR bytes, hence the 3× in the oracle). The
    // video analog of q84 (image) / q109 (audio): two independent
    // implementations of the container must agree through the full
    // encode→decode→statistics pipeline.
    "q120_video_decode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val blobs = graft.functions.Par.fanOut(tbl(s, dir, "documents").select(col("doc_id")))
          .as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val w = (4 + id % 5).toInt
              val h = (3 + id % 4).toInt
              val nf = (2 + id % 3).toInt
              val frames = (0 until nf).map { f =>
                Array.tabulate(w * h)(i =>
                  ((id * 31 + f * 97 + (i / w) * 13 + (i % w) * 7) % 256).toByte)
              }
              (id, Multimodal.encodeAviDib(w, h, frames))
            }
          }.toDF("doc_id", "blob")
        Multimodal.videoStats(blobs, "doc_id", "blob").orderBy(col("doc_id"))
      },
      Some("""WITH ids AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
             |            2 + doc_id % 3 AS nf FROM documents),
             |px AS (SELECT i.doc_id, i.w, i.h, i.nf,
             |       (i.doc_id*31 + f.r*97 + y.r*13 + x.r*7) % 256 AS v
             |       FROM ids i
             |       JOIN range(0, 4) f(r) ON f.r < i.nf
             |       JOIN range(0, 6) y(r) ON y.r < i.h
             |       JOIN range(0, 8) x(r) ON x.r < i.w)
             |SELECT doc_id, 'avi' AS format, w AS width, h AS height, nf AS n_frames,
             |       CAST(3 * sum(v) AS BIGINT) AS px_sum
             |FROM px GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // END-TO-END CURATION: the composed chain a migrating user actually
    // runs — clean (NFC + control-strip + whitespace squash) → language
    // ID → integer quality score → lang/quality gate → exact dedup on
    // the CLEANED text (keep-lowest, copies counted) → deterministic
    // split assignment. Input plants real duplicates (every doc_id%3==0
    // doc re-keyed at +10000 with identical text). Every stage is an
    // already-oracle-checked operator (q116/q35/q36/q30/q102); this row
    // pins that the COMPOSITION — filters between stages, dedup over the
    // derived clean text, split over the surviving reps — is exact too.
    // Plan shape: per-row codegen projections end to end; the only
    // exchanges are the dedup hash aggregate and the final sort.
    "q135_curation_e2e" -> QueryDef(
      (s, dir) => {
        val base = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
        val input = base.unionByName(
          base.where(col("doc_id") % 3 === 0)
            .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text")))
        // cleaned feeds three consumers and f two — materialize each once
        // (the q151 rationale; eager Stages.mat, GC-released)
        val cleaned = graft.functions.Stages.mat(
          TextOps.cleanText(input, "doc_id", "text"))
        val lang = TextOps.langId(cleaned, "doc_id", "text_clean")
          .select(col("doc_id"), col("pred_lang"))
        val qual = TextOps.qualityScore(
            cleaned.withColumn("n_chars", length(col("text_clean")).cast("long")),
            "doc_id", "text_clean", "n_chars")
          .select(col("doc_id"), col("score"))
        val f = graft.functions.Stages.mat(cleaned.select(col("doc_id"), col("text_clean"))
          .join(lang, Seq("doc_id")).join(qual, Seq("doc_id"))
          .where(col("pred_lang") =!= "und" && col("score") >= 150))
        val kept = Dedup.exactDedup(f, "doc_id", "text_clean")
        TextOps.splitAssign(
            kept.join(f.select(col("doc_id"), col("pred_lang"), col("score")), Seq("doc_id")),
            "doc_id")
          .select(col("doc_id"), col("pred_lang"), col("score"),
            col("n_copies"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some {
        val stop = TextOps.langProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
        s"""WITH input AS (SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 3 = 0),
           |c AS (SELECT doc_id, ${TextOps.cleanTextExprSql("text")} AS text_clean FROM input),
           |l AS (SELECT doc_id, pred_lang FROM (${TextOps.langIdSql("c", "doc_id", "text_clean")}) ll),
           |q AS (SELECT doc_id, n_tokens * 2 + n_uniq * 3 + n_stop * 5 - n_chars // 10 AS score FROM (
           |  SELECT doc_id, length(text_clean) AS n_chars,
           |    CAST(len(tk) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
           |    CAST(len(list_filter(tk, t -> t IN ($stop))) AS BIGINT) AS n_stop
           |  FROM (SELECT doc_id, text_clean, string_split(text_clean, ' ') AS tk FROM c) t) s),
           |f AS (SELECT c.doc_id, c.text_clean, l.pred_lang, q.score
           |      FROM c JOIN l USING (doc_id) JOIN q USING (doc_id)
           |      WHERE l.pred_lang <> 'und' AND q.score >= 150),
           |d AS (SELECT doc_id,
           |        row_number() OVER (PARTITION BY md5(text_clean) ORDER BY doc_id) AS rn,
           |        count(*) OVER (PARTITION BY md5(text_clean)) AS n_copies FROM f)
           |SELECT f.doc_id, f.pred_lang, f.score, d.n_copies,
           |       ${TextOps.splitAssignSql("f.doc_id")} AS split
           |FROM f JOIN d USING (doc_id) WHERE d.rn = 1
           |ORDER BY f.doc_id""".stripMargin.replace("\n", " ")
      }),

    // Sketch-guided heavy hitters: every corpus trigram at frequency
    // share >= 1/5000 with its EXACT count — but the plan never shuffles
    // the unbounded gram key space (q74's full groupBy does, and at
    // 100 TB that key space is ~10^11 grams). Pass 1 folds per-partition
    // Misra-Gries summaries up a treeAggregate (mergeable, no false
    // negatives, driver state O(k)); pass 2 broadcast-joins the <= 2k
    // candidates back and exact-counts only those, so the one exchange
    // moves <= 2k map-combined rows per partition at any corpus size.
    // Candidate sets vary with partitioning; the verified output is the
    // exact answer, so the direct-computation oracle hash-matches.
    "q132_heavy_hitters" -> QueryDef(
      (s, dir) => HeavyHitters.frequentGrams(tbl(s, dir, "documents"), "text"),
      Some(HeavyHitters.frequentGramsSql("documents", "text"))),

    // Per-group HLL registers: distinct users PER EVENT TYPE as mergeable
    // sketch rows — q73's global registers made grouped. No distinct
    // anywhere: max() over every raw event is the whole point (the
    // sketch replaces the distinct's shuffle), so the only exchange is
    // one two-phase aggregate keyed by (event_type, bucket) — 64 rows
    // per group at any event volume, combinable across stores/days.
    "q133_group_hll" -> QueryDef(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        tbl(s, dir, "events")
          .select(col("event_type"),
            TextOps.portableHash(col("user_id").cast("string")).as("hv"))
          .select(col("event_type"), (col("hv") % 64).as("bucket"),
            expr("hv div 64").as("rest"))
          .select(col("event_type"), col("bucket"),
            (lit(55) - length(expr("trim(LEADING '0' FROM bin(rest))"))).cast("long").as("rho"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(max(col("rho")).as("max_rho"))
          .orderBy(col("event_type"), col("bucket"))
      },
      Some(s"""WITH h AS (SELECT event_type,
             |  ${TextOps.portableHashSql("CAST(user_id AS VARCHAR)")} AS hv FROM events),
             |b AS (SELECT event_type, hv % 64 AS bucket, hv // 64 AS rest FROM h)
             |SELECT event_type, bucket,
             |       max(55 - length(ltrim(bin(rest), '0'))) AS max_rho
             |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    // IVF ANN through the KMeans coarse quantizer, probed at
    // nprobe = nlist: every cell is searched, so the top-k is exactly the
    // brute-force result REGARDLESS of the (library-internal) centroid
    // placement — which turns the untestable "rows-only" KMeans path into
    // a fully oracle-checked one. The train → assign → probe → rerank
    // machinery all executes; recall at nprobe < nlist is asserted against
    // brute force in PipelineSpec.
    "q55_ann_ivf" -> QueryDef(
      (s, dir) =>
        Similarity.ivfTopK(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, 5, nlist = 16, nprobe = 16)
          .select(col("query_id"), col("vec_id"), col("dot"), col("rk"))
          .orderBy(col("query_id"), col("rk")),
      Some(s"""WITH qv AS (SELECT vec_id, ${Similarity.quantizeSql("embedding")} AS qe FROM embeddings),
              |qq AS (SELECT vec_id AS query_id, qe AS q FROM qv WHERE vec_id < 10),
              |d AS (SELECT qq.query_id, qv.vec_id, ${Similarity.dotQSql("qq.q", "qv.qe", DIM)} AS dot
              |      FROM qq CROSS JOIN qv)
              |SELECT query_id, vec_id, dot, rk FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rk FROM d) r
              |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin.replace("\n", " "))),

    // Bigram-LM perplexity bands (CCNet-style curation gate): per-doc
    // conditional-surprisal sums over token TRANSITIONS — the corpus's
    // own bigram model, integer-exact via the bit-length log — bucketed
    // into head/middle/tail. Upgrades q111's unigram stand-in to a real
    // conditional model; the only corpus exchanges move compact
    // (w1,w2,count) model rows and the doc re-aggregate.
    "q136_bigram_lm" -> QueryDef(
      (s, dir) =>
        TextOps.bigramLmScore(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.bigramLmScoreSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // One-scan table profile (ANALYZE-style corpus health check): per
    // column — rows, nulls, exact distincts, string-form min/max — all
    // from ONE aggregate over ONE scan, unpivoted to a row per column.
    // The oracle recomputes each column independently.
    "q137_table_profile" -> QueryDef(
      (s, dir) =>
        graft.functions.Profile.tableProfile(tbl(s, dir, "documents"),
            Seq("doc_id", "text", "lang", "source", "n_chars"))
          .orderBy(col("col_name")),
      Some(s"SELECT * FROM (${graft.functions.Profile.tableProfileSql("documents",
          Seq("doc_id", "text", "lang", "source", "n_chars"))}) p ORDER BY col_name")),

    // Deterministic epoch shuffle into training shards: seeded
    // pseudo-random permutation as (shard, pos) — uniform hash shard
    // assignment + in-shard rank of an independent hash. The plan is
    // repartition-by-shard + in-shard sort (numShards independent sorts,
    // never a corpus-wide ORDER BY rand()).
    "q138_shard_shuffle" -> QueryDef(
      (s, dir) =>
        TextOps.shardShuffle(tbl(s, dir, "documents"), "doc_id", numShards = 8)
          .orderBy(col("shard"), col("pos")),
      Some(TextOps.shardShuffleSql("documents", "doc_id", numShards = 8) +
        " ORDER BY shard, pos")),

    // Deterministic uniform k-per-group sample (eval/eyeball draws):
    // bottom-k of a seeded hash per group THROUGH THE BOUNDED HEAP —
    // O(groups × k) state, no window sort even when a group spans the
    // corpus. The oracle is the row_number window the heap replaces, so
    // sampling semantics (ranks included) are hash-checked.
    "q139_group_sample" -> QueryDef(
      (s, dir) =>
        TextOps.sampleKPerGroup(tbl(s, dir, "documents"), "doc_id", "lang", k = 7)
          .orderBy(col("lang"), col("rk")),
      Some(TextOps.sampleKPerGroupSql("documents", "doc_id", "lang", k = 7) +
        " ORDER BY lang, rk")),

    // CCNet's actual band rule: head/middle/tail by corpus perplexity
    // QUANTILES (33rd/66th percentile of ppl10), thresholds found by the
    // radix quantile machinery (4 narrow passes, 2 driver rows) — the
    // oracle re-derives the same ⌈p·n⌉-rank values, so no data-derived
    // threshold crosses engines.
    "q140_bigram_lm_auto" -> QueryDef(
      (s, dir) =>
        TextOps.bigramLmBandsAuto(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.bigramLmBandsAutoSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // q136's 100 TB path: identical output, but every exchange and join
    // moves (long, long) HASH keys instead of token-string pairs (the
    // q105/q54 compact-key discipline; counts exact modulo 60-bit
    // collisions, and the twin hashes identically so parity is
    // bit-exact). The production xxhash64 family makes the hashing
    // itself codegen-cheap; md5 is the oracle tax.
    "q141_bigram_lm_hashed" -> QueryDef(
      (s, dir) =>
        TextOps.bigramLmScoreHashed(tbl(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(TextOps.bigramLmScoreHashedSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // q137's 100 TB path: the Expand-multiplied exact count(DISTINCT)
    // replaced by per-column HLL REGISTER state — the exchange carries
    // ≤ 64 mergeable register rows per column out of each task, never
    // raw values, and the output stays integer-exact (the q73
    // register-exactness discipline) so the twin replays it
    // bit-for-bit.
    "q142_profile_sketch" -> QueryDef(
      (s, dir) =>
        graft.functions.Profile.tableProfileSketch(tbl(s, dir, "documents"),
            Seq("doc_id", "text", "lang", "source", "n_chars"))
          .orderBy(col("col_name")),
      Some(s"SELECT * FROM (${graft.functions.Profile.tableProfileSketchSql("documents",
          Seq("doc_id", "text", "lang", "source", "n_chars"))}) p ORDER BY col_name")),

    // DSIR-style data selection (Xie et al. 2023): the top-50 most
    // target-like NON-target docs under integer bit-length unigram LLR,
    // target = the English split. One shared count aggregate builds both
    // models; ranking is the bounded heap, hash-checked against the
    // row_number window it replaces.
    "q143_dsir_select" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .withColumn("is_t", col("lang") === "en")
        TextOps.dsirSelect(docs, "doc_id", "text", "is_t", k = 50)
          .orderBy(col("doc_id"))
      },
      Some(s"SELECT * FROM (${TextOps.dsirSelectSql("documents", "doc_id",
          "text", "lang = 'en'", k = 50)}) q ORDER BY doc_id")),

    // Image near-dup dedup by banded perceptual dHash, THROUGH the real
    // PNG decode path (q84's fixture discipline: pixels are
    // formula-derived — groups of 5 docs share a pseudo-random blocky
    // base image, each doc perturbs one pixel — so the oracle replays
    // decode + 9×8 sampling + banding + Hamming verify relationally
    // while Spark runs the actual ImageIO codec). Candidates come from
    // the 16-bit (band, value) equi-join; pigeonhole makes banding exact
    // at maxHamming < numBands (3 < 4 here).
    "q144_image_near_dup" -> QueryDef(
      (s, dir) => {
        Multimodal.imageNearDupPairs(imageBlobs(s, dir), "doc_id", "blob")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH ids AS (SELECT doc_id, doc_id // 5 AS gid FROM documents),
             |d AS (SELECT doc_id, gid, gid % 13 + 16 AS w, gid % 11 + 16 AS h,
             |  doc_id % (gid % 13 + 16) AS nx, (doc_id * 3) % (gid % 11 + 16) AS ny FROM ids),
             |g AS (SELECT doc_id, gid, nx, ny, i.r AS xi, j.r AS yj,
             |  i.r * w // 9 AS sx, j.r * h // 8 AS sy,
             |  ((gid+1)*2654435761 + (i.r * w // 9 * 29 + j.r * h // 8 * 13 + 7)*40503)
             |    // 8192 % 65536 AS bm
             |  FROM d, range(0, 9) i(r), range(0, 8) j(r)),
             |p AS (SELECT doc_id, xi, yj,
             |  CASE WHEN sx = nx AND sy = ny
             |    THEN (bm*bm // 64 % 256 + doc_id) % 256
             |    ELSE bm*bm // 64 % 256 END AS pv FROM g),
             |bits AS (SELECT a.doc_id, a.yj, a.xi,
             |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
             |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.yj = b.yj
             |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |    AND a.doc_id < b.doc_id),
             |ham AS (SELECT c.id_a, c.id_b,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_a
             |    JOIN bands y ON y.doc_id = c.id_b AND y.yj = x.yj
             |  GROUP BY c.id_a, c.id_b)
             |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3
             |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    // Audio near-dup dedup by banded acoustic fingerprint, THROUGH the
    // real AudioSystem decode path (q109's discipline, q144's fixture
    // trick applied to sound: samples are formula-derived — groups of 5
    // docs share a pseudo-random 72-slice wave, each doc perturbs ONE
    // sample — so the oracle replays decode + slicing + energy + banding
    // + Hamming relationally while Spark decodes the actual WAV bytes).
    "q145_audio_near_dup" -> QueryDef(
      (s, dir) => {
        Multimodal.audioNearDupPairs(audioBlobs(s, dir), "doc_id", "blob")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH ids AS (SELECT doc_id, doc_id // 5 AS gid,
             |  doc_id % 1152 AS kp FROM documents),
             |bm AS (SELECT doc_id, kp, s.r AS s,
             |  ((gid+1)*2654435761 + (s.r+3)*40503) // 8192 % 65536 AS b
             |  FROM ids, range(0, 72) s(r)),
             |smp AS (SELECT doc_id, s,
             |  abs(b*b // 64 % 1000 - 500
             |    + CASE WHEN s*16 + q.r = kp THEN doc_id % 300 + 1 ELSE 0 END) AS a
             |  FROM bm, range(0, 16) q(r)),
             |e AS (SELECT doc_id, s, sum(a) // 16 AS e FROM smp GROUP BY doc_id, s),
             |bits AS (SELECT a.doc_id, a.s // 9 AS yj, a.s % 9 AS xi,
             |  CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
             |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.s = a.s + 1
             |  WHERE a.s % 9 < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |    AND a.doc_id < b.doc_id),
             |ham AS (SELECT c.id_a, c.id_b,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_a
             |    JOIN bands y ON y.doc_id = c.id_b AND y.yj = x.yj
             |  GROUP BY c.id_a, c.id_b)
             |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3
             |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    // Incremental image near-dup against the MATERIALIZED fingerprint
    // index (the q87 steady-state discipline for media): decode + hash
    // only the batch (doc_id % 7 = 0), probe the standing index's band
    // table with partition pruning on the batch's bucket footprint,
    // Hamming-verify against the index's stored hash arrays. The oracle
    // replays the whole chain — decode, 9×8 sampling, banding, the
    // cross-split candidate join, Hamming — relationally.
    "q146_image_near_dup_indexed" -> QueryDef(
      (s, dir) => {
        Multimodal.imageNearDupAgainstIndex(
            imageBlobs(s, dir, col("doc_id") % 7 === 0),
            "doc_id", "blob", fpIndex(s, dir))
          .orderBy(col("id_new"), col("id_old"))
      },
      Some("""WITH ids AS (SELECT doc_id, doc_id // 5 AS gid FROM documents),
             |d AS (SELECT doc_id, gid, gid % 13 + 16 AS w, gid % 11 + 16 AS h,
             |  doc_id % (gid % 13 + 16) AS nx, (doc_id * 3) % (gid % 11 + 16) AS ny FROM ids),
             |g AS (SELECT doc_id, gid, nx, ny, i.r AS xi, j.r AS yj,
             |  i.r * w // 9 AS sx, j.r * h // 8 AS sy,
             |  ((gid+1)*2654435761 + (i.r * w // 9 * 29 + j.r * h // 8 * 13 + 7)*40503)
             |    // 8192 % 65536 AS bm
             |  FROM d, range(0, 9) i(r), range(0, 8) j(r)),
             |p AS (SELECT doc_id, xi, yj,
             |  CASE WHEN sx = nx AND sy = ny
             |    THEN (bm*bm // 64 % 256 + doc_id) % 256
             |    ELSE bm*bm // 64 % 256 END AS pv FROM g),
             |bits AS (SELECT a.doc_id, a.yj, a.xi,
             |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
             |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.yj = b.yj
             |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |  WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0),
             |ham AS (SELECT c.id_new, c.id_old,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_new
             |    JOIN bands y ON y.doc_id = c.id_old AND y.yj = x.yj
             |  GROUP BY c.id_new, c.id_old)
             |SELECT id_new, id_old, hamming FROM ham WHERE hamming <= 3
             |ORDER BY id_new, id_old""".stripMargin.replace("\n", " "))),

    // HTML → text extraction (q125/q126's WARC bodies are html; this is
    // the step between ingest and every text operator): each doc's text
    // is wrapped in a full html page — head/title, a style block, a
    // script block whose BODY contains both a '<' comparison and a
    // literal "</div>" string, a comment, double-escaped and named
    // entities — and the extractor must return exactly the visible text.
    // Pure per-row codegen regexp chain, identical patterns both engines.
    "q147_html_extract" -> QueryDef(
      (s, dir) => {
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style type=\"text/css\">p { color: red; }</style>" +
            "<script type=\"text/javascript\">var x = 1 < 2 && \"</div>\";" +
            "</script></head><body><!-- boilerplate note --><p>"),
          col("text"),
          lit(" &amp;lt; &quot;q&quot; &#39;s&nbsp;end</p>" +
            "<div>tail &amp; &lt;eof&gt;</div></body></html>"))
        TextOps.htmlExtract(
            tbl(s, dir, "documents").select(col("doc_id"), html.as("html")),
            "doc_id", "html")
          .orderBy(col("doc_id"))
      },
      Some {
        val htmlSql = "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || " +
          "'</title><style type=\"text/css\">p { color: red; }</style>" +
          "<script type=\"text/javascript\">var x = 1 < 2 && \"</div>\";" +
          "</script></head><body><!-- boilerplate note --><p>' || text || " +
          "' &amp;lt; &quot;q&quot; &#39;s&nbsp;end</p>" +
          "<div>tail &amp; &lt;eof&gt;</div></body></html>'"
        s"SELECT doc_id, ${TextOps.htmlExtractExprSql(htmlSql)} AS text_extracted " +
          "FROM documents ORDER BY doc_id"
      }),

    // Paragraph-frequency boilerplate scrub (CCNet paragraph dedup):
    // every doc is reshaped into 8-token lines with a planted newsletter
    // header (3 variants, df ≈ N/3) and, for even ids, a rights footer
    // (df ≈ N/2) — the scrub must drop exactly the planted boilerplate
    // (df > 2) plus any organically repeated content line, and rebuild
    // the doc in original order. Counting shuffles line HASHES only.
    "q148_paragraph_scrub" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .withColumn("tk", split(col("text"), " "))
          .select(col("doc_id"), concat(
            lit("subscribe to newsletter variant "),
            (col("doc_id") % 3).cast("string"), lit("\n"),
            expr("array_join(transform(sequence(0, " +
              "greatest(1, cast(ceil(size(tk)/8.0) as int)) - 1), " +
              "i -> array_join(slice(tk, i*8+1, 8), ' ')), '\n')"),
            when(col("doc_id") % 2 === 0,
              lit("\nall rights reserved footer 0")).otherwise(lit("")))
            .as("text2"))
        TextOps.paragraphScrub(docs, "doc_id", "text2")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
          |src AS (SELECT doc_id,
          |  'subscribe to newsletter variant ' || CAST(doc_id % 3 AS VARCHAR) || chr(10) ||
          |  array_to_string(list_transform(
          |    range(0, greatest(1, CAST(ceil(len(tk)/8.0) AS INT))),
          |    i -> array_to_string(tk[i*8+1:i*8+8], ' ')), chr(10)) ||
          |  CASE WHEN doc_id % 2 = 0
          |    THEN chr(10) || 'all rights reserved footer 0' ELSE '' END AS text2
          |  FROM t0),
          |t AS (SELECT doc_id, string_split(text2, chr(10)) AS sp FROM src),
          |l0 AS (SELECT doc_id, unnest(sp) AS line,
          |  unnest(range(len(sp))) AS pos FROM t),
          |l AS (SELECT doc_id, pos, line FROM l0 WHERE trim(line) <> ''),
          |lh AS (SELECT doc_id, pos, line,
          |  ${TextOps.portableHashSql("line")} AS lh FROM l),
          |hot AS (SELECT lh FROM (
          |  SELECT lh, count(DISTINCT doc_id) AS df FROM lh GROUP BY lh) h
          |  WHERE df > 2),
          |f AS (SELECT a.doc_id, a.pos, a.line,
          |  (h.lh IS NOT NULL) AS hot FROM lh a LEFT JOIN hot h USING (lh))
          |SELECT doc_id,
          |  coalesce(string_agg(line, chr(10) ORDER BY pos)
          |    FILTER (WHERE NOT hot), '') AS text_scrubbed,
          |  CAST(sum(CASE WHEN hot THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
          |  CAST(sum(CASE WHEN hot THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
          |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Video near-dup dedup — the fourth modality leg, THROUGH the real
    // AVI decode path (q120's raw-DIB bit-exactness makes the pixel
    // formula relationally replayable): groups of 5 docs share a
    // middle-square pseudo-random clip, each doc perturbs ONE pixel of
    // ONE frame. The fingerprint samples 8 frames x 9 middle-row probes;
    // only sampled frames decode. Same 16-bit banding engine as
    // q144/q145.
    "q149_video_near_dup" -> QueryDef(
      (s, dir) => {
        Multimodal.videoNearDupPairs(videoBlobs(s, dir), "doc_id", "blob")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH ids AS (SELECT doc_id, doc_id // 5 AS gid FROM documents),
             |d AS (SELECT doc_id, gid, 18 + gid % 9 AS w, 12 + gid % 7 AS h,
             |  8 + gid % 5 AS nf FROM ids),
             |d2 AS (SELECT doc_id, gid, w, h, nf, doc_id % nf AS pf,
             |  doc_id % w AS px, (doc_id * 3) % h AS py FROM d),
             |g AS (SELECT doc_id, gid, pf, px, py, i.r AS xi, j.r AS yj,
             |  j.r * nf // 8 AS sf, i.r * w // 9 AS sx, h // 2 AS sy,
             |  ((gid+1)*2654435761 +
             |   ((j.r * nf // 8)*1009 + (i.r * w // 9)*29 + (h // 2)*13 + 7)*40503)
             |    // 8192 % 65536 AS bm
             |  FROM d2, range(0, 9) i(r), range(0, 8) j(r)),
             |p AS (SELECT doc_id, xi, yj,
             |  CASE WHEN sf = pf AND sx = px AND sy = py
             |    THEN (bm*bm // 64 % 256 + doc_id) % 256
             |    ELSE bm*bm // 64 % 256 END AS pv FROM g),
             |bits AS (SELECT a.doc_id, a.yj, a.xi,
             |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
             |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.yj = b.yj
             |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |    AND a.doc_id < b.doc_id),
             |ham AS (SELECT c.id_a, c.id_b,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_a
             |    JOIN bands y ON y.doc_id = c.id_b AND y.yj = x.yj
             |  GROUP BY c.id_a, c.id_b)
             |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3
             |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    // DSIR with the paper's hashed bigram features (q143's 100 TB path):
    // the importance model is BOUNDED at 8192 bucket rows no matter the
    // corpus vocabulary, and every exchange/join moves bucket ints, never
    // token strings. Same integer LLR conventions; twin hashes and
    // bucketizes identically so parity is bit-exact.
    "q150_dsir_hashed" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .withColumn("is_t", col("lang") === "en")
        TextOps.dsirSelectHashed(docs, "doc_id", "text", "is_t", k = 50)
          .orderBy(col("doc_id"))
      },
      Some(s"SELECT * FROM (${TextOps.dsirSelectHashedSql("documents", "doc_id",
          "text", "lang = 'en'", k = 50)}) q ORDER BY doc_id")),

    // THE raw-corpus pipeline end to end: every doc becomes a full html
    // page (title/style/script + a nav div and a rights-footer div that
    // repeat across the WHOLE crawl) with planted exact dups
    // (doc_id%3==0 re-keyed at +10000, the q135 discipline); the chain
    // is extract (block closers -> paragraph newlines) -> paragraph
    // boilerplate scrub (drops the nav/footer lines by corpus df) ->
    // clean -> langId + quality gate -> exact dedup -> split. Every
    // stage is an already-oracle-checked operator; this row pins the
    // COMPOSITION from raw html to training-ready rows.
    "q151_raw_pipeline_e2e" -> QueryDef(
      (s, dir) => {
        val base = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
        val input = base.unionByName(
          base.where(col("doc_id") % 3 === 0)
            .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text")))
        val pages = input.select(col("doc_id"), concat(
          lit("<html><head><title>t</title><style>p{c:red}</style>" +
            "<script>var a = 1 < 2 && \"</div>\";</script></head><body>" +
            "<div>home about contact subscribe</div><p>"),
          col("text"),
          lit("</p><!-- f --><div>all rights reserved</div></body></html>"))
          .as("html"))
        val extracted = TextOps.htmlExtract(pages, "doc_id", "html")
        val scrubbed = TextOps.paragraphScrub(extracted, "doc_id", "text_extracted")
          .select(col("doc_id"), col("text_scrubbed"))
        // the extract→scrub→clean regexp chain feeds THREE consumers
        // (lang, quality, the gate join) — materialize it once (eager
        // Stages.mat, ContextCleaner-released) instead of re-running
        // the per-row chain under every branch; same for the gated frame
        // `f`, which both the dedup aggregate and the join-back consume
        val cleaned = graft.functions.Stages.mat(
          TextOps.cleanText(scrubbed, "doc_id", "text_scrubbed"))
        val lang = TextOps.langId(cleaned, "doc_id", "text_clean")
          .select(col("doc_id"), col("pred_lang"))
        val qual = TextOps.qualityScore(
            cleaned.withColumn("n_chars", length(col("text_clean")).cast("long")),
            "doc_id", "text_clean", "n_chars")
          .select(col("doc_id"), col("score"))
        val f = graft.functions.Stages.mat(cleaned.select(col("doc_id"), col("text_clean"))
          .join(lang, Seq("doc_id")).join(qual, Seq("doc_id"))
          .where(col("pred_lang") =!= "und" && col("score") >= 150))
        val kept = Dedup.exactDedup(f, "doc_id", "text_clean")
        TextOps.splitAssign(
            kept.join(f.select(col("doc_id"), col("pred_lang"), col("score")), Seq("doc_id")),
            "doc_id")
          .select(col("doc_id"), col("pred_lang"), col("score"),
            col("n_copies"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some {
        val stop = TextOps.langProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
        val htmlSql = "'<html><head><title>t</title><style>p{c:red}</style>" +
          "<script>var a = 1 < 2 && \"</div>\";</script></head><body>" +
          "<div>home about contact subscribe</div><p>' || text || " +
          "'</p><!-- f --><div>all rights reserved</div></body></html>'"
        s"""WITH input AS (SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 3 = 0),
           |x AS (SELECT doc_id, ${TextOps.htmlExtractExprSql(htmlSql)} AS xt FROM input),
           |t AS (SELECT doc_id, string_split(xt, chr(10)) AS sp FROM x),
           |l0 AS (SELECT doc_id, unnest(sp) AS line,
           |  unnest(range(len(sp))) AS pos FROM t),
           |ln AS (SELECT doc_id, pos, line FROM l0 WHERE trim(line) <> ''),
           |lhh AS (SELECT doc_id, pos, line,
           |  ${TextOps.portableHashSql("line")} AS lh FROM ln),
           |hot AS (SELECT lh FROM (
           |  SELECT lh, count(DISTINCT doc_id) AS df FROM lhh GROUP BY lh) h
           |  WHERE df > 2),
           |scr AS (SELECT doc_id,
           |  coalesce(string_agg(line, chr(10) ORDER BY pos)
           |    FILTER (WHERE h.lh IS NULL), '') AS ts
           |  FROM lhh a LEFT JOIN hot h USING (lh) GROUP BY doc_id),
           |c AS (SELECT doc_id, ${TextOps.cleanTextExprSql("ts")} AS text_clean FROM scr),
           |l AS (SELECT doc_id, pred_lang FROM (${TextOps.langIdSql("c", "doc_id", "text_clean")}) ll),
           |q AS (SELECT doc_id, n_tokens * 2 + n_uniq * 3 + n_stop * 5 - n_chars // 10 AS score FROM (
           |  SELECT doc_id, length(text_clean) AS n_chars,
           |    CAST(len(tk) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
           |    CAST(len(list_filter(tk, t -> t IN ($stop))) AS BIGINT) AS n_stop
           |  FROM (SELECT doc_id, text_clean, string_split(text_clean, ' ') AS tk FROM c) t2) s2),
           |f AS (SELECT c.doc_id, c.text_clean, l.pred_lang, q.score
           |      FROM c JOIN l USING (doc_id) JOIN q USING (doc_id)
           |      WHERE l.pred_lang <> 'und' AND q.score >= 150),
           |d AS (SELECT doc_id,
           |        row_number() OVER (PARTITION BY md5(text_clean) ORDER BY doc_id) AS rn,
           |        count(*) OVER (PARTITION BY md5(text_clean)) AS n_copies FROM f)
           |SELECT f.doc_id, f.pred_lang, f.score, d.n_copies,
           |       ${TextOps.splitAssignSql("f.doc_id")} AS split
           |FROM f JOIN d USING (doc_id) WHERE d.rn = 1
           |ORDER BY f.doc_id""".stripMargin.replace("\n", " ")
      })
,

    // Semantic eval-set decontamination (the embedding counterpart of
    // q88's n-gram check): every corpus vector's MAX quantized dot
    // against the broadcast eval set (vec_id % 97 = 0), verdict at
    // tau = 0. Exact — the fused dot codegen loop per (corpus, eval)
    // pair, one map-combined max exchange, no candidate generation.
    "q152_semantic_decontam" -> QueryDef(
      (s, dir) =>
        Similarity.semanticDecontaminate(tbl(s, dir, "embeddings"),
            "vec_id", "embedding", col("vec_id") % 97 === 0, tau = 0L)
          .orderBy(col("vec_id")),
      Some(s"""WITH qv AS (SELECT vec_id, ${Similarity.quantizeSql("embedding")} AS qe FROM embeddings),
              |e AS (SELECT qe AS ev FROM qv WHERE vec_id % 97 = 0),
              |d AS (SELECT c.vec_id,
              |  CAST(max(${Similarity.dotQSql("e.ev", "c.qe", DIM)}) AS BIGINT) AS max_dot
              |  FROM qv c CROSS JOIN e WHERE c.vec_id % 97 <> 0 GROUP BY c.vec_id)
              |SELECT vec_id, max_dot, max_dot >= 0 AS contaminated FROM d
              |ORDER BY vec_id""".stripMargin.replace("\n", " "))),

    // END of the MEDIA dedup pipeline (the q85 shape for images): banded
    // dHash near-dup pairs (q144) -> transitive closure (q81's
    // min-label propagation) -> one representative per duplicate
    // cluster, every other member marked dropped. One row per image.
    // The oracle replays decode + banding + Hamming + a recursive-CTE
    // closure.
    "q153_media_dedup_resolve" -> QueryDef(
      (s, dir) => {
        val blobs = imageBlobs(s, dir)
        val pairs = Multimodal.imageNearDupPairs(blobs, "doc_id", "blob")
        val cc = Graph.connectedComponents(pairs, "id_a", "id_b")
        // id universe from the base table, NOT blobs.select(doc_id): the
        // generator is an opaque mapPartitions, so projecting ids off it
        // would re-encode every blob a second time per pass (the oracle
        // joins `FROM documents` for the same reason)
        tbl(s, dir, "documents").select(col("doc_id"))
          .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("rep"),
            (coalesce(col("component"), col("doc_id")) === col("doc_id")).as("kept"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE ids AS (SELECT doc_id, doc_id // 5 AS gid FROM documents),
             |d0 AS (SELECT doc_id, gid, gid % 13 + 16 AS w, gid % 11 + 16 AS h,
             |  doc_id % (gid % 13 + 16) AS nx, (doc_id * 3) % (gid % 11 + 16) AS ny FROM ids),
             |g AS (SELECT doc_id, gid, nx, ny, i.r AS xi, j.r AS yj,
             |  i.r * w // 9 AS sx, j.r * h // 8 AS sy,
             |  ((gid+1)*2654435761 + (i.r * w // 9 * 29 + j.r * h // 8 * 13 + 7)*40503)
             |    // 8192 % 65536 AS bm
             |  FROM d0, range(0, 9) i(r), range(0, 8) j(r)),
             |p AS (SELECT doc_id, xi, yj,
             |  CASE WHEN sx = nx AND sy = ny
             |    THEN (bm*bm // 64 % 256 + doc_id) % 256
             |    ELSE bm*bm // 64 % 256 END AS pv FROM g),
             |bits AS (SELECT a.doc_id, a.yj, a.xi,
             |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
             |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.yj = b.yj
             |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |    AND a.doc_id < b.doc_id),
             |ham AS (SELECT c.id_a, c.id_b,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_a
             |    JOIN bands y ON y.doc_id = c.id_b AND y.yj = x.yj
             |  GROUP BY c.id_a, c.id_b),
             |pairs AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
             |e AS (SELECT id_a AS u, id_b AS v FROM pairs
             |      UNION SELECT id_b, id_a FROM pairs),
             |reach(u, v) AS (
             |  SELECT u, v FROM e
             |  UNION
             |  SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v),
             |cc AS (SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u)
             |SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS rep,
             |       coalesce(cc.component, d.doc_id) = d.doc_id AS kept
             |FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin.replace("\n", " "))),

    // URL canonicalization (the step before URL-level dedup in a crawl
    // pipeline): four messy variants per corpus — mixed-case
    // scheme/host, default ports, fragments, tracking params, unsorted
    // queries, empty paths — each normalized to its canonical form.
    // Pure per-row expression chain; twin shares the exact semantics.
    "q154_canonical_url" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id").cast("string")
        val url = when(col("doc_id") % 4 === 0,
            concat(lit("HTTPS://Example.COM:443/p"), d, lit("?b=2&utm_source=x&a=1#f")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("http://EXAMPLE.com:80?a=1&doc="), d))
          .when(col("doc_id") % 4 === 2,
            concat(lit("https://example.com/p"), d))
          .otherwise(
            concat(lit("HTTP://sub.Example.Com/p?gclid=9&z="), d, lit("&y=2#x")))
        TextOps.canonicalUrl(
            tbl(s, dir, "documents").select(col("doc_id"), url.as("url")),
            "doc_id", "url")
          .orderBy(col("doc_id"))
      },
      Some {
        val urlExpr = "CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://Example.COM:443/p' || CAST(doc_id AS VARCHAR) || '?b=2&utm_source=x&a=1#f' " +
          "WHEN doc_id % 4 = 1 THEN 'http://EXAMPLE.com:80?a=1&doc=' || CAST(doc_id AS VARCHAR) " +
          "WHEN doc_id % 4 = 2 THEN 'https://example.com/p' || CAST(doc_id AS VARCHAR) " +
          "ELSE 'HTTP://sub.Example.Com/p?gclid=9&z=' || CAST(doc_id AS VARCHAR) || '&y=2#x' END"
        s"SELECT * FROM (${TextOps.canonicalUrlSql("documents", "doc_id", urlExpr)}) q ORDER BY doc_id"
      }),

    // URL-level dedup — what the canonicalizer exists for: raw URLs that
    // differ only in case/port/tracking/query-order collapse to one
    // canonical form (here: 50 pages x 10 messy variants each), then
    // exact dedup keeps the lowest doc_id per canonical URL with the
    // copy count. Canonicalization is per-row; the only exchange is the
    // dedup hash aggregate.
    "q155_url_dedup" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id").cast("string")
        val page = (col("doc_id") % 50).cast("string")
        val url = when(col("doc_id") % 2 === 0,
            concat(lit("HTTPS://Example.COM:443/page"), page,
              lit("?utm_source=s"), d, lit("&x=1#f")))
          .otherwise(
            concat(lit("https://example.com/page"), page,
              lit("?x=1&fbclid="), d))
        Dedup.exactDedup(
            TextOps.canonicalUrl(
              tbl(s, dir, "documents").select(col("doc_id"), url.as("url")),
              "doc_id", "url"),
            "doc_id", "canon_url")
          .orderBy(col("doc_id"))
      },
      Some {
        val urlExpr = "CASE WHEN doc_id % 2 = 0 " +
          "THEN 'HTTPS://Example.COM:443/page' || CAST(doc_id % 50 AS VARCHAR) || '?utm_source=s' || CAST(doc_id AS VARCHAR) || '&x=1#f' " +
          "ELSE 'https://example.com/page' || CAST(doc_id % 50 AS VARCHAR) || '?x=1&fbclid=' || CAST(doc_id AS VARCHAR) END"
        s"""SELECT doc_id, text_hash, n_copies FROM (
           |  SELECT doc_id, md5(canon_url) AS text_hash,
           |    row_number() OVER (PARTITION BY md5(canon_url) ORDER BY doc_id) AS rn,
           |    count(*) OVER (PARTITION BY md5(canon_url)) AS n_copies
           |  FROM (${TextOps.canonicalUrlSql("documents", "doc_id", urlExpr)}) c) t
           |WHERE rn = 1 ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // Incremental AUDIO near-dup against the materialized fingerprint
    // index — the q146 steady-state probe through the shared engine's
    // audio leg: decode + fingerprint only the batch (doc_id % 7 = 0),
    // bucket-pruned band scan, Hamming verify vs stored arrays.
    "q156_audio_near_dup_indexed" -> QueryDef(
      (s, dir) => {
        Multimodal.audioNearDupAgainstIndex(
            audioBlobs(s, dir, col("doc_id") % 7 === 0),
            "doc_id", "blob", afpIndex(s, dir))
          .orderBy(col("id_new"), col("id_old"))
      },
      Some("""WITH ids AS (SELECT doc_id, doc_id // 5 AS gid,
             |  doc_id % 1152 AS kp FROM documents),
             |bm AS (SELECT doc_id, kp, s.r AS s,
             |  ((gid+1)*2654435761 + (s.r+3)*40503) // 8192 % 65536 AS b
             |  FROM ids, range(0, 72) s(r)),
             |smp AS (SELECT doc_id, s,
             |  abs(b*b // 64 % 1000 - 500
             |    + CASE WHEN s*16 + q.r = kp THEN doc_id % 300 + 1 ELSE 0 END) AS a
             |  FROM bm, range(0, 16) q(r)),
             |e AS (SELECT doc_id, s, sum(a) // 16 AS e FROM smp GROUP BY doc_id, s),
             |bits AS (SELECT a.doc_id, a.s // 9 AS yj, a.s % 9 AS xi,
             |  CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
             |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.s = a.s + 1
             |  WHERE a.s % 9 < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |  WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0),
             |ham AS (SELECT c.id_new, c.id_old,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_new
             |    JOIN bands y ON y.doc_id = c.id_old AND y.yj = x.yj
             |  GROUP BY c.id_new, c.id_old)
             |SELECT id_new, id_old, hamming FROM ham WHERE hamming <= 3
             |ORDER BY id_new, id_old""".stripMargin.replace("\n", " "))),

    // Incremental VIDEO near-dup against the materialized fingerprint
    // index — closes the steady-state symmetry across all four
    // modalities (q87 text / q146 image / q156 audio / this): decode +
    // fingerprint only the batch's clips (8 sampled frames each,
    // doc_id % 7 = 0), bucket-pruned band scan over the standing
    // corpus's index, Hamming verify vs stored arrays. Oracle replays
    // decode, frame/probe sampling, banding, the cross-split candidate
    // join, and Hamming relationally from the AVI fixture's pixel
    // formula.
    "q157_video_near_dup_indexed" -> QueryDef(
      (s, dir) => {
        Multimodal.videoNearDupAgainstIndex(
            videoBlobs(s, dir, col("doc_id") % 7 === 0),
            "doc_id", "blob", vfpIndex(s, dir))
          .orderBy(col("id_new"), col("id_old"))
      },
      Some("""WITH ids AS (SELECT doc_id, doc_id // 5 AS gid FROM documents),
             |d AS (SELECT doc_id, gid, 18 + gid % 9 AS w, 12 + gid % 7 AS h,
             |  8 + gid % 5 AS nf FROM ids),
             |d2 AS (SELECT doc_id, gid, w, h, nf, doc_id % nf AS pf,
             |  doc_id % w AS px, (doc_id * 3) % h AS py FROM d),
             |g AS (SELECT doc_id, gid, pf, px, py, i.r AS xi, j.r AS yj,
             |  j.r * nf // 8 AS sf, i.r * w // 9 AS sx, h // 2 AS sy,
             |  ((gid+1)*2654435761 +
             |   ((j.r * nf // 8)*1009 + (i.r * w // 9)*29 + (h // 2)*13 + 7)*40503)
             |    // 8192 % 65536 AS bm
             |  FROM d2, range(0, 9) i(r), range(0, 8) j(r)),
             |p AS (SELECT doc_id, xi, yj,
             |  CASE WHEN sf = pf AND sx = px AND sy = py
             |    THEN (bm*bm // 64 % 256 + doc_id) % 256
             |    ELSE bm*bm // 64 % 256 END AS pv FROM g),
             |bits AS (SELECT a.doc_id, a.yj, a.xi,
             |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
             |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.yj = b.yj
             |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |  WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0),
             |ham AS (SELECT c.id_new, c.id_old,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_new
             |    JOIN bands y ON y.doc_id = c.id_old AND y.yj = x.yj
             |  GROUP BY c.id_new, c.id_old)
             |SELECT id_new, id_old, hamming FROM ham WHERE hamming <= 3
             |ORDER BY id_new, id_old""".stripMargin.replace("\n", " "))),

    // AUDIO dedup resolution — the q153 composition over the audio leg:
    // banded energy-gradient pairs (q145) -> transitive closure ->
    // lowest-id representative per duplicate cluster, one verdict row
    // per clip. The oracle replays decode + slicing + energy + banding +
    // a recursive-CTE closure.
    "q158_audio_dedup_resolve" -> QueryDef(
      (s, dir) => {
        val blobs = audioBlobs(s, dir)
        val pairs = Multimodal.audioNearDupPairs(blobs, "doc_id", "blob")
        val cc = Graph.connectedComponents(pairs, "id_a", "id_b")
        // documents ids, not blobs.select(doc_id) — the q153 rationale
        tbl(s, dir, "documents").select(col("doc_id"))
          .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("rep"),
            (coalesce(col("component"), col("doc_id")) === col("doc_id")).as("kept"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE ids AS (SELECT doc_id, doc_id // 5 AS gid,
             |  doc_id % 1152 AS kp FROM documents),
             |bm AS (SELECT doc_id, kp, s.r AS s,
             |  ((gid+1)*2654435761 + (s.r+3)*40503) // 8192 % 65536 AS b
             |  FROM ids, range(0, 72) s(r)),
             |smp AS (SELECT doc_id, s,
             |  abs(b*b // 64 % 1000 - 500
             |    + CASE WHEN s*16 + q.r = kp THEN doc_id % 300 + 1 ELSE 0 END) AS a
             |  FROM bm, range(0, 16) q(r)),
             |e0 AS (SELECT doc_id, s, sum(a) // 16 AS e FROM smp GROUP BY doc_id, s),
             |bits AS (SELECT a.doc_id, a.s // 9 AS yj, a.s % 9 AS xi,
             |  CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
             |  FROM e0 a JOIN e0 b ON a.doc_id = b.doc_id AND b.s = a.s + 1
             |  WHERE a.s % 9 < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |    AND a.doc_id < b.doc_id),
             |ham AS (SELECT c.id_a, c.id_b,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_a
             |    JOIN bands y ON y.doc_id = c.id_b AND y.yj = x.yj
             |  GROUP BY c.id_a, c.id_b),
             |pairs AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
             |edg AS (SELECT id_a AS u, id_b AS v FROM pairs
             |      UNION SELECT id_b, id_a FROM pairs),
             |reach(u, v) AS (
             |  SELECT u, v FROM edg
             |  UNION
             |  SELECT r.u, edg.v FROM reach r JOIN edg ON edg.u = r.v),
             |cc AS (SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u)
             |SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS rep,
             |       coalesce(cc.component, d.doc_id) = d.doc_id AS kept
             |FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin.replace("\n", " "))),

    // VIDEO dedup resolution — the same composition over the video leg
    // (q149 pairs -> closure -> canonical keep); with this row every
    // modality has BOTH halves of the dedup story oracle-checked:
    // steady-state indexed probe (q87/q146/q156/q157) and full-corpus
    // resolution (q85/q153/q158/this).
    "q159_video_dedup_resolve" -> QueryDef(
      (s, dir) => {
        val blobs = videoBlobs(s, dir)
        val pairs = Multimodal.videoNearDupPairs(blobs, "doc_id", "blob")
        val cc = Graph.connectedComponents(pairs, "id_a", "id_b")
        // documents ids, not blobs.select(doc_id) — the q153 rationale
        tbl(s, dir, "documents").select(col("doc_id"))
          .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("rep"),
            (coalesce(col("component"), col("doc_id")) === col("doc_id")).as("kept"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE ids AS (SELECT doc_id, doc_id // 5 AS gid FROM documents),
             |d0 AS (SELECT doc_id, gid, 18 + gid % 9 AS w, 12 + gid % 7 AS h,
             |  8 + gid % 5 AS nf FROM ids),
             |d2 AS (SELECT doc_id, gid, w, h, nf, doc_id % nf AS pf,
             |  doc_id % w AS px, (doc_id * 3) % h AS py FROM d0),
             |g AS (SELECT doc_id, gid, pf, px, py, i.r AS xi, j.r AS yj,
             |  j.r * nf // 8 AS sf, i.r * w // 9 AS sx, h // 2 AS sy,
             |  ((gid+1)*2654435761 +
             |   ((j.r * nf // 8)*1009 + (i.r * w // 9)*29 + (h // 2)*13 + 7)*40503)
             |    // 8192 % 65536 AS bm
             |  FROM d2, range(0, 9) i(r), range(0, 8) j(r)),
             |p AS (SELECT doc_id, xi, yj,
             |  CASE WHEN sf = pf AND sx = px AND sy = py
             |    THEN (bm*bm // 64 % 256 + doc_id) % 256
             |    ELSE bm*bm // 64 % 256 END AS pv FROM g),
             |bits AS (SELECT a.doc_id, a.yj, a.xi,
             |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
             |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.yj = b.yj
             |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
             |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, yj),
             |b16 AS (SELECT doc_id, yj // 2 AS bj,
             |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
             |  GROUP BY doc_id, yj // 2),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
             |    AND a.doc_id < b.doc_id),
             |ham AS (SELECT c.id_a, c.id_b,
             |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
             |  FROM cand c JOIN bands x ON x.doc_id = c.id_a
             |    JOIN bands y ON y.doc_id = c.id_b AND y.yj = x.yj
             |  GROUP BY c.id_a, c.id_b),
             |pairs AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
             |edg AS (SELECT id_a AS u, id_b AS v FROM pairs
             |      UNION SELECT id_b, id_a FROM pairs),
             |reach(u, v) AS (
             |  SELECT u, v FROM edg
             |  UNION
             |  SELECT r.u, edg.v FROM reach r JOIN edg ON edg.u = r.v),
             |cc AS (SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u)
             |SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS rep,
             |       coalesce(cc.component, d.doc_id) = d.doc_id AS kept
             |FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin.replace("\n", " "))),

    // MULTIMODAL end-to-end composition — one table carrying BOTH a
    // media blob and an html page per doc, curated through both
    // pipelines at once: image near-dup resolve (q153's pairs→closure→
    // rep over the real-PNG fixture) ∧ text extract→exact-dedup (pages
    // planted so groups of 3 share their leader's text) → a doc is kept
    // iff it is canonical on BOTH axes → split assignment for the
    // survivors. Pins that the media and text legs compose on one
    // table: one row per doc with both reps, the composed verdict, and
    // the final split ('' for dropped docs — the log is NULL-free).
    "q161_multimodal_e2e" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
        // media leg
        val blobs = imageBlobs(s, dir)
        val mcc = Graph.connectedComponents(
          Multimodal.imageNearDupPairs(blobs, "doc_id", "blob"), "id_a", "id_b")
        // documents ids, not blobs.select(doc_id) — the q153 rationale
        val media = docs.select(col("doc_id"))
          .join(mcc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("media_rep"))
        // text leg: groups of 3 docs share their leader's page text
        val pages = docs
          .join(docs.select(col("doc_id").as("lead"), col("text").as("ltext")),
            col("doc_id") - col("doc_id") % 3 === col("lead"))
          .select(col("doc_id"),
            concat(lit("<html><body><p>"), col("ltext"),
              lit("</p></body></html>")).as("html"))
        // materialized once: the hash feeds BOTH the rep aggregate and the
        // join, and each consumer's inlined isnotnull(th) filter would
        // otherwise re-evaluate the whole 14-step regexp chain per row
        val extracted = graft.functions.Stages.mat(
          TextOps.htmlExtract(pages, "doc_id", "html")
            .select(col("doc_id"),
              md5(col("text_extracted").cast("binary")).as("th")))
        val textSide = extracted.join(
          extracted.groupBy(col("th")).agg(min(col("doc_id")).as("text_rep")), "th")
        val composed = media.join(
            textSide.select(col("doc_id"), col("text_rep")), Seq("doc_id"))
          .withColumn("kept",
            col("media_rep") === col("doc_id") && col("text_rep") === col("doc_id"))
        TextOps.splitAssign(composed, "doc_id")
          .select(col("doc_id"), col("media_rep"), col("text_rep"), col("kept"),
            when(col("kept"), col("split")).otherwise(lit("")).as("split"))
          .orderBy(col("doc_id"))
      },
      Some {
        val extractSql = TextOps.htmlExtractExprSql(
          "'<html><body><p>' || l.text || '</p></body></html>'")
        s"""WITH RECURSIVE ids AS (SELECT doc_id, doc_id // 5 AS gid FROM documents),
           |d0 AS (SELECT doc_id, gid, gid % 13 + 16 AS w, gid % 11 + 16 AS h,
           |  doc_id % (gid % 13 + 16) AS nx, (doc_id * 3) % (gid % 11 + 16) AS ny FROM ids),
           |g AS (SELECT doc_id, gid, nx, ny, i.r AS xi, j.r AS yj,
           |  i.r * w // 9 AS sx, j.r * h // 8 AS sy,
           |  ((gid+1)*2654435761 + (i.r * w // 9 * 29 + j.r * h // 8 * 13 + 7)*40503)
           |    // 8192 % 65536 AS bm
           |  FROM d0, range(0, 9) i(r), range(0, 8) j(r)),
           |p AS (SELECT doc_id, xi, yj,
           |  CASE WHEN sx = nx AND sy = ny
           |    THEN (bm*bm // 64 % 256 + doc_id) % 256
           |    ELSE bm*bm // 64 % 256 END AS pv FROM g),
           |bits AS (SELECT a.doc_id, a.yj, a.xi,
           |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
           |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.yj = b.yj
           |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
           |bands AS (SELECT doc_id, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
           |  FROM bits GROUP BY doc_id, yj),
           |b16 AS (SELECT doc_id, yj // 2 AS bj,
           |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
           |  GROUP BY doc_id, yj // 2),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
           |    AND a.doc_id < b.doc_id),
           |ham AS (SELECT c.id_a, c.id_b,
           |  CAST(sum(bit_count(xor(x.bv, y.bv))) AS BIGINT) AS hamming
           |  FROM cand c JOIN bands x ON x.doc_id = c.id_a
           |    JOIN bands y ON y.doc_id = c.id_b AND y.yj = x.yj
           |  GROUP BY c.id_a, c.id_b),
           |prs AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |edg AS (SELECT id_a AS u, id_b AS v FROM prs
           |      UNION SELECT id_b, id_a FROM prs),
           |reach(u, v) AS (
           |  SELECT u, v FROM edg
           |  UNION
           |  SELECT r.u, edg.v FROM reach r JOIN edg ON edg.u = r.v),
           |cc AS (SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u),
           |tx AS (SELECT d.doc_id, $extractSql AS xt
           |  FROM documents d JOIN documents l ON l.doc_id = d.doc_id - d.doc_id % 3),
           |tr AS (SELECT doc_id,
           |  min(doc_id) OVER (PARTITION BY md5(xt)) AS text_rep FROM tx),
           |v AS (SELECT d.doc_id,
           |  coalesce(cc.component, d.doc_id) AS media_rep, tr.text_rep,
           |  (coalesce(cc.component, d.doc_id) = d.doc_id
           |    AND tr.text_rep = d.doc_id) AS kept
           |  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
           |  JOIN tr ON tr.doc_id = d.doc_id)
           |SELECT doc_id, media_rep, text_rep, kept,
           |  CASE WHEN kept THEN ${TextOps.splitAssignSql("doc_id")} ELSE '' END AS split
           |FROM v ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    // EXACT substring-duplication spans (Lee et al. 2022's suffix-array
    // dedup surface, window-granular): rolling 8-token window hashes →
    // windows appearing in ≥2 distinct docs → per-doc gaps-and-islands
    // merge into MAXIMAL duplicated spans. Fixture: docs with
    // doc_id%4==0 re-enter whole at +10000, so clone/original pairs
    // carry full-length spans, while any naturally repeated 8-grams
    // across the corpus surface as partial spans — both engines hash
    // the same fold and merge identically.
    "q162_substring_dup_spans" -> QueryDef(
      (s, dir) => {
        val base = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
        val input = base.unionByName(
          base.where(col("doc_id") % 4 === 0)
            .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text")))
        TextOps.duplicatedSpans(input, "doc_id", "text")
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some {
        val inner = TextOps.duplicatedSpansSql(
          "(SELECT doc_id, text FROM documents UNION ALL " +
            "SELECT doc_id + 10000, text FROM documents WHERE doc_id % 4 = 0) u",
          "doc_id", "text")
        s"SELECT * FROM ($inner) q ORDER BY doc_id, span_start"
      }),

    // The REMOVAL half of q162 (what Lee et al. 2022 apply): every
    // duplicated window survives only in the LOWEST-id doc containing
    // it; other docs get the covering spans CUT and the survivors
    // rebuilt in order. On the q162 fixture the +10000 clones scrub to
    // "" while their originals keep full text; natural cross-doc
    // repeats cut from the higher-id member only.
    "q163_substring_dup_scrub" -> QueryDef(
      (s, dir) => {
        val base = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
        val input = base.unionByName(
          base.where(col("doc_id") % 4 === 0)
            .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text")))
        TextOps.scrubDuplicatedSpans(input, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some {
        val inner = TextOps.scrubDuplicatedSpansSql(
          "(SELECT doc_id, text FROM documents UNION ALL " +
            "SELECT doc_id + 10000, text FROM documents WHERE doc_id % 4 = 0) u",
          "doc_id", "text")
        s"SELECT * FROM ($inner) q ORDER BY doc_id"
      }),

    // SPAN-COVERAGE report (Reports.spanCoverageReport) — the q166
    // summary surface for span-granular scrubs: per SOURCE of the base
    // document (re-entries map back through id % 10000), duplicated
    // spans, windows, and the token/byte coverage a q163-style scrub
    // would remove. One groupBy over q162's span output.
    "q167_span_coverage_report" -> QueryDef(
      (s, dir) => {
        val base = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
        val input = base.unionByName(
          base.where(col("doc_id") % 4 === 0)
            .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text")))
        val spans = TextOps.duplicatedSpans(input, "doc_id", "text")
        val src = tbl(s, dir, "documents")
          .select(col("doc_id").as("base_id"), col("source"))
        graft.functions.Reports.spanCoverageReport(
            spans.join(src, spans("doc_id") % 10000 === src("base_id"))
              .select(col("source"), col("n_windows"), col("span_start"),
                col("span_end"), col("byte_start"), col("byte_end")),
            Seq("source"))
          .orderBy(col("source"))
      },
      Some {
        val inner = TextOps.duplicatedSpansSql(
          "(SELECT doc_id, text FROM documents UNION ALL " +
            "SELECT doc_id + 10000, text FROM documents WHERE doc_id % 4 = 0) u",
          "doc_id", "text")
        s"""SELECT d.source, CAST(count(*) AS BIGINT) AS n_spans,
           |CAST(sum(q.n_windows) AS BIGINT) AS n_windows,
           |CAST(sum(q.span_end - q.span_start) AS BIGINT) AS tokens_covered,
           |CAST(sum(q.byte_end - q.byte_start) AS BIGINT) AS bytes_covered
           |FROM ($inner) q JOIN documents d ON d.doc_id = q.doc_id % 10000
           |GROUP BY d.source ORDER BY d.source""".stripMargin.replace("\n", " ")
      }),

    // Incremental substring-dup spans against the materialized
    // WINDOW-HASH SPAN INDEX — the q87/q146 steady-state discipline for
    // the q162 family: only the batch (doc_id % 7 == 0 of the q162
    // universe) is tokenized + window-hashed; the standing corpus
    // enters as a bucket-pruned scan of the (wh, wmin, df) model. A
    // batch window is duplicated when standing + intra-batch df
    // reaches 2.
    "q168_span_dup_indexed" -> QueryDef(
      (s, dir) => {
        TextOps.duplicatedSpansAgainstIndex(
            spanUniverse(s, dir).where(col("doc_id") % 7 === 0),
            "doc_id", "text", spanIdx(s, dir))
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some {
        val inner = TextOps.duplicatedSpansAgainstSql(
          SpanUniverseSql, "doc_id", "text", "doc_id % 7 = 0")
        s"SELECT * FROM ($inner) q ORDER BY doc_id, span_start"
      }),

    // Incremental substring-dup SCRUB against the span index —
    // first-arrival-wins at steady state: a batch window is cut iff its
    // canonical holder (min of the index's wmin and the lowest batch id
    // holding it) is a lower id, so the canonical copy survives exactly
    // once corpus-wide and a replayed batch reproduces identical output
    // (its own standing rows carry wmin = its id, never < id).
    "q169_span_scrub_indexed" -> QueryDef(
      (s, dir) => {
        TextOps.scrubSpansAgainstIndex(
            spanUniverse(s, dir).where(col("doc_id") % 7 === 0),
            "doc_id", "text", spanIdx(s, dir))
          .orderBy(col("doc_id"))
      },
      Some {
        val inner = TextOps.scrubSpansAgainstSql(
          SpanUniverseSql, "doc_id", "text", "doc_id % 7 = 0")
        s"SELECT * FROM ($inner) q ORDER BY doc_id"
      })
  )
}
