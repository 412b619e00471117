package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{Dedup, Multimodal, Similarity, TextOps}
import graft.streaming.{StreamOps, StreamingDedup, StreamingMediaIngest, StreamingRawIngest, StreamingSpanIngest, StreamingVectors}

/** Oracle-checked rows for the STREAMING jobs: a deterministic
  * `availableNow` drain's verdict log is plain parquet, so a batch SQL
  * twin (the q86/q87 and q89/q90 shapes the jobs reuse per micro-batch)
  * hash-matches it row for row — the write-path batteries the reference
  * covers with its int_test suites
  * (/root/reference/spdb/spatialdb/test/int_test_spatialdb.py:39-315),
  * expressed as CORRECTNESS rows instead of spec-only trust.
  *
  * Determinism contract: each micro-batch is ONE drain of ONE new file
  * (write file → drain → write next file → drain), so batch ids and the
  * index state each batch probes are structural, not timestamp-races.
  * The drained state is built once per testdata dir and cached — verify
  * and bench passes re-read the standing verdict log, matching the
  * sigIndex/ivfIndex standing-state rationale in [[Pipeline]].
  */
object Streaming {
  import QueryDef.tbl

  private val DIM = 64 // embeddings.embedding length

  /** Streamed-dedup verdict log: standing corpus = doc_id%5==0 (seeds the
    * signature index), then three micro-batches doc_id%5==1,2,3 drained
    * in order — batch b probes standing + batches < b, plus itself.
    */
  private val dedupCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def dedupVerdicts(s: SparkSession, dir: String): String =
    dedupCache.computeIfAbsent(dir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-sdd").toString
      val docs = tbl(s, dir, "documents")
      Dedup.writeSignatureIndex(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text", s"$base/idx")
      (1 to 3).foreach { m =>
        docs.where(col("doc_id") % 5 === m)
          .coalesce(1).write.mode("append").parquet(s"$base/docs")
        StreamingDedup.runAvailableNow(
          s, s"$base/docs", s"$base/idx", s"$base/verdicts", s"$base/ckpt")
      }
      s"$base/verdicts"
    })

  /** Streamed-ANN verdict log: standing corpus = vec_id%13!=0 (builds the
    * IVF index), two micro-batches vec_id%26==0 then %26==13, each probed
    * before its append grows the index.
    */
  private val vecCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def vecVerdicts(s: SparkSession, dir: String): String =
    vecCache.computeIfAbsent(dir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-svc").toString
      val emb = tbl(s, dir, "embeddings")
      Similarity.writeIvfIndex(
        emb.where(col("vec_id") % 13 =!= 0), "vec_id", "embedding", s"$base/idx")
      Seq(col("vec_id") % 26 === 0, col("vec_id") % 26 === 13).foreach { pred =>
        emb.where(pred).coalesce(1).write.mode("append").parquet(s"$base/vecs")
        StreamingVectors.runAvailableNow(
          s, s"$base/vecs", s"$base/idx", s"$base/verdicts", s"$base/ckpt", dim = DIM)
      }
      s"$base/verdicts"
    })

  /** The q134 duplicate-planting rule: every doc carries its LEADER's
    * original text. Even 16-id blocks group by same-residue stripes
    * (leader = block·16 + doc_id%4 → all four copies land in ONE drain
    * slot: intra-batch keep-lowest executes, residue-0 stripes are
    * standing-only), odd blocks group consecutive triples (leader =
    * doc_id − doc_id%3 → triples straddle drain slots: standing dups
    * when the triple touches residue 0, first-batch keeper + LATER-batch
    * dups through the grown index when it doesn't). One expression both
    * engines evaluate identically on nonnegative ids.
    */
  private val LeaderSql =
    """CASE WHEN (doc_id // 16) % 2 = 0 THEN (doc_id // 16) * 16 + doc_id % 4
      |     ELSE doc_id - doc_id % 3 END""".stripMargin.replace("\n", " ")

  /** Streamed raw-ingest verdict log: standing corpus = residue 0 mod 4
    * (seeds the hash index); residues 1..3 serialized to JSONL (with
    * [[LeaderSql]] texts) and drained one file per micro-batch through
    * [[StreamingRawIngest]].
    */
  private val rawIngestCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def rawIngestVerdicts(s: SparkSession, dir: String): String =
    rawIngestCache.computeIfAbsent(dir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-sri").toString
      val docs = tbl(s, dir, "documents")
      val leadered = docs
        .select(col("doc_id"), col("lang"), col("source"),
          expr(LeaderSql.replace("//", "div")).as("leader"))
        .join(docs.select(col("doc_id").as("leader"), col("text")), Seq("leader"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          length(col("text")).cast("long").as("n_chars"))
      Dedup.writeHashIndex(
        leadered.where(col("doc_id") % 4 === 0), "doc_id", "text", s"$base/idx")
      (1 to 3).foreach { m =>
        leadered.where(col("doc_id") % 4 === m)
          .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars"))).as("value"))
          .coalesce(1).write.mode("append").text(s"$base/raw")
        StreamingRawIngest.runAvailableNow(
          s, s"$base/raw", s"$base/idx", s"$base/curated",
          s"$base/verdicts", s"$base/quar", s"$base/ckpt")
      }
      s"$base/verdicts"
    })

  /** Streamed SPAN-scrub verdict log: standing corpus = residue 0 mod 4
    * (seeds the window-hash span index); residues 1..3 serialized to
    * JSONL (with [[LeaderSql]] texts — planted whole-doc repeats across
    * residues, so cross-batch, intra-batch and standing-corpus cut
    * rules all execute) and drained one file per micro-batch through
    * [[StreamingSpanIngest]]. */
  private val spanIngestCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def spanIngestVerdicts(s: SparkSession, dir: String): String =
    spanIngestCache.computeIfAbsent(dir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-ssi").toString
      val docs = tbl(s, dir, "documents")
      val leadered = docs
        .select(col("doc_id"), col("lang"), col("source"),
          expr(LeaderSql.replace("//", "div")).as("leader"))
        .join(docs.select(col("doc_id").as("leader"), col("text")), Seq("leader"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          length(col("text")).cast("long").as("n_chars"))
      graft.functions.TextOps.writeSpanIndex(
        leadered.where(col("doc_id") % 4 === 0), "doc_id", "text", s"$base/idx")
      (1 to 3).foreach { m =>
        leadered.where(col("doc_id") % 4 === m)
          .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars"))).as("value"))
          .coalesce(1).write.mode("append").text(s"$base/raw")
        StreamingSpanIngest.runAvailableNow(
          s, s"$base/raw", s"$base/idx", s"$base/curated",
          s"$base/verdicts", s"$base/quar", s"$base/ckpt")
      }
      s"$base/verdicts"
    })

  /** One dedup-oracle branch pair: batch m's cross-probe (vs standing +
    * earlier batches, the q86 SQL with an explicit old-side predicate)
    * UNION its intra-batch pairs (the q32 SQL restricted to the batch).
    */
  private def dedupBatchSql(m: Int): String = {
    val b = m - 1 // micro-batch id: residue m drained as batch m-1
    val cross = Dedup.nearDupAgainstSql(
      "documents", "doc_id", "text",
      newPred = s"doc_id % 5 = $m", oldPred = Some(s"doc_id % 5 <= $b"))
    val intra = Dedup.nearDupPairsSql(
      s"(SELECT * FROM documents WHERE doc_id % 5 = $m) tb$m", "doc_id", "text")
    s"""SELECT CAST($b AS BIGINT) AS batch_id, doc_new, doc_old, FALSE AS intra, is_dup FROM ($cross) c$b
       |UNION ALL SELECT CAST($b AS BIGINT), doc_a, doc_b, TRUE, is_dup FROM ($intra) p$b""".stripMargin
  }

  /** The events table as an availableNow FILE-STREAM source with `ts` as
    * a true timestamp (watermarks need event-time columns; the ns-long
    * form converts exactly — ts is µs-precision at every SF).
    */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = QueryDef.tbl(s, dir, "events").schema
    QueryDef.normalizeTs(
      s.readStream.schema(schema).option("pathGlobFilter", "events.parquet").parquet(dir))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * lit(100)).cast("long")

  /** Streamed MEDIA-ingest verdict log (the q134 drill for binary
    * blobs), ALL THREE modalities through one gate:
    *
    *  - IMAGE: groups of 3 consecutive doc_ids share one base image
    *    (gid = doc_id/3, middle-square pixels, per-doc single-pixel
    *    perturbation at row y=1 — NEVER sampled by the dHash grid for
    *    any h ≥ 16, so group members are fingerprint-identical while
    *    their PNG bytes all differ);
    *  - AUDIO: the q156 fixture's wave per doc (groups of 5 share a
    *    72-slice middle-square wave, gid = doc_id/5, one perturbed
    *    sample whose energy shift the oracle replays exactly);
    *  - VIDEO: the q157 fixture's clip per doc (groups of 5, one
    *    perturbed pixel of one frame, pure-integer sampling geometry).
    *
    * Standing corpus = doc_id%5==0 (seeds each modality's fingerprint
    * index); residues 1..3 are drained as three micro-batches of real
    * PNG + WAV + AVI files named `<id>.<ext>`; docs with doc_id%3==0
    * additionally re-enter at id+10000 in their batch slot (planted
    * near-dups that exercise intra-batch and cross-batch resolution in
    * EVERY modality — ids collide across modalities only in the file
    * stem; the gate's verdicts and indexes are per-modality).
    * Residue-4 docs sit out, so some groups have NO standing member and
    * their first-arriving batch doc is kept. Junk and no-id files ride
    * along in drain 1 (quarantined, never in the log). q160/q164/q165
    * each replay one modality's verdict log relationally; q166
    * aggregates all of them.
    */
  private val mediaIngestCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def mediaIngestVerdicts(s: SparkSession, dir: String): String =
    mediaIngestCache.computeIfAbsent(dir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-smi").toString
      val raw = s"$base/raw"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(raw))
      def blob(id: Long, gid: Long): Array[Byte] = {
        val w = (gid % 13 + 16).toInt
        val h = (gid % 11 + 16).toInt
        val nx = (id % w).toInt
        Multimodal.encodeGrayPng(w, h, (x, y) => {
          val b = ((gid + 1L) * 2654435761L +
            (x * 29L + y * 13L + 7L) * 40503L) / 8192L % 65536L
          val base0 = (b * b / 64L % 256L).toInt
          if (x == nx && y == 1) ((base0 + id) % 256).toInt else base0
        })
      }
      def audioBlob(id: Long, gid: Long): Array[Byte] = {
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
        Multimodal.encodeWavPcm16(8000, samples)
      }
      def videoBlob(id: Long, gid: Long): Array[Byte] = {
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
            val base0 = (b * b / 64L % 256L).toInt
            val v = if (f == pf && x == px && y == py)
              ((base0 + id) % 256).toInt else base0
            v.toByte
          }
        }
        Multimodal.encodeAviDib(w, h, frames)
      }
      // fixture BUILD collects the sf-scale id list on the driver
      // (bounded by the fixture, not an ingest path — production drains
      // files that already exist; the warcFixture rationale)
      val ids = tbl(s, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      import s.implicits._
      val standing = ids.filter(_ % 5 == 0)
      Multimodal.writeImageFingerprintIndex(
        standing.map(id => (id, blob(id, id / 3))).toSeq.toDF("doc_id", "blob"),
        "doc_id", "blob", s"$base/idx/image")
      Multimodal.writeAudioFingerprintIndex(
        standing.map(id => (id, audioBlob(id, id / 5))).toSeq.toDF("doc_id", "blob"),
        "doc_id", "blob", s"$base/idx/audio")
      Multimodal.writeVideoFingerprintIndex(
        standing.map(id => (id, videoBlob(id, id / 5))).toSeq.toDF("doc_id", "blob"),
        "doc_id", "blob", s"$base/idx/video")
      java.nio.file.Files.write(java.nio.file.Paths.get(raw, "junk.bin"),
        "no digits here".getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get(raw, "99990001.png"),
        "not-a-png".getBytes("UTF-8"))
      (1 to 3).foreach { m =>
        ids.filter(_ % 5 == m).foreach { id =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(raw, s"$id.png"), blob(id, id / 3))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(raw, s"$id.wav"), audioBlob(id, id / 5))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(raw, s"$id.avi"), videoBlob(id, id / 5))
        }
        ids.filter(id => id % 3 == 0 && id % 5 == m).foreach { id =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(raw, s"${id + 10000}.png"),
            blob(id + 10000, id / 3))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(raw, s"${id + 10000}.wav"),
            audioBlob(id + 10000, id / 5))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(raw, s"${id + 10000}.avi"),
            videoBlob(id + 10000, id / 5))
        }
        StreamingMediaIngest.runAvailableNow(
          s, raw, s"$base/idx", s"$base/verdicts", s"$base/quar", s"$base/ckpt")
      }
      s"$base/verdicts"
    })

  /** DuckDB replay of the streamed media gate for ONE modality: the
    * fixture's membership/batches CTE (standing = bo −1, drains 0..2,
    * +10000 re-entries in their batch slot) feeds the modality's
    * band-math SQL (the q160/q156/q157 formulas over the SAME blob
    * parameters the fixture wrote), then the gate's candidate
    * restriction — lower ids only, batches ≤ own — Hamming ≤ 3 verify,
    * and min-id-wins. Shared by q160/q164/q165 and aggregated by q166.
    */
  private def mediaVerdictSql(modality: String): String = {
    val g = if (modality == "image") 3 else 5
    val mem =
      s"""mem AS (
         |  SELECT doc_id AS id, doc_id // $g AS gid,
         |         CAST(doc_id % 5 AS BIGINT) - 1 AS bo
         |  FROM documents WHERE doc_id % 5 <> 4
         |  UNION ALL
         |  SELECT doc_id + 10000, doc_id // $g, CAST(doc_id % 5 AS BIGINT) - 1
         |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 5 BETWEEN 1 AND 3)""".stripMargin
    val bands = modality match {
      case "image" =>
        """d AS (SELECT id, gid, bo, gid % 13 + 16 AS w, gid % 11 + 16 AS h FROM mem),
          |g AS (SELECT id, bo, i.r AS xi, j.r AS yj,
          |  ((gid+1)*2654435761 + ((i.r * w // 9) * 29 + (j.r * h // 8) * 13 + 7)*40503)
          |    // 8192 % 65536 AS bm
          |  FROM d, range(0, 9) i(r), range(0, 8) j(r)),
          |p AS (SELECT id, bo, xi, yj, bm*bm // 64 % 256 AS pv FROM g),
          |bits AS (SELECT a.id, a.bo, a.yj, a.xi,
          |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
          |  FROM p a JOIN p b ON a.id = b.id AND a.yj = b.yj
          |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
          |bands AS (SELECT id, bo, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
          |  FROM bits GROUP BY id, bo, yj)""".stripMargin
      case "audio" =>
        """d AS (SELECT id, gid, bo, id % 1152 AS kp FROM mem),
          |bm AS (SELECT id, bo, kp, s.r AS s,
          |  ((gid+1)*2654435761 + (s.r+3)*40503) // 8192 % 65536 AS b
          |  FROM d, range(0, 72) s(r)),
          |smp AS (SELECT id, bo, s,
          |  abs(b*b // 64 % 1000 - 500
          |    + CASE WHEN s*16 + q.r = kp THEN id % 300 + 1 ELSE 0 END) AS a
          |  FROM bm, range(0, 16) q(r)),
          |e AS (SELECT id, bo, s, sum(a) // 16 AS e FROM smp GROUP BY id, bo, s),
          |bits AS (SELECT a.id, a.bo, a.s // 9 AS yj, a.s % 9 AS xi,
          |  CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
          |  FROM e a JOIN e b ON a.id = b.id AND b.s = a.s + 1
          |  WHERE a.s % 9 < 8),
          |bands AS (SELECT id, bo, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
          |  FROM bits GROUP BY id, bo, yj)""".stripMargin
      case "video" =>
        """d0 AS (SELECT id, gid, bo, 18 + gid % 9 AS w, 12 + gid % 7 AS h,
          |  8 + gid % 5 AS nf FROM mem),
          |d2 AS (SELECT id, gid, bo, w, h, nf, id % nf AS pf,
          |  id % w AS px, (id * 3) % h AS py FROM d0),
          |g AS (SELECT id, bo, pf, px, py, i.r AS xi, j.r AS yj,
          |  j.r * nf // 8 AS sf, i.r * w // 9 AS sx, h // 2 AS sy,
          |  ((gid+1)*2654435761 +
          |   ((j.r * nf // 8)*1009 + (i.r * w // 9)*29 + (h // 2)*13 + 7)*40503)
          |    // 8192 % 65536 AS bm
          |  FROM d2, range(0, 9) i(r), range(0, 8) j(r)),
          |p AS (SELECT id, bo, xi, yj,
          |  CASE WHEN sf = pf AND sx = px AND sy = py
          |    THEN (bm*bm // 64 % 256 + id) % 256
          |    ELSE bm*bm // 64 % 256 END AS pv FROM g),
          |bits AS (SELECT a.id, a.bo, a.yj, a.xi,
          |  CASE WHEN b.pv > a.pv THEN 1 ELSE 0 END AS bit
          |  FROM p a JOIN p b ON a.id = b.id AND a.yj = b.yj
          |    AND b.xi = a.xi + 1 WHERE a.xi < 8),
          |bands AS (SELECT id, bo, yj, CAST(sum(bit << xi) AS BIGINT) AS bv
          |  FROM bits GROUP BY id, bo, yj)""".stripMargin
    }
    s"""WITH $mem,
       |$bands,
       |b16 AS (SELECT id, bo, yj // 2 AS bj,
       |  CAST(sum(bv << (8 * (yj % 2))) AS BIGINT) AS bv FROM bands
       |  GROUP BY id, bo, yj // 2),
       |cand AS (SELECT DISTINCT a.id AS id_new, b.id AS id_old
       |  FROM b16 a JOIN b16 b ON a.bj = b.bj AND a.bv = b.bv
       |  WHERE a.bo >= 0 AND b.id < a.id AND b.bo <= a.bo),
       |ham AS (SELECT c.id_new, c.id_old
       |  FROM cand c JOIN bands x ON x.id = c.id_new
       |    JOIN bands y ON y.id = c.id_old AND y.yj = x.yj
       |  GROUP BY c.id_new, c.id_old
       |  HAVING sum(bit_count(xor(x.bv, y.bv))) <= 3),
       |rep AS (SELECT id_new AS id, min(id_old) AS m FROM ham GROUP BY id_new)
       |SELECT mem.bo AS batch_id, mem.id, '$modality' AS modality,
       |       coalesce(rep.m, mem.id) AS rep, rep.m IS NULL AS kept
       |FROM mem LEFT JOIN rep USING (id) WHERE mem.bo >= 0""".stripMargin
      .replace("\n", " ")
  }

  val defs: Map[String, QueryDef] = Map(

    // The streaming document-dedup job's verdict log, hash-matched by its
    // batch twin: per drained micro-batch, index-probe verdicts against
    // everything already in the signature index plus intra-batch pairs.
    "q118_stream_dedup" -> QueryDef(
      (s, dir) =>
        s.read.parquet(dedupVerdicts(s, dir))
          .select(col("batch_id").cast("long").as("batch_id"), col("doc_new"),
            col("doc_old"), col("intra"), col("is_dup"))
          .orderBy(col("batch_id"), col("doc_new"), col("doc_old"), col("intra")),
      Some {
        val branches = (1 to 3).map(dedupBatchSql).mkString(" UNION ALL ")
        s"""SELECT batch_id, doc_new, doc_old, intra, is_dup FROM ($branches) u
           |ORDER BY batch_id, doc_new, doc_old, intra""".stripMargin.replace("\n", " ")
      }),

    // The streaming embedding-ingest job's verdict log: per micro-batch,
    // IVF top-k of each batch vector against the index it probed
    // (standing corpus + earlier batches, never its own rows) — the
    // det-Lloyd oracle with the corpus restricted per batch.
    "q119_stream_vectors" -> QueryDef(
      (s, dir) =>
        s.read.parquet(vecVerdicts(s, dir))
          .select(col("batch_id").cast("long").as("batch_id"), col("query_id"),
            col("vec_id"), col("cell"), col("dot"), col("rk"))
          .orderBy(col("batch_id"), col("query_id"), col("rk")),
      Some {
        val train = "vec_id % 13 <> 0"
        val b0 = Similarity.ivfTopKDetSql("embeddings", "vec_id", "embedding",
          queryPredSql = "vec_id % 26 = 0", k = 5, dim = DIM,
          trainWhereSql = train, corpusWhereSql = train)
        val b1 = Similarity.ivfTopKDetSql("embeddings", "vec_id", "embedding",
          queryPredSql = "vec_id % 26 = 13", k = 5, dim = DIM,
          trainWhereSql = train, corpusWhereSql = s"($train) OR vec_id % 26 = 0")
        s"""SELECT * FROM (
           |SELECT CAST(0 AS BIGINT) AS batch_id, query_id, vec_id, cell, dot, rk FROM ($b0) v0
           |UNION ALL SELECT CAST(1 AS BIGINT), query_id, vec_id, cell, dot, rk FROM ($b1) v1) u
           |ORDER BY batch_id, query_id, rk""".stripMargin.replace("\n", " ")
      }),

    // The streaming RAW-CORPUS ingest front door, end to end: JSONL
    // files drain through parse → exact-dedup gate (persistent hash
    // index, bucket-pruned probe) → verdict log → curated append, one
    // micro-batch per file. The fixture plants real duplicates (every
    // doc carries its [[LeaderSql]] leader's text), mixed so ALL keep
    // rules execute: standing-corpus dups, intra-batch keep-lowest, and
    // cross-batch dups resolved through the index grown by earlier
    // drains. The oracle recomputes first-arrival-wins dedup
    // relationally: a hash's representative is the lowest doc_id in the
    // EARLIEST residue (drain order) containing it.
    "q134_stream_raw_ingest" -> QueryDef(
      (s, dir) =>
        s.read.parquet(rawIngestVerdicts(s, dir))
          .select(col("batch_id").cast("long").as("batch_id"), col("doc_id"),
            col("text_hash"), col("rep"), col("kept"))
          .orderBy(col("batch_id"), col("doc_id")),
      Some(s"""WITH v AS (
             |  SELECT d.doc_id, md5(l.text) AS text_hash, d.doc_id % 4 AS r
             |  FROM documents d JOIN documents l
             |  ON l.doc_id = (${LeaderSql.replace("doc_id", "d.doc_id")})),
             |f AS (SELECT text_hash, min(r) AS r0 FROM v GROUP BY text_hash),
             |rep AS (SELECT v.text_hash, min(v.doc_id) AS rep
             |        FROM v JOIN f ON v.text_hash = f.text_hash AND v.r = f.r0
             |        GROUP BY v.text_hash)
             |SELECT CAST(v.r - 1 AS BIGINT) AS batch_id, v.doc_id, v.text_hash,
             |       rep.rep AS rep, (v.doc_id = rep.rep) AS kept
             |FROM v JOIN f USING (text_hash) JOIN rep USING (text_hash)
             |WHERE v.r >= 1
             |ORDER BY batch_id, doc_id""".stripMargin.replace("\n", " "))),

    // Streamed MEDIA ingest verdict log: binaryFile micro-batches →
    // magic-sniff → REAL PNG decode + dHash → bucket-pruned probe of the
    // standing per-modality fingerprint index → min-id-wins verdicts →
    // index growth (ALL fingerprints, so verdicts are a non-recursive
    // function of ids-seen-so-far — see StreamingMediaIngest). The
    // oracle replays the whole chain relationally: per-doc bands from
    // the fixture's base-pixel formula (perturbations are off-sample by
    // construction), the banded candidate join restricted to lower ids
    // in batches <= own, Hamming <= 3 verify, min match as rep.
    "q160_stream_media_ingest" -> QueryDef(
      (s, dir) =>
        s.read.parquet(mediaIngestVerdicts(s, dir))
          .where(col("modality") === "image")
          .select(col("batch_id").cast("long").as("batch_id"), col("id"),
            col("modality"), col("rep"), col("kept"))
          .orderBy(col("batch_id"), col("id")),
      Some(s"SELECT * FROM (${mediaVerdictSql("image")}) v ORDER BY batch_id, id")),

    // The AUDIO leg of the streamed media gate, oracle-checked end to
    // end: the SAME drains as q160 carry real WAV files through magic-
    // sniff → PCM decode → energy-gradient fingerprint → bucket-pruned
    // probe of the standing audio index → min-id-wins verdicts. The
    // oracle replays the q156 band math over the fixture's wave formula
    // (perturbation energies included — the replay is exact, not
    // perturbation-blind), restricted to lower ids in batches ≤ own.
    "q164_stream_media_ingest_audio" -> QueryDef(
      (s, dir) =>
        s.read.parquet(mediaIngestVerdicts(s, dir))
          .where(col("modality") === "audio")
          .select(col("batch_id").cast("long").as("batch_id"), col("id"),
            col("modality"), col("rep"), col("kept"))
          .orderBy(col("batch_id"), col("id")),
      Some(s"SELECT * FROM (${mediaVerdictSql("audio")}) v ORDER BY batch_id, id")),

    // The VIDEO leg — with this row the streaming media gate is oracle-
    // checked for EVERY modality it routes (image q160 / audio q164 /
    // video here): real AVI containers decode frame-sampled fingerprints
    // per drain, and the q157 band math replays them relationally.
    "q165_stream_media_ingest_video" -> QueryDef(
      (s, dir) =>
        s.read.parquet(mediaIngestVerdicts(s, dir))
          .where(col("modality") === "video")
          .select(col("batch_id").cast("long").as("batch_id"), col("id"),
            col("modality"), col("rep"), col("kept"))
          .orderBy(col("batch_id"), col("id")),
      Some(s"SELECT * FROM (${mediaVerdictSql("video")}) v ORDER BY batch_id, id")),

    // CURATION REPORT over the ingest gates' verdict logs — the
    // first-class summary surface (Reports.curationReport): per
    // log/group/batch, docs seen/kept/dropped, integer-exact drop rate
    // in basis points, and bytes ingested/removed where the log has
    // payload sizes (the raw-text log, through its leader-text byte
    // lengths; media logs carry fingerprint verdicts, bytes 0). One
    // map-side-combined groupBy over logs q134/q160/q164/q165 already
    // pin — the oracle recomputes the verdicts relationally and
    // aggregates the same way.
    "q166_curation_report" -> QueryDef(
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val leaderBytes = docs
          .select(col("doc_id"), expr(LeaderSql.replace("//", "div")).as("leader"))
          .join(docs.select(col("doc_id").as("leader"),
            octet_length(col("text")).cast("long").as("n_bytes")), Seq("leader"))
          .select(col("doc_id"), col("n_bytes"))
        val raw = s.read.parquet(rawIngestVerdicts(s, dir))
          .join(leaderBytes, Seq("doc_id"))
          .select(lit("raw").as("log"), lit("text").as("grp"),
            col("batch_id").cast("long").as("batch_id"), col("kept"),
            col("n_bytes"))
        val media = s.read.parquet(mediaIngestVerdicts(s, dir))
          .select(lit("media").as("log"), col("modality").as("grp"),
            col("batch_id").cast("long").as("batch_id"), col("kept"))
        graft.functions.Reports
          .curationReport(raw, "kept", Seq("log", "grp", "batch_id"), Some("n_bytes"))
          .unionByName(graft.functions.Reports
            .curationReport(media, "kept", Seq("log", "grp", "batch_id")))
          .orderBy(col("log"), col("grp"), col("batch_id"))
      },
      Some {
        val lead = LeaderSql.replace("doc_id", "d.doc_id")
        val mediaLegs = Seq("image", "audio", "video").map { m =>
          s"""SELECT 'media' AS log, modality AS grp, batch_id,
             |CAST(count(*) AS BIGINT) AS n_docs,
             |CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
             |CAST(0 AS BIGINT) AS bytes_total,
             |CAST(0 AS BIGINT) AS bytes_removed
             |FROM (${mediaVerdictSql(m)}) v$m
             |GROUP BY modality, batch_id""".stripMargin
        }.mkString(" UNION ALL ")
        val rawLeg =
          s"""SELECT 'raw' AS log, 'text' AS grp, batch_id,
             |CAST(count(*) AS BIGINT) AS n_docs,
             |CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
             |CAST(sum(nb) AS BIGINT) AS bytes_total,
             |CAST(sum(CASE WHEN kept THEN 0 ELSE nb END) AS BIGINT) AS bytes_removed
             |FROM (WITH v AS (
             |  SELECT d.doc_id, md5(l.text) AS text_hash, strlen(l.text) AS nb,
             |         d.doc_id % 4 AS r
             |  FROM documents d JOIN documents l ON l.doc_id = ($lead)),
             |f AS (SELECT text_hash, min(r) AS r0 FROM v GROUP BY text_hash),
             |rep AS (SELECT v.text_hash, min(v.doc_id) AS rep
             |        FROM v JOIN f ON v.text_hash = f.text_hash AND v.r = f.r0
             |        GROUP BY v.text_hash)
             |SELECT CAST(v.r - 1 AS BIGINT) AS batch_id, v.nb,
             |       (v.doc_id = rep.rep) AS kept
             |FROM v JOIN rep USING (text_hash) WHERE v.r >= 1) verd
             |GROUP BY batch_id""".stripMargin
        s"""SELECT log, grp, batch_id, n_docs, n_kept, n_dropped,
           |n_dropped * 10000 // n_docs AS drop_bp, bytes_total, bytes_removed
           |FROM ($rawLeg UNION ALL $mediaLegs) u
           |ORDER BY log, grp, batch_id""".stripMargin.replace("\n", " ")
      }),

    // Streamed SPAN-scrub ingest end to end (the q134 discipline at
    // WINDOW granularity — Lee et al.'s scrub as a continuous job):
    // JSONL drains through parse → scrubSpansAgainstIndex vs the
    // standing window-hash span index → verdict log → curated append →
    // appendSpanIndex. The oracle replays the canonical-holder rule
    // relationally: a window is cut from doc w iff SOME holder with a
    // lower id exists in the standing corpus or a batch ≤ w's (the
    // index stores ALL seen windows with min-id wmin, so the rule is a
    // pure function of ids-seen-so-far — replay-idempotent AND
    // SQL-replayable, the StreamingMediaIngest argument).
    "q170_stream_span_scrub" -> QueryDef(
      (s, dir) =>
        s.read.parquet(spanIngestVerdicts(s, dir))
          .select(col("batch_id").cast("long").as("batch_id"), col("doc_id"),
            col("text_scrubbed"), col("n_kept"), col("n_cut"))
          .orderBy(col("batch_id"), col("doc_id")),
      Some {
        val lead = LeaderSql.replace("doc_id", "d.doc_id")
        val universe = s"(SELECT d.doc_id, l.text AS text FROM documents d " +
          s"JOIN documents l ON l.doc_id = ($lead)) uu"
        val prefix = TextOps.spanWhsSqlPrefix(universe, "doc_id", "text", 8)
        val tail = TextOps.scrubSqlTail("flg", "doc_id", 8, "doc_id % 4 >= 1")
        s"""SELECT CAST(q.doc_id % 4 AS BIGINT) - 1 AS batch_id, q.doc_id,
           |q.text_scrubbed, q.n_kept, q.n_cut FROM (
           |WITH $prefix,
           |flg AS (SELECT ww.doc_id, ww.pos FROM whs ww
           |  WHERE ww.doc_id % 4 >= 1 AND EXISTS (
           |    SELECT 1 FROM whs hh WHERE hh.wh = ww.wh AND hh.doc_id < ww.doc_id
           |      AND (hh.doc_id % 4 = 0 OR hh.doc_id % 4 <= ww.doc_id % 4))),
           |$tail) q ORDER BY batch_id, doc_id""".stripMargin.replace("\n", " ")
      }),

    // Stream-STREAM interval join (the W-family ack correlation,
    // StreamOps.ackJoin) as a CORRECTNESS row: clicks joined to same-user
    // purchases within 1 hour, both sides watermarked file streams. An
    // inner interval join's emitted set is exactly the batch join's —
    // state eviction only ever drops rows whose match window has passed —
    // so the batch SQL twin hash-matches the drained output.
    "q121_stream_interval_join" -> QueryDef(
      (s0, dir) => {
        // state-heavy streaming job: size state partitions for the state,
        // not the batch shuffle width — a stream-stream join instantiates
        // 4 state stores per partition per micro-batch, so 32 batch
        // partitions mean 128 store inits per drain for 100k rows; r16
        // A/B: 8 -> 4 partitions reads 2.5 vs 2.9-3.3 s at sf0.1 (the
        // ~40k-row state fits comfortably in 4), q122/q64 flat
        val s = s0.newSession()
        s.conf.set("spark.sql.shuffle.partitions", "4")
        val src = eventStream(s, dir)
        val writes = src.where(col("event_type") === "click")
          .select(col("user_id").as("w_key"), col("ts").as("w_ts"))
        val acks = src.where(col("event_type") === "purchase")
          .select(col("user_id").as("a_key"), col("ts").as("a_ts"))
        val name = s"q121_mem_${System.nanoTime()}"
        val q = StreamOps.ackJoin(writes, acks, within = "1 hour", watermark = "10 minutes")
          .select(col("w_key"), expr("unix_micros(w_ts) * 1000").as("w_ts_ns"),
            expr("unix_micros(a_ts) * 1000").as("a_ts_ns"))
          .writeStream.trigger(Trigger.AvailableNow())
          .outputMode("append").format("memory").queryName(name)
          .start()
        q.awaitTermination()
        s.table(name).orderBy(col("w_key"), col("w_ts_ns"), col("a_ts_ns"))
      },
      Some("""WITH w AS (SELECT user_id AS w_key, epoch_ns(ts) AS w_ts_ns FROM events WHERE event_type = 'click'),
             |a AS (SELECT user_id AS a_key, epoch_ns(ts) AS a_ts_ns FROM events WHERE event_type = 'purchase')
             |SELECT w_key, w_ts_ns, a_ts_ns FROM w JOIN a
             |ON a_key = w_key AND a_ts_ns >= w_ts_ns AND a_ts_ns <= w_ts_ns + 3600000000000
             |ORDER BY w_key, w_ts_ns, a_ts_ns""".stripMargin.replace("\n", " "))),

    // APPEND-mode watermarked windowed aggregation (q64 checks the
    // complete-mode engine; this row checks the WATERMARK semantics): a
    // drained availableNow stream emits exactly the windows the final
    // watermark (ms-floored max event time − 10 min) has closed — open
    // tail windows stay in state and never reach the sink. The oracle
    // recomputes the same closed-window set relationally.
    "q122_stream_closed_windows" -> QueryDef(
      (s0, dir) => {
        // same state-partition sizing rationale as q121
        val s = s0.newSession()
        s.conf.set("spark.sql.shuffle.partitions", "4")
        val name = s"q122_mem_${System.nanoTime()}"
        val q = StreamOps.windowedEventCounts(
            eventStream(s, dir).select(col("ts"), col("event_type"),
              cents(col("value")).as("value")))
          .select(expr("unix_micros(window_start) * 1000").as("window_start_ns"),
            col("event_type"), col("n"), col("total").as("total_c"))
          .writeStream.trigger(Trigger.AvailableNow())
          .outputMode("append").format("memory").queryName(name)
          .start()
        q.awaitTermination()
        s.table(name).orderBy(col("window_start_ns"), col("event_type"))
      },
      Some("""WITH wm AS (SELECT (epoch_ns(max(ts)) // 1000000 - 600000) * 1000000 AS wm_ns FROM events),
             |b AS (SELECT (epoch_ns(ts) // 300000000000) * 300000000000 AS window_start_ns, event_type,
             |      CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS v FROM events)
             |SELECT window_start_ns, event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS total_c
             |FROM b, wm WHERE window_start_ns + 300000000000 <= wm.wm_ns
             |GROUP BY window_start_ns, event_type
             |ORDER BY window_start_ns, event_type""".stripMargin.replace("\n", " ")))
  )
}
