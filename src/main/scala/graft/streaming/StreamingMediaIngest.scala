package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.functions.Multimodal

/** Media-corpus ingest as a continuously-running Structured Streaming
  * job — the [[StreamingRawIngest]] discipline applied to binary blobs:
  * raw media files land in `rawDir` and each `binaryFile` micro-batch
  * flows through
  *
  *  1. ROUTE: numeric id from the file name (`<id>.<ext>` — rows with
  *     no id quarantine) + magic-byte modality sniff
  *     ([[Multimodal.sniffModality]]); unknown formats quarantine as
  *     junk, never fail the batch,
  *  2. FINGERPRINT: the modality's REAL decode path — [[Multimodal
  *     .imageDHash]] / [[Multimodal.audioFingerprint]] /
  *     [[Multimodal.videoFingerprint]] — only over the batch's blobs;
  *     sniffed-but-undecodable blobs quarantine,
  *  3. DEDUP GATE: probe the standing PER-MODALITY fingerprint index
  *     (`indexPath/<modality>`, bucket-pruned — [[Multimodal
  *     .nearDupAgainstFingerprintIndex]]) plus the batch's own banded
  *     intra-pairs; verdicts are MIN-ID-WINS over every lower-id match
  *     seen so far,
  *  4. LOG + INDEX: one idempotently-written verdict row per decoded
  *     clip — (batch_id, id, modality, rep, kept) — then ALL the
  *     batch's fingerprints append to the modality's index so the NEXT
  *     batch sees them.
  *
  * Dedup semantics (what the q160 oracle pins): a clip is kept iff NO
  * clip with a LOWER id within `maxHamming` exists in (the standing
  * corpus ∪ every earlier batch ∪ its own batch); `rep` is the lowest
  * such id (the clip itself when kept — never null). Two deliberate
  * choices make this 100 TB- and replay-sound:
  *
  *  - The index stores EVERY seen fingerprint, kept or dropped (64
  *    bytes/clip — the media stay deduped, the fingerprints are the
  *    cheap part): later near-dups of ANY variant are caught, and
  *    kept-ness never feeds back into the match set, so the verdict of
  *    a clip is a pure function of ids-seen-so-far — no recursive
  *    dependency, and an oracle can replay it relationally.
  *  - Matches are restricted to `id_old < id_new`. A replayed batch
  *    (crash after the index append, before the checkpoint commit)
  *    probes an index that already holds its OWN fingerprints:
  *    self-matches are excluded by the probe, higher-id batch mates
  *    fall to the id filter, and lower-id mates were already counted
  *    via the intra-pairs — so the replay reproduces bit-identical
  *    verdicts (StreamOpsSpec's crash-replay battery asserts this).
  *
  * Delivery: source offsets checkpoint; verdict/quarantine writes are
  * one overwritten directory per micro-batch id; the index append is
  * at-least-once (duplicate fingerprint rows collapse in the probe's
  * candidate groupBy; [[graft.functions.IndexMaintenance
  * .compactFingerprintIndex]] merges them away on cadence). Cold start:
  * a missing `indexPath/<modality>` is an empty standing corpus — the
  * first batch carrying that modality creates it, at `seedBuckets`
  * when given (the sizing hint for deployments that KNOW the corpus
  * will grow — recorded in the index meta so every later append/probe
  * follows it) or the default 64-bucket floor otherwise; corpus-scale
  * deployments can equally seed with `write*FingerprintIndex` to get
  * adaptive sizing from a standing corpus.
  */
object StreamingMediaIngest {

  /** Drain all pending media files through route → fingerprint → gate →
    * log → index. `seedBuckets > 0` sizes any index CREATED by this
    * drain's first batch (ignored for indexes that already exist). */
  def runAvailableNow(
      spark: SparkSession,
      rawDir: String,
      indexPath: String,
      verdictsDir: String,
      quarantineDir: String,
      checkpointDir: String,
      maxHamming: Int = 3,
      numBands: Int = 4,
      maxFilesPerTrigger: Option[Int] = None,
      seedBuckets: Int = 0): Unit = {
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val reader = spark.readStream.format("binaryFile").schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .load(rawDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gate(batch, batchId, indexPath, verdictsDir, quarantineDir,
          maxHamming, numBands, seedBuckets)
      }
      .start()
    query.awaitTermination()
  }

  /** The per-batch gate; package-visible so the crash-replay spec can
    * re-run one batch directly. `batch` carries binaryFile rows
    * (path, content). */
  private[graft] def gate(
      batch: DataFrame,
      batchId: Long,
      indexPath: String,
      verdictsDir: String,
      quarantineDir: String,
      maxHamming: Int,
      numBands: Int,
      seedBuckets: Int = 0): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val routed = batch
      .select(col("path"),
        regexp_extract(col("path"), "([0-9]+)\\.[A-Za-z0-9]+$", 1).as("id_s"),
        col("content"))
      .select(col("path"),
        when(col("id_s") =!= "", col("id_s").cast("long")).as("id"),
        col("content"))
    val sniffed = routed.where(col("id").isNotNull)
      .select(col("path"), col("id"), col("content"))
      .as[(String, Long, Array[Byte])]
      .map { case (p, id, b) =>
        (p, id, Multimodal.sniffModality(b).getOrElse("junk"), b)
      }
      .toDF("path", "id", "modality", "content")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // fingerprint each modality through its real decode path; keep
      // (id, modality, bands) rows only for clips that actually decode
      val legs: Seq[(String, DataFrame => DataFrame)] = Seq(
        "image" -> (df => Multimodal.imageDHash(df, "id", "content")),
        "audio" -> (df => Multimodal.audioFingerprint(df, "id", "content")),
        "video" -> (df => Multimodal.videoFingerprint(df, "id", "content")))
      val hashedLegs = legs.map { case (m, fp) =>
        m -> fp(sniffed.where(col("modality") === m))
          .select(col("id"), col("bands"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      try {
        // one verdict frame per modality: standing matches through the
        // bucket-pruned index probe (when the index exists) UNION the
        // batch's own banded intra-pairs, all restricted to lower ids
        val verdicts = hashedLegs.map { case (m, hashed) =>
          val idx = s"$indexPath/$m"
          val standing =
            if (indexExists(idx))
              Multimodal.nearDupAgainstFingerprintIndex(
                  hashed, idx, maxHamming, numBands)
                .where(col("id_old") < col("id_new"))
                .select(col("id_new").as("id"), col("id_old").as("m_id"))
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row],
              StructType(Seq(StructField("id", LongType),
                StructField("m_id", LongType))))
          val intra = Multimodal.bandedHammingPairs(hashed, maxHamming, numBands)
            .select(col("id_b").as("id"), col("id_a").as("m_id"))
          val rep = standing.unionByName(intra)
            .groupBy(col("id")).agg(min(col("m_id")).as("m_min"))
          hashed.select(col("id"))
            .join(rep, Seq("id"), "left")
            .select(lit(batchId).as("batch_id"), col("id"),
              lit(m).as("modality"),
              coalesce(col("m_min"), col("id")).as("rep"),
              col("m_min").isNull.as("kept"))
        }
        val verdictAll = verdicts.reduce(_.unionByName(_))
        verdictAll.write.mode("overwrite")
          .parquet(s"$verdictsDir/batch_id=$batchId")
        // quarantine: no-id paths, junk formats, sniffed-but-undecodable
        // — each row carries the REAL file path (an operator triaging
        // quarantine must be able to locate the offending blob). The
        // undecodable anti-join keys on (id, modality): ids are only
        // unique per modality (5.png and 5.wav coexist in a batch), so
        // an id-only join would let a decodable PNG mask an undecodable
        // WAV that shares its number
        val decodedIds = hashedLegs.map { case (m, h) =>
            h.select(col("id"), lit(m).as("modality"))
          }.reduce(_.unionByName(_))
        val quar = routed.where(col("id").isNull)
          .select(col("path"), lit("no_id").as("reason"))
          .unionByName(sniffed.where(col("modality") === "junk")
            .select(col("path"), lit("junk").as("reason")))
          .unionByName(sniffed.where(col("modality") =!= "junk")
            .join(decodedIds, Seq("id", "modality"), "left_anti")
            .select(col("path"), lit("undecodable").as("reason")))
        quar.write.mode("overwrite").parquet(s"$quarantineDir/batch_id=$batchId")
        // grow each modality's index by the WHOLE batch (see object
        // doc); an index this append CREATES records seedBuckets (the
        // cold-start sizing hint) — or the default floor — in its meta
        hashedLegs.foreach { case (m, hashed) =>
          val idx = s"$indexPath/$m"
          val seed =
            if (seedBuckets > 0 && !graft.functions.IndexMeta.exists(spark, idx))
              seedBuckets
            else 0
          Multimodal.appendFingerprintIndex(hashed, idx, numBands, seed)
        }
      } finally hashedLegs.foreach { case (_, df) => df.unpersist(); () }
    } finally { sniffed.unpersist(); () }
  }

  private def indexExists(idxPath: String): Boolean = {
    val p = new Path(s"$idxPath/bands")
    p.getFileSystem(new Configuration()).exists(p)
  }
}
