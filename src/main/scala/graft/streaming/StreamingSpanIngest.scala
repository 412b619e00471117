package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.TextOps
import graft.sources.RawCorpus

/** Substring-level dedup as a continuously-running Structured Streaming
  * job — the [[StreamingRawIngest]] discipline applied at WINDOW (not
  * whole-document) granularity, i.e. the steady-state form of Lee et
  * al. 2022's suffix-array scrub: JSONL documents land in `rawDir` and
  * each micro-batch flows through
  *
  *  1. PARSE: the quarantining contract of [[RawCorpus]] (`from_json`
  *     PERMISSIVE; malformed lines quarantine, never fail the batch),
  *  2. SPAN SCRUB: [[TextOps.scrubSpansAgainstIndex]] against the
  *     standing window-hash span index — only the batch tokenizes and
  *     window-hashes; the standing corpus enters as a bucket-pruned
  *     `(wh, wmin)` model scan. A window is cut from a doc iff its
  *     canonical holder (min of the index's wmin and the lowest batch
  *     id holding it) is a LOWER id — first-arrival-wins, the canonical
  *     copy of every repeated passage survives exactly once corpus-wide,
  *  3. LOG + CURATE: one verdict row per valid doc — (batch_id, doc_id,
  *     text_scrubbed, n_kept, n_cut) — written idempotently (one
  *     overwritten directory per micro-batch id); docs with any
  *     surviving tokens append (scrubbed) to the curated store,
  *  4. INDEX: the batch's ORIGINAL window hashes append to the span
  *     index ([[TextOps.appendSpanIndex]] — all seen windows, scrubbed
  *     or not, so the canonical-holder function stays a pure function
  *     of ids-seen-so-far), and the NEXT batch sees this one's text.
  *
  * REPLAY IDEMPOTENCE (the crash window between the index append and
  * the checkpoint commit): a replayed batch probes an index that
  * already holds its own window rows, but those rows carry
  * `wmin = the batch's own lowest holder` — for every window the
  * canonical-holder comparison resolves exactly as on the first run,
  * so verdicts, curated output, and scrubbed text are bit-identical
  * (StreamOpsSpec's crash-replay battery asserts this). Maintenance:
  * [[graft.functions.IndexMaintenance.compactSpanIndex]] on cadence.
  *
  * Seed the index with [[TextOps.writeSpanIndex]] over the standing
  * corpus (an empty corpus works — the probe reads an explicit schema).
  */
object StreamingSpanIngest {

  /** Drain all pending JSONL files through parse → span scrub → log →
    * curate → index growth. */
  def runAvailableNow(
      spark: SparkSession,
      rawDir: String,
      indexPath: String,
      curatedDir: String,
      verdictsDir: String,
      quarantineDir: String,
      checkpointDir: String,
      L: Int = 8,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .text(rawDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parsed = batch.select(
          from_json(col("value"), RawCorpus.docSchema,
            Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
            .as("r"))
          .select(col("r.*"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (valid, quar) = RawCorpus.validSplit(parsed)
        try gate(valid, quar, batchId, indexPath, curatedDir, verdictsDir,
          quarantineDir, L)
        finally { parsed.unpersist(); () }
      }
      .start()
    query.awaitTermination()
  }

  /** The shared per-batch gate; package-visible for the crash-replay
    * spec. `valid` carries the documents schema (doc_id, text, ...). */
  private[graft] def gate(
      valid: DataFrame,
      quar: DataFrame,
      batchId: Long,
      indexPath: String,
      curatedDir: String,
      verdictsDir: String,
      quarantineDir: String,
      L: Int): Unit = {
    val scrubbed = TextOps
      .scrubSpansAgainstIndex(valid, "doc_id", "text", indexPath, L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      scrubbed
        .select(lit(batchId).as("batch_id"), col("doc_id"),
          col("text_scrubbed"), col("n_kept"), col("n_cut"))
        .write.mode("overwrite").parquet(s"$verdictsDir/batch_id=$batchId")
      quar.write.mode("overwrite").parquet(s"$quarantineDir/batch_id=$batchId")
      // curated rows keep the doc's metadata with the SCRUBBED text;
      // fully-duplicated docs (no surviving token) drop
      valid.drop("text")
        .join(scrubbed.where(col("n_kept") > 0)
          .select(col("doc_id"), col("text_scrubbed").as("text")), Seq("doc_id"))
        .write.mode("overwrite").parquet(s"$curatedDir/batch_id=$batchId")
      // index the ORIGINAL text's windows — all seen windows, kept or
      // cut, so canonical holders are a pure function of ids seen
      TextOps.appendSpanIndex(valid, "doc_id", "text", indexPath, L)
    } finally { scrubbed.unpersist(); () }
  }
}
