package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Dedup
import graft.sources.RawCorpus

/** Raw-corpus ingest as a continuously-running Structured Streaming job:
  * raw files — JSONL lines ([[runAvailableNow]]) or WARC archives
  * ([[runAvailableNowWarc]]) — land in `rawDir` and each micro-batch
  * flows through the full front door of a curation pipeline —
  *
  *  1. PARSE: the schema-explicit quarantining contract of
  *     [[RawCorpus.readJsonlDocs]] applied to the batch's lines
  *     (`from_json` in PERMISSIVE mode; malformed lines and
  *     structurally-valid rows missing their key are quarantined, never
  *     silently ingested and never failing the batch),
  *  2. EXACT-DEDUP GATE: the batch probes the persistent hash index
  *     ([[Dedup.exactDupsAgainstIndexed]] — bucket partition filters
  *     make a batch O(batch + matches) against any standing corpus) and
  *     resolves intra-batch copies to the lowest-id batch mate,
  *  3. VERDICTS: one row per valid doc — (batch_id, doc_id, text_hash,
  *     rep, kept) with `rep` the hash's canonical representative (the
  *     doc itself when kept — never null, so the log joins and compares
  *     without three-valued logic) — written idempotently (one
  *     overwritten directory per micro-batch id), quarantined lines
  *     logged the same way,
  *  4. CURATE + INDEX: kept docs append to the curated store (per-batch
  *     directory) and their hashes to the index, so the NEXT batch sees
  *     this one's documents.
  *
  * Dedup semantics (what the q134 oracle pins): a doc is kept iff its
  * text hash is not in the index AND it is the lowest-id holder of that
  * hash within its own batch; `rep` is the indexed representative
  * (first-arrival keeper across batches) or the batch representative for
  * hashes first seen in this batch. Delivery: source offsets are
  * checkpointed; verdict/curated/quarantine writes are idempotent per
  * batch id; the index append is at-least-once with the same
  * min-representative probe remedy as [[StreamingDedup]]. Maintenance:
  * run [[graft.functions.IndexMaintenance.compactHashIndex]] on cadence
  * (restores one-row-per-hash); the curated store's per-batch
  * directories compact with
  * [[graft.functions.IndexMaintenance.compactParquetTable]].
  */
object StreamingRawIngest {

  /** Drain all pending JSONL files through parse → gate → log → curate.
    * The hash index at `indexPath` must exist (seed it with
    * [[Dedup.writeHashIndex]]; an empty standing corpus works).
    */
  def runAvailableNow(
      spark: SparkSession,
      rawDir: String,
      indexPath: String,
      curatedDir: String,
      verdictsDir: String,
      quarantineDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .text(rawDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // consumed by four jobs (probe, quarantine, curate, index
        // append) — persist the parsed batch for the batch's scope only
        val parsed = batch.select(
          from_json(col("value"), RawCorpus.docSchema,
            Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
            .as("r"))
          .select(col("r.*"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (valid, quar) = RawCorpus.validSplit(parsed)
        try gate(valid, quar, batchId, indexPath, curatedDir, verdictsDir, quarantineDir)
        finally { parsed.unpersist(); () }
      }
      .start()
    query.awaitTermination()
  }

  /** The WARC front door: gzip-member web archives drained one
    * `binaryFile` micro-batch at a time through the SAME gate — the
    * per-archive member walk and documents projection are
    * [[RawCorpus.parseWarcFrame]]/[[RawCorpus.warcDocs]] (identical to
    * the batch reader, q126's path); quarantine carries damaged-archive
    * marker rows and response records that don't project to a doc id.
    */
  def runAvailableNowWarc(
      spark: SparkSession,
      rawDir: String,
      indexPath: String,
      curatedDir: String,
      verdictsDir: String,
      quarantineDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val reader = spark.readStream.format("binaryFile").schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .load(rawDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parsed = RawCorpus.parseWarcFrame(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val docs = RawCorpus.warcDocs(parsed)
        val valid = docs.where(col("doc_id").isNotNull)
        // quarantine = one marker per DAMAGED archive (clean_eof=false
        // covers both the all-damage marker row and partially-damaged
        // files whose leading records still ingest — the batch reader
        // surfaces the same condition as its clean_eof column) + every
        // response record that doesn't project to a doc id
        val quar = parsed.where(col("warc_type").isNull || !col("clean_eof"))
          .select(col("path")).distinct()
          .select(to_json(struct(col("path"))).as("_corrupt"))
          .unionByName(docs.where(col("doc_id").isNull)
            .select(to_json(struct(col("text"), col("lang"), col("source"))).as("_corrupt")))
        try gate(valid, quar, batchId, indexPath, curatedDir, verdictsDir, quarantineDir)
        finally { parsed.unpersist(); () }
      }
      .start()
    query.awaitTermination()
  }

  /** The shared per-batch gate: probe → verdicts → quarantine → curate →
    * index append. `valid` must carry the documents schema (doc_id,
    * text, ...); `quar` one `_corrupt` string column.
    *
    * REPLAY IDEMPOTENCE: the index append is at-least-once (a crash
    * between [[Dedup.appendHashIndex]] and the checkpoint commit replays
    * the batch against an index that already holds the batch's own kept
    * docs). On replay the probe then reports each kept doc as a dup of
    * ITSELF (`dup_of = doc_id`, the min-representative contract
    * [[Dedup.exactDupsAgainstIndexed]] documents), so `kept` is derived
    * from the representative — `rep === doc_id`, self-representative
    * counts as kept — not from `dup_of IS NULL`. A replayed batch
    * therefore reproduces bit-identical verdicts/curated output; the
    * naive null-test would flip `kept` to false and overwrite the
    * batch's curated directory with an empty set (round-13 ADVICE,
    * high). StreamOpsSpec's crash-replay battery re-runs the gate after
    * a successful append and asserts the outputs match.
    */
  private[graft] def gate(
      valid: DataFrame,
      quar: DataFrame,
      batchId: Long,
      indexPath: String,
      curatedDir: String,
      verdictsDir: String,
      quarantineDir: String): Unit = {
    val probed = Dedup.exactDupsAgainstIndexed(valid, "doc_id", "text", indexPath)
    val batchRep = probed.groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("batch_rep"))
    val verdicts = probed.join(batchRep, Seq("text_hash"))
      .select(
        lit(batchId).as("batch_id"),
        col("doc_id"),
        col("text_hash"),
        coalesce(col("dup_of"), col("batch_rep")).as("rep"),
        (coalesce(col("dup_of"), col("batch_rep")) === col("doc_id")).as("kept"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      verdicts.write.mode("overwrite").parquet(s"$verdictsDir/batch_id=$batchId")
      quar.write.mode("overwrite").parquet(s"$quarantineDir/batch_id=$batchId")
      val kept = valid.join(
        verdicts.where(col("kept")).select(col("doc_id")), Seq("doc_id"), "left_semi")
      kept.write.mode("overwrite").parquet(s"$curatedDir/batch_id=$batchId")
      Dedup.appendHashIndex(kept, "doc_id", "text", indexPath)
    } finally { verdicts.unpersist(); () }
  }
}
