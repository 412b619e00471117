package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.Dedup

/** The continuously-fed document-dedup pipeline as an actual Structured
  * Streaming job — the streaming form of the q86/q87 incremental
  * near-dup shape. Document files (parquet, `doc_id: long, text:
  * string`) land in `docsDir`; each micro-batch is
  *
  *  1. probed against the persistent signature index
  *     ([[Dedup.nearDupAgainstIndexed]] — the batch's bucket footprint
  *     reaches the index scan as a partition filter, so a batch costs
  *     O(batch + collisions) however large the standing corpus is),
  *  2. checked against ITSELF ([[Dedup.nearDupPairs]] — intra-batch
  *     near-dups the index can't know yet),
  *  3. appended to the verdict log (one overwritten directory per
  *     micro-batch id → replayed batches can't double-log), and
  *  4. its signatures appended to the index
  *     ([[Dedup.appendSignatureIndex]]), so the NEXT batch sees this
  *     one's documents.
  *
  * Verdict rows: (batch_id, doc_new, doc_old, intra, is_dup) — `intra`
  * marks pairs found within the batch (doc_old is then a batch-mate,
  * not a corpus doc).
  *
  * Delivery semantics: the source offsets are checkpointed and the
  * verdict write is idempotent per batch id; the index APPEND is
  * at-least-once — a crash between step 4 and the checkpoint commit
  * re-appends the batch's signatures on restart, which duplicates
  * band/array rows for those docs (verdicts for LATER batches then
  * repeat those collision rows; candidate sets stay correct because the
  * band join is distinct'd). Run
  * `IndexMaintenance.compactSignatureIndex` on the usual cadence — or
  * dedup on (doc_new, doc_old) downstream — if exact-once index rows
  * matter operationally.
  */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Drain all pending document files through the probe → log → append
    * loop. The signature index at `indexPath` must exist (build it with
    * [[Dedup.writeSignatureIndex]] — an empty corpus works: the first
    * batch then simply finds no corpus matches and seeds the index).
    */
  def runAvailableNow(
      spark: SparkSession,
      docsDir: String,
      indexPath: String,
      verdictsDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.schema(docSchema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(docsDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch is consumed by three jobs (index probe, self pairs,
        // signature append) — cache it for the scope of the batch
        val docs = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val vsIndex = Dedup.nearDupAgainstIndexed(docs, "doc_id", "text", indexPath)
            .select(col("doc_new"), col("doc_old"), lit(false).as("intra"), col("is_dup"))
          val intra = Dedup.nearDupPairs(docs, "doc_id", "text")
            .select(col("doc_a").as("doc_new"), col("doc_b").as("doc_old"),
              lit(true).as("intra"), col("is_dup"))
          vsIndex.unionByName(intra)
            .withColumn("batch_id", lit(batchId))
            .select(col("batch_id"), col("doc_new"), col("doc_old"),
              col("intra"), col("is_dup"))
            .write.mode("overwrite")
            .parquet(s"$verdictsDir/batch_id=$batchId")
          Dedup.appendSignatureIndex(docs, "doc_id", "text", indexPath)
        } finally { docs.unpersist(); () }
      }
      .start()
    query.awaitTermination()
  }
}
