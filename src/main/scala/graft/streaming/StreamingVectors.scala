package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.functions.Similarity

/** The embedding side of the continuously-fed pipeline as a Structured
  * Streaming job (the vector analog of [[StreamingDedup]]): embedding
  * files (parquet, `vec_id: long, embedding: array<float>`) land in
  * `vecsDir`; each micro-batch is
  *
  *  1. probed against the standing IVF index
  *     ([[Similarity.ivfTopKIndexed]] — cell-partition-pruned, the
  *     corpus is never re-quantized), logging each batch vector's top-k
  *     nearest standing vectors — the retrieval/near-dup verdict,
  *  2. appended to the index under the frozen centroid model
  *     ([[Similarity.appendIvfIndex]]), so the NEXT batch probes this
  *     one's vectors too,
  *  3. drift-annotated ([[Similarity.ivfIndexSkew]] — O(nlist)
  *     count-only scan): the verdict log's `max_skew` column carries the
  *     occupancy skew of the index the batch probed, turning "time to
  *     retrain" into a number the operator alerts on (one batch lagged —
  *     see the ordering note in the loop).
  *
  * Verdict rows: (batch_id, query_id, vec_id, cell, dot, rk, max_skew).
  * Same delivery semantics as [[StreamingDedup]]: checkpointed offsets,
  * idempotent per-batch verdict dirs, at-least-once index append (a
  * replayed append duplicates that batch's cell rows — run
  * `IndexMaintenance.compactIvfIndex` on cadence, or rebuild when the
  * drift guard trips).
  */
object StreamingVectors {

  def vecSchema(dim: Int): StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Drain all pending embedding files through the probe → log → append
    * → drift-check loop. The IVF index at `indexPath` must exist
    * ([[Similarity.writeIvfIndex]] over the initial corpus).
    */
  def runAvailableNow(
      spark: SparkSession,
      vecsDir: String,
      indexPath: String,
      verdictsDir: String,
      checkpointDir: String,
      dim: Int,
      k: Int = 5,
      nprobe: Int = 4,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.schema(vecSchema(dim))
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(vecsDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val vecs = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // the verdicts are WRITTEN (materialized) before the append:
          // the probe plan scans the index lazily, and an append to the
          // same path refreshes path caches (refreshByPath) — a
          // persist() around the probe would be silently invalidated and
          // the batch would match itself. Write-then-append makes the
          // ordering structural. `max_skew` is therefore the occupancy
          // the batch PROBED against; this batch's own append shows up
          // in the NEXT batch's row (and in the operator's cadence
          // check), one-batch-lagged by construction.
          val (_, _, skew) = Similarity.ivfIndexSkew(spark, indexPath)
          Similarity.ivfTopKIndexed(
              vecs, "vec_id", "embedding", indexPath, k, nprobe)
            .withColumn("batch_id", lit(batchId))
            .withColumn("max_skew", lit(skew))
            .select(col("batch_id"), col("query_id"), col("vec_id"),
              col("cell"), col("dot"), col("rk"), col("max_skew"))
            .write.mode("overwrite")
            .parquet(s"$verdictsDir/batch_id=$batchId")
          Similarity.appendIvfIndex(vecs, "vec_id", "embedding", indexPath)
        } finally { vecs.unpersist(); () }
      }
      .start()
    query.awaitTermination()
  }
}
