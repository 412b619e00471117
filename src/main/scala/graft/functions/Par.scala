package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** Parallelism repair for CPU-dense per-row stages.
  *
  * A scan's task count comes from its splits; a small or single-row-group
  * file yields ONE task, which serializes every downstream narrow
  * transform (gram hashing, md5 MinHash, media decode, quantization) no
  * matter how many cores the session has. [[fanOut]] inserts a
  * round-robin exchange ONLY in that case — when the source already
  * provides at least the session's default parallelism (any
  * production-scale table: 100 TB is ~10^6 splits), it is a provable
  * no-op and no shuffle is added. Callers project to the needed columns
  * first so the exchange ships only what the downstream stage reads.
  *
  * The `sizeCol` overload makes the split BYTES-aware (guide §2.5 skew):
  * round-robin balances ROW counts, so a low-split source of skewed
  * payloads (documents from 10 B to 1 MB, media blobs from thumbnails to
  * 4K frames) still produces straggler decode tasks. The weighted form
  * assigns each row to the least-loaded of 32×parallelism virtual
  * buckets by cumulative payload bytes (greedy bin-packing, one
  * O(log buckets) heap op per row) and exchanges on the bucket key —
  * equal BYTES per task, and no round-robin pre-sort
  * (`spark.sql.execution.sortBeforeRepartition`) either. Assignment is
  * deterministic for the exchange-free scan-shaped plans this gate
  * admits (same splits → same iteration order), which is what makes a
  * hash exchange on a computed key retry-safe here.
  */
object Par {

  /** `df`, repartitioned to the session default parallelism iff its
    * current plan would execute with fewer partitions.
    *
    * Only scan-shaped plans are probed: if the plan already contains a
    * shuffle-introducing operator (aggregate, join, distinct, sort,
    * repartition, window), its exchange output is already
    * `spark.sql.shuffle.partitions` wide, so fan-out would be a no-op —
    * and probing `.rdd` there would be actively harmful, because under
    * AQE it materializes every upstream shuffle stage (real jobs whose
    * results the actual action cannot reuse). For exchange-free plans,
    * `.rdd` only plans the lineage; no job runs.
    */
  def fanOut(df: DataFrame): DataFrame = fanOutImpl(df, None)

  /** [[fanOut]], balancing cumulative `sizeCol` BYTES per task instead of
    * row counts — for payload-skewed decode stages (see object doc).
    */
  def fanOut(df: DataFrame, sizeCol: Column): DataFrame =
    fanOutImpl(df, Some(sizeCol))

  private def fanOutImpl(df: DataFrame, sizeCol: Option[Column]): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val hasExchange = df.queryExecution.analyzed.collectFirst {
      case _: Aggregate | _: Join | _: Distinct | _: Deduplicate | _: Sort |
          _: RepartitionOperation | _: Window => ()
    }.isDefined
    if (hasExchange) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df
      else sizeCol match {
        case None => df.repartition(target)
        case Some(s) =>
          // 32 virtual buckets per output partition: greedy bin-packing
          // balances bucket bytes exactly; ~32 hash-spread buckets per
          // task keep the hash-collision variance small (the guide's
          // "20-100× more keys than partitions" rule)
          val buckets = 32 * target
          val withBytes = df.withColumn("__fan_bytes",
            coalesce(s.cast("long"), lit(1L)))
          val outSchema = org.apache.spark.sql.types.StructType(
            withBytes.schema.fields :+ org.apache.spark.sql.types.StructField(
              "__fan_bucket", org.apache.spark.sql.types.IntegerType, nullable = false))
          val enc = org.apache.spark.sql.Encoders.row(outSchema)
          val bytesIdx = withBytes.schema.length - 1
          val assign = (it: Iterator[Row]) => {
            // min-heap of (cumulative bytes, bucket): each row lands in
            // the currently lightest bucket
            val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
              Ordering.by[(Long, Int), (Long, Int)](identity).reverse)
            (0 until buckets).foreach(b => heap += ((0L, b)))
            it.map { r =>
              val bytes = math.max(1L, r.getLong(bytesIdx))
              val (load, b) = heap.dequeue()
              heap += ((load + bytes, b))
              Row.fromSeq(r.toSeq :+ b)
            }
          }
          withBytes.mapPartitions(assign)(enc)
            .repartition(target, col("__fan_bucket"))
            .drop("__fan_bucket", "__fan_bytes")
      }
    }
  }
}
