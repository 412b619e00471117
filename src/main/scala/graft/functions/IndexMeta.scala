package graft.functions

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Bucket-count sizing + persistence for the persistent pipeline indexes
  * ([[Dedup.writeHashIndex]], [[Multimodal.writeFingerprintIndex]]).
  *
  * WHY adaptive: the bucket count is the index's pruning granularity — a
  * probing batch's `.where(bucket IN footprint)` skips every directory
  * outside its footprint. A FIXED count stops pruning at some scale: with
  * 64 buckets any non-trivial batch touches all 64 (footprint ==
  * buckets, nominal pruning) and each directory grows linearly with the
  * corpus, so probe cost degrades to a full index scan. The sizing rule
  * targets ~256 Ki rows per bucket (a few MB of parquet — one task-sized
  * scan), rounded to a power of two and clamped to [64, 65536]:
  *
  *  - floor 64: below ~16M rows the layout is identical to the historic
  *    fixed default, so small deployments (and every test fixture) see
  *    byte-identical indexes;
  *  - cap 65536: bounds directory/file counts on the object store; past
  *    the cap a bucket grows linearly again (~50 MB at 10^11 rows —
  *    still one comfortable task per directory).
  *
  * WHY persisted: writer, appender and prober must agree on the count —
  * a prober assuming a different modulus would prune AWAY directories
  * that hold real matches (silent false negatives, not a perf bug). The
  * count chosen at build time is therefore written to
  * `<index>/buckets.json` (sibling of the data tables, untouched by
  * compaction's directory swaps) and read back by append/probe paths;
  * indexes written before this file existed fall back to the historic
  * default of 64.
  */
object IndexMeta {

  /** Historic fixed bucket count — the fallback for indexes that predate
    * the meta file, and the adaptive rule's floor. */
  final val DefaultBuckets = 64

  /** The ~256 Ki-rows-per-bucket sizing rule (see object doc). */
  def adaptiveBuckets(nRows: Long): Int = {
    val target = math.max(1L, nRows / 262144L)
    val p = if (target <= 1L) 1L else java.lang.Long.highestOneBit(target - 1L) << 1
    math.min(65536L, math.max(DefaultBuckets.toLong, p)).toInt
  }

  /** Record the bucket count chosen at build time (one small JSON file —
    * overwritten on index rebuild). */
  def write(spark: SparkSession, indexPath: String, buckets: Int): Unit = {
    val p = new Path(s"$indexPath/buckets.json")
    val fs = p.getFileSystem(new Configuration())
    val out = fs.create(p, true)
    try out.write(s"""{"buckets":$buckets}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** The recorded bucket count, or [[DefaultBuckets]] for pre-meta
    * indexes. */
  def read(spark: SparkSession, indexPath: String): Int = {
    val p = new Path(s"$indexPath/buckets.json")
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) DefaultBuckets
    else {
      val in = fs.open(p)
      try {
        val s = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toInt).getOrElse(DefaultBuckets)
      } finally in.close()
    }
  }

  /** Resolve an API-level `buckets` argument: positive = explicit
    * (caller-fixed), 0 = the index's recorded count (append/probe
    * paths), falling back to [[DefaultBuckets]]. */
  def resolve(spark: SparkSession, indexPath: String, buckets: Int): Int =
    if (buckets > 0) buckets else read(spark, indexPath)
}
