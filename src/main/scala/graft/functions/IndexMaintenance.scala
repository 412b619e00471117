package graft.functions

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for the persistent pipeline indexes. Every
  * `append*Index` call lands one file set per batch, so a standing index
  * fed by N ingest batches accumulates O(N) files per partition — at which
  * point probe cost is dominated by file-open overhead, not data. This is
  * the maintenance pass a deployment runs on a cadence (NOT the drift
  * rebuild: [[Similarity.ivfNeedsRebuild]] decides when the MODEL is
  * stale and retrains; compaction merges files under the unchanged model
  * and never changes results).
  *
  * Mechanics: read → rewrite hash-distributed by the partition column
  * (each partition value lands in exactly one task ⇒ one file per
  * directory) → swap directories. The swap is two renames, not one atomic
  * commit — a crash between them leaves the index at `<path>.old`
  * (recover by renaming back); a deployment wanting all-or-nothing wraps
  * the call in its table format's transaction or the store's
  * CommitProtocol, same contract as the append path documents.
  */
object IndexMaintenance {

  /** Rewrite a parquet table with one file per `partitionCol` value
    * (or `targetFiles` files when unpartitioned), then swap it into
    * place. Returns (filesBefore, filesAfter).
    */
  def compactParquetTable(
      spark: SparkSession,
      path: String,
      partitionCol: Option[String],
      targetFiles: Int = 1,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity)
      : (Long, Long) = {
    val raw = spark.read.parquet(path)
    val before = raw.inputFiles.length.toLong
    val df = transform(raw)
    val tmp = new Path(path + ".compact-tmp")
    val fs = tmp.getFileSystem(new Configuration())
    fs.delete(tmp, true)
    partitionCol match {
      case Some(pc) =>
        df.repartition(col(pc))
          .write.partitionBy(pc).parquet(tmp.toString)
      case None =>
        df.repartition(math.max(1, targetFiles)).write.parquet(tmp.toString)
    }
    val cur = new Path(path)
    val old = new Path(path + ".old")
    fs.delete(old, true)
    require(fs.rename(cur, old), s"compact swap: could not move $cur aside")
    require(fs.rename(tmp, cur), s"compact swap: could not move $tmp into place")
    fs.delete(old, true)
    val after = spark.read.parquet(path).inputFiles.length.toLong
    (before, after)
  }

  /** Compact a [[Dedup.writeSignatureIndex]] index grown by
    * [[Dedup.appendSignatureIndex]]: merges each `bands/bk=` directory to
    * one file and the verification `arrays/` table to `arrayFiles`.
    */
  def compactSignatureIndex(
      spark: SparkSession, path: String, arrayFiles: Int = 4): Unit = {
    compactParquetTable(spark, s"$path/arrays", None, arrayFiles)
    compactParquetTable(spark, s"$path/bands", Some("bk"))
    ()
  }

  /** Compact a [[Dedup.writeHashIndex]] exact-dedup index grown by
    * [[Dedup.appendHashIndex]]: merges each `hashes/hb=` bucket
    * directory to one file AND restores the one-row-per-hash invariant —
    * rows duplicated by at-least-once replayed appends collapse to the
    * same min representative the probe takes, so probe results are
    * unchanged by construction.
    */
  def compactHashIndex(spark: SparkSession, path: String): Unit = {
    compactParquetTable(spark, s"$path/hashes", Some("hb"), transform = df => {
      val idc = df.columns.filterNot(c => c == "text_hash" || c == "hb").head
      df.groupBy(col("hb"), col("text_hash"))
        .agg(org.apache.spark.sql.functions.min(col(idc)).as(idc))
        .select(col(idc), col("text_hash"), col("hb"))
    })
    ()
  }

  /** Compact a [[TextOps.writeSpanIndex]] window-hash span index grown
    * by [[TextOps.appendSpanIndex]]: merges each `whs/hb=` bucket
    * directory to one file and collapses multi-generation rows to one
    * per wh — `min(wmin)` (exact, the probe's own collapse) and
    * `sum(df)` (matching the probe's at-least-once df semantics), so
    * probe results are unchanged by construction.
    */
  def compactSpanIndex(spark: SparkSession, path: String): Unit = {
    compactParquetTable(spark, s"$path/whs", Some("hb"), transform = df =>
      df.groupBy(col("hb"), col("wh"))
        .agg(
          org.apache.spark.sql.functions.min(col("wmin")).as("wmin"),
          org.apache.spark.sql.functions.sum(col("df")).as("df"))
        .select(col("wh"), col("wmin"), col("df"), col("hb")))
    ()
  }

  /** Compact a [[Multimodal.writeFingerprintIndex]] media index grown by
    * [[Multimodal.appendFingerprintIndex]] (the image/audio/video
    * modality legs all share it): merges each `bands/bk=` bucket
    * directory to one file and the Hamming-verification `hashes/` table
    * to `hashFiles`. Same hashes-before-bands ordering as the writer —
    * a crash between the two swaps leaves at worst a compacted
    * verification table next to an uncompacted band table, never band
    * rows whose hashes are missing.
    */
  def compactFingerprintIndex(
      spark: SparkSession, path: String, hashFiles: Int = 4): Unit = {
    compactParquetTable(spark, s"$path/hashes", None, hashFiles)
    compactParquetTable(spark, s"$path/bands", Some("bk"))
    ()
  }

  /** Compact a [[Similarity.writeIvfIndex]] index grown by
    * [[Similarity.appendIvfIndex]]: merges each `cells/cell=` directory
    * to one file. The centroid model is untouched.
    */
  def compactIvfIndex(spark: SparkSession, path: String): Unit = {
    compactParquetTable(spark, s"$path/cells", Some("cell"))
    ()
  }

  /** Compact a [[Similarity.writeIvfPqIndex]] index grown by
    * [[Similarity.appendIvfPqIndex]]: `cells/` plus the parallel
    * `pq/codes/` cell partitions (each append lands one file set in
    * both). The centroid and codebook models are untouched.
    */
  def compactIvfPqIndex(spark: SparkSession, path: String): Unit = {
    compactIvfIndex(spark, path)
    compactParquetTable(spark, s"$path/pq/codes", Some("cell"))
    ()
  }
}
