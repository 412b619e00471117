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
    * overwritten on index rebuild), plus any structural PARAMETERS the
    * index's key derivation depends on (window length L, shingle k,
    * band count, ...): a probe or append run with a different value
    * would derive different keys and silently find NOTHING — the
    * modulus-disagreement failure mode at the parameter level. Probes
    * check them via [[requireParam]]. */
  def write(
      spark: SparkSession,
      indexPath: String,
      buckets: Int,
      params: Map[String, Int] = Map.empty): Unit = {
    // tmp + rename, never truncate-in-place: a probe racing a rebuild's
    // meta overwrite must see the old file or the new one — a partially
    // written buckets.json would otherwise parse as "no recorded count"
    // and silently probe with the 64-bucket default (the exact
    // false-negative pruning the recorded modulus exists to prevent).
    // Rename is atomic on local/HDFS semantics; object stores get
    // close-then-swap, the best a file-shaped meta can do there.
    val p = new Path(s"$indexPath/buckets.json")
    val tmp = new Path(s"$indexPath/buckets.json.tmp")
    val fs = p.getFileSystem(new Configuration())
    val out = fs.create(tmp, true)
    val extra = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""","$k":$v""" }.mkString
    try out.write(s"""{"buckets":$buckets$extra}""".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) throw new java.io.IOException(
      s"could not publish $tmp -> $p")
  }

  /** The raw meta file, or None when absent. Present-but-unreadable
    * content is surfaced by the parsers below, never defaulted. */
  private def readRaw(indexPath: String): Option[String] = {
    val p = new Path(s"$indexPath/buckets.json")
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    }
  }

  /** Fail loudly on a present-but-unparseable meta file: defaulting here
    * would let a probe run with the wrong modulus (silent false
    * negatives) after a torn write or manual damage. */
  private def parsedBuckets(indexPath: String, s: String): Int =
    """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"index meta $indexPath/buckets.json exists but does not parse " +
          s"(${s.take(80)}) — refusing to default to $DefaultBuckets " +
          "buckets; restore or rebuild the index"))

  /** A recorded structural parameter, or None for indexes that predate
    * parameter recording. */
  def readParam(spark: SparkSession, indexPath: String, key: String): Option[Int] = {
    readRaw(indexPath).flatMap { s =>
      parsedBuckets(indexPath, s) // corrupt meta throws; a missing PARAM
      // key on a valid file is legitimate (pre-recording index) -> None
      (s""""$key"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(s).map(_.group(1).toInt)
    }
  }

  /** Fail LOUDLY when a probe/append's structural parameter disagrees
    * with the one the index was built with (recorded indexes only —
    * pre-recording indexes keep the caller contract). */
  def requireParam(
      spark: SparkSession, indexPath: String, key: String, expected: Int): Unit =
    readParam(spark, indexPath, key).foreach { v =>
      if (v != expected) throw new IllegalArgumentException(
        s"index at $indexPath was built with $key=$v but this call passes " +
          s"$key=$expected — mismatched key derivation would silently find " +
          "no candidates; use the recorded value or rebuild the index")
    }

  /** The recorded bucket count, or [[DefaultBuckets]] for pre-meta
    * indexes. */
  def read(spark: SparkSession, indexPath: String): Int =
    readRaw(indexPath).map(parsedBuckets(indexPath, _)).getOrElse(DefaultBuckets)

  /** Resolve an API-level `buckets` argument: positive = explicit
    * (caller-fixed), 0 = the index's recorded count (append/probe
    * paths), falling back to [[DefaultBuckets]]. */
  def resolve(spark: SparkSession, indexPath: String, buckets: Int): Int =
    if (buckets > 0) buckets else read(spark, indexPath)

  /** Whether the index already records a bucket count. */
  def exists(spark: SparkSession, indexPath: String): Boolean = {
    val p = new Path(s"$indexPath/buckets.json")
    p.getFileSystem(new Configuration()).exists(p)
  }

  /** [[resolve]] that also RECORDS the resolved count when the meta file
    * is absent — the append paths' contract: an index created COLD via
    * an append (a streaming deployment's first batch) would otherwise
    * work only because every reader falls back to the same implicit
    * [[DefaultBuckets]], which breaks silently if the default ever
    * changes or a later caller passes an explicit count. */
  /** An EXPLICIT bucket count on a probe/append of a recorded index must
    * match the recorded one — an override would derive a different
    * modulus and silently prune matches away (only a REBUILD may change
    * the count; it rewrites the meta). */
  private def checkExplicit(spark: SparkSession, indexPath: String, buckets: Int): Unit =
    if (buckets > 0 && exists(spark, indexPath)) {
      val rec = read(spark, indexPath)
      if (rec != buckets) throw new IllegalArgumentException(
        s"index at $indexPath records $rec buckets but this probe/append " +
          s"passes an explicit $buckets — a modulus override silently prunes " +
          "matches away; pass 0 to follow the recorded count, or rebuild")
    }

  def resolveAndRecord(
      spark: SparkSession,
      indexPath: String,
      buckets: Int,
      params: Map[String, Int] = Map.empty): Int = {
    // NOTE: cold creation is check-then-write — two CONCURRENT first
    // appends to the same index path can record different moduli
    // (last-writer-wins). Concurrent cold appends are unsupported; the
    // streaming gates are single-writer by contract (one query per
    // index), and a deployment fanning writers out must seed the index
    // with an explicit write*Index build first.
    checkExplicit(spark, indexPath, buckets)
    val b = resolve(spark, indexPath, buckets)
    if (!exists(spark, indexPath)) write(spark, indexPath, b, params)
    b
  }

  /** [[resolve]] plus a LAYOUT VALIDATION for the probe paths: one
    * directory listing of the bucketed data table, failing loudly when
    * any on-disk `partCol=N` directory has `N >= count`. That is the
    * detectable half of a torn index rebuild (meta written, data
    * re-partitioned under a LARGER modulus before a crash): probing
    * with the stale smaller modulus would PRUNE AWAY directories that
    * hold real matches — silent false negatives, the failure mode this
    * object's doc warns about. The converse tear (data at a smaller
    * modulus than the meta) is not layout-detectable and is covered by
    * the writers' documented rebuild discipline (rebuild = re-run the
    * whole build; a torn rebuild must be re-run, not probed). Cost: one
    * `listStatus` RPC per probe, ≤ 65536 entries.
    */
  def validated(
      spark: SparkSession,
      indexPath: String,
      buckets: Int,
      dataDir: String,
      partCol: String): Int = {
    checkExplicit(spark, indexPath, buckets)
    val b = resolve(spark, indexPath, buckets)
    val p = new Path(s"$indexPath/$dataDir")
    val fs = p.getFileSystem(new Configuration())
    if (fs.exists(p)) {
      val pre = partCol + "="
      val seen = fs.listStatus(p).iterator.map(_.getPath.getName)
        .filter(n => n.startsWith(pre) && n.drop(pre.length).forall(_.isDigit))
        .map(_.drop(pre.length).toInt)
      val bad = seen.filter(_ >= b).toSeq
      if (bad.nonEmpty) throw new IllegalStateException(
        s"index at $indexPath records $b buckets but $dataDir/ holds " +
          s"partitions ${bad.sorted.take(5).mkString(", ")}... — the index " +
          "layout and buckets.json disagree (torn rebuild?); rebuild the " +
          "index before probing, or probes would silently prune away matches")
    }
    b
  }
}
