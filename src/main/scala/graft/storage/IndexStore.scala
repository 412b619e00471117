package graft.storage

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.VoxelType

/** One materialized-index row: annotation id `id` occurs in the cuboid
  * addressed by (lookupKey, res, t, morton). `id = 0` is a tombstone —
  * "this cuboid key was rewritten at this version" — so a cuboid whose
  * rewrite removed every id still masks its stale entries during chain
  * resolution ([[IndexStore.read]] drops tombstones after masking).
  */
final case class IdxRow(lookupKey: String, res: Int, t: Int, morton: Long, id: Long)

/** Persistent id⇄cuboid index — the engine's analog of the reference's
  * DynamoDB id-index / s3-index pair (`spdb/spatialdb/object_indices.py:
  * 167-347, 373-432`), which the reference maintains on every write so
  * loose bounding boxes and interior ids-in-region never touch voxel
  * data. One FLAT table serves both directions: group by morton and you
  * have the s3-index (cuboid → id set); filter by id and you have the
  * id-index (id → cuboid set). Rows are id-clustered on disk so the
  * id-index probe — the `get_bounding_box` hot path — prunes to a few
  * parquet row groups instead of scanning the index.
  *
  * Versioning piggybacks on [[VersionedStore]]'s commit machinery under
  * `storeRoot/_index`: a write's index delta is the flat rows of exactly
  * the touched cuboids (plus tombstones), committed with a `_DELTA`
  * marker; readers mask older versions per cuboid key. The index commit
  * FOLLOWS the data commit (two commits, not one transaction) — the lag
  * window the reference's asynchronous DynamoDB index updates also have —
  * but unlike the reference the window is CLOSED at both ends: every
  * index version records the store version it covers (`_STORE_V`), so
  * [[readCurrent]] detects index-behind-store and masks the missing store
  * versions' rows in on the fly (readers never observe the stale index,
  * even if the writer died between the two commits), and the next
  * successful index commit re-derives every unindexed version's delta
  * ([[deltaRowsFor]]), healing the standing index deterministically.
  */
object IndexStore {

  def path(storeRoot: String): String = s"$storeRoot/_index"

  def exists(path: String): Boolean = VersionedStore.currentVersion(path).isDefined

  /** The store version the current index snapshot covers (its `_STORE_V`
    * stamp); None when no index exists or the stamp is unreadable — both
    * mean "coverage unknown", which callers must treat as fully stale.
    * The per-version stamp is IMMUTABLE once its version is current
    * (written inside the commit lock before the pointer publish), so it
    * memoizes unconditionally — only the pointer read pays IO.
    */
  def coveredStoreVersion(path: String): Option[Int] =
    VersionedStore.currentVersion(path).flatMap { v =>
      stampCache.computeIfAbsent(s"$path/v$v", _ => {
        val p = Paths.get(path, s"v$v", "_STORE_V")
        if (!Files.exists(p)) None
        else
          try Some(new String(Files.readAllBytes(p), "UTF-8").trim.toInt)
          catch { case _: NumberFormatException => None }
      })
    }

  private val stampCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Int]]()

  /** Flat index rows for a cuboid set: one row per distinct non-zero id in
    * each blob, plus one unconditional `id = 0` tombstone per cuboid key.
    * Runs as a typed flatMap directly over the blobs — no voxel-plane
    * explosion (a 4 MiB cuboid yields its distinct-id set, not 4M rows).
    */
  def fromCuboids(cuboids: Dataset[CuboidRow], vt: VoxelType): Dataset[IdxRow] = {
    val spark = cuboids.sparkSession
    import spark.implicits._
    val width = vt.byteWidth
    cuboids.flatMap { c =>
      val buf = ByteBuffer.wrap(c.data).order(ByteOrder.LITTLE_ENDIAN)
      val n = c.data.length / width
      val seen = scala.collection.mutable.HashSet.empty[Long]
      var i = 0
      while (i < n) {
        val v = vt.read(buf, i)
        if (v != 0L) { seen += v; () }
        i += 1
      }
      Iterator.single(IdxRow(c.lookupKey, c.res, c.t, c.morton, 0L)) ++
        seen.iterator.map(id => IdxRow(c.lookupKey, c.res, c.t, c.morton, id))
    }
  }

  /** Bring index coverage up to store version `storeV` — the self-healing
    * index commit behind [[graft.GraftDB]]'s write path. The coverage
    * read, the delta/full decision, the row derivation and the `_STORE_V`
    * stamp ALL execute inside the index commit lock, so the stamp is
    * monotone by construction: two racing façade writers serialize here,
    * the second observes the first's coverage, and the
    * lower-store-version writer can never land last and mask the newer
    * rows (the check-then-act race a lock-free pre-check allows).
    *
    * Scope is self-healing, as in the reference's per-write DynamoDB
    * index updates (`object_indices.py:730-817`) but with the crash
    * window closed: a commit covers EVERY store version since the one
    * its predecessor was stamped with, so
    *  - bootstrap (a store with pre-index history) forces a FULL build;
    *  - crash repair (a writer that died between its data commit and its
    *    index commit) is folded into the next writer's delta via
    *    [[deltaRowsFor]] newest-wins masking.
    * `full = true` forces a full rebuild (hierarchy builds re-derive
    * every level wholesale). No-op (no new index version) when coverage
    * already reaches `storeV` and `full` is false.
    */
  def commitCovering(
      spark: SparkSession, path: String, storeRoot: String,
      storeV: Int, full: Boolean, vt: VoxelType): Option[Int] =
    VersionedStore.withCommitLockAbortable(path) { next =>
      val covered = coveredStoreVersion(path)
      if (!full && covered.exists(_ >= storeV)) false // racer already covered us
      else {
        val floor = covered.getOrElse(-1)
        val stampV = math.max(storeV, floor)
        val missing = (floor + 1) to stampV
        val needFull = full ||
          (covered.isEmpty && storeV > 0) || // no/unstamped index, prior history
          !missing.forall(VersionedStore.isDelta(storeRoot, _))
        if (needFull) {
          write(fromCuboids(VersionedStore.read(spark, storeRoot), vt),
            s"$path/v$next", clustered = true)
        } else {
          write(deltaRowsFor(spark, storeRoot, missing, vt),
            s"$path/v$next", clustered = false)
          Files.write(Paths.get(path, s"v$next", "_DELTA"), Array.emptyByteArray)
          ()
        }
        stamp(path, next, stampV)
        true
      }
    }

  private def stamp(path: String, next: Int, storeV: Int): Unit = {
    Files.write(Paths.get(path, s"v$next", "_STORE_V"),
      storeV.toString.getBytes("UTF-8"))
    ()
  }

  private def write(rows: Dataset[IdxRow], dir: String, clustered: Boolean): Unit = {
    // id-clustered so `id = X` probes prune row groups (the bbox hot
    // path); deltas skip the range shuffle like the cuboid store's
    val arranged =
      if (clustered) rows.repartitionByRange(col("id")).sortWithinPartitions("id", "morton")
      else rows.sortWithinPartitions("id", "morton")
    arranged.write.mode("overwrite").parquet(dir)
  }

  /** Collapse the delta chain into one id-clustered full snapshot
    * (maintenance job, like [[VersionedStore.compact]]; readers never
    * require it — chain resolution is exact at any depth). Compacts the
    * REPAIRED view ([[readCurrent]]) so an index-behind-store state is
    * healed, not baked in; `storeV` is the store version whose content
    * the compacted snapshot therefore covers. `preV` is the store version
    * current BEFORE the store's own compaction: when the index already
    * covered it, compaction is a pure chain collapse (no store IO —
    * content-preserving, so coverage carries to `storeV`); only an
    * actually-behind index pays the repair read.
    */
  def compact(
      spark: SparkSession, path: String, storeRoot: String,
      vt: VoxelType, preV: Option[Int], storeV: Int): Int = {
    import spark.implicits._
    // coverage check AND chain resolution inside the commit lock (the
    // same discipline as [[commitCovering]]): a racing writer's index
    // delta committed after a lock-free resolution would be masked
    // wholesale by the compacted full snapshot
    VersionedStore.withCommitLock(path) { next =>
      val covered = coveredStoreVersion(path)
      val rows =
        if (covered.isDefined && covered == preV) read(spark, path)
        else readCurrent(spark, path, storeRoot, vt)
      write(rows.as[IdxRow], s"$path/v$next", clustered = true)
      stamp(path, next, math.max(storeV, covered.getOrElse(-1)))
    }
  }

  /** Index rows (tombstones included) of the store's committed version
    * directories `vs` — all deltas — with newest-wins masking per cuboid
    * key across them, i.e. exactly the delta that brings an index covering
    * `vs.min - 1` up to `vs.max`. O(sum of the versions' write sizes).
    */
  private[graft] def deltaRowsFor(
      spark: SparkSession, storeRoot: String, vs: Seq[Int],
      vt: VoxelType): Dataset[IdxRow] = {
    import spark.implicits._
    if (vs.isEmpty) spark.emptyDataset[IdxRow]
    else if (vs.lengthCompare(1) == 0)
      fromCuboids(CuboidStore.read(spark, s"$storeRoot/v${vs.head}"), vt)
    else {
      import org.apache.spark.sql.expressions.Window
      val union = vs.map { v =>
        fromCuboids(CuboidStore.read(spark, s"$storeRoot/v$v"), vt)
          .toDF().withColumn("__v", lit(v))
      }.reduce(_ unionByName _)
      val w = Window.partitionBy(col("lookupKey"), col("res"), col("t"), col("morton"))
      union.withColumn("__mx", max(col("__v")).over(w))
        .where(col("__v") === col("__mx"))
        .drop("__v", "__mx")
        .as[IdxRow]
    }
  }

  /** [[read]], plus on-the-fly repair of the data-commit/index-commit
    * crash window: when the index's covered store version is behind the
    * store's `_CURRENT`, the missing versions' index rows are derived
    * from their committed version directories and mask the standing index
    * (per cuboid key, tombstones honored) — so a reader NEVER observes
    * the one-write-stale index, even if the writer died between the two
    * commits. The repair is read-only; the standing index heals at the
    * next index commit (see [[graft.GraftDB]]'s `commitIndexFor`). Cost:
    * one O(1) stamp read when current (the overwhelmingly common case);
    * O(missing writes) extra when inside the crash window; O(store) only
    * when coverage is unknown or a full-snapshot store version landed
    * unindexed — the re-derive-everything fallback.
    */
  def readCurrent(
      spark: SparkSession, path: String, storeRoot: String,
      vt: VoxelType): DataFrame = {
    import spark.implicits._
    val cur = VersionedStore.currentVersion(storeRoot).getOrElse(-1)
    val covered = coveredStoreVersion(path).getOrElse(-2)
    if (covered >= cur) read(spark, path)
    else {
      val missing = (math.max(covered, -1) + 1) to cur
      if (covered < -1 || !missing.forall(VersionedStore.isDelta(storeRoot, _)))
        // coverage unknown, or a full store snapshot in the gap wiped
        // keys wholesale: masking cannot fix the standing index —
        // re-derive from the resolved store
        fromCuboids(VersionedStore.read(spark, storeRoot), vt)
          .toDF().where(col("id") =!= 0L)
      else {
        import org.apache.spark.sql.expressions.Window
        val topUp = deltaRowsFor(spark, storeRoot, missing, vt)
        val w = Window.partitionBy(col("lookupKey"), col("res"), col("t"), col("morton"))
        read(spark, path).withColumn("__v", lit(0))
          .unionByName(topUp.toDF().withColumn("__v", lit(1)))
          .withColumn("__mx", max(col("__v")).over(w))
          .where(col("__v") === col("__mx") && col("id") =!= 0L)
          .drop("__v", "__mx")
      }
    }
  }

  /** Resolved current index: flat (lookupKey, res, t, morton, id) rows,
    * tombstones removed. Delta chains resolve per cuboid key — a key's
    * rows all come from the newest version that wrote that key (max-__v
    * masking rather than row_number, because one key legitimately holds
    * many id rows).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    VersionedStore.currentVersion(path) match {
      case None => spark.emptyDataset[IdxRow].toDF()
      case Some(v) =>
        val chain = VersionedStore.versionChain(path, v)
        val resolved =
          if (chain.lengthCompare(1) == 0) readVersion(spark, s"$path/v$v")
          else {
            import org.apache.spark.sql.expressions.Window
            val union = chain.map { ver =>
              readVersion(spark, s"$path/v$ver").withColumn("__v", lit(ver))
            }.reduce(_ union _)
            val w = Window.partitionBy(col("lookupKey"), col("res"), col("t"), col("morton"))
            union.withColumn("__mx", max(col("__v")).over(w))
              .where(col("__v") === col("__mx"))
              .drop("__v", "__mx")
          }
        resolved.where(col("id") =!= 0L)
    }
  }

  private def readVersion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // explicit schema: inference throws on a file-less version directory
    // (the index delta of an empty write); explicit reads yield empty
    val schema = StructType(Seq(
      StructField("lookupKey", StringType), StructField("res", IntegerType),
      StructField("t", IntegerType), StructField("morton", LongType),
      StructField("id", LongType)))
    spark.read.schema(schema).parquet(dir).select(
      col("lookupKey").cast("string"),
      col("res").cast("int"),
      col("t").cast("int"),
      col("morton").cast("long"),
      col("id").cast("long"))
  }
}
