package graft.storage

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Versioned cuboid store with atomic snapshot commits — the stand-in for
  * an ACID table format that deletes the reference's entire write-
  * coordination machinery (SURVEY §2.9 W2-W5: page-out sets, delayed-write
  * queues, dirty-read polling, pub/sub): readers always see the last
  * committed version; a commit writes a fresh `v{n}` directory and
  * atomically swings the `_CURRENT` pointer.
  *
  * W6 write-lock (`state.py:157-185`): a `_LOCK` marker file acts as the
  * channel-level circuit breaker — commits refuse while it exists.
  *
  * Scale note: a full `commit` rewrites the snapshot directory, but the
  * write path streams through `commitDelta`: only touched cuboids are
  * written (with a `_DELTA` marker) and `read` masks older versions
  * key-by-key, so a write's IO scales with the write, not the store —
  * the file-level-reuse property a Delta/Iceberg `MERGE INTO` provides,
  * with the same atomic-visibility contract. `compact` collapses long
  * chains as a maintenance job, exactly like table-format compaction.
  *
  * Commit coordination goes through [[CommitProtocol]] — the writer
  * mutex, the `_CURRENT` pointer swing, and their atomicity requirements
  * live behind that interface ([[LocalFsCommitProtocol]] here; see the
  * trait's S3 conditional-PUT design note for the object-store
  * deployment). Every other code path is storage-agnostic through the
  * Hadoop FS layer.
  */
object VersionedStore {

  /** Pluggable control-plane primitives (local-FS in this sandbox;
    * test-swappable so the racing-committer batteries run over the
    * rename-less [[ObjectStoreCommitProtocol]] too).
    */
  @volatile private[graft] var protocol: CommitProtocol = LocalFsCommitProtocol

  private def currentFile(path: String): Path = Paths.get(path, "_CURRENT")
  private def lockFile(path: String): Path = Paths.get(path, "_LOCK")

  /** The hot pointer read of every query — stamp-memoized
    * ([[ControlCache]]): repeated resolutions of an unchanged snapshot
    * cost one stat, not one readSmall each.
    */
  def currentVersion(path: String): Option[Int] =
    ControlCache.readSmall(protocol, currentFile(path))
      .map(b => new String(b, StandardCharsets.UTF_8).trim.toInt)

  def isLocked(path: String): Boolean = Files.exists(lockFile(path))

  /** W6: set/clear the channel write lock. */
  def setLock(path: String, locked: Boolean): Unit = {
    Files.createDirectories(Paths.get(path))
    if (locked) { protocol.tryCreateExclusive(lockFile(path)); () }
    else protocol.delete(lockFile(path))
  }

  private def isDeltaVersion(path: String, v: Int): Boolean =
    Files.exists(Paths.get(path, s"v$v", "_DELTA"))

  /** Whether version `v` was committed as a delta (masks older versions
    * key-by-key) rather than a full snapshot. Public so maintenance jobs
    * (incremental hierarchy propagation) can classify the versions
    * committed since their last run.
    */
  def isDelta(path: String, v: Int): Boolean = isDeltaVersion(path, v)

  /** Newest-first version chain ending at the most recent full snapshot
    * (or v0). Each delta masks older versions key-by-key on read.
    */
  private[storage] def versionChain(path: String, cur: Int): Seq[Int] = {
    val b = Seq.newBuilder[Int]
    var v = cur
    while (v > 0 && isDeltaVersion(path, v)) { b += v; v -= 1 }
    b += v
    b.result()
  }

  /** Read the current snapshot (empty dataset if nothing committed).
    * A delta chain resolves distributively: union the chain with a
    * version column and keep the newest row per cuboid key — no driver-
    * side materialization, one shuffle on the cuboid key regardless of
    * chain depth. Chains shorten via [[compact]].
    */
  def read(spark: SparkSession, path: String): Dataset[CuboidRow] = {
    import spark.implicits._
    currentVersion(path) match {
      case None => spark.emptyDataset[CuboidRow]
      case Some(v) =>
        val chain = versionChain(path, v)
        if (chain.lengthCompare(1) == 0) CuboidStore.read(spark, s"$path/v$v")
        else {
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions.{col, lit, row_number}
          val union = chain.map { ver =>
            CuboidStore.read(spark, s"$path/v$ver").toDF()
              .withColumn("__v", lit(ver))
          }.reduce(_ union _)
          val w = Window
            .partitionBy(col("lookupKey"), col("res"), col("t"), col("morton"))
            .orderBy(col("__v").desc)
          union.withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1)
            .drop("__v", "__rn")
            .as[CuboidRow]
        }
    }
  }

  /** [[read]] restricted to the cuboid keys in `keys` (columns
    * `lookupKey, res, t, morton`): every chain member is semi-joined to
    * the (broadcast) key set BEFORE chain resolution, so reading the
    * current state of a write's footprint costs O(touched × depth) — the
    * Z-clustered store's row-group min/max prune does the heavy lifting
    * inside each version scan. This is what makes a delta-commit
    * micro-batch O(batch): without it, resolving `existing` would
    * shuffle the whole store per batch.
    */
  /** Key-footprint cap for literal pushdown in [[readForKeys]] — mirrors
    * the engine-wide 4096 `isin` guard (SpatialOps covering sets).
    */
  private val PushdownCap = 4096

  def readForKeys(
      spark: SparkSession,
      path: String,
      keys: org.apache.spark.sql.DataFrame): Dataset[CuboidRow] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, col, lit, row_number}
    val keyCols = Seq("lookupKey", "res", "t", "morton")
    currentVersion(path) match {
      case None => spark.emptyDataset[CuboidRow]
      case Some(v) =>
        val chain = versionChain(path, v)
        // A semi-join alone reaches the scan as a runtime filter at best:
        // it can prune neither the (lookupKey, res) partition directories
        // nor the Z-clustered morton row groups, so every chain member
        // reads its full blob column. Collect the key footprint (bounded —
        // it is O(one write) by contract here) and push it as literal In
        // predicates; the broadcast semi-join below stays for exactness.
        val ks = keys
          .select(col("lookupKey"), col("res").cast("int"),
            col("t").cast("int"), col("morton").cast("long"))
          .distinct().limit(PushdownCap + 1).collect()
        if (ks.isEmpty) return spark.emptyDataset[CuboidRow]
        // Under the cap, the collected footprint itself becomes the
        // broadcast side (a LocalRelation): the keys frame's lineage is
        // never re-executed for the broadcast build — one driver collect
        // serves both the literal pushdown and the exact semi-join.
        val (prefilter, semiKeys): (
            org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
            org.apache.spark.sql.DataFrame) =
          if (ks.length > PushdownCap) (identity, keys.select(keyCols.map(col): _*))
          else {
            val lks = ks.map(_.getString(0)).distinct.toSeq
            val rs = ks.map(_.getInt(1)).distinct.toSeq
            val ts = ks.map(_.getInt(2)).distinct.toSeq
            val ms = ks.map(_.getLong(3)).distinct.toSeq
            val schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("lookupKey",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("res",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("t",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("morton",
                org.apache.spark.sql.types.LongType)))
            val local = spark.createDataFrame(
              java.util.Arrays.asList(ks: _*), schema)
            (df => df.where(
              col("lookupKey").isin(lks: _*) && col("res").isin(rs: _*) &&
                col("t").isin(ts: _*) && col("morton").isin(ms: _*)),
              local)
          }
        val pruned = chain.map { ver =>
          prefilter(CuboidStore.read(spark, s"$path/v$ver").toDF())
            .join(broadcast(semiKeys), keyCols, "left_semi")
            .withColumn("__v", lit(ver))
        }.reduce(_ union _)
        val w = Window
          .partitionBy(col("lookupKey"), col("res"), col("t"), col("morton"))
          .orderBy(col("__v").desc)
        pruned.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .drop("__v", "__rn")
          .as[CuboidRow]
    }
  }

  /** Commit a new full snapshot: write `v{n+1}`, then atomically replace
    * `_CURRENT`. Readers of the old version are unaffected (their file
    * listing is already resolved). Returns the committed version.
    *
    * Concurrent committers serialize on an exclusive `_COMMIT` marker
    * (atomic createFile) so two writers can never race to the same
    * version directory; stale markers (crashed committer) expire after
    * `CommitLockTimeoutMs`.
    */
  def commit(cuboids: Dataset[CuboidRow], path: String): Int =
    withCommitLock(path) { next =>
      CuboidStore.write(cuboids, s"$path/v$next")
    }

  /** Commit only the cuboids a write touched (from
    * [[graft.engine.CuboidMerge.mergeDelta]]): the version directory gets
    * a `_DELTA` marker (ignored by the parquet reader, like `_SUCCESS`)
    * and [[read]] masks older versions key-by-key. Write volume scales
    * with the write, not the store — the file-level-reuse half of what a
    * Delta/Iceberg `MERGE INTO` would provide, with the same atomic-
    * visibility contract.
    */
  def commitDelta(touched: Dataset[CuboidRow], path: String): Int =
    withCommitLock(path) { next =>
      CuboidStore.write(touched, s"$path/v$next", clustered = false)
      Files.write(Paths.get(path, s"v$next", "_DELTA"), Array.emptyByteArray)
      ()
    }

  /** Collapse the delta chain into a fresh full snapshot (maintenance
    * job; readers never require it). The chain is resolved INSIDE the
    * commit lock: resolving it first and then committing would let a
    * delta land in between, and the full snapshot — masking everything
    * older key-by-key — would silently erase that racer's write. With
    * the resolution under the lock, compaction is content-preserving
    * under any interleaving with writers.
    */
  def compact(spark: SparkSession, path: String): Int =
    withCommitLock(path) { next =>
      CuboidStore.write(read(spark, path), s"$path/v$next")
    }

  private[storage] def withCommitLock(path: String)(write: Int => Unit): Int =
    withCommitLockAbortable(path) { next => write(next); true }
      .getOrElse(throw new IllegalStateException(s"commit to $path aborted"))

  /** [[withCommitLock]] whose body may ABORT: returning false skips the
    * pointer publish (no new version becomes visible) and yields None.
    * This is what lets a committer make its do-I-even-need-to-commit
    * decision INSIDE the lock — e.g. [[IndexStore.commitCovering]]'s
    * coverage check, which would be a check-then-act race if evaluated
    * before acquiring the mutex. An aborting body must not have written
    * anything under `v{next}`.
    */
  private[storage] def withCommitLockAbortable(
      path: String)(write: Int => Boolean): Option[Int] = {
    if (isLocked(path))
      throw new IllegalStateException(s"store $path is write-locked")
    Files.createDirectories(Paths.get(path))
    val marker = Paths.get(path, "_COMMIT")
    if (!protocol.acquireMutex(marker, staleMs = CommitLockTimeoutMs,
        deadlineMs = CommitLockTimeoutMs, pollMs = 20))
      throw new IllegalStateException(s"commit lock on $path not released")
    try {
      val next = currentVersion(path).getOrElse(-1) + 1
      if (!write(next)) None
      else {
        protocol.publish(currentFile(path),
          next.toString.getBytes(StandardCharsets.UTF_8))
        Some(next)
      }
    } finally protocol.delete(marker)
  }

  final val CommitLockTimeoutMs = 600000L
}
