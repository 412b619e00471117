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
  * Scale note: a commit REWRITES the full snapshot directory (the merge
  * itself only shuffles touched cuboids — see `CuboidMerge` — but the
  * untouched bytes are still copied). That is the honest cost of
  * snapshot isolation without a table format; on a production cluster
  * this store is the slot where Delta/Iceberg `MERGE INTO` drops in
  * (file-level reuse + the same atomic-visibility contract), with zero
  * changes to the operators above it.
  */
object VersionedStore {

  private def currentFile(path: String): Path = Paths.get(path, "_CURRENT")
  private def lockFile(path: String): Path = Paths.get(path, "_LOCK")

  def currentVersion(path: String): Option[Int] = {
    val f = currentFile(path)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  def isLocked(path: String): Boolean = Files.exists(lockFile(path))

  /** W6: set/clear the channel write lock. */
  def setLock(path: String, locked: Boolean): Unit = {
    Files.createDirectories(Paths.get(path))
    if (locked) { Files.write(lockFile(path), Array.emptyByteArray); () }
    else { Files.deleteIfExists(lockFile(path)); () }
  }

  /** Read the current snapshot (empty dataset if nothing committed). */
  def read(spark: SparkSession, path: String): Dataset[CuboidRow] = {
    import spark.implicits._
    currentVersion(path) match {
      case Some(v) => CuboidStore.read(spark, s"$path/v$v")
      case None    => spark.emptyDataset[CuboidRow]
    }
  }

  /** Commit a new snapshot: write `v{n+1}`, then atomically replace
    * `_CURRENT`. Readers of the old version are unaffected (their file
    * listing is already resolved). Returns the committed version.
    *
    * Concurrent committers serialize on an exclusive `_COMMIT` marker
    * (atomic createFile) so two writers can never race to the same
    * version directory; stale markers (crashed committer) expire after
    * `CommitLockTimeoutMs`.
    */
  def commit(cuboids: Dataset[CuboidRow], path: String): Int = {
    if (isLocked(path))
      throw new IllegalStateException(s"store $path is write-locked")
    Files.createDirectories(Paths.get(path))
    val marker = Paths.get(path, "_COMMIT")
    val deadline = System.currentTimeMillis() + CommitLockTimeoutMs
    while (!tryAcquire(marker)) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(s"commit lock on $path not released")
      Thread.sleep(20)
    }
    try {
      val next = currentVersion(path).getOrElse(-1) + 1
      CuboidStore.write(cuboids, s"$path/v$next")
      val tmp = Paths.get(path, s"_CURRENT.tmp$next")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, currentFile(path), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      next
    } finally {
      Files.deleteIfExists(marker)
      ()
    }
  }

  final val CommitLockTimeoutMs = 600000L

  private def tryAcquire(marker: Path): Boolean =
    try { Files.createFile(marker); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        // crashed committer recovery: break stale markers
        try {
          val age = System.currentTimeMillis() -
            Files.getLastModifiedTime(marker).toMillis
          if (age > CommitLockTimeoutMs) Files.deleteIfExists(marker)
        } catch { case _: java.io.IOException => () }
        false
    }
}
