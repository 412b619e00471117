package graft.storage

import java.nio.file.{Files, Path, StandardCopyOption}

/** The control-plane primitives the engine's stores need from their
  * storage system, extracted behind one interface so the local-FS
  * implementation this sandbox runs on is swappable for an object-store
  * one without touching [[VersionedStore]] / [[graft.engine.IdReservation]]
  * logic. Exactly three primitives exist:
  *
  *  1. [[tryCreateExclusive]] — create-if-absent of a small marker object
  *     (mutex acquire / CAS guard),
  *  2. [[publish]] — atomically replace a small pointer object (readers
  *     see the old or the new content, never a torn write),
  *  3. [[readSmall]] — read-after-write-consistent read of that pointer.
  *
  * Everything data-plane (version directories, `_DELTA` markers, parquet
  * IO) is bulk-immutable and already storage-agnostic.
  *
  * LOCAL FS ([[LocalFsCommitProtocol]]): `Files.createFile` is atomic on
  * POSIX filesystems and HDFS; `ATOMIC_MOVE` over the target gives the
  * torn-free pointer replace.
  *
  * S3 DESIGN NOTE (the 100 TB deployment): S3 conditional writes make all
  * three primitives direct calls — [[tryCreateExclusive]] is `PutObject`
  * with `If-None-Match: *` (HTTP 412 → false), [[publish]] is a plain
  * `PutObject` (per-object atomic, read-after-write consistent),
  * [[readSmall]] is `GetObject`, and [[ageMs]] reads the object's
  * `Last-Modified` for the same stale-marker-breaking rule. On stores
  * without conditional writes the acquire falls back to an external lock
  * row (DynamoDB conditional update) — the Delta LogStore / Iceberg
  * lock-manager playbook.
  */
trait CommitProtocol {

  /** Atomically create `marker` iff absent; false when it already exists. */
  def tryCreateExclusive(marker: Path): Boolean

  /** Milliseconds since `marker` was written; None if it vanished. */
  def ageMs(marker: Path): Option[Long]

  /** Remove `marker` if present (mutex release; idempotent). */
  def delete(marker: Path): Unit

  /** Atomically replace `target` with `content` — never observable torn. */
  def publish(target: Path, content: Array[Byte]): Unit

  /** Read-after-write-consistent read of `target`; None if absent. */
  def readSmall(target: Path): Option[Array[Byte]]

  /** Mutex acquire over [[tryCreateExclusive]] with crashed-holder
    * recovery: a marker older than `staleMs` is broken (its holder
    * crashed without [[delete]]); polls every `pollMs` until `deadlineMs`
    * from now. Returns true once acquired, false on deadline.
    */
  final def acquireMutex(
      marker: Path, staleMs: Long, deadlineMs: Long, pollMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + deadlineMs
    while (true) {
      if (tryCreateExclusive(marker)) return true
      ageMs(marker).foreach { age => if (age > staleMs) delete(marker) }
      if (System.currentTimeMillis() > deadline) return false
      Thread.sleep(pollMs)
    }
    false // unreachable
  }
}

/** POSIX/HDFS implementation — see the trait's atomicity notes. */
object LocalFsCommitProtocol extends CommitProtocol {

  override def tryCreateExclusive(marker: Path): Boolean =
    try { Files.createFile(marker); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  override def ageMs(marker: Path): Option[Long] =
    try Some(System.currentTimeMillis() - Files.getLastModifiedTime(marker).toMillis)
    catch { case _: java.io.IOException => None }

  override def delete(marker: Path): Unit = {
    try { Files.deleteIfExists(marker); () }
    catch { case _: java.io.IOException => () }
  }

  override def publish(target: Path, content: Array[Byte]): Unit = {
    val tmp = target.resolveSibling(
      s"${target.getFileName}.tmp${Thread.currentThread().getId}")
    Files.write(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  override def readSmall(target: Path): Option[Array[Byte]] =
    if (Files.exists(target)) Some(Files.readAllBytes(target)) else None
}
