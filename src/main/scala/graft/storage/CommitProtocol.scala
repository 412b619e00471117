package graft.storage

import java.nio.file.{DirectoryStream, Files, Path, StandardCopyOption}

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
  * TWO implementations ship, and the StreamSpec racing-committer /
  * concurrent-reservation batteries run against BOTH:
  *
  *  - [[LocalFsCommitProtocol]] (POSIX/HDFS): `Files.createFile` is
  *    atomic; `ATOMIC_MOVE` over the target gives the torn-free pointer
  *    replace.
  *  - [[ObjectStoreCommitProtocol]] (rename-less emulation): allows
  *    itself ONLY object-store verbs — create-object-if-absent, list,
  *    stat, delete; no atomic rename, no in-place overwrite. [[publish]]
  *    becomes an append-only generation chain of immutable objects whose
  *    tiny content rides in the object NAME (directory-entry creation is
  *    the atomic step), [[readSmall]] resolves the max generation. This
  *    is the put-if-absent-only discipline S3 conditional writes give.
  *
  * S3 MAPPING (the 100 TB deployment): [[tryCreateExclusive]] is
  * `PutObject` with `If-None-Match: *` (HTTP 412 → false), [[publish]] is
  * a plain `PutObject` (per-object atomic, read-after-write consistent),
  * [[readSmall]] is `GetObject`, [[stampMs]] reads `Last-Modified` (or
  * the ETag as the identity token), and [[deleteIfStamp]] is
  * `DeleteObject` with `If-Match` on the observed ETag — on S3 the
  * conditional stale-break is therefore EXACT, with no re-check window.
  * On stores without conditional writes the acquire falls back to an
  * external lock row (DynamoDB conditional update) — the Delta LogStore /
  * Iceberg lock-manager playbook; the reference's own analog is the
  * DynamoDB conditional update at `spdb/spatialdb/object_indices.py:
  * 690-728`.
  */
trait CommitProtocol {

  /** Atomically create `marker` iff absent; false when it already exists. */
  def tryCreateExclusive(marker: Path): Boolean

  /** Modification stamp of `marker` (epoch millis it was written; the
    * marker's identity token for [[deleteIfStamp]]); None if absent.
    */
  def stampMs(marker: Path): Option[Long]

  /** Remove `marker` if present (mutex release; idempotent). */
  def delete(marker: Path): Unit

  /** Delete `marker` only if its stamp still equals `observed` —
    * re-checked immediately before the delete, so a marker refreshed or
    * re-created by a LIVE holder between observation and break is left
    * alone. Local FS keeps a microsecond re-check→delete window (POSIX
    * has no compare-and-delete); on S3 `DeleteObject If-Match <etag>`
    * makes it exact — see the trait's S3 mapping.
    */
  def deleteIfStamp(marker: Path, observed: Long): Unit =
    if (stampMs(marker).contains(observed)) delete(marker)

  /** Atomically replace `target` with `content` — never observable torn. */
  def publish(target: Path, content: Array[Byte]): Unit

  /** Read-after-write-consistent read of `target`; None if absent. */
  def readSmall(target: Path): Option[Array[Byte]]

  /** Cheap change-detection token for a PUBLISHED pointer — what
    * [[ControlCache]] validates its memo against instead of re-reading
    * the content per call. None when the pointer is absent. Local FS:
    * the mtime (cheap stat; see [[pointerStampExact]] for the
    * granularity caveat). S3 mapping: `HeadObject` ETag — strictly
    * cheaper than the `GetObject` it saves, and exact.
    */
  def pointerStamp(target: Path): Option[Long] = stampMs(target)

  /** Whether [[pointerStamp]] tokens are EXACT (change on every publish,
    * never repeat). False for mtime-based stamps: two publishes inside
    * one filesystem-timestamp granule can share a stamp, so a cache must
    * additionally require the stamp to be older than its skew window
    * before trusting a match. True for the object-store chain (monotone
    * generation numbers) and for an ETag-based S3 implementation.
    */
  def pointerStampExact: Boolean = false

  /** Mutex acquire over [[tryCreateExclusive]] with crashed-holder
    * recovery: a marker older than `staleMs` is broken (its holder is
    * presumed to have crashed without [[delete]]); polls every `pollMs`
    * until `deadlineMs` from now. Returns true once acquired, false on
    * deadline.
    *
    * The break is CONDITIONAL on the marker's stamp ([[deleteIfStamp]]):
    * two waiters that both observe the same stale marker can no longer
    * double-break — the first breaker's freshly created lock has a new
    * stamp, so the second waiter's re-check refuses the delete.
    *
    * CONTRACT: `staleMs` must exceed the worst-case critical-section hold
    * time. A live holder that keeps its marker past `staleMs` without
    * refreshing it WILL have its lock broken and a second writer admitted
    * — callers size `staleMs` accordingly ([[VersionedStore]] uses
    * `CommitLockTimeoutMs` = 10 min against commits that take seconds).
    */
  final def acquireMutex(
      marker: Path, staleMs: Long, deadlineMs: Long, pollMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + deadlineMs
    while (true) {
      if (tryCreateExclusive(marker)) return true
      stampMs(marker).foreach { s =>
        if (System.currentTimeMillis() - s > staleMs) deleteIfStamp(marker, s)
      }
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

  override def stampMs(marker: Path): Option[Long] =
    try Some(Files.getLastModifiedTime(marker).toMillis)
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

/** Rename-less object-store emulation: the ONLY filesystem verbs used are
  * create-if-absent (`Files.createFile` — stands in for `PutObject
  * If-None-Match: *`), list, stat, and delete. No `Files.move`, no
  * overwrite of an existing object.
  *
  * A published pointer is an append-only chain of immutable, empty
  * generation objects `<name>.g<gen%010d>.<hex content>` next to the
  * target path; the atomic step is the directory-entry creation (exactly
  * an object PUT), the content rides hex-encoded in the name so a reader
  * can never observe a torn body, and [[readSmall]] resolves the highest
  * generation — readers see the old or the new pointer, never an
  * intermediate. [[publish]] retries on generation collision (two racing
  * publishers; the loser re-lists and takes the next slot), and prunes
  * generations older than the last few so the chain stays O(1).
  *
  * Pointer contents here are tiny by design (version ints, id counters —
  * capped at [[ObjectStoreCommitProtocol.MaxContent]] bytes), which is
  * what makes name-encoding sound; a real S3 deployment publishes the
  * body directly (per-object atomic PUT) and needs none of this.
  */
object ObjectStoreCommitProtocol extends CommitProtocol {

  final val MaxContent = 96 // hex doubles it; POSIX name limit is 255

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  private def genPrefix(target: Path): String = s"${target.getFileName}.g"

  /** (gen, contentHex) pairs for `target`'s chain, unsorted.
    *
    * An IOException mid-iteration is RETRIED, never truncated: a partial
    * listing would let [[readSmall]] resolve an older generation (stale
    * pointer) or None (pointer transiently absent) and let [[publish]]
    * compute a stale max generation — violating the never-see-old-pointer
    * guarantee the chain emulation exists to provide. Only a genuinely
    * absent directory yields an empty listing; persistent listing failure
    * is surfaced, not silently read as "no pointer".
    */
  private def listGens(target: Path): Seq[(Long, String)] = {
    val prefix = genPrefix(target)
    var attempt = 0
    while (true) {
      val dir = target.getParent
      if (dir == null || !Files.isDirectory(dir)) return Seq.empty
      try {
        val out = Seq.newBuilder[(Long, String)]
        val stream: DirectoryStream[Path] = Files.newDirectoryStream(dir, prefix + "*")
        try stream.forEach { p =>
          val rest = p.getFileName.toString.stripPrefix(prefix)
          val dot = rest.indexOf('.')
          if (dot == 10) // g<gen%010d>.<hex>; anything else is not ours
            try out += ((rest.substring(0, dot).toLong, rest.substring(dot + 1)))
            catch { case _: NumberFormatException => () }
        } finally stream.close()
        return out.result()
      } catch {
        case _: java.nio.file.NoSuchFileException => return Seq.empty // dir vanished: truly empty
        case e @ (_: java.io.IOException | _: java.nio.file.DirectoryIteratorException) =>
          attempt += 1
          if (attempt >= 50)
            throw new IllegalStateException(s"listGens($target): listing failed after $attempt attempts", e)
          Thread.sleep(2)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def tryCreateExclusive(marker: Path): Boolean =
    try { Files.createFile(marker); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  override def stampMs(marker: Path): Option[Long] =
    try Some(Files.getLastModifiedTime(marker).toMillis)
    catch { case _: java.io.IOException => None }

  override def delete(marker: Path): Unit = {
    try { Files.deleteIfExists(marker); () }
    catch { case _: java.io.IOException => () }
  }

  override def publish(target: Path, content: Array[Byte]): Unit = {
    require(content.length <= MaxContent,
      s"object-store pointer content is ${content.length} B (max $MaxContent)")
    val h = hex(content)
    var attempt = 0
    while (attempt < 1000) {
      val gens = listGens(target)
      val next = if (gens.isEmpty) 1L else gens.map(_._1).max + 1L
      val obj = target.resolveSibling(f"${genPrefix(target)}$next%010d.$h")
      if (tryCreateExclusive(obj)) {
        // prune the tail (keep a few so a concurrent reader's list→read
        // window never dangles); pruning is best-effort garbage collection
        gens.filter(_._1 < next - 4).foreach { case (g, old) =>
          delete(target.resolveSibling(f"${genPrefix(target)}$g%010d.$old"))
        }
        return
      }
      attempt += 1 // generation collision: another publisher won the slot
    }
    throw new IllegalStateException(s"publish to $target: 1000 gen collisions")
  }

  override def readSmall(target: Path): Option[Array[Byte]] = {
    val gens = listGens(target)
    if (gens.isEmpty) None
    else Some(unhex(gens.maxBy(_._1)._2))
  }

  /** The chain's max generation number: strictly monotone per publish —
    * an EXACT cache-validation token (no clock involved).
    */
  override def pointerStamp(target: Path): Option[Long] = {
    val gens = listGens(target)
    if (gens.isEmpty) None else Some(gens.map(_._1).max)
  }

  override def pointerStampExact: Boolean = true
}
