package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import graft.storage.{CommitProtocol, LocalFsCommitProtocol}

/** A8 annotation-id block reservation — the Spark-side analog of the
  * reference's DynamoDB atomic counter (`spdb/spatialdb/object_indices.py:
  * 667-728`): reserve `numIds` consecutive ids per (lookupKey, res)
  * channel, retrying a conditional update until a 10 s deadline (the
  * reference's own deadline).
  *
  * This is control-plane, not data-plane: one tiny counter per channel,
  * mutated under a [[graft.storage.CommitProtocol]] mutex (exclusive
  * marker + atomic pointer publish) so concurrent reservations across
  * JVMs/executors serialize correctly — on the local FS here, on S3 via
  * the protocol's conditional-PUT mapping (see CommitProtocol's design
  * note; the reference's DynamoDB conditional update is the same
  * primitive).
  */
object IdReservation {

  final val DefaultDeadlineMs = 10000L // object_indices.py:687

  /** Test-swappable like [[graft.storage.VersionedStore.protocol]]. */
  @volatile private[graft] var protocol: CommitProtocol = LocalFsCommitProtocol

  private def keyFile(dir: String, lookupKey: String, res: Int): Path =
    Paths.get(dir, s"${lookupKey.replace("&", "_")}_r$res.counter")

  /** Reserve a block: returns [start, start+numIds) — ids start at 1 like
    * the reference (`object_indices.py:700-713`).
    */
  def reserve(
      counterDir: String,
      lookupKey: String,
      res: Int,
      numIds: Long,
      deadlineMs: Long = DefaultDeadlineMs): (Long, Long) = {
    require(numIds > 0)
    Files.createDirectories(Paths.get(counterDir))
    val f = keyFile(counterDir, lookupKey, res)
    val lock = Paths.get(f.toString + ".lock")
    // stale lock age = the deadline (mirrors the reference's bounded retry)
    if (!protocol.acquireMutex(lock, staleMs = deadlineMs,
        deadlineMs = deadlineMs, pollMs = 5))
      throw new IllegalStateException(
        s"id reservation for $lookupKey res $res timed out after $deadlineMs ms")
    try {
      val cur = protocol.readSmall(f)
        .map(b => new String(b, StandardCharsets.UTF_8).trim.toLong)
        .getOrElse(1L)
      // atomic publish: a crash mid-write can never leave a truncated
      // counter behind
      protocol.publish(f, (cur + numIds).toString.getBytes(StandardCharsets.UTF_8))
      (cur, cur + numIds)
    } finally protocol.delete(lock)
  }
}
