package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** A8 annotation-id block reservation — the Spark-side analog of the
  * reference's DynamoDB atomic counter (`spdb/spatialdb/object_indices.py:
  * 667-728`): reserve `numIds` consecutive ids per (lookupKey, res)
  * channel, retrying a conditional update until a 10 s deadline (the
  * reference's own deadline).
  *
  * This is control-plane, not data-plane: one tiny counter per channel,
  * mutated via an exclusive lock file (atomic `createFile`) so concurrent
  * reservations across JVMs/executors serialize correctly on a shared
  * filesystem.
  */
object IdReservation {

  final val DefaultDeadlineMs = 10000L // object_indices.py:687

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
    val deadline = System.currentTimeMillis() + deadlineMs
    while (System.currentTimeMillis() < deadline) {
      val acquired =
        try { Files.createFile(lock); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            // crashed-holder recovery: a lock older than the deadline is
            // stale — break it (mirrors the reference's bounded retry)
            try {
              val age = System.currentTimeMillis() -
                Files.getLastModifiedTime(lock).toMillis
              if (age > deadlineMs) Files.deleteIfExists(lock)
            } catch { case _: java.io.IOException => () }
            false
        }
      if (acquired) {
        try {
          val cur =
            if (Files.exists(f))
              new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong
            else 1L
          // write-then-atomic-move: a crash mid-write can never leave a
          // truncated counter behind
          val tmp = Paths.get(f.toString + ".tmp")
          Files.write(tmp, (cur + numIds).toString.getBytes(StandardCharsets.UTF_8))
          Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          return (cur, cur + numIds)
        } finally {
          Files.deleteIfExists(lock)
          ()
        }
      }
      Thread.sleep(5)
    }
    throw new IllegalStateException(
      s"id reservation for $lookupKey res $res timed out after $deadlineMs ms")
  }
}
