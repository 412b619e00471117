package graft.storage

import java.nio.file.Path

/** Stamp-validated memo for HOT control-plane pointer reads — the
  * `_CURRENT` snapshot pointers and the façade's status/marker files that
  * every query resolves. Without it each façade call pays one
  * [[CommitProtocol.readSmall]] per control file; at high QPS that is
  * pure repeated IO for pointers that change only on writes. The memo
  * serves the cached content while the pointer's [[CommitProtocol
  * .pointerStamp]] token is unchanged — one readSmall per STAMP CHANGE,
  * not per call (on S3: HEAD-validated cache over GetObject).
  *
  * Correctness:
  *  - the token is read BEFORE the content, so a publish racing the fill
  *    can only pair an old token with newer content — a pair that never
  *    validates (tokens move forward), it just costs one extra re-read;
  *  - mtime-based tokens ([[CommitProtocol.pointerStampExact]] false)
  *    can repeat across publishes inside one filesystem-timestamp
  *    granule, so a match is trusted only once the stamp is older than
  *    [[SettleMs]] — fresh pointers read through. Assumes client-vs-
  *    filesystem clock skew below the window; exact tokens (object-store
  *    generation numbers, S3 ETags) skip the window entirely;
  *  - absent pointers are never negative-cached (absence has no token to
  *    validate) — a `_CURRENT` that appears is seen immediately.
  *
  * Snapshot isolation is unaffected: a reader still resolves the pointer
  * (cached or not) to an immutable version directory.
  */
object ControlCache {

  /** Trust window for inexact (mtime) stamps: must exceed the coarsest
    * filesystem timestamp granularity (jiffy-clamped mtimes reach ~10 ms)
    * plus client/FS clock skew.
    */
  final val SettleMs = 50L

  private final case class Entry(stamp: Long, content: Option[Array[Byte]])
  private val cache = new java.util.concurrent.ConcurrentHashMap[Path, Entry]()

  /** Physical readSmall calls issued through the cache — the test
    * contract ("one readSmall per stamp change") and an ops metric.
    */
  private val misses = new java.util.concurrent.atomic.AtomicLong
  private[graft] def missCount: Long = misses.get

  def readSmall(p: CommitProtocol, target: Path): Option[Array[Byte]] =
    p.pointerStamp(target) match {
      case Some(s) =>
        val e = cache.get(target)
        val settled = p.pointerStampExact || System.currentTimeMillis() - s > SettleMs
        if (e != null && e.stamp == s && settled) e.content
        else {
          misses.incrementAndGet()
          val c = p.readSmall(target)
          cache.put(target, Entry(s, c))
          c
        }
      case None =>
        cache.remove(target)
        misses.incrementAndGet()
        p.readSmall(target) // absent — or published in the stat window
    }
}
