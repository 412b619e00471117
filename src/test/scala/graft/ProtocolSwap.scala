package graft

import graft.engine.IdReservation
import graft.storage.{CommitProtocol, VersionedStore}

/** Serializes every test that swaps the process-global commit protocol
  * (`VersionedStore.protocol` / `IdReservation.protocol` are @volatile
  * JVM-wide state): under parallel suite execution — or a lazily
  * evaluated Spark plan from another suite firing inside the swap
  * window — an unguarded swap silently runs unrelated tests against the
  * object-store emulation. All swappers funnel through this one monitor
  * (reentrant, so a test may nest a temporary swap back to local-FS).
  */
object ProtocolSwap {

  /** Run `body` with the engine-wide protocol set to `p`, restored
    * after; mutually exclusive with every other swapper in the JVM.
    */
  def withProtocol[A](p: CommitProtocol)(body: => A): A = synchronized {
    val (vs, ir) = (VersionedStore.protocol, IdReservation.protocol)
    VersionedStore.protocol = p
    IdReservation.protocol = p
    try body
    finally { VersionedStore.protocol = vs; IdReservation.protocol = ir }
  }
}
