package graft.engine

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Dataset

import graft.core.VoxelType
import graft.storage.CuboidRow

/** Write-merge mode, mirroring the reference's dense kernels
  * (`spdb/c_lib/c_version/overwriteDense.c:26`, `exceptionDense.c:26`,
  * `shaveDense.c:26`).
  */
sealed trait MergeMode
object MergeMode {
  /** M1: incoming non-zero wins. */
  case object Overwrite extends MergeMode
  /** M2: incoming lands only on zero voxels. */
  case object Exception extends MergeMode
  /** M3/W8: zero wherever the incoming mask is non-zero. */
  case object Shave extends MergeMode
}

/** Cuboid-plane bulk merge: join the two blob sets on the cuboid key and
  * apply the merge rule inside a binary kernel — ONE shuffle of ~4 MiB
  * blobs on a 4-column key, instead of the voxel-plane full-outer join's
  * shuffle of every voxel on a 6-column key (the ~200x explosion paid
  * before the join). This is the path bulk writes take at 100 TB; the
  * voxel-plane `SpatialOps.overwriteMerge` remains for small edits.
  *
  * Semantics match the reference exactly: an absent cuboid on either side
  * behaves as all-zero (missing-cuboid = zeros, `spatialdb.py:571-585`).
  */
object CuboidMerge {

  /** Elementwise merge rule on widened voxel values. */
  private def rule(mode: MergeMode, d: Long, s: Long): Long = mode match {
    case MergeMode.Overwrite => if (s != 0L) s else d
    case MergeMode.Exception => if (d == 0L && s != 0L) s else d
    case MergeMode.Shave     => if (s != 0L) 0L else d
  }

  /** Merge two blobs of `n` voxels at `width` bytes each. */
  private[engine] def mergeBlobs(
      dst: Array[Byte],
      src: Array[Byte],
      width: Int,
      mode: MergeMode): Array[Byte] = {
    val out = new Array[Byte](dst.length)
    val db = ByteBuffer.wrap(dst).order(ByteOrder.LITTLE_ENDIAN)
    val sb = ByteBuffer.wrap(src).order(ByteOrder.LITTLE_ENDIAN)
    val ob = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    val n = dst.length / width
    var i = 0
    width match {
      case 1 =>
        while (i < n) {
          ob.put(i, rule(mode, db.get(i) & 0xffL, sb.get(i) & 0xffL).toByte)
          i += 1
        }
      case 2 =>
        while (i < n) {
          ob.putShort(i * 2, rule(mode, db.getShort(i * 2) & 0xffffL, sb.getShort(i * 2) & 0xffffL).toShort)
          i += 1
        }
      // 4-byte lanes serve BOTH uint32 and float32: the rule only
      // zero-tests and copies values, and copying raw lanes is lossless
      // whichever interpretation applies (float32's zero test is
      // bits == 0, i.e. +0.0f — the integral-value contract never
      // produces -0.0f)
      case 4 =>
        while (i < n) {
          ob.putInt(i * 4, rule(mode, db.getInt(i * 4) & 0xffffffffL, sb.getInt(i * 4) & 0xffffffffL).toInt)
          i += 1
        }
      case _ =>
        while (i < n) {
          ob.putLong(i * 8, rule(mode, db.getLong(i * 8), sb.getLong(i * 8)))
          i += 1
        }
    }
    out
  }

  /** Number of distinct incoming cuboid keys below which the touched/
    * untouched split broadcasts (100k keys ≈ a few MB of key tuples).
    */
  final val BroadcastKeyLimit = 100000L

  /** Bulk merge of `incoming` writes into `existing` cuboids. Returns the
    * merged cuboid set (union of keys; blobs combined per `mode`).
    *
    * For a small write into a big store (the common case), the existing
    * side is first split by a broadcast semi/anti join on the incoming
    * key set: only the touched cuboids enter the blob-merge join, and the
    * untouched majority passes through with NO shuffle — a write's cost
    * scales with the write, not the store. Writes touching >
    * [[BroadcastKeyLimit]] keys fall back to the full join.
    */
  def merge(
      existing: Dataset[CuboidRow],
      incoming: Dataset[CuboidRow],
      vt: VoxelType,
      mode: MergeMode): Dataset[CuboidRow] = {
    val spark = existing.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    val keyCols = Seq("lookupKey", "res", "t", "morton")
    val incKeys = incoming.toDF().select(keyCols.map(col): _*).distinct()
    val nKeys = incKeys.limit((BroadcastKeyLimit + 1).toInt).count()
    if (nKeys <= BroadcastKeyLimit) {
      val untouched = existing.join(broadcast(incKeys), keyCols, "left_anti").as[CuboidRow]
      val touched = existing.join(broadcast(incKeys), keyCols, "left_semi").as[CuboidRow]
      untouched.union(mergeAll(touched, incoming, vt, mode))
    } else mergeAll(existing, incoming, vt, mode)
  }

  /** The delta of a merge: ONLY the cuboids the write touches, fully
    * merged with their existing counterparts — the unit a
    * [[graft.storage.VersionedStore.commitDelta]] persists. The
    * untouched store never enters the plan output at all, so a commit's
    * write volume scales with the write, not the store.
    */
  def mergeDelta(
      existing: Dataset[CuboidRow],
      incoming: Dataset[CuboidRow],
      vt: VoxelType,
      mode: MergeMode): Dataset[CuboidRow] = {
    val spark = existing.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    val keyCols = Seq("lookupKey", "res", "t", "morton")
    val incKeys = incoming.toDF().select(keyCols.map(col): _*).distinct()
    val nKeys = incKeys.limit((BroadcastKeyLimit + 1).toInt).count()
    val touched =
      if (nKeys <= BroadcastKeyLimit)
        existing.join(broadcast(incKeys), keyCols, "left_semi").as[CuboidRow]
      else existing.join(incKeys, keyCols, "left_semi").as[CuboidRow]
    mergeAll(touched, incoming, vt, mode)
  }

  /** Unconditional full-outer blob merge (both sides shuffle on the key).
    * `private[graft]`: the streaming ingest calls it directly with an
    * already key-pruned existing side (`VersionedStore.readForKeys`).
    */
  private[graft] def mergeAll(
      existing: Dataset[CuboidRow],
      incoming: Dataset[CuboidRow],
      vt: VoxelType,
      mode: MergeMode): Dataset[CuboidRow] = {
    val spark = existing.sparkSession
    import spark.implicits._
    val width = vt.byteWidth
    existing
      .joinWith(incoming,
        existing("lookupKey") === incoming("lookupKey") &&
          existing("res") === incoming("res") &&
          existing("t") === incoming("t") &&
          existing("morton") === incoming("morton"),
        "full_outer")
      .map { case (e, i) =>
        if (i == null) e
        else if (e == null) mode match {
          // absent existing = all zeros: overwrite/exception keep the
          // incoming write; a shave mask over nothing stays nothing
          case MergeMode.Shave => CuboidRow(i.lookupKey, i.res, i.t, i.morton,
            new Array[Byte](i.data.length))
          case _ => i
        }
        else CuboidRow(e.lookupKey, e.res, e.t, e.morton,
          mergeBlobs(e.data, i.data, width, mode))
      }
  }
}
