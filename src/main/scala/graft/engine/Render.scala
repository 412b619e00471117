package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.VoxelType

/** F6 slice-to-image render (`spdb/spatialdb/imagecube.py:104-150,
  * 231-300`): project one plane of the volume to 2-D pixel rows, with the
  * reference's 16→8-bit windowing (`i/256`, i.e. `>> 8`). The projection
  * and windowing are distributed; only the final bounded slice is
  * collected into an image buffer.
  */
object Render {

  sealed trait Plane { def fixed: String; def u: String; def v: String }
  case object XY extends Plane { val fixed = "z"; val u = "x"; val v = "y" }
  case object XZ extends Plane { val fixed = "y"; val u = "x"; val v = "z" }
  case object YZ extends Plane { val fixed = "x"; val u = "y"; val v = "z" }

  /** One plane at `k` as (u, v, pix) rows. uint16 windows to 8 bits; uint8
    * and annotation labels pass through (annotations typically go through
    * [[SpatialOps.recolor]] first).
    */
  def slice(voxels: DataFrame, plane: Plane, k: Long, vt: VoxelType): DataFrame = {
    val pix: Column = vt match {
      case VoxelType.UInt16 => shiftright(col("value"), 8)
      case _                => col("value")
    }
    voxels.where(col(plane.fixed) === k)
      .select(col(plane.u).as("u"), col(plane.v).as("v"), pix.cast("long").as("pix"))
  }

  /** Collect a bounded slice into a row-major grayscale byte image of
    * `w x h` (origin at (u0, v0); absent voxels render as 0). Driver-side
    * by design — this is the presentation edge, bounded by screen size.
    */
  def toGrayBytes(sliceDf: DataFrame, u0: Long, v0: Long, w: Int, h: Int): Array[Byte] = {
    val img = new Array[Byte](w * h)
    sliceDf
      .where(col("u") >= u0 && col("u") < u0 + w && col("v") >= v0 && col("v") < v0 + h)
      .collect()
      .foreach { r =>
        val u = r.getAs[Long]("u") - u0
        val v = r.getAs[Long]("v") - v0
        img((v * w + u).toInt) = (r.getAs[Long]("pix") & 0xff).toByte
      }
    img
  }
}
