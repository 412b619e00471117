package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse (point-list) annotation editing — the voxel-plane restatement of
  * the reference's `annotateCube.c:26-79` and `shaveCube.c:26-65`: a point
  * list outer-joined onto the voxel set, with per-mode conflict rules and
  * exception/zeroed side outputs.
  *
  * Point DataFrames carry the full voxel key (lookupKey, res, t, x, y, z);
  * voxel sets are sparse (absent row = value 0), so painting an absent
  * voxel creates a row and shaving an absent voxel is a no-op.
  */
object SparseOps {

  private val keys = Seq("lookupKey", "res", "t", "x", "y", "z")

  /** Conflict modes of `annotateCube` (`annotateCube.c:54-71`). */
  object ConflictMode {
    val Overwrite = 'O' // relabel conflicting voxels
    val Preserve = 'P'  // keep conflicting voxels
    val Exception = 'E' // keep conflicting voxels, report them
  }

  /** M6 sparse paint: set `annId` at each point. Returns the merged voxel
    * set; conflicts (existing non-zero label != annId) follow `mode`.
    */
  def annotateSparse(voxels: DataFrame, points: DataFrame, annId: Long, mode: Char): DataFrame = {
    val p = points.select(keys.map(col): _*).distinct().withColumn("_pt", lit(1))
    val merged = voxels.join(p, keys, "full_outer")
    val v = coalesce(col("value"), lit(0L))
    val painted = mode match {
      case 'O' => when(col("_pt").isNotNull, lit(annId)).otherwise(v)
      case _ => // P and E both preserve conflicting labels
        when(col("_pt").isNotNull && v === 0, lit(annId)).otherwise(v)
    }
    merged.select(keys.map(col) :+ painted.cast("long").as("value"): _*)
  }

  /** M6 'E'-mode side output: points whose voxel already carries a
    * different non-zero label (`annotateCube.c:63-70`).
    */
  def annotateExceptions(voxels: DataFrame, points: DataFrame, annId: Long): DataFrame = {
    val p = points.select(keys.map(col): _*).distinct()
    p.join(voxels, keys)
      .where(col("value") =!= 0 && col("value") =!= annId)
      .select(keys.map(col): _*)
  }

  /** M7 sparse shave: zero each point currently labelled `annId`.
    * Returns (result, zeroed, exceptions): zeroed = points actually
    * erased; exceptions = points carrying some other non-zero label
    * (`shaveCube.c:44-64`).
    */
  def shaveSparse(
      voxels: DataFrame,
      points: DataFrame,
      annId: Long): (DataFrame, DataFrame, DataFrame) = {
    val p = points.select(keys.map(col): _*).distinct().withColumn("_pt", lit(1))
    val merged = voxels.join(p, keys, "full_outer")
    val v = coalesce(col("value"), lit(0L))
    val result = merged.select(
      keys.map(col) :+
        when(col("_pt").isNotNull && v === annId, lit(0L)).otherwise(v)
          .cast("long").as("value"): _*)
    val joined = points.select(keys.map(col): _*).distinct().join(voxels, keys)
    val zeroed = joined.where(col("value") === annId).select(keys.map(col): _*)
    val exceptions = joined.where(col("value") =!= 0 && col("value") =!= annId)
      .select(keys.map(col): _*)
    (result, zeroed, exceptions)
  }

  /** J6/M11 isotropic build (`isotropicBuild.c:26-107`): merge each pair
    * of z-adjacent slices (2z, 2z+1) into output slice z — keep the
    * non-zero side, or the truncated mean when both are non-zero.
    */
  def isotropicBuild(voxels: DataFrame): DataFrame = {
    val a = voxels.where(col("z") % 2 === 0)
      .select(col("lookupKey"), col("res"), col("t"), col("x"), col("y"),
        expr("z div 2").cast("long").as("z"), col("value").as("va"))
    val b = voxels.where(col("z") % 2 === 1)
      .select(col("lookupKey"), col("res"), col("t"), col("x"), col("y"),
        expr("(z - 1) div 2").cast("long").as("z"), col("value").as("vb"))
    val va = coalesce(col("va"), lit(0L))
    val vb = coalesce(col("vb"), lit(0L))
    a.join(b, keys, "full_outer")
      .select(keys.map(col) :+
        when(vb === 0, va).when(va === 0, vb)
          .otherwise(expr("(va + vb) div 2")).cast("long").as("value"): _*)
  }
}
