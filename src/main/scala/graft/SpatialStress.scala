package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Region, Resource, VoxelType}
import graft.engine.{CuboidMerge, MergeMode, SpatialOps}
import graft.storage.{CuboidCodec, CuboidStore, VolumeGen}

/** Spatial-engine stress run: generates a multi-million-voxel volume,
  * writes the Z-order-clustered store, and times the heavy spatial paths
  * (pruned cutout, index-first ids-in-region, bulk cuboid merge, pyramid,
  * and the façade's index-first bounding box). Writes one BENCH-style
  * JSON line (stress_spatial.json). Usage: runMain graft.SpatialStress [sideVoxels]
  */
object SpatialStress {
  def main(args: Array[String]): Unit = {
    val side = args.headOption.map(_.toInt).getOrElse(512)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import Region.{Box, CuboidDims}
    val dims = CuboidDims(64, 64, 16)
    val box = Box(0, side, 0, side, 0, 64)
    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      stages(name) = math.rint(sec * 100) / 100
      println(f"[stress] $name%-28s $sec%8.2f s"); r
    }
    val nVox = box.volume
    println(f"[stress] volume ${nVox / 1e6}%.1f M voxels, cuboids ${Region.coveringCount(box, dims)}")
    val voxels = VolumeGen.voxels(spark, "s", 0, box, 0 until 1, VoxelType.UInt64, seed = 31)
    val path = Files.createTempDirectory("stress").toString
    timed("store_write_clustered") {
      CuboidStore.write(CuboidCodec.fromVoxels(voxels, VoxelType.UInt64, dims), path)
    }
    val small = Box(100, 164, 100, 164, 10, 26)
    timed("pruned_cutout_small") {
      SpatialOps.cutoutFromStore(spark, path, "s", 0, small, 0 until 1, VoxelType.UInt64, dims).count()
    }
    val wide = Box(0, side, 0, side, 0, 48)
    timed("wide_cutout_75pct") {
      SpatialOps.cutoutFromStore(spark, path, "s", 0, wide, 0 until 1, VoxelType.UInt64, dims).count()
    }
    val voxDf = voxels.toDF()
    val cubIdx = timed("build_cuboid_index") {
      val i = SpatialOps.buildCuboidIndex(voxDf, dims); i.count(); i
    }
    timed("ids_in_region_hybrid") {
      SpatialOps.idsInRegionIndexed(voxDf, cubIdx, Box(13, side - 13, 13, side - 13, 3, 61), dims).count()
    }
    timed("bulk_cuboid_merge") {
      val a = CuboidStore.read(spark, path)
      val b = CuboidCodec.fromVoxels(
        VolumeGen.voxels(spark, "s", 0, box, 0 until 1, VoxelType.UInt64, seed = 32),
        VoxelType.UInt64, dims)
      CuboidMerge.merge(a, b, VoxelType.UInt64, MergeMode.Overwrite).count()
    }
    timed("pyramid_3level_annotation") {
      SpatialOps.buildPyramid(voxDf, 3, annotation = true).map(_._2.count()).sum
    }
    // the façade path at scale: one writeCuboid commit (merge + index
    // maintenance), then the index-first loose/tight bounding box — the
    // round-8 loose-before-tight plan whose tight scan decodes only the
    // target id's loose box, never the store
    val db = new GraftDB(
      spark, Resource.fixture(VoxelType.UInt64),
      Files.createTempDirectory("stress-db").toString, dims)
    timed("facade_write_with_index") {
      db.writeCuboid(voxDf.select(col("t"), col("x"), col("y"), col("z"), col("value")))
    }
    timed("facade_bbox_loose") {
      db.getBoundingBox(42L, tight = false).count()
    }
    // worst case: id 42 is uniform across the volume, so its loose box IS
    // the volume — the tight agg still decodes everything (inherent)
    timed("facade_bbox_tight_uniform") {
      db.getBoundingBox(42L, tight = true).count()
    }
    // realistic case: a LOCALIZED object (one segmented structure) — the
    // loose box prunes the tight scan to the object's own cuboids
    timed("facade_write_small_object") {
      db.writeCuboid(VolumeGen.constant(
        spark, "s", 0, Box(128, 192, 128, 192, 16, 32), 0 until 1, value = 999999L)
        .toDF().select(col("t"), col("x"), col("y"), col("z"), col("value")))
    }
    timed("facade_bbox_tight_localized") {
      db.getBoundingBox(999999L, tight = true).count()
    }
    // hierarchy maintenance at scale: the first build pays O(store) once;
    // after a one-cuboid patch the incremental propagate pays O(write x
    // levels) — the contrast between these two stages is the point
    timed("facade_build_hierarchy_full") {
      db.buildHierarchy(3)
    }
    timed("facade_patch_write") {
      db.writeCuboid(VolumeGen.constant(
        spark, "s", 0, Box(40, 56, 40, 56, 4, 12), 0 until 1, value = 31L)
        .toDF().select(col("t"), col("x"), col("y"), col("z"), col("value")))
    }
    timed("facade_propagate_incremental") {
      db.propagate()
    }
    val total = math.rint(stages.values.sum * 100) / 100
    val json =
      s"""{"metric":"spatial_stress","voxels":$nVox,"unit":"sec","total":$total,""" +
        stages.map { case (k, v) => s""""$k":$v""" }.mkString("\"stages\":{", ",", "}}")
    Files.writeString(Paths.get("stress_spatial.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
