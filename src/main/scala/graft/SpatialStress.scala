package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Region, VoxelType}
import graft.engine.{CuboidMerge, MergeMode, SpatialOps}
import graft.storage.{CuboidCodec, CuboidStore, VolumeGen}

/** Spatial-engine stress run: generates a multi-million-voxel volume,
  * writes the Z-order-clustered store, and times the heavy spatial paths
  * (pruned cutout, index-first ids-in-region, bulk cuboid merge, pyramid).
  * A scale sanity-check for the parts the driver's relational bench does
  * not reach. Usage: runMain graft.SpatialStress [sideVoxels]
  */
object SpatialStress {
  def main(args: Array[String]): Unit = {
    val side = args.headOption.map(_.toInt).getOrElse(256)
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
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val nVox = box.volume
    println(f"[stress] volume ${nVox / 1e6}%.1f M voxels, cuboids ${Region.coveringCount(box, dims)}")
    val voxels = VolumeGen.voxels(spark, "s", 0, box, 0 until 1, VoxelType.UInt64, seed = 31)
    val path = java.nio.file.Files.createTempDirectory("stress").toString
    timed("store write (Z-clustered)") {
      CuboidStore.write(CuboidCodec.fromVoxels(voxels, VoxelType.UInt64, dims), path)
    }
    val small = Box(100, 164, 100, 164, 10, 26)
    timed("pruned cutout (1 cuboid-ish)") {
      SpatialOps.cutoutFromStore(spark, path, "s", 0, small, 0 until 1, VoxelType.UInt64, dims).count()
    }
    val wide = Box(0, side, 0, side, 0, 48)
    timed("wide cutout (75% volume)") {
      SpatialOps.cutoutFromStore(spark, path, "s", 0, wide, 0 until 1, VoxelType.UInt64, dims).count()
    }
    val voxDf = voxels.toDF()
    val cubIdx = timed("build cuboid index") {
      val i = SpatialOps.buildCuboidIndex(voxDf, dims); i.count(); i
    }
    timed("ids-in-region (hybrid)") {
      SpatialOps.idsInRegionIndexed(voxDf, cubIdx, Box(13, side - 13, 13, side - 13, 3, 61), dims).count()
    }
    timed("bulk cuboid-plane merge") {
      val a = CuboidStore.read(spark, path)
      val b = CuboidCodec.fromVoxels(
        VolumeGen.voxels(spark, "s", 0, box, 0 until 1, VoxelType.UInt64, seed = 32),
        VoxelType.UInt64, dims)
      CuboidMerge.merge(a, b, VoxelType.UInt64, MergeMode.Overwrite).count()
    }
    timed("3-level annotation pyramid") {
      SpatialOps.buildPyramid(voxDf, 3, annotation = true).map(_._2.count()).sum
    }
    spark.stop()
  }
}
