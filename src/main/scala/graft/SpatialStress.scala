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
  * and the façade's index-first bounding box), then the delta-chain depth
  * battery (deep-chain reads, propagate, compaction). Writes one
  * BENCH-style JSON line (stress_spatial.json).
  * Usage: runMain graft.SpatialStress [sideVoxels] [zDepth]
  */
object SpatialStress {
  def main(args: Array[String]): Unit = {
    val side = args.headOption.map(_.toInt).getOrElse(512)
    val zDepth = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import Region.{Box, CuboidDims}
    val dims = CuboidDims(64, 64, 16)
    val box = Box(0, side, 0, side, 0, zDepth)
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
    val wide = Box(0, side, 0, side, 0, math.max(48, zDepth * 3 / 4))
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
    // --- delta-chain depth battery: the VERSION-COUNT axis. K more patch
    // writes deepen the chain; the O(touched) contracts must hold at the
    // deep chain, and compaction restores depth 1. The regression signal
    // is deep_chain_patch_write vs facade_patch_write: a chain read that
    // rescans the store would scale with the volume, not the patch.
    val K = 24
    timed(s"chain_${K}_patch_writes") {
      (1 to K).foreach { i =>
        val cx = (i % 8).toLong * 64; val cy = ((i / 8) % 8).toLong * 64
        db.writeCuboid(VolumeGen.constant(
          spark, "s", 0, Box(cx, cx + 64, cy, cy + 64, 16, 32), 0 until 1, value = 2000L + i)
          .toDF().select(col("t"), col("x"), col("y"), col("z"), col("value")))
      }
    }
    timed("deep_chain_small_cutout") {
      db.cutout((100, 100, 10), (64, 64, 16)).count()
    }
    timed("deep_chain_patch_write") {
      db.writeCuboid(VolumeGen.constant(
        spark, "s", 0, Box(40, 56, 40, 56, 4, 12), 0 until 1, value = 77L)
        .toDF().select(col("t"), col("x"), col("y"), col("z"), col("value")))
    }
    timed("deep_chain_propagate") {
      db.propagate()
    }
    // files a ONE-KEY chain read opens at max depth — must be ~1/version
    // (each delta contributes its own files), never the snapshot's file
    // count per version; PlanContractSpec asserts the growth bound, this
    // records the absolute number at scale
    val chainDepth = graft.storage.VersionedStore.currentVersion(db.storeRoot).getOrElse(0)
    val deepChainFiles = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import spark.implicits._
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val keys = Seq((db.resource.lookupKey, 0, 0, graft.core.Morton.encode(1L, 1L, 1L)))
          .toDF("lookupKey", "res", "t", "morton")
        val df = graft.storage.VersionedStore.readForKeys(spark, db.storeRoot, keys)
        // execute THIS QueryExecution so its scan metrics populate
        df.queryExecution.toRdd.count()
        df.queryExecution.executedPlan
          .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    println(s"[stress] one-key chain read at store version $chainDepth opens $deepChainFiles files")
    timed("compact_store_and_index") {
      db.compact()
    }
    timed("post_compact_cutout") {
      db.cutout((100, 100, 10), (64, 64, 16)).count()
    }
    val total = math.rint(stages.values.sum * 100) / 100
    val json =
      s"""{"metric":"spatial_stress","voxels":$nVox,"unit":"sec","total":$total,""" +
        s""""store_version_max":$chainDepth,"deep_chain_files_read":$deepChainFiles,""" +
        stages.map { case (k, v) => s""""$k":$v""" }.mkString("\"stages\":{", ",", "}}")
    Files.writeString(Paths.get("stress_spatial.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
