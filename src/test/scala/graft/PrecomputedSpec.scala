package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Region, Resource, VoxelType}
import graft.sources.Precomputed
import graft.storage.{CuboidCodec, VoxelRow}

/** The alternate "cloudvol" channel backend (`resource.py:247-280`):
  * precomputed-layout info/chunk serde, edge clipping, round-trip
  * through export + pruned cutout, and missing-chunk-is-zero semantics.
  */
class PrecomputedSpec extends AnyFunSuite {
  import Region.{Box, CuboidDims}

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-precomputed-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = CuboidDims(16, 16, 4)

  test("info JSON round-trips all scale fields") {
    val res = Resource.fixture(VoxelType.UInt16)
    val info = Precomputed.infoFor(res, dims, levels = 3)
    val back = Precomputed.parseInfo(Precomputed.infoJson(info))
    assert(back == info)
    assert(back.layerType == "image")
    assert(Precomputed.infoFor(Resource.fixture(VoxelType.UInt64), dims).layerType
      == "segmentation")
  }

  test("chunk names clip at the volume edge and parse back") {
    val s = Precomputed.Scale("0", 40, 20, 6, 16, 16, 4, 0, 0, 0, 1, 1, 1)
    assert(Precomputed.chunkName(s, 0, 0, 0) == "0-16_0-16_0-4")
    assert(Precomputed.chunkName(s, 2, 1, 1) == "32-40_16-20_4-6")
    assert(Precomputed.parseChunkName("32-40_16-20_4-6") == Box(32, 40, 16, 20, 4, 6))
  }

  test("export + cutout round-trips incl. edge-clipped chunks and absent-chunk zeros") {
    import spark.implicits._
    // a volume whose extent (40, 20, 6) is NOT chunk-aligned: the x=32+,
    // y=16+, z=4+ chunks are clipped on write; chunk (0,1,0)-region is
    // left entirely absent (implicit zeros)
    val frame = graft.core.CoordinateFrame("f", 0, 40, 0, 20, 0, 6)
    val res = Resource.fixture(VoxelType.UInt16).copy(coordFrame = frame)
    val voxels = Seq(
      (1L, 1L, 1L, 7L), (17L, 3L, 2L, 9L), (39L, 19L, 5L, 65535L), // edge chunk corner
      (33L, 2L, 1L, 12L), (8L, 8L, 3L, 1L))
      .map { case (x, y, z, v) => VoxelRow(res.lookupKey, 0, 0, x, y, z, v) }
      .toDS()
    val root = Files.createTempDirectory("pcspec").toString
    val info = Precomputed.infoFor(res, dims, 1)
    Precomputed.writeInfo(root, info)
    Precomputed.exportScale(
      CuboidCodec.fromVoxels(voxels, VoxelType.UInt16, dims), root, info, "0", dims)
    // the clipped far-corner chunk object carries only in-bounds voxels
    val corner = new java.io.File(s"$root/0/32-40_16-20_4-6")
    assert(corner.exists() && corner.length() == 8L * 4 * 2 * 2)
    val all = Precomputed.cutout(spark, root, "0", Box(0, 40, 0, 20, 0, 6), res.lookupKey)
      .select($"x", $"y", $"z", $"value").as[(Long, Long, Long, Long)].collect().toSet
    assert(all == Set((1L, 1L, 1L, 7L), (17L, 3L, 2L, 9L), (39L, 19L, 5L, 65535L),
      (33L, 2L, 1L, 12L), (8L, 8L, 3L, 1L)))
    // a box over an absent chunk region is empty, not an error
    assert(Precomputed.cutout(spark, root, "0", Box(0, 16, 16, 20, 0, 4), res.lookupKey)
      .isEmpty)
    // sub-box cutout prunes to the request (only the voxel inside it)
    val sub = Precomputed.cutout(spark, root, "0", Box(16, 32, 0, 8, 0, 4), res.lookupKey)
      .select($"x", $"y", $"z", $"value").as[(Long, Long, Long, Long)].collect().toSeq
    assert(sub == Seq((17L, 3L, 2L, 9L)))
  }

  test("precomputed cutout opens only the request's chunk files (numFiles bound)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    // a 128x128x16 volume = 8x8x4 = 256 chunk grid at 16x16x4 chunks;
    // one voxel per chunk guarantees every chunk object exists
    val frame = graft.core.CoordinateFrame("f", 0, 128, 0, 128, 0, 16)
    val res = Resource.fixture(VoxelType.UInt8).copy(coordFrame = frame)
    val voxels = (for { cx <- 0 until 8; cy <- 0 until 8; cz <- 0 until 4 }
      yield VoxelRow(res.lookupKey, 0, 0, cx * 16L + 3, cy * 16L + 5, cz * 4L + 1,
        (cx + cy + cz) % 200 + 1L)).toDS()
    val root = Files.createTempDirectory("pcbound").toString
    val info = Precomputed.infoFor(res, dims, 1)
    Precomputed.writeInfo(root, info)
    Precomputed.exportScale(
      CuboidCodec.fromVoxels(voxels, VoxelType.UInt8, dims), root, info, "0", dims)
    assert(new java.io.File(s"$root/0").listFiles().count(!_.getName.startsWith(".")) == 256)
    // a 2x2x1-chunk request must open exactly those 4 chunk objects,
    // never the 256-file layer
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Precomputed.cutout(spark, root, "0", Box(16, 48, 32, 64, 4, 8), res.lookupKey)
      df.queryExecution.toRdd.count()
      val files = df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
      assert(files == 4, s"sub-box cutout opened $files chunk files, expected 4")
      assert(df.count() == 4)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("multi-scale export: a built hierarchy round-trips per level through the layer") {
    import spark.implicits._
    val frame = graft.core.CoordinateFrame("f", 0, 64, 0, 64, 0, 8)
    val base = Resource.fixture(VoxelType.UInt8).copy(
      coordFrame = frame,
      experiment = Resource.fixture(VoxelType.UInt8).experiment.copy(numHierarchyLevels = 2))
    val db = new GraftDB(spark, base, Files.createTempDirectory("pcmulti").toString, dims)
    db.writeCuboid(graft.storage.VolumeGen.voxels(
      spark, base.lookupKey, 0, Region.Box(0, 64, 0, 64, 0, 8),
      0 until 1, VoxelType.UInt8, seed = 7).toDF())
    db.buildHierarchy()
    val cvRoot = Files.createTempDirectory("pcmulti-layer").toString
    db.exportPrecomputed(cvRoot)
    assert(Precomputed.readInfo(cvRoot).scales.map(_.key) == Seq("0", "1"))
    val cvDb = new GraftDB(spark,
      base.copy(channel = base.channel.copy(storageType = "precomputed", cvPath = cvRoot)),
      Files.createTempDirectory("pcmulti-empty").toString, dims)
    for (res <- 0 to 1) {
      val (ex, ey, ez) = base.extentAt(res)
      val want = db.cutout((0, 0, 0), (ex, ey, ez), res)
        .select($"x", $"y", $"z", $"value").as[(Long, Long, Long, Long)].collect().toSet
      val got = cvDb.cutout((0, 0, 0), (ex, ey, ez), res)
        .select($"x", $"y", $"z", $"value").as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"res $res mismatch: ${got.size} vs ${want.size} voxels")
      assert(want.nonEmpty)
    }
  }

  test("toCuboids bulk-load inverts exportScale, zero-padding clipped edge chunks") {
    import spark.implicits._
    val frame = graft.core.CoordinateFrame("f", 0, 40, 0, 20, 0, 6)
    val res = Resource.fixture(VoxelType.UInt16).copy(coordFrame = frame)
    val voxels = Seq(
      (1L, 1L, 1L, 7L), (17L, 3L, 2L, 9L), (39L, 19L, 5L, 65535L),
      (33L, 2L, 1L, 12L), (8L, 8L, 3L, 1L))
      .map { case (x, y, z, v) => VoxelRow(res.lookupKey, 0, 0, x, y, z, v) }
      .toDS()
    val root = Files.createTempDirectory("pcingest").toString
    val info = Precomputed.infoFor(res, dims, 1)
    Precomputed.writeInfo(root, info)
    val srcCubs = CuboidCodec.fromVoxels(voxels, VoxelType.UInt16, dims)
    Precomputed.exportScale(srcCubs, root, info, "0", dims)
    val back = Precomputed.toCuboids(spark, root, "0", res.lookupKey, dims)
    // voxel-for-voxel identical to the source volume (zeros dropped by
    // the codec on both sides; the padded edge voxels decode to nothing)
    val src = CuboidCodec.toVoxels(srcCubs, VoxelType.UInt16, dims)
      .map(v => (v.x, v.y, v.z, v.value)).collect().toSet
    val got = CuboidCodec.toVoxels(back, VoxelType.UInt16, dims)
      .map(v => (v.x, v.y, v.z, v.value)).collect().toSet
    assert(got == src)
    // the edge cuboid's body is a FULL cuboid after padding
    assert(back.collect().forall(_.data.length == 16 * 16 * 4 * 2))
  }

  test("GraftDB routes a storage_type=precomputed channel's cutout to the layer") {
    import spark.implicits._
    val frame = graft.core.CoordinateFrame("f", 0, 64, 0, 32, 0, 8)
    val base = Resource.fixture(VoxelType.UInt64).copy(coordFrame = frame)
    val db = new GraftDB(spark, base, Files.createTempDirectory("pcdb").toString, dims)
    val vox = Seq((3L, 4L, 1L, 11L), (20L, 20L, 6L, 22L), (63L, 31L, 7L, 33L))
      .map { case (x, y, z, v) => (0L, x, y, z, v) }
      .toDF("t", "x", "y", "z", "value")
    db.writeCuboid(vox)
    val cvRoot = Files.createTempDirectory("pclayer").toString
    db.exportPrecomputed(cvRoot)
    val cvDb = new GraftDB(spark,
      base.copy(channel = base.channel.copy(storageType = "precomputed", cvPath = cvRoot)),
      Files.createTempDirectory("pcempty").toString, dims)
    val got = cvDb.cutout((0, 0, 0), (64, 32, 8))
      .select($"x", $"y", $"z", $"value").as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((3L, 4L, 1L, 11L), (20L, 20L, 6L, 22L), (63L, 31L, 7L, 33L)))
    // 3-D contract: multi-t cutouts are a caller bug on this backend
    intercept[IllegalArgumentException] { cvDb.cutout((0, 0, 0), (8, 8, 4), 0, 0 until 2) }
  }
}
