package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Morton, Region, VoxelType}
import graft.engine.{SpatialOps, VoteAggregator, VoteIn}
import graft.storage.{CuboidCodec, CuboidStore, VolumeGen, VoxelRow}

/** Engine-level semantics tests: the Spark restatement of the reference's
  * write/read round-trip idiom (`spdb/spatialdb/test/int_test_spatialdb.py:
  * 39-315`) plus the kernel truth tables of SURVEY §2.10 / FIXTURES §A.4.
  */
class EngineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import Region.{Box, CuboidDims}
  private val dims = CuboidDims(8, 8, 4) // small chunks for tests

  private def vox(rows: (Long, Long, Long, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.map { case (x, y, z, v) => VoxelRow("4&3&2", 0, 0, x, y, z, v) }
      .toDF()
  }

  test("blob<->voxel codec round-trips a random volume") {
    import spark.implicits._
    val box = Box(0, 16, 0, 16, 0, 8) // 2x2x2 cuboids at 8x8x4
    val voxels = VolumeGen.voxels(spark, "4&3&2", 0, box, 0 until 2,
      VoxelType.UInt64, seed = 7, zeroFraction = 0.5)
    val nonZero = voxels.where($"value" =!= 0)
    val cuboids = CuboidCodec.fromVoxels(voxels, VoxelType.UInt64, dims)
    assert(cuboids.count() == 16) // 8 cuboids x 2 time samples
    val back = CuboidCodec.toVoxels(cuboids, VoxelType.UInt64, dims)
    assert(back.count() == nonZero.count())
    assert(back.toDF().except(nonZero.toDF()).isEmpty)
    assert(nonZero.toDF().except(back.toDF()).isEmpty)
  }

  test("codec masks unsigned uint8/uint16 correctly") {
    import spark.implicits._
    // values above the signed midpoint must survive the byte/short round-trip
    val voxels = Seq(
      VoxelRow("k", 0, 0, 0, 0, 0, 200L),   // > Byte.MaxValue
      VoxelRow("k", 0, 0, 1, 0, 0, 254L),
      VoxelRow("k", 0, 0, 2, 0, 0, 1L)).toDS()
    val back8 = CuboidCodec.toVoxels(
      CuboidCodec.fromVoxels(voxels, VoxelType.UInt8, dims), VoxelType.UInt8, dims)
    assert(back8.collect().map(v => (v.x, v.value)).toSet == Set((0L, 200L), (1L, 254L), (2L, 1L)))
    val voxels16 = Seq(VoxelRow("k", 0, 0, 0, 0, 0, 65534L)).toDS()
    val back16 = CuboidCodec.toVoxels(
      CuboidCodec.fromVoxels(voxels16, VoxelType.UInt16, dims), VoxelType.UInt16, dims)
    assert(back16.collect().head.value == 65534L)
  }

  test("store write/read + pruned cutout round-trip (aligned and unaligned)") {
    import spark.implicits._
    val box = Box(0, 32, 0, 32, 0, 8)
    val voxels = VolumeGen.voxels(spark, "4&3&2", 0, box, 0 until 1,
      VoxelType.UInt64, seed = 11)
    val path = java.nio.file.Files.createTempDirectory("cuboids").toString
    CuboidStore.write(CuboidCodec.fromVoxels(voxels, VoxelType.UInt64, dims), path)

    // unaligned window fully inside (mirrors corner (600,600,4) case scaled down)
    val win = Box(5, 21, 3, 19, 1, 7)
    val got = SpatialOps.cutoutFromStore(spark, path, "4&3&2", 0, win,
      0 until 1, VoxelType.UInt64, dims)
    val want = voxels.toDF().where(
      $"value" =!= 0 && $"x" >= 5 && $"x" < 21 && $"y" >= 3 && $"y" < 19 && $"z" >= 1 && $"z" < 7)
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("overwrite/exception/shave merge kernels (truth tables)") {
    // dst at (0..3,0,0): 5,0,7,0 ; src: 0,6,8,0 ; plus src-only voxel at x=9
    val dst = vox((0, 0, 0, 5), (2, 0, 0, 7))
    val src = vox((1, 0, 0, 6), (2, 0, 0, 8), (9, 0, 0, 3))
    def values(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.where(col("value") =!= 0).collect()
        .map(r => r.getAs[Long]("x") -> r.getAs[Long]("value")).toMap
    // M1: src!=0 wins
    assert(values(SpatialOps.overwriteMerge(dst, src)) == Map(0L -> 5L, 1L -> 6L, 2L -> 8L, 9L -> 3L))
    // M2: fill-only where dst==0
    assert(values(SpatialOps.exceptionMerge(dst, src)) == Map(0L -> 5L, 1L -> 6L, 2L -> 7L, 9L -> 3L))
    // M3: mask erases
    assert(values(SpatialOps.shaveMerge(dst, src)) == Map(0L -> 5L))
  }

  test("filterIds zeroes labels outside list; relabel/annotateEntity") {
    val v = vox((0, 0, 0, 5), (1, 0, 0, 6), (2, 0, 0, 7))
    def values(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("value"))).toSet
    assert(values(SpatialOps.filterIds(v, Seq(5, 7))) == Set((0L, 5L), (1L, 0L), (2L, 7L)))
    // large-list path (join)
    val bigList = (100L to 200L) :+ 6L
    assert(values(SpatialOps.filterIds(v, bigList)) == Set((0L, 0L), (1L, 6L), (2L, 0L)))
    assert(values(SpatialOps.relabel(v, 6, 66)) == Set((0L, 5L), (1L, 66L), (2L, 7L)))
    assert(values(SpatialOps.annotateEntity(v, 9)) == Set((0L, 9L), (1L, 9L), (2L, 9L)))
  }

  test("vote aggregator: repeated wins, else first non-zero, all-zero -> 0") {
    assert(VoteAggregator.finish(Seq(VoteIn(0, 0), VoteIn(1, 3), VoteIn(2, 5), VoteIn(3, 5))
      .foldLeft(VoteAggregator.zero)(VoteAggregator.reduce)) == 5L)
    assert(VoteAggregator.finish(Seq(VoteIn(0, 0), VoteIn(1, 9), VoteIn(2, 5), VoteIn(3, 3))
      .foldLeft(VoteAggregator.zero)(VoteAggregator.reduce)) == 9L)
    assert(VoteAggregator.finish(VoteAggregator.zero) == 0L)
    // distributed form
    val v = vox((0, 0, 0, 5), (1, 0, 0, 5), (0, 1, 0, 9), (3, 3, 3, 7))
    val down = SpatialOps.downsampleAnnotation(v)
    val got = down.collect().map(r =>
      (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("z"), r.getAs[Long]("value"))).toSet
    assert(got == Set((0L, 0L, 0L, 5L), (1L, 1L, 3L, 7L)))
  }

  test("ids-in-region: direct == index-first hybrid") {
    import spark.implicits._
    val box = Box(0, 32, 0, 32, 0, 8)
    val voxels = VolumeGen.voxels(spark, "4&3&2", 0, box, 0 until 1,
      VoxelType.UInt64, seed = 13).toDF()
    val req = Box(3, 29, 2, 30, 1, 7)
    val direct = SpatialOps.idsInRegion(voxels, req).as[Long].collect().toSet
    val cubIdx = SpatialOps.buildCuboidIndex(voxels, dims)
    val hybrid = SpatialOps.idsInRegionIndexed(voxels, cubIdx, req, dims).as[Long].collect().toSet
    assert(direct == hybrid)
    assert(direct.nonEmpty)
  }

  test("bounding boxes: tight within loose; tight exact") {
    import spark.implicits._
    val v = vox((3, 4, 1, 42), (12, 9, 2, 42), (5, 5, 3, 42), (0, 0, 0, 7))
    val tight = SpatialOps.boundingBoxTight(v, 42).collect().head
    assert((tight.getAs[Long]("x_min"), tight.getAs[Long]("x_max")) == (3L, 12L))
    assert((tight.getAs[Long]("y_min"), tight.getAs[Long]("y_max")) == (4L, 9L))
    assert((tight.getAs[Long]("z_min"), tight.getAs[Long]("z_max")) == (1L, 3L))
    val idIdx = SpatialOps.buildIdIndex(v, dims)
    val loose = SpatialOps.boundingBoxLoose(idIdx, 42, dims).collect().head
    assert(loose.getAs[Long]("x_min") <= 3 && loose.getAs[Long]("x_max") >= 12)
    assert(loose.getAs[Long]("z_min") <= 1 && loose.getAs[Long]("z_max") >= 3)
  }

  test("chunked id_index flattens to the unchunked index, rows bounded") {
    import spark.implicits._
    // id 42 spread over many cuboids so chunkSize=2 forces several chunks
    val v = vox((0 until 40).map(i => (i.toLong * 4, 0L, 0L, 42L)) :+ ((0L, 8L, 0L, 7L)): _*)
    val chunked = SpatialOps.buildIdIndexChunked(v, dims, chunkSize = 2)
    assert(chunked.select(max(size($"mortons"))).as[Int].head() <= 2)
    val flat = chunked.select($"id", explode($"mortons").as("m"))
      .as[(Long, Long)].collect().toSet
    val plain = SpatialOps.buildIdIndex(v, dims)
      .select($"id", explode($"mortons").as("m"))
      .as[(Long, Long)].collect().toSet
    assert(flat == plain && flat.nonEmpty)
    // chunk numbering is dense from 0 in morton order
    val chunks42 = chunked.where($"id" === 42L).select($"chunk_no").as[Long].collect().sorted
    assert(chunks42.head == 0L && chunks42.toSeq == (0L until chunks42.length).toSeq)
  }

  test("zoomOut/zoomIn") {
    val v = vox((0, 0, 0, 1), (1, 0, 0, 2), (2, 0, 0, 3), (2, 2, 0, 4))
    val out = SpatialOps.zoomOut(v, 1).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("value"))).toSet
    assert(out == Set((0L, 0L, 1L), (1L, 0L, 3L), (1L, 1L, 4L)))
    val in = SpatialOps.zoomIn(vox((1, 1, 0, 9)), 1).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("value"))).toSet
    assert(in == Set((2L, 2L, 9L), (3L, 2L, 9L), (2L, 3L, 9L), (3L, 3L, 9L)))
  }

  test("shifted-aligned and time-offset round-trips (int_test_spatialdb.py:75-315 cases)") {
    import spark.implicits._
    // shifted aligned corner (the reference's (1024,1024,32) case scaled to test dims)
    val shifted = Box(32, 48, 32, 48, 8, 16)
    val vol = VolumeGen.voxels(spark, "4&3&2", 0, shifted, 2 until 5,
      VoxelType.UInt64, seed = 23)
    val path = java.nio.file.Files.createTempDirectory("shifted").toString
    CuboidStore.write(CuboidCodec.fromVoxels(vol, VoxelType.UInt64, dims), path)
    // cutout the exact shifted box over the offset time range
    val got = SpatialOps.cutoutFromStore(spark, path, "4&3&2", 0, shifted,
      2 until 5, VoxelType.UInt64, dims)
    val want = vol.toDF().where($"value" =!= 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // missing time step: t=7 was never written -> zero rows, not an error (W7)
    assert(SpatialOps.cutoutFromStore(spark, path, "4&3&2", 0, shifted,
      7 until 8, VoxelType.UInt64, dims).count() == 0)
    // partially-covered time range returns only the written samples
    val part = SpatialOps.cutoutFromStore(spark, path, "4&3&2", 0, shifted,
      4 until 8, VoxelType.UInt64, dims)
    assert(part.select("t").distinct().as[Int].collect().toSeq == Seq(4))
  }

  test("buildPyramid: anisotropic levels halve x/y; iso levels halve z too") {
    import spark.implicits._
    val base = VolumeGen.voxels(spark, "4&3&2", 0, Box(0, 32, 0, 32, 0, 8),
      0 until 1, VoxelType.UInt64, seed = 29, zeroFraction = 0.2).toDF()
    val pyr = SpatialOps.buildPyramid(base, 3, annotation = true, isoLevel = 1).toMap
    assert(pyr.keySet == Set(0, 1, 2))
    def maxOf(df: org.apache.spark.sql.DataFrame, c: String) =
      df.agg(max(col(c))).as[Long].head()
    // level 1 (<= isoLevel): x/y halved, z untouched
    assert(maxOf(pyr(1), "x") <= 15 && maxOf(pyr(1), "z") == maxOf(base, "z"))
    // level 2 (> isoLevel): z halves as well; res column tracks the level
    assert(maxOf(pyr(2), "x") <= 7 && maxOf(pyr(2), "z") <= maxOf(base, "z") / 2)
    assert(pyr(2).select("res").distinct().as[Int].collect().toSeq == Seq(2))
    // image pyramid strides instead of voting
    val img = SpatialOps.buildPyramid(base, 2, annotation = false).toMap
    val l1 = img(1)
    val direct = SpatialOps.zoomOut(base, 1).withColumn("res", col("res") + 1)
    assert(l1.except(direct).isEmpty && direct.except(l1).isEmpty)
  }

  test("cuboid-plane merge kernel equals voxel-plane merge (all modes)") {
    import spark.implicits._
    import graft.engine.{CuboidMerge, MergeMode}
    val box = Box(0, 16, 0, 16, 0, 8)
    // two overlapping random volumes with different seeds; B shifted so
    // some cuboids exist on only one side
    val a = VolumeGen.voxels(spark, "k", 0, box, 0 until 1, VoxelType.UInt64, seed = 3)
    val b = VolumeGen.voxels(spark, "k", 0, Box(8, 24, 0, 16, 0, 8), 0 until 1, VoxelType.UInt64, seed = 4)
    val ca = CuboidCodec.fromVoxels(a, VoxelType.UInt64, dims)
    val cb = CuboidCodec.fromVoxels(b, VoxelType.UInt64, dims)
    for ((mode, voxelPlane) <- Seq(
        (MergeMode.Overwrite: MergeMode) -> SpatialOps.overwriteMerge _,
        (MergeMode.Exception: MergeMode) -> SpatialOps.exceptionMerge _,
        (MergeMode.Shave: MergeMode) -> SpatialOps.shaveMerge _)) {
      val viaCuboids = CuboidCodec.toVoxels(
        CuboidMerge.merge(ca, cb, VoxelType.UInt64, mode), VoxelType.UInt64, dims).toDF()
      val viaVoxels = voxelPlane(a.toDF(), b.toDF()).where($"value" =!= 0)
      assert(viaCuboids.except(viaVoxels).isEmpty && viaVoxels.except(viaCuboids).isEmpty,
        s"cuboid-plane != voxel-plane for $mode")
    }
  }

  test("small write into big store: touched/untouched split equals full merge") {
    import spark.implicits._
    import graft.engine.{CuboidMerge, MergeMode}
    val big = CuboidCodec.fromVoxels(
      VolumeGen.voxels(spark, "k", 0, Box(0, 32, 0, 32, 0, 8), 0 until 1, VoxelType.UInt64, seed = 61),
      VoxelType.UInt64, dims)
    // one-cuboid write (well under the broadcast limit -> split path)
    val small = CuboidCodec.fromVoxels(
      Seq(VoxelRow("k", 0, 0, 3, 3, 1, 999L)).toDS(), VoxelType.UInt64, dims)
    val viaSplit = CuboidCodec.toVoxels(
      CuboidMerge.merge(big, small, VoxelType.UInt64, MergeMode.Overwrite),
      VoxelType.UInt64, dims).toDF()
    val want = SpatialOps.overwriteMerge(
      CuboidCodec.toVoxels(big, VoxelType.UInt64, dims, keepZeros = true).toDF(),
      Seq(VoxelRow("k", 0, 0, 3, 3, 1, 999L)).toDS().toDF()).where($"value" =!= 0)
    assert(viaSplit.count() == want.count())
    assert(viaSplit.except(want).isEmpty && want.except(viaSplit).isEmpty)
  }

  test("uint8 cuboid-plane merge masks unsigned correctly") {
    import spark.implicits._
    import graft.engine.{CuboidMerge, MergeMode}
    // 200 > Byte.MaxValue: must stay non-zero through the merge kernel
    val d = CuboidCodec.fromVoxels(Seq(VoxelRow("k", 0, 0, 0, 0, 0, 200L)).toDS(), VoxelType.UInt8, dims)
    val s = CuboidCodec.fromVoxels(Seq(VoxelRow("k", 0, 0, 1, 0, 0, 254L)).toDS(), VoxelType.UInt8, dims)
    val merged = CuboidCodec.toVoxels(
      CuboidMerge.merge(d, s, VoxelType.UInt8, MergeMode.Overwrite), VoxelType.UInt8, dims)
    assert(merged.collect().map(v => (v.x, v.value)).toSet == Set((0L, 200L), (1L, 254L)))
  }

  test("ids-in-region hybrid takes the distributed-join path on huge covers") {
    import spark.implicits._
    val tiny = CuboidDims(1, 1, 1) // every voxel its own cuboid: 20^3 = 8000 > 4096
    val box = Box(0, 20, 0, 20, 0, 20)
    val voxels = VolumeGen.voxels(spark, "k", 0, box, 0 until 1,
      VoxelType.UInt64, seed = 17).toDF()
    val req = Box(0, 20, 0, 20, 0, 20)
    assert(Region.coveringCount(req, tiny) > 4096)
    val cubIdx = SpatialOps.buildCuboidIndex(voxels, tiny)
    val hybrid = SpatialOps.idsInRegionIndexed(voxels, cubIdx, req, tiny).as[Long].collect().toSet
    val direct = SpatialOps.idsInRegion(voxels, req).as[Long].collect().toSet
    assert(hybrid == direct && direct.nonEmpty)
  }

  test("filterIds with duplicate ids in the large-list path does not duplicate rows") {
    val v = vox((0, 0, 0, 5), (1, 0, 0, 6))
    val dupList = Seq.fill(40)(5L) ++ (100L to 140L) // 81 entries, dup 5s
    val got = SpatialOps.filterIds(v, dupList)
    assert(got.count() == 2)
    assert(got.where(col("value") === 5).count() == 1)
  }

  test("morton expressions run inside codegen and match Scala impl") {
    import spark.implicits._
    val df = spark.range(1000).select(
      (col("id") * 37 % 2097152).as("x"),
      (col("id") * 101 % 2097152).as("y"),
      (col("id") * 13 % 2097152).as("z"))
    val checked = df
      .withColumn("m", Morton.morton_encode(col("x"), col("y"), col("z")))
      .withColumn("ok",
        Morton.morton_x(col("m")) === col("x") &&
          Morton.morton_y(col("m")) === col("y") &&
          Morton.morton_z(col("m")) === col("z"))
    assert(checked.where(!col("ok")).count() == 0)
  }
}
