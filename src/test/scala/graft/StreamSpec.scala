package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Region, VoxelType}
import graft.engine.{CuboidMerge, IdReservation, MergeMode, Render, SparseOps, SpatialOps}
import graft.storage.{CuboidCodec, CuboidStore, VersionedStore, VolumeGen, VoxelRow}
import graft.streaming.StreamingIngest

/** Write-path, store, and presentation specs: streaming ingest round-trip
  * (the reference's `int_test_spatialdb.py:75-315` ordering cases),
  * snapshot isolation, write lock, id reservation, sparse paint/shave
  * truth tables, isotropic build, and slice render.
  */
class StreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import Region.{Box, CuboidDims}
  private val dims = CuboidDims(8, 8, 4)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def vox(rows: (Long, Long, Long, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.map { case (x, y, z, v) => VoxelRow("k", 0, 0, x, y, z, v) }.toDF()
  }

  test("streaming ingest equals batch merge (write/read round-trip)") {
    import spark.implicits._
    val box = Box(0, 16, 0, 16, 0, 8)
    val a = VolumeGen.voxels(spark, "k", 0, box, 0 until 1, VoxelType.UInt64, seed = 21)
    val b = VolumeGen.voxels(spark, "k", 0, Box(8, 24, 0, 16, 0, 8), 0 until 1, VoxelType.UInt64, seed = 22)
    val store = tmp("store")
    VersionedStore.commit(CuboidCodec.fromVoxels(a, VoxelType.UInt64, dims), store)
    // write events: volume B lands in the ingest dir
    val events = tmp("events")
    b.toDF().write.mode("append").parquet(events)
    StreamingIngest.runAvailableNow(spark, events, store, tmp("ckpt"),
      VoxelType.UInt64, dims)
    // read-back equals the direct cuboid-plane batch merge
    val got = CuboidCodec.toVoxels(VersionedStore.read(spark, store), VoxelType.UInt64, dims).toDF()
    val want = CuboidCodec.toVoxels(
      CuboidMerge.merge(
        CuboidCodec.fromVoxels(a, VoxelType.UInt64, dims),
        CuboidCodec.fromVoxels(b, VoxelType.UInt64, dims),
        VoxelType.UInt64, MergeMode.Overwrite),
      VoxelType.UInt64, dims).toDF()
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(VersionedStore.currentVersion(store).contains(1))
  }

  test("versioned store: snapshot isolation and write lock") {
    import spark.implicits._
    val store = tmp("store2")
    val v0 = Seq(VoxelRow("k", 0, 0, 0, 0, 0, 7L)).toDS()
    VersionedStore.commit(CuboidCodec.fromVoxels(v0, VoxelType.UInt64, dims), store)
    val snap0 = VersionedStore.read(spark, store)
    val n0 = snap0.count()
    val v1 = Seq(VoxelRow("k", 0, 0, 1, 0, 0, 9L)).toDS()
    VersionedStore.commit(CuboidCodec.fromVoxels(v1, VoxelType.UInt64, dims), store)
    assert(VersionedStore.currentVersion(store).contains(1))
    assert(snap0.count() == n0) // old snapshot still readable
    VersionedStore.setLock(store, locked = true)
    intercept[IllegalStateException] {
      VersionedStore.commit(CuboidCodec.fromVoxels(v1, VoxelType.UInt64, dims), store)
    }
    VersionedStore.setLock(store, locked = false)
    VersionedStore.commit(CuboidCodec.fromVoxels(v1, VoxelType.UInt64, dims), store)
    assert(VersionedStore.currentVersion(store).contains(2))
  }

  test("streaming ingest with periodic compaction bounds the chain") {
    import spark.implicits._
    val rows = (0 until 24).map(i => VoxelRow("k", 0, 0, i.toLong, 0, 0, (i % 7 + 1).toLong))
    val events = tmp("eventsC")
    rows.toDS().repartitionByRange(6, col("x")).write.mode("overwrite").parquet(events)
    val store = tmp("storeC")
    StreamingIngest.runAvailableNow(spark, events, store, tmp("ckptC"),
      VoxelType.UInt64, dims, maxFilesPerTrigger = Some(1), compactEvery = 3)
    // every 3rd commit compacts, so the final read resolves a short chain
    // and still equals the full write set
    val got = CuboidCodec.toVoxels(VersionedStore.read(spark, store), VoxelType.UInt64, dims)
      .collect().map(r => (r.x, r.value)).toSet
    assert(got == rows.map(r => (r.x, r.value)).toSet)
    val v = VersionedStore.currentVersion(store).get
    assert(v >= 6) // 6 delta batches + interleaved compaction commits
  }

  test("delta commits: chain read, shave masking, compaction") {
    import spark.implicits._
    val store = tmp("storeDelta")
    def cubs(rows: (Long, Long)*) = CuboidCodec.fromVoxels(
      rows.map { case (x, v) => VoxelRow("k", 0, 0, x, 0, 0, v) }.toDS(),
      VoxelType.UInt64, dims)
    // full base: voxels at x=0 (cuboid 0) and x=20 (cuboid 2)
    VersionedStore.commit(cubs((0L, 5L), (20L, 6L)), store)
    // delta 1: overwrite touches only cuboid 0
    val inc1 = cubs((1L, 7L))
    VersionedStore.commitDelta(
      CuboidMerge.mergeDelta(VersionedStore.read(spark, store), inc1,
        VoxelType.UInt64, MergeMode.Overwrite), store)
    // delta 2: shave erases x=20 (touches only cuboid 2)
    val inc2 = cubs((20L, 1L))
    VersionedStore.commitDelta(
      CuboidMerge.mergeDelta(VersionedStore.read(spark, store), inc2,
        VoxelType.UInt64, MergeMode.Shave), store)
    assert(VersionedStore.currentVersion(store).contains(2))
    def state() = CuboidCodec.toVoxels(
      VersionedStore.read(spark, store), VoxelType.UInt64, dims)
      .collect().map(r => (r.x, r.value)).toSet
    assert(state() == Set((0L, 5L), (1L, 7L))) // x=20 shaved, x=0 kept, x=1 added
    // delta v1 holds only the touched cuboid (write scaled with the write)
    assert(CuboidStore.read(spark, s"$store/v1").count() == 1)
    // compaction collapses the chain without changing the content
    VersionedStore.compact(spark, store)
    assert(VersionedStore.currentVersion(store).contains(3))
    assert(state() == Set((0L, 5L), (1L, 7L)))
  }

  test("concurrent commits serialize on the commit lock (no version race)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val store = tmp("store3")
    def cuboids(x: Long) = CuboidCodec.fromVoxels(
      Seq(VoxelRow("k", 0, 0, x, 0, 0, 1L)).toDS(), VoxelType.UInt64, dims)
    val versions = Await.result(
      Future.sequence((1L to 4L).toList.map(x => Future(VersionedStore.commit(cuboids(x), store)))),
      120.seconds)
    assert(versions.sorted == List(0, 1, 2, 3)) // every committer got a distinct version
    assert(VersionedStore.currentVersion(store).contains(3))
    assert(VersionedStore.read(spark, store).count() == 1) // last snapshot intact
  }

  test("id reservation: monotone non-overlapping blocks, concurrent safety") {
    val dir = tmp("ids")
    val (s1, e1) = IdReservation.reserve(dir, "4&3&2", 0, 10)
    assert((s1, e1) == (1L, 11L)) // ids start at 1 like the reference
    val (s2, e2) = IdReservation.reserve(dir, "4&3&2", 0, 5)
    assert(s2 == 11L && e2 == 16L)
    // different channel: independent counter
    assert(IdReservation.reserve(dir, "9&9&9", 0, 3) == ((1L, 4L)))
    // concurrent reservations never overlap
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val ranges = Await.result(
      Future.sequence(List.fill(8)(Future(IdReservation.reserve(dir, "c", 0, 100)))),
      30.seconds)
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case List((_, e), (s, _)) => assert(s >= e)
      case _                    =>
    }
  }

  test("sparse annotate: O/P modes + exception side output") {
    // voxel at x=0 labelled 7 (conflict), x=1 labelled 555 (same), x=2 zero-absent
    val v = vox((0, 0, 0, 7), (1, 0, 0, 555))
    val p = vox((0, 0, 0, 0), (1, 0, 0, 0), (2, 0, 0, 0)).drop("value")
    def values(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.where(col("value") =!= 0).collect()
        .map(r => r.getAs[Long]("x") -> r.getAs[Long]("value")).toMap
    assert(values(SparseOps.annotateSparse(v, p, 555L, 'O')) ==
      Map(0L -> 555L, 1L -> 555L, 2L -> 555L))
    assert(values(SparseOps.annotateSparse(v, p, 555L, 'P')) ==
      Map(0L -> 7L, 1L -> 555L, 2L -> 555L))
    val exc = SparseOps.annotateExceptions(v, p, 555L).collect().map(_.getAs[Long]("x")).toSet
    assert(exc == Set(0L)) // only the conflicting point
  }

  test("sparse shave: erase matching label, report zeroed and exceptions") {
    val v = vox((0, 0, 0, 5), (1, 0, 0, 8), (3, 0, 0, 5))
    val p = vox((0, 0, 0, 0), (1, 0, 0, 0), (2, 0, 0, 0)).drop("value")
    val (result, zeroed, exceptions) = SparseOps.shaveSparse(v, p, 5L)
    val values = result.where(col("value") =!= 0).collect()
      .map(r => r.getAs[Long]("x") -> r.getAs[Long]("value")).toMap
    assert(values == Map(1L -> 8L, 3L -> 5L)) // x=0 shaved, x=3 untouched (not a point)
    assert(zeroed.collect().map(_.getAs[Long]("x")).toSet == Set(0L))
    assert(exceptions.collect().map(_.getAs[Long]("x")).toSet == Set(1L))
  }

  test("isotropic build: non-zero preference, truncated mean") {
    val v = vox((0, 0, 0, 10), (0, 0, 1, 21), // both non-zero -> (10+21)/2 = 15
      (1, 0, 2, 9),                            // odd side zero -> 9
      (2, 0, 3, 13))                           // even side zero -> 13
    val got = SparseOps.isotropicBuild(v).where(col("value") =!= 0).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("z"), r.getAs[Long]("value"))).toSet
    assert(got == Set((0L, 0L, 15L), (1L, 1L, 9L), (2L, 1L, 13L)))
  }

  test("render: slice projection, 16->8 windowing, byte image packing") {
    val v = vox((0, 0, 2, 65535L), (1, 1, 2, 256L), (3, 2, 5, 99L))
    val sl = Render.slice(v, Render.XY, 2L, VoxelType.UInt16)
    val pix = sl.collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("pix"))).toSet
    assert(pix == Set((0L, 0L, 255L), (1L, 1L, 1L))) // z=5 voxel excluded; >>8 applied
    val img = Render.toGrayBytes(sl, 0, 0, 4, 4)
    assert(img.length == 16)
    assert((img(0) & 0xff) == 255 && (img(5) & 0xff) == 1 && img.count(_ != 0) == 2)
  }

  test("resample composes zoom ops; occupancy counts per cuboid") {
    import spark.implicits._
    val v = vox((0, 0, 0, 5), (1, 0, 0, 5), (9, 9, 3, 8))
    val down = SpatialOps.resample(v, 1, annotation = true)
    assert(down.where(col("value") === 5).count() == 1)
    val up = SpatialOps.resample(vox((1, 1, 0, 9)), -1)
    assert(up.count() == 4)
    val occ = SpatialOps.cuboidOccupancy(v, dims).select("n_nonzero").as[Long].collect().sorted
    assert(occ.toSeq == Seq(1L, 2L))
  }
}
