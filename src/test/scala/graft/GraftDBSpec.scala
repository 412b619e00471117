package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Region, Resource, VoxelType}
import graft.storage.VolumeGen

/** Façade-level round-trips: the reference migration surface — write /
  * cutout / filtered cutout / to-black erase / ids-in-region / bounding
  * box / id reservation / hierarchy, all through [[GraftDB]] (mirrors the
  * reference's `int_test_spatialdb.py` end-to-end batteries).
  */
class GraftDBSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-db-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import Region.Box
  private val dims = Region.CuboidDims(8, 8, 4)

  private def newDb(): GraftDB = new GraftDB(
    spark, Resource.fixture(VoxelType.UInt64),
    java.nio.file.Files.createTempDirectory("graftdb").toString, dims)

  test("hot control reads are stamp-memoized: one readSmall per stamp change, not per call") {
    import spark.implicits._
    import graft.storage.{ControlCache, VersionedStore}
    val db = newDb()
    db.writeCuboid(VolumeGen.voxels(spark, db.resource.lookupKey, 0, Box(0, 16, 0, 16, 0, 4),
      0 until 1, VoxelType.UInt64, seed = 77).toDF())
    db.buildHierarchy(2) // materializes _DOWNSAMPLE_STATUS + _HIERARCHY_V
    Thread.sleep(ControlCache.SettleMs + 30) // mtime stamps must settle past the skew window
    // warm the memo once per control file
    db.downsampleStatus; db.hierarchyMarker
    VersionedStore.currentVersion(db.storeRoot)
    val m0 = ControlCache.missCount
    (1 to 10).foreach { _ =>
      assert(db.downsampleStatus == GraftDB.Downsampled)
      assert(db.hierarchyMarker.isDefined)
      assert(VersionedStore.currentVersion(db.storeRoot).isDefined)
    }
    assert(ControlCache.missCount == m0,
      s"${ControlCache.missCount - m0} readSmall calls for 30 unchanged-pointer reads")
    // a write moves the stamps; after settling, exactly one re-read each
    db.writeCuboid(Seq((0L, 1L, 1L, 1L, 99L)).toDF("t", "x", "y", "z", "value"))
    Thread.sleep(ControlCache.SettleMs + 30)
    assert(db.downsampleStatus == GraftDB.NotDownsampled) // the new content IS seen
    VersionedStore.currentVersion(db.storeRoot)
    val m1 = ControlCache.missCount
    assert(m1 > m0, "stamp change must trigger a re-read")
    (1 to 10).foreach { _ =>
      db.downsampleStatus
      VersionedStore.currentVersion(db.storeRoot)
    }
    assert(ControlCache.missCount == m1, "post-change reads must hit the refreshed memo")
  }

  test("write / cutout round-trip and filtered cutout through the facade") {
    import spark.implicits._
    val db = newDb()
    val vol = VolumeGen.voxels(spark, db.resource.lookupKey, 0, Box(0, 16, 0, 16, 0, 8),
      0 until 1, VoxelType.UInt64, seed = 51).toDF()
    db.writeCuboid(vol)
    val got = db.cutout((2, 3, 1), (10, 11, 6))
    val want = vol.where($"value" =!= 0 &&
      $"x" >= 2 && $"x" < 12 && $"y" >= 3 && $"y" < 14 && $"z" >= 1 && $"z" < 7)
    assert(got.count() == want.count() && got.except(want).isEmpty)
    // filtered cutout zeroes labels outside the list
    val someIds = want.select("value").as[Long].take(3).toSeq
    val filtered = db.cutout((2, 3, 1), (10, 11, 6), filterIds = Some(someIds))
    assert(filtered.where($"value" =!= 0).select("value").as[Long].collect().toSet
      .subsetOf(someIds.toSet))
    // ids absent from the region filter to an empty result, not an error
    // (int_test_spatialdb.py:709 test_filtered_cutout_bad_id_list)
    val bad = db.cutout((2, 3, 1), (10, 11, 6), filterIds = Some(Seq(999999L, 888888L)))
    assert(bad.where($"value" =!= 0).count() == 0)
  }

  test("resource lock refuses writes until cleared (spatialdb.py:741-746)") {
    import spark.implicits._
    val db = newDb()
    val v = Seq((0L, 0L, 0L, 0L, 3L)).toDF("t", "x", "y", "z", "value")
    assert(!db.resourceLocked)
    db.setResourceLock(true)
    assert(db.resourceLocked)
    val e = intercept[IllegalStateException](db.writeCuboid(v))
    assert(e.getMessage.contains("write-locked"))
    db.setResourceLock(false)
    db.writeCuboid(v)
    assert(db.cutout((0, 0, 0), (1, 1, 1)).select("value").as[Long].head() == 3L)
  }

  test("write resolution guard: only base resolution and base+1 accepted") {
    import spark.implicits._
    val db = newDb()
    val v = Seq((0L, 0L, 0L, 0L, 5L)).toDF("t", "x", "y", "z", "value")
    db.writeCuboid(v, res = 0) // base
    db.writeCuboid(v, res = 1) // base + 1
    // parity with spatialdb.py:746-752: anything else is rejected
    val e = intercept[IllegalArgumentException](db.writeCuboid(v, res = 2))
    assert(e.getMessage.contains("Resolution Mismatch"))
  }

  test("overwrite merge semantics and to-black erase across writes") {
    import spark.implicits._
    val db = newDb()
    val a = VolumeGen.voxels(spark, db.resource.lookupKey, 0, Box(0, 8, 0, 8, 0, 4),
      0 until 1, VoxelType.UInt64, seed = 52).toDF()
    db.writeCuboid(a)
    // second write: non-zero voxels of B overwrite A (M1)
    val b = Seq((0L, 0L, 0L, 0L, 77L)).toDF("t", "x", "y", "z", "value")
    db.writeCuboid(b)
    assert(db.cutout((0, 0, 0), (1, 1, 1)).select("value").as[Long].head() == 77L)
    // to-black: the same cell as a mask erases it (W8)
    db.writeCuboid(b, toBlack = true)
    assert(db.cutout((0, 0, 0), (1, 1, 1)).where($"value" =!= 0).count() == 0)
  }

  test("sequential writes compose across a deep delta chain (time-offset case)") {
    import spark.implicits._
    val db = newDb()
    // five writes at offset times [2,5) with a missing step (t=3), one
    // delta commit each — the chain read must compose all of them
    for (i <- 0 until 5) {
      val t = if (i % 2 == 0) 2L else 4L
      db.writeCuboid(Seq((t, i.toLong, 0L, 0L, (i + 1).toLong)).toDF("t", "x", "y", "z", "value"))
    }
    // overwrite chain: the same cell rewritten twice — last write wins
    db.writeCuboid(Seq((2L, 0L, 0L, 0L, 99L)).toDF("t", "x", "y", "z", "value"))
    val got = db.cutout((0, 0, 0), (8, 8, 4), tRange = 2 until 5)
      .select($"t", $"x", $"value").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 0L, 99L), (2L, 2L, 3L), (2L, 4L, 5L), (4L, 1L, 2L), (4L, 3L, 4L)))
    // absent time step yields no rows (sparse semantics, W7 contract)
    assert(db.cutout((0, 0, 0), (8, 8, 4), tRange = 3 until 4).count() == 0)
  }

  test("ids-in-region, stringified egress, bounding boxes") {
    import spark.implicits._
    val db = newDb()
    val vol = Seq(
      (0L, 1L, 1L, 1L, 42L), (0L, 6L, 7L, 3L, 42L), (0L, 2L, 2L, 2L, 9L))
      .toDF("t", "x", "y", "z", "value")
    db.writeCuboid(vol)
    val ids = db.getIdsInRegion((0, 0, 0), (8, 8, 4)).as[Long].collect().toSet
    assert(ids == Set(42L, 9L))
    assert(db.stringifyIds(db.getIdsInRegion((0, 0, 0), (8, 8, 4)))
      .as[String].collect().toSet == Set("42", "9"))
    val tight = db.getBoundingBox(42L).collect().head
    assert((tight.getAs[Long]("x_min"), tight.getAs[Long]("x_max")) == ((1L, 6L)))
    val loose = db.getBoundingBox(42L, tight = false).collect().head
    assert(loose.getAs[Long]("x_min") <= 1 && loose.getAs[Long]("x_max") >= 6)
  }

  test("materialized id index: maintained per write, shave masks stale entries, bbox index-first") {
    import spark.implicits._
    import graft.storage.IndexStore
    val db = newDb()
    // id 42 in two cuboids: (1,1,1) → cuboid (0,0,0), (9,1,1) → cuboid (1,0,0)
    db.writeCuboid(Seq(
      (0L, 1L, 1L, 1L, 42L), (0L, 9L, 1L, 1L, 42L), (0L, 2L, 2L, 2L, 9L))
      .toDF("t", "x", "y", "z", "value"))
    val ip = IndexStore.path(db.storeRoot)
    assert(IndexStore.exists(ip))
    def mortonsOf(id: Long): Set[Long] =
      IndexStore.read(spark, ip).where($"id" === id)
        .select("morton").as[Long].collect().toSet
    assert(mortonsOf(42L) == Set(graft.core.Morton.encode(0, 0, 0), graft.core.Morton.encode(1, 0, 0)))
    // loose bbox spans both cuboids; tight is exact
    val loose0 = db.getBoundingBox(42L, tight = false).collect().head
    assert((loose0.getAs[Long]("x_min"), loose0.getAs[Long]("x_max")) == ((0L, 16L)))
    val tight0 = db.getBoundingBox(42L).collect().head
    assert((tight0.getAs[Long]("x_min"), tight0.getAs[Long]("x_max")) == ((1L, 9L)))
    // shave the second cuboid's voxel: the delta's index commit must MASK
    // the stale (cuboid 1 → 42) entry via its tombstone, not just append
    db.writeCuboid(Seq((0L, 9L, 1L, 1L, 1L)).toDF("t", "x", "y", "z", "value"), toBlack = true)
    assert(mortonsOf(42L) == Set(graft.core.Morton.encode(0, 0, 0)))
    val tight1 = db.getBoundingBox(42L).collect().head
    assert((tight1.getAs[Long]("x_min"), tight1.getAs[Long]("x_max")) == ((1L, 1L)))
    val loose1 = db.getBoundingBox(42L, tight = false).collect().head
    assert(loose1.getAs[Long]("x_max") == 8L)
    // absent id: empty tight result, not an error
    assert(db.getBoundingBox(424242L).isEmpty)
  }

  test("an empty write commits harmlessly and later reads/writes still work") {
    import spark.implicits._
    val db = newDb()
    db.writeCuboid(Seq((0L, 1L, 1L, 1L, 5L)).toDF("t", "x", "y", "z", "value"))
    // zero-row write: commits an empty delta version (and an empty index
    // delta) — chain reads must treat it as empty, not fail schema
    // inference on the file-less version directory
    db.writeCuboid(Seq.empty[(Long, Long, Long, Long, Long)].toDF("t", "x", "y", "z", "value"))
    assert(db.cutout((0, 0, 0), (8, 8, 4)).select("value").as[Long].collect().toSeq == Seq(5L))
    assert(db.getBoundingBox(5L).collect().head.getAs[Long]("x_min") == 1L)
    db.writeCuboid(Seq((0L, 2L, 2L, 2L, 7L)).toDF("t", "x", "y", "z", "value"))
    assert(db.cutout((0, 0, 0), (8, 8, 4)).where($"value" =!= 0).count() == 2)
  }

  test("compact collapses data and index chains without changing any result") {
    import spark.implicits._
    import graft.storage.{IndexStore, VersionedStore}
    val db = newDb()
    db.writeCuboid(Seq(
      (0L, 1L, 1L, 1L, 42L), (0L, 9L, 1L, 1L, 42L), (0L, 2L, 2L, 2L, 9L))
      .toDF("t", "x", "y", "z", "value"))
    db.writeCuboid(Seq((0L, 3L, 3L, 3L, 7L)).toDF("t", "x", "y", "z", "value"))
    db.writeCuboid(Seq((0L, 9L, 1L, 1L, 1L)).toDF("t", "x", "y", "z", "value"), toBlack = true)
    def snapshot() = (
      db.cutout((0, 0, 0), (16, 16, 8)).where($"value" =!= 0)
        .select($"x", $"y", $"z", $"value").as[(Long, Long, Long, Long)].collect().toSet,
      db.getBoundingBox(42L).collect().head.toSeq)
    val before = snapshot()
    val v = db.compact()
    // both current versions are full snapshots now (no _DELTA marker)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(db.storeRoot, s"v$v", "_DELTA")))
    val iv = VersionedStore.currentVersion(IndexStore.path(db.storeRoot)).get
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(IndexStore.path(db.storeRoot), s"v$iv", "_DELTA")))
    assert(snapshot() == before)
  }

  test("propagate recomputes only dirty derived cuboids and matches a full rebuild") {
    import spark.implicits._
    val db = newDb()
    db.writeCuboid(VolumeGen.voxels(spark, db.resource.lookupKey, 0, Box(0, 16, 0, 16, 0, 8),
      0 until 1, VoxelType.UInt64, seed = 60).toDF())
    db.buildHierarchy(3)
    assert(db.hierarchyMarker.map(_._2).contains(3))
    // a one-voxel patch + a full-slab erase: the erase empties entire
    // level-1/2 parents, exercising the zero-fill masking path
    db.writeCuboid(Seq((0L, 1L, 1L, 5L, 123L)).toDF("t", "x", "y", "z", "value"))
    db.writeCuboid(
      VolumeGen.constant(spark, db.resource.lookupKey, 0, Box(0, 16, 0, 16, 0, 4)).toDF(),
      toBlack = true)
    assert(db.downsampleStatus == GraftDB.NotDownsampled)
    val v = db.propagate()
    assert(db.downsampleStatus == GraftDB.Downsampled)
    // the commit is a delta, marked as a propagate version, and O(write):
    // exactly 2 dirty parents per derived level (patch + erased slab)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(db.storeRoot, s"v$v", "_DELTA")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(db.storeRoot, s"v$v", "_PROPAGATE")))
    assert(graft.storage.CuboidStore.read(spark, s"${db.storeRoot}/v$v").count() == 4)
    // equivalence: a fresh store with the same final base, fully rebuilt
    val db2 = newDb()
    db2.writeCuboid(db.cutout((0, 0, 0), (16, 16, 8)))
    db2.buildHierarchy(3)
    for (r <- 0 until 3) {
      val a = db.cutout((0, 0, 0), (16, 16, 8), res = r).where($"value" =!= 0)
        .select($"x", $"y", $"z", $"value")
      val b = db2.cutout((0, 0, 0), (16, 16, 8), res = r).where($"value" =!= 0)
        .select($"x", $"y", $"z", $"value")
      assert(a.count() == b.count() && a.except(b).isEmpty, s"level $r diverged")
    }
    // nothing new: propagate is a cheap no-op that keeps the version
    assert(db.propagate() == v)
    assert(db.downsampleStatus == GraftDB.Downsampled)
  }

  test("propagate on an image channel (zoomOut geometry, no index) matches a rebuild") {
    import spark.implicits._
    val db = new GraftDB(
      spark, Resource.fixture(VoxelType.UInt8, "4&3&9"),
      java.nio.file.Files.createTempDirectory("graftdb").toString, dims)
    db.writeCuboid(VolumeGen.voxels(spark, db.resource.lookupKey, 0, Box(0, 16, 0, 16, 0, 4),
      0 until 1, VoxelType.UInt8, seed = 61).toDF())
    db.buildHierarchy(3)
    db.writeCuboid(Seq((0L, 2L, 2L, 1L, 200L)).toDF("t", "x", "y", "z", "value"))
    db.propagate()
    val db2 = new GraftDB(
      spark, Resource.fixture(VoxelType.UInt8, "4&3&9"),
      java.nio.file.Files.createTempDirectory("graftdb").toString, dims)
    db2.writeCuboid(db.cutout((0, 0, 0), (16, 16, 4)))
    db2.buildHierarchy(3)
    for (r <- 0 until 3) {
      val a = db.cutout((0, 0, 0), (16, 16, 4), res = r).where($"value" =!= 0)
        .select($"x", $"y", $"z", $"value")
      val b = db2.cutout((0, 0, 0), (16, 16, 4), res = r).where($"value" =!= 0)
        .select($"x", $"y", $"z", $"value")
      assert(a.count() == b.count() && a.except(b).isEmpty, s"level $r diverged")
    }
  }

  test("propagate without a prior hierarchy falls back to a full build") {
    import spark.implicits._
    val db = newDb()
    db.writeCuboid(Seq((0L, 1L, 1L, 1L, 5L), (0L, 9L, 9L, 3L, 6L))
      .toDF("t", "x", "y", "z", "value"))
    db.propagate()
    assert(db.downsampleStatus == GraftDB.Downsampled)
    assert(db.cutout((0, 0, 0), (8, 8, 4), res = 1).where($"value" =!= 0).count() > 0)
  }

  test("index crash window: readers repaired on the fly, standing index healed by the next write") {
    import spark.implicits._
    import graft.core.Morton
    import graft.storage.{CuboidCodec, IndexStore, VersionedStore, VoxelRow}
    val db = newDb()
    val ip = IndexStore.path(db.storeRoot)
    db.writeCuboid(Seq((0L, 1L, 1L, 1L, 7L)).toDF("t", "x", "y", "z", "value"))
    assert(IndexStore.coveredStoreVersion(ip).contains(0))
    // simulate a writer that died BETWEEN its data commit and its index
    // commit: land a store delta directly, bypassing index maintenance
    val orphan = CuboidCodec.fromVoxels(
      Seq(VoxelRow(db.resource.lookupKey, 0, 0, 9L, 9L, 3L, 42L)).toDS(),
      VoxelType.UInt64, dims)
    VersionedStore.commitDelta(orphan, db.storeRoot)
    assert(VersionedStore.currentVersion(db.storeRoot).contains(1))
    assert(IndexStore.coveredStoreVersion(ip).contains(0)) // index is behind...
    assert(IndexStore.read(spark, ip).where($"id" === 42L).isEmpty) // ...and lacks 42
    // ...but index-first readers NEVER see the stale window: readCurrent
    // masks the orphaned version's rows in on the fly
    assert(db.getIdsInRegion((0, 0, 0), (16, 16, 8)).as[Long].collect().toSet
      == Set(7L, 42L))
    val bb = db.getBoundingBox(42L).collect().head
    assert((bb.getAs[Long]("x_min"), bb.getAs[Long]("x_max")) == ((9L, 9L)))
    // the next facade write heals the standing index deterministically:
    // its delta covers the orphaned version too
    db.writeCuboid(Seq((0L, 2L, 2L, 2L, 8L)).toDF("t", "x", "y", "z", "value"))
    assert(IndexStore.coveredStoreVersion(ip).contains(2))
    assert(IndexStore.read(spark, ip).where($"id" === 42L)
      .select("morton").as[Long].collect().toSet == Set(Morton.encode(1, 1, 0)))
    // an orphaned to-black erase masks via its tombstone through the same
    // repair path: shave 42's voxel behind the index's back
    val shaved = graft.engine.CuboidMerge.mergeAll(
      VersionedStore.readForKeys(spark, db.storeRoot,
        orphan.toDF().select($"lookupKey", $"res", $"t", $"morton").distinct()),
      orphan, VoxelType.UInt64, graft.engine.MergeMode.Shave)
    VersionedStore.commitDelta(shaved, db.storeRoot)
    assert(db.getIdsInRegion((0, 0, 0), (16, 16, 8)).as[Long].collect().toSet
      == Set(7L, 8L)) // 42 gone for readers immediately, pre-heal
    // a SECOND orphan rewriting the SAME cuboid: the on-the-fly repair
    // must take the newest orphan per cuboid key (deltaRowsFor masking
    // across multiple missing versions), not union both
    val orphan2 = CuboidCodec.fromVoxels(
      Seq(VoxelRow(db.resource.lookupKey, 0, 0, 9L, 9L, 3L, 99L)).toDS(),
      VoxelType.UInt64, dims)
    VersionedStore.commitDelta(orphan2, db.storeRoot)
    assert(IndexStore.coveredStoreVersion(ip).contains(2)) // two behind now
    assert(db.getIdsInRegion((0, 0, 0), (16, 16, 8)).as[Long].collect().toSet
      == Set(7L, 8L, 99L))
    // heal: the next write's index delta covers BOTH orphaned versions
    db.writeCuboid(Seq((0L, 3L, 3L, 3L, 6L)).toDF("t", "x", "y", "z", "value"))
    assert(IndexStore.coveredStoreVersion(ip).contains(5))
    assert(IndexStore.read(spark, ip).where($"id" === 99L)
      .select("morton").as[Long].collect().toSet == Set(Morton.encode(1, 1, 0)))
    assert(IndexStore.read(spark, ip).where($"id" === 42L).isEmpty)
  }

  test("propagate delta is bounded by the patch footprint, not the store (big-store contract)") {
    import spark.implicits._
    import graft.storage.CuboidStore
    val db = newDb()
    // 64×64×16 base volume = 8×8×4 = 256 base cuboids
    db.writeCuboid(VolumeGen.voxels(spark, db.resource.lookupKey, 0, Box(0, 64, 0, 64, 0, 16),
      0 until 1, VoxelType.UInt64, seed = 77).toDF())
    val levels = 4
    db.buildHierarchy(levels)
    val storeCuboids = graft.storage.VersionedStore.read(spark, db.storeRoot).count()
    // one-voxel patch → 1 dirty base cuboid → exactly 1 recomputed parent
    // per derived level: the delta must be ≤ footprint × (levels-1), and
    // in particular nowhere near the store's own cuboid count — red if
    // propagate ever falls back to rescanning/rebuilding the store
    db.writeCuboid(Seq((0L, 33L, 17L, 9L, 555L)).toDF("t", "x", "y", "z", "value"))
    val v = db.propagate()
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(db.storeRoot, s"v$v", "_PROPAGATE")))
    val delta = CuboidStore.read(spark, s"${db.storeRoot}/v$v").toDF()
    val deltaRows = delta.count()
    assert(deltaRows <= (levels - 1).toLong,
      s"propagate delta $deltaRows exceeds footprint×levels bound ${levels - 1}")
    assert(deltaRows < storeCuboids / 10,
      s"propagate delta $deltaRows is store-sized ($storeCuboids) — store rescan regression")
    // exactly the patch's ancestor chain: one recomputed cuboid per level
    assert(delta.select("res").distinct().as[Int].collect().toSet
      == (1 until levels).toSet)
  }

  test("facade battery over the rename-less object-store protocol (put-if-absent only)") {
    import spark.implicits._
    import graft.storage.{IndexStore, LocalFsCommitProtocol, ObjectStoreCommitProtocol, VersionedStore}
    // swap the engine-wide control plane to the object-store emulation:
    // every pointer publish, status write, lock and id counter must work
    // without atomic rename or in-place overwrite. ProtocolSwap holds the
    // JVM-wide swap lock for the whole battery (reentrant for the nested
    // local-FS rebuild below).
    ProtocolSwap.withProtocol(ObjectStoreCommitProtocol) {
      val db = newDb()
      db.writeCuboid(VolumeGen.voxels(spark, db.resource.lookupKey, 0, Box(0, 16, 0, 16, 0, 8),
        0 until 1, VoxelType.UInt64, seed = 83).toDF())
      db.writeCuboid(Seq((0L, 1L, 1L, 1L, 424L)).toDF("t", "x", "y", "z", "value"))
      // snapshot pointer, id index, status machine all through the chain
      assert(VersionedStore.currentVersion(db.storeRoot).contains(1))
      assert(IndexStore.coveredStoreVersion(IndexStore.path(db.storeRoot)).contains(1))
      assert(db.cutout((1, 1, 1), (1, 1, 1)).select("value").as[Long].head() == 424L)
      val bb = db.getBoundingBox(424L).collect().head
      assert((bb.getAs[Long]("x_min"), bb.getAs[Long]("x_max")) == ((1L, 1L)))
      assert(db.reserveIds(10)._1 == 1L && db.reserveIds(5)._1 == 11L)
      db.buildHierarchy(2)
      assert(db.downsampleStatus == GraftDB.Downsampled)
      db.writeCuboid(Seq((0L, 2L, 2L, 2L, 7L)).toDF("t", "x", "y", "z", "value"))
      assert(db.downsampleStatus == GraftDB.NotDownsampled)
      val v = db.propagate()
      assert(db.downsampleStatus == GraftDB.Downsampled)
      assert(db.hierarchyMarker.map(_._2).contains(2))
      assert(v >= 2)
      // equivalence against the same store rebuilt under the local-FS
      // protocol: content is protocol-independent. Force the object-store
      // side to sets first (plan construction is the only protocol
      // consumer), then swap back and rebuild.
      def levels(d: GraftDB): Seq[Set[(Long, Long, Long, Long)]] =
        (0 until 2).map(r => d.cutout((0, 0, 0), (16, 16, 8), res = r)
          .where($"value" =!= 0)
          .select($"x", $"y", $"z", $"value")
          .as[(Long, Long, Long, Long)].collect().toSet)
      val objSide = levels(db)
      val base = db.cutout((0, 0, 0), (16, 16, 8)).collect()
      val fsSide = ProtocolSwap.withProtocol(LocalFsCommitProtocol) {
        val db2 = newDb()
        db2.writeCuboid(spark.createDataFrame(
          spark.sparkContext.parallelize(base.toSeq),
          db.cutout((0, 0, 0), (16, 16, 8)).schema))
        db2.buildHierarchy(2)
        levels(db2)
      }
      assert(objSide == fsSide, "object-store and local-FS stores diverged")
    }
  }

  test("id reservation and hierarchy build through the facade") {
    import spark.implicits._
    val db = newDb()
    assert(db.reserveIds(10) == ((1L, 11L)))
    assert(db.reserveIds(5) == ((11L, 16L)))
    val vol = VolumeGen.voxels(spark, db.resource.lookupKey, 0, Box(0, 16, 0, 16, 0, 4),
      0 until 1, VoxelType.UInt64, seed = 53).toDF()
    db.writeCuboid(vol)
    // downsample-status machine (ndtype.py:43-45): fresh channel is
    // NOT_DOWNSAMPLED, a successful build lands on DOWNSAMPLED, and a
    // new base write invalidates back to NOT_DOWNSAMPLED
    assert(db.downsampleStatus == GraftDB.NotDownsampled)
    db.buildHierarchy(3)
    assert(db.downsampleStatus == GraftDB.Downsampled)
    // levels 1 and 2 exist in the committed snapshot with shrunken extents
    val snap = graft.storage.VersionedStore.read(spark, db.storeRoot).toDF()
    assert(snap.select("res").distinct().as[Int].collect().toSet == Set(0, 1, 2))
    val l1 = db.cutout((0, 0, 0), (8, 8, 4), res = 1)
    assert(l1.count() > 0)
    assert(l1.agg(max($"x")).as[Long].head() <= 7)
    db.writeCuboid(Seq((0L, 0L, 0L, 0L, 9L)).toDF("t", "x", "y", "z", "value"))
    assert(db.downsampleStatus == GraftDB.NotDownsampled)
  }
}
