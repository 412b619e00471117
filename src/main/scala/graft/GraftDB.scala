package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ChannelType, Region, Resource, VoxelType}
import graft.engine.{CuboidMerge, IdReservation, MergeMode, SpatialOps}
import graft.storage.{CuboidCodec, CuboidStore, IndexStore, VersionedStore, VoxelRow}

/** The engine façade — a 1:1 migration target for the reference's
  * `SpatialDB` entry points (`spdb/spatialdb/spatialdb.py`): cutout,
  * write_cuboid (incl. to_black), get_ids_in_region, get_bounding_box,
  * reserve_ids, plus the hierarchy job. One instance per channel
  * ([[Resource]]); data lives in a [[VersionedStore]] under `storeRoot`,
  * so every write is an atomic snapshot commit and readers never block
  * (the reference's dirty-read polling has no analog here).
  *
  * All coordinates are world-space `[corner, corner+extent)` at the given
  * resolution, matching the reference's conventions; annotation ids are
  * Long internally and stringified only at the JSON egress helpers
  * (`object.py:828-831`).
  */
final class GraftDB(
    val spark: SparkSession,
    val resource: Resource,
    val storeRoot: String,
    val dims: Region.CuboidDims = Region.CuboidDims()) {
  import Region.Box

  private def vt: VoxelType = resource.channel.datatype
  private def lk: String = resource.lookupKey
  private def indexPath: String = IndexStore.path(storeRoot)

  /** Index maintenance follows the reference: only annotation channels
    * carry id indexes (`object_indices.py` writes happen on the
    * annotation ingest path; image channels have no ids to index).
    */
  private def maintainsIndex: Boolean = resource.channel.isAnnotation

  /** Re-derive and commit the index rows of the cuboids in a just-
    * committed version directory (delta: exactly the touched cuboids;
    * full snapshot: everything) — O(committed cuboids) IO, mirroring the
    * reference's per-write DynamoDB index updates
    * (`object_indices.py:730-817`).
    */
  private def commitIndexFor(version: Int, full: Boolean): Unit = {
    // the coverage check, delta/full decision and `_STORE_V` stamp all
    // run INSIDE the index commit lock (see [[IndexStore.commitCovering]])
    // so a racing façade writer can never stamp coverage backwards
    IndexStore.commitCovering(spark, indexPath, storeRoot, version, full, vt)
    ()
  }

  private def box(corner: (Long, Long, Long), extent: (Long, Long, Long)): Box =
    Box(corner._1, corner._1 + extent._1,
      corner._2, corner._2 + extent._2,
      corner._3, corner._3 + extent._3)

  /** `SpatialDB.cutout` (`spatialdb.py:360`): pruned scan of the current
    * snapshot, optional id filter (`filter_ids`, annotation channels).
    * Returns sparse voxel rows; absent voxels are zero.
    */
  def cutout(
      corner: (Long, Long, Long),
      extent: (Long, Long, Long),
      res: Int = 0,
      tRange: Range = 0 until 1,
      filterIds: Option[Seq[Long]] = None): DataFrame = {
    val out =
      if (resource.channel.isCloudVolume) {
        // alternate backend (`resource.py:273-280`): the channel's voxels
        // live in a precomputed chunk layout at cvPath; it has no time
        // axis, so only t=0 is addressable — same 3-D shape the
        // reference's cloudvol channels expose.
        require(tRange == (0 until 1),
          s"precomputed channels are 3-D (t=0 only), got $tRange")
        graft.sources.Precomputed.cutout(
          spark, resource.channel.cvPath, res.toString, box(corner, extent), lk)
      } else SpatialOps.cutoutFromCuboids(
        VersionedStore.read(spark, storeRoot), lk, res, box(corner, extent), tRange, vt, dims)
    filterIds.fold(out)(ids => SpatialOps.filterIds(out, ids))
  }

  /** Export the current snapshot's t=0 slice as a precomputed layer at
    * `cvRoot` (info + raw chunk objects) — the migration path onto the
    * reference's alternate `storage_type='cloudvol'` backend
    * (`resource.py:247-259`). One scale per resolution present in the
    * store; chunk writes are partition-local, nothing collects.
    */
  def exportPrecomputed(cvRoot: String): Unit = {
    import graft.sources.Precomputed
    val cubs = VersionedStore.read(spark, storeRoot)
    val resLevels = cubs.toDF().select(col("res")).distinct()
      .collect().map(_.getInt(0)).sorted
    val levels = if (resLevels.isEmpty) 1 else resLevels.max + 1
    val info = Precomputed.infoFor(resource, dims, levels)
    Precomputed.writeInfo(cvRoot, info)
    resLevels.foreach { r => Precomputed.exportScale(cubs, cvRoot, info, r.toString, dims) }
  }

  /** `SpatialDB.write_cuboid` (`spatialdb.py:719`): merge-write a voxel
    * set into the channel. `toBlack = true` treats the input as an erase
    * mask (W8 cutout-to-black); otherwise non-zero voxels overwrite (M1).
    * One atomic DELTA commit replaces the reference's write-buffer /
    * page-out pipeline: the chain read and the write both cost O(write),
    * never O(store). Returns the committed version.
    *
    * Concurrency contract: commits serialize (commit lock), and writers
    * touching DISJOINT cuboids compose under any interleaving. The
    * read-merge-write of a SHARED cuboid is not transactional — the
    * last committer's merged cuboid wins, so a racer's voxels inside
    * that same cuboid can be lost (the reference serializes this case
    * via its write-lock/page-out machinery). Deployments with multiple
    * writers to overlapping regions route them through ONE
    * [[graft.streaming.StreamingIngest]] writer or take
    * [[setResourceLock]] around the write.
    */
  def writeCuboid(voxels: DataFrame, res: Int = 0, toBlack: Boolean = false): Int = {
    // behavioral parity with the reference's resolution guard
    // (`spatialdb.py:746-752`): writes land only at the channel's base
    // resolution or one level above it — anything else is a caller bug
    // (derived levels are rebuilt by `buildHierarchy`, never written).
    val baseRes = resource.channel.baseResolution
    require(res == baseRes || res == baseRes + 1,
      s"Resolution Mismatch: writes allowed only at base resolution $baseRes or ${baseRes + 1}, got $res")
    import spark.implicits._
    val rows = voxels
      .select(lit(lk).as("lookupKey"), lit(res).as("res"),
        col("t").cast("int").as("t"), col("x"), col("y"), col("z"), col("value"))
    // Key footprint from the VOXELS (narrow scan + distinct), not from
    // the encoded cuboid frame: deriving it from `incoming` ran the full
    // encode (groupByKey + blob build) once for the key job and needed a
    // MEMORY_AND_DISK persist to spare the write job a second encode.
    // Voxel-derived keys make `incoming` single-consumer — the encode
    // runs exactly once, inside the commit's write job, nothing cached.
    val incKeys = rows
      .select(col("lookupKey"), col("res"), col("t"),
        graft.core.Morton.morton_encode(
          expr(s"x div ${dims.x}"), expr(s"y div ${dims.y}"),
          expr(s"z div ${dims.z}")).as("morton"))
      .distinct()
    val incoming = CuboidCodec.fromVoxels(rows.as[VoxelRow], vt, dims)
    val existingTouched = VersionedStore.readForKeys(spark, storeRoot, incKeys)
    val mode = if (toBlack) MergeMode.Shave else MergeMode.Overwrite
    val v = VersionedStore.commitDelta(
      CuboidMerge.mergeAll(existingTouched, incoming, vt, mode), storeRoot)
    // keep the persistent id index current (reads back the committed
    // delta directory, so the merge plan is not recomputed)
    if (maintainsIndex) commitIndexFor(v, full = false)
    // a committed base write makes any built hierarchy stale
    if (downsampleStatus == GraftDB.Downsampled)
      setDownsampleStatus(GraftDB.NotDownsampled)
    v
  }

  /** `SpatialDB.get_ids_in_region` (`spatialdb.py:924`), index-first like
    * the reference (`object.py:778-831`): interior cuboids answer from
    * the persistent index with no voxel IO; only boundary slabs decode.
    * Falls back to the direct cutout when no index exists (stores written
    * before index maintenance).
    */
  def getIdsInRegion(
      corner: (Long, Long, Long),
      extent: (Long, Long, Long),
      res: Int = 0,
      tRange: Range = 0 until 1): DataFrame = {
    require(resource.channel.channelType == ChannelType.Annotation)
    val b = box(corner, extent)
    if (IndexStore.exists(indexPath))
      SpatialOps.idsInRegionFromStore(
        VersionedStore.read(spark, storeRoot), flatIndex(res), lk, res, b, tRange, vt, dims)
    else
      SpatialOps.idsInRegion(cutout(corner, extent, res, tRange), b, tRange)
  }

  /** `SpatialDB.resource_locked` (`spatialdb.py:741-746`,
    * `state.py:157-185`): the channel-level circuit breaker an operator
    * throws after excessive write errors. Writes refuse while it is set
    * (every commit checks it — [[writeCuboid]] and [[buildHierarchy]]
    * both fail with "write-locked"); reads never block.
    */
  def resourceLocked: Boolean = VersionedStore.isLocked(storeRoot)

  /** Set/clear the write lock (`RedisKVIO.set_cache_lock` analog). */
  def setResourceLock(locked: Boolean): Unit =
    VersionedStore.setLock(storeRoot, locked)

  /** Id egress helper: the reference stringifies uint64 ids in JSON
    * results to survive HTTP/JS (`object.py:828-831`).
    */
  def stringifyIds(ids: DataFrame): DataFrame =
    ids.select(col("id").cast("string").as("id"))

  /** The channel's flat id index at `res`: the materialized
    * [[IndexStore]] when one exists, else derived on the fly from a full
    * decode — the pre-index behavior, kept only as the legacy fallback
    * (annotation writes maintain the index, so a store written through
    * this façade always has one).
    */
  private def flatIndex(res: Int): DataFrame = {
    val base =
      // readCurrent, not read: masks in any store versions committed but
      // not yet indexed (the data-commit/index-commit crash window), so
      // index-first reads never see a stale index
      if (IndexStore.exists(indexPath))
        IndexStore.readCurrent(spark, indexPath, storeRoot, vt)
      else {
        val (ex, ey, ez) = resource.extentAt(res)
        val nt = math.max(1, resource.experiment.numTimeSamples)
        SpatialOps.buildFlatIndex(
          SpatialOps.cutoutFromCuboids(
            VersionedStore.read(spark, storeRoot), lk, res,
            Box(0, ex, 0, ey, 0, ez), 0 until nt, vt, dims), dims)
      }
    base.where(col("lookupKey") === lk && col("res") === res)
  }

  /** `SpatialDB.get_bounding_box` (`spatialdb.py:869`), loose-BEFORE-tight
    * like the reference (`object_indices.py:434-470`): the loose box
    * comes from the persistent id index (no voxel IO), and the tight box
    * decodes ONLY the loose box's cuboids and the id's time span — never
    * the whole channel. The O(1)-row loose collect is the same
    * index-lookup-then-bounded-cutout plan the reference runs; at 100 TB
    * the tight path's IO is the id's own footprint, not the store's.
    */
  def getBoundingBox(id: Long, res: Int = 0, tight: Boolean = true): DataFrame = {
    val loose = SpatialOps.boundingBoxLooseFlat(flatIndex(res), id, dims)
    if (!tight) loose.drop("t_min", "t_max")
    else loose.collect().headOption match {
      case None =>
        // absent id: empty result with the tight schema
        import spark.implicits._
        SpatialOps.boundingBoxTight(spark.emptyDataset[VoxelRow].toDF(), id)
      case Some(r) =>
        val looseBox = Box(
          r.getAs[Long]("x_min"), r.getAs[Long]("x_max"),
          r.getAs[Long]("y_min"), r.getAs[Long]("y_max"),
          r.getAs[Long]("z_min"), r.getAs[Long]("z_max"))
        // `until`, not `to`: cutout treats Range.end as exclusive
        val tr = r.getAs[Int]("t_min") until (r.getAs[Int]("t_max") + 1)
        SpatialOps.boundingBoxTight(
          SpatialOps.cutoutFromCuboids(
            VersionedStore.read(spark, storeRoot), lk, res, looseBox, tr, vt, dims), id)
    }
  }

  /** Maintenance job: collapse both delta chains (cuboids + index) into
    * fresh full snapshots — the table-format compaction analog. Readers
    * never require it; run it when write-heavy channels accumulate deep
    * chains. Returns the compacted store version.
    */
  def compact(): Int = {
    val pre = VersionedStore.currentVersion(storeRoot)
    val v = VersionedStore.compact(spark, storeRoot)
    if (maintainsIndex && IndexStore.exists(indexPath)) {
      // compacts the repaired view and stamps coverage at the compacted
      // store version (compaction is content-preserving)
      IndexStore.compact(spark, indexPath, storeRoot, vt, pre, v)
      ()
    }
    // compaction is content-preserving: if the hierarchy was current at
    // the pre-compact version, it is equally current at the compacted
    // one — carry the marker forward so the next propagate stays a no-op
    // instead of falling back to a full rebuild.
    hierarchyMarker match {
      case Some((h, l)) if pre.contains(h) => setHierarchyMarker(v, l)
      case _ => ()
    }
    v
  }

  /** `AWSObjectStore.reserve_ids` (`object_indices.py:667-728`). */
  def reserveIds(numIds: Long, res: Int = 0): (Long, Long) =
    IdReservation.reserve(s"$storeRoot/_ids", lk, res, numIds)

  /** Downsample/propagation status of the channel's hierarchy — the
    * reference's state machine (`ndtype.py:43-45` NOT_PROPAGATED /
    * UNDER_PROPAGATION / PROPAGATED; `resource.py:243-256`
    * `Channel.downsample_status` carries the string form): without it a
    * reader cannot tell whether level-k data reflects the current base.
    * Persisted next to the snapshot pointer so the status survives
    * sessions and is visible to every reader of the store.
    */
  def downsampleStatus: String =
    readControl("_DOWNSAMPLE_STATUS").getOrElse(GraftDB.NotDownsampled)

  private def setDownsampleStatus(s: String): Unit =
    atomicWrite("_DOWNSAMPLE_STATUS", s)

  /** Control-file replace/read through [[graft.storage.CommitProtocol]]'s
    * `publish`/`readSmall` — the same primitives the `_CURRENT` pointer
    * uses, so a concurrent reader can never observe an empty/torn control
    * file AND the façade's whole control plane (status, hierarchy marker,
    * snapshot pointers, locks, id counters) runs on one storage contract:
    * atomic rename locally, put-if-absent generation chains on a
    * rename-less object store (GraftDBSpec runs the façade battery over
    * both). Logical races between a base writer and the downsample worker
    * remain governed by the single-downsample-worker deployment contract
    * documented in buildHierarchy.
    */
  private def atomicWrite(name: String, content: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(storeRoot))
    VersionedStore.protocol.publish(
      java.nio.file.Paths.get(storeRoot, name), content.getBytes("UTF-8"))
  }

  private def readControl(name: String): Option[String] =
    // stamp-memoized ([[graft.storage.ControlCache]]): status/marker
    // polls at high QPS cost a stat while unchanged, not a readSmall
    graft.storage.ControlCache.readSmall(
      VersionedStore.protocol, java.nio.file.Paths.get(storeRoot, name))
      .map(new String(_, "UTF-8").trim)

  /** `(base store version the current hierarchy reflects, levels built)`,
    * recorded by [[buildHierarchy]]/[[propagate]] so [[propagate]] can
    * tell exactly which committed versions the pyramid has not seen yet.
    */
  def hierarchyMarker: Option[(Int, Int)] =
    readControl("_HIERARCHY_V").flatMap { s =>
      try {
        val parts = s.split("\\s+")
        Some((parts(0).toInt, parts(1).toInt))
      } catch {
        // a corrupt marker must degrade to the full-rebuild path, never
        // wedge the channel
        case _: RuntimeException => None
      }
    }

  private def setHierarchyMarker(v: Int, levels: Int): Unit =
    atomicWrite("_HIERARCHY_V", s"$v $levels")

  /** The hierarchy job: build and commit all levels of the current
    * snapshot's base-resolution data (A5/A6 per level). Walks the
    * downsample-status machine: IN_PROGRESS while building, DOWNSAMPLED
    * once the snapshot with all levels is committed, back to
    * NOT_DOWNSAMPLED on failure.
    */
  def buildHierarchy(numLevels: Int = 0): Int = {
    import spark.implicits._
    setDownsampleStatus(GraftDB.InProgress)
    // EVERYTHING after the IN_PROGRESS write is inside the try: a plan
    // construction failure must not leave the status stuck at
    // IN_PROGRESS (nothing else ever resets it)
    try {
      // base version the pyramid derives from — rechecked after the
      // commit to catch a concurrent base write racing this build
      val baseV = VersionedStore.currentVersion(storeRoot)
      val levels = if (numLevels > 0) numLevels else resource.experiment.numHierarchyLevels
      val base = CuboidCodec.toVoxels(
        VersionedStore.read(spark, storeRoot)
          .where(col("res") === 0).as[graft.storage.CuboidRow],
        vt, dims).toDF()
      val pyramid = SpatialOps.buildPyramid(
        base, levels,
        annotation = resource.channel.channelType == ChannelType.Annotation,
        isoLevel = resource.isotropicLevel)
      val allLevels = pyramid.map { case (_, v) =>
        CuboidCodec.fromVoxels(v.as[VoxelRow], vt, dims)
      }.reduce(_ union _)
      val preCommit = VersionedStore.currentVersion(storeRoot)
      val v = VersionedStore.commit(allLevels, storeRoot)
      // the full snapshot re-derived every level — rebuild the index to
      // match (full, not delta: derived levels replace wholesale)
      if (maintainsIndex) commitIndexFor(v, full = true)
      // the committed snapshot IS the base state the pyramid reflects;
      // [[propagate]] treats versions after this as dirty
      setHierarchyMarker(v, levels)
      // if another session advanced the base while we built, the pyramid
      // we just committed is already stale — advertise that, don't lie.
      // (A commit landing in the tiny window between the re-check and
      // our commit still slips through; single downsample worker per
      // channel is the deployment contract, as in the reference.)
      setDownsampleStatus(
        if (preCommit == baseV) GraftDB.Downsampled else GraftDB.NotDownsampled)
      v
    } catch {
      case e: Throwable => setDownsampleStatus(GraftDB.NotDownsampled); throw e
    }
  }

  /** Incremental hierarchy maintenance: recompute ONLY the derived-level
    * cuboids whose base data changed since the last build, and commit
    * them as one delta. [[buildHierarchy]] costs O(store) — fine for the
    * first build, a scale-killer as the per-write refresh at 100 TB,
    * where one small write would force a full-channel rebuild. Each
    * level-k cuboid depends on exactly its 4 (or 8, once z scales)
    * level-(k-1) children, so the dirty set grows by at most the write's
    * own footprint per level and the whole job costs O(write × levels):
    * chain-read the dirty cuboids ([[VersionedStore.readForKeys]]),
    * re-downsample them together with their clean siblings, zero-fill
    * parents whose recompute came back empty (an erase must mask the
    * stale cuboid), commit one delta, advance the `_HIERARCHY_V` marker.
    *
    * Falls back to [[buildHierarchy]] when incremental maintenance is
    * not well-defined: no hierarchy yet, a non-delta version in the
    * unseen range (someone rebuilt or compacted underneath a stale
    * marker), or a direct write at a derived level (the reference's
    * base+1 aniso quirk). Returns the committed (or current) version.
    */
  def propagate(): Int = {
    import spark.implicits._
    val cur = VersionedStore.currentVersion(storeRoot).getOrElse(
      throw new IllegalStateException("propagate: nothing committed"))
    hierarchyMarker match {
      case None => buildHierarchy()
      case Some((h, _)) if h >= cur => cur // hierarchy already current
      case Some((h, levels)) =>
        // versions the pyramid has not seen; our own propagate commits
        // carry a _PROPAGATE marker and contain no base changes
        val unseen = ((h + 1) to cur).filterNot(isPropagateVersion)
        if (unseen.isEmpty) {
          setHierarchyMarker(cur, levels)
          setDownsampleStatus(GraftDB.Downsampled)
          cur
        } else if (!unseen.forall(VersionedStore.isDelta(storeRoot, _)))
          buildHierarchy(levels)
        else {
          // persisted across BOTH consumers — the derived-level probe and
          // the incremental pass's dirty-set projection — so each unseen
          // version directory is listed and read once, not once per use;
          // the union is O(unseen writes) by the all-deltas guard above,
          // so the cache is bounded by the dirty footprint
          val writes = unseen
            .map(v => CuboidStore.read(spark, s"$storeRoot/v$v").toDF())
            .reduce(_ union _)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            if (writes.where(col("res") =!= 0).limit(1).count() > 0)
              buildHierarchy(levels) // derived-level direct write: rebuild
            else propagateIncremental(writes, cur, levels)
          } finally { writes.unpersist(); () }
        }
    }
  }

  private def isPropagateVersion(v: Int): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(storeRoot, s"v$v", "_PROPAGATE"))

  private def propagateIncremental(writes: DataFrame, baseV: Int, levels: Int): Int = {
    import spark.implicits._
    import graft.core.Morton
    import graft.storage.CuboidRow
    setDownsampleStatus(GraftDB.InProgress)
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      val annotation = resource.channel.channelType == ChannelType.Annotation
      val iso = resource.isotropicLevel
      val keyOf = (coords: DataFrame, res: Int) =>
        coords.select(
          lit(lk).as("lookupKey"), lit(res).as("res"), col("t"),
          Morton.morton_encode(col("cx"), col("cy"), col("cz")).as("morton"))
      // dirty cuboid-grid coords at the base level
      var dirty = writes.where(col("res") === 0)
        .select(col("t"),
          Morton.morton_x(col("morton")).as("cx"),
          Morton.morton_y(col("morton")).as("cy"),
          Morton.morton_z(col("morton")).as("cz"))
        .distinct()
      // current content of the dirty cuboids (chain-resolved, O(write))
      var dirtyVoxels = CuboidCodec.toVoxels(
        VersionedStore.readForKeys(spark, storeRoot, keyOf(dirty, 0)), vt, dims).toDF()
      var acc: org.apache.spark.sql.Dataset[CuboidRow] = null
      for (res <- 1 until levels) {
        // same level geometry as buildPyramid: x/y halve every level; z
        // halves only for annotation channels past the isotropic level
        val scaleZ = annotation && res > iso
        val parents = dirty.select(col("t"),
          shiftright(col("cx"), 1).as("cx"),
          shiftright(col("cy"), 1).as("cy"),
          (if (scaleZ) shiftright(col("cz"), 1) else col("cz")).as("cz"))
          .distinct()
        // every child of a dirty parent: dirty ones carry this pass's
        // recomputed content, clean siblings come from the store
        val zOffs = if (scaleZ) Seq(0, 1) else Seq(0)
        val offsets = array((for { ox <- 0 to 1; oy <- 0 to 1; oz <- zOffs }
          yield struct(lit(ox).as("ox"), lit(oy).as("oy"), lit(oz).as("oz"))): _*)
        val children = parents
          .select(col("t"), col("cx"), col("cy"), col("cz"), explode(offsets).as("o"))
          .select(col("t"),
            (col("cx") * 2 + col("o.ox")).as("cx"),
            (col("cy") * 2 + col("o.oy")).as("cy"),
            (if (scaleZ) col("cz") * 2 + col("o.oz") else col("cz")).as("cz"))
        val cleanKeys = children.join(dirty, Seq("t", "cx", "cy", "cz"), "left_anti")
        val input = dirtyVoxels.unionByName(CuboidCodec.toVoxels(
          VersionedStore.readForKeys(spark, storeRoot, keyOf(cleanKeys, res - 1)),
          vt, dims).toDF())
        val level = (if (annotation) SpatialOps.downsampleAnnotation(input, scaleZ)
                     else SpatialOps.zoomOut(input, 1))
          .withColumn("res", col("res") + 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persisted += level
        val produced = CuboidCodec.fromVoxels(level.as[VoxelRow], vt, dims)
        // a dirty parent whose recompute has no voxels left (an erase)
        // must still mask its stale blob: emit an explicit zero cuboid
        val producedKeys = level.select(col("t"),
          expr(s"x div ${dims.x}").as("cx"),
          expr(s"y div ${dims.y}").as("cy"),
          expr(s"z div ${dims.z}").as("cz")).distinct()
        val blobSize = (dims.x * dims.y * dims.z).toInt * vt.byteWidth
        val lkLocal = lk
        val resLocal = res
        val zeroed = parents.join(producedKeys, Seq("t", "cx", "cy", "cz"), "left_anti")
          .select(col("t").cast("int"), col("cx"), col("cy"), col("cz"))
          .as[(Int, Long, Long, Long)]
          .map { case (t, cx, cy, cz) =>
            CuboidRow(lkLocal, resLocal, t, Morton.encode(cx, cy, cz),
              new Array[Byte](blobSize))
          }
        val levelCuboids = produced.union(zeroed)
        acc = if (acc == null) levelCuboids else acc.union(levelCuboids)
        dirty = parents
        dirtyVoxels = level
      }
      val v =
        if (acc == null) baseV // levels == 1: nothing derived to maintain
        else {
          val committed = VersionedStore.commitDelta(acc, storeRoot)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(storeRoot, s"v$committed", "_PROPAGATE"),
            Array.emptyByteArray)
          if (maintainsIndex) commitIndexFor(committed, full = false)
          committed
        }
      // marker = the base version whose writes we just folded in; our own
      // commit is _PROPAGATE-marked so the next propagate skips it
      setHierarchyMarker(baseV, levels)
      // our delta took the slot right after baseV iff no write raced the
      // commit; an interleaved base write means the pyramid is stale again
      setDownsampleStatus(
        if (v == baseV || v == baseV + 1) GraftDB.Downsampled
        else GraftDB.NotDownsampled)
      v
    } catch {
      case e: Throwable => setDownsampleStatus(GraftDB.NotDownsampled); throw e
    } finally persisted.foreach(_.unpersist())
  }
}

object GraftDB {
  /** `Channel.downsample_status` values (`resource_setup.py:44`,
    * `test_basicresource.py:168`; numeric twins in `ndtype.py:43-45`).
    */
  val NotDownsampled = "NOT_DOWNSAMPLED"
  val InProgress = "IN_PROGRESS"
  val Downsampled = "DOWNSAMPLED"
}
