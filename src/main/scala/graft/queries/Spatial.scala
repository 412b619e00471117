package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftDB
import graft.core.{Morton, Region, Resource, VoxelType}
import graft.engine.SpatialOps
import graft.storage.{CuboidCodec, VersionedStore, VoxelRow}

/** Oracle-checked queries for the spatial/volumetric operator surface
  * (SURVEY §2.2-§2.10): every operator runs over the deterministic
  * [[VoxelView]] derived from lineitem, so DuckDB can compute the exact
  * same result relationally. All arithmetic is integer-only — hash-exact
  * across engines.
  */
object Spatial {
  import Region.{Box, CuboidDims}

  private val LK = VoxelView.LK
  private val dims = CuboidDims(16, 16, 4)

  private def vox(s: SparkSession, dir: String): DataFrame = VoxelView.engineDf(s, dir)
  private def vox2(s: SparkSession, dir: String): DataFrame = VoxelView.engineDf2(s, dir)

  private val V = s"v AS (${VoxelView.sql})"
  private val V2 = s"w AS (${VoxelView.sql2})"

  /** Morton SQL over cuboid-grid coordinates (divide-by-dims inlined). */
  private def cuboidMortonSql(dims: CuboidDims): String =
    Morton.encodeSql(s"(x // ${dims.x})", s"(y // ${dims.y})", s"(z // ${dims.z})")

  private def out(df: DataFrame): DataFrame = df // readability marker

  /** A populated [[GraftDB]] façade over the deduped voxel view (one
    * `writeCuboid` commit, which also materializes the id index) — built
    * once per testdata dir and shared by the façade-path queries
    * (q82/q83), so the store-build cost is not paid per query.
    */
  /** q57's deterministic event files, built once per testdata dir (the
    * ingest itself stays per-pass — it is the operator under test). */
  private val q57EventsCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val facadeCache = new java.util.concurrent.ConcurrentHashMap[String, GraftDB]()
  private def facadeDb(s: SparkSession, dir: String): GraftDB =
    facadeCache.computeIfAbsent(dir, _ => {
      val fixture = Resource.fixture(VoxelType.UInt64)
      val res = fixture.copy(experiment = fixture.experiment.copy(numTimeSamples = 2))
      val db = new GraftDB(
        s, res, java.nio.file.Files.createTempDirectory("graft-facade").toString, dims)
      // dense blob cells hold one value: dedup coordinates first (max id
      // wins, same rule as the q50 store round-trip)
      val deduped = VoxelView.df(s, dir)
        .groupBy(col("t"), col("x"), col("y"), col("z"))
        .agg(max(col("id")).as("value"))
        .select(col("t"), col("x"), col("y"), col("z"), col("value"))
      db.writeCuboid(deduped)
      db
    })

  /** q91 fixture: a façade store whose LAST data commit is deliberately
    * ORPHANED — the t=1 slice is committed straight to the
    * [[VersionedStore]], bypassing index maintenance, exactly the state a
    * writer that died between its data commit and its index commit leaves
    * behind. Separate from [[facadeCache]], whose store must stay fully
    * indexed for q82/q83.
    */
  private val repairCache = new java.util.concurrent.ConcurrentHashMap[String, GraftDB]()
  private def repairDb(s: SparkSession, dir: String): GraftDB =
    repairCache.computeIfAbsent(dir, _ => {
      import s.implicits._
      val fixture = Resource.fixture(VoxelType.UInt64)
      val res = fixture.copy(experiment = fixture.experiment.copy(numTimeSamples = 2))
      val db = new GraftDB(
        s, res, java.nio.file.Files.createTempDirectory("graft-repair").toString, dims)
      val deduped = VoxelView.df(s, dir)
        .groupBy(col("t"), col("x"), col("y"), col("z"))
        .agg(max(col("id")).as("value"))
      db.writeCuboid(deduped.where(col("t") === 0)
        .select(col("t"), col("x"), col("y"), col("z"), col("value")))
      val orphan = CuboidCodec.fromVoxels(
        deduped.where(col("t") === 1)
          .select(lit(VoxelView.LK).as("lookupKey"), lit(0).as("res"),
            col("t").cast("int").as("t"), col("x"), col("y"), col("z"), col("value"))
          .as[VoxelRow],
        VoxelType.UInt64, dims)
      VersionedStore.commitDelta(orphan, db.storeRoot)
      db
    })

  /** q97 fixture: the deduped t=0 volume committed to a normal store,
    * exported once as a precomputed layer, and wrapped in a
    * storage_type="precomputed" channel façade (the reference's cloudvol
    * switch, `resource.py:273-280`). Cached per testdata dir like
    * [[facadeDb]] so the export cost is not paid per pass.
    */
  private val precomputedCache = new java.util.concurrent.ConcurrentHashMap[String, GraftDB]()
  private def precomputedDb(s: SparkSession, dir: String): GraftDB =
    precomputedCache.computeIfAbsent(dir, _ => {
      val fixture = Resource.fixture(VoxelType.UInt64)
      val db = new GraftDB(
        s, fixture, java.nio.file.Files.createTempDirectory("graft-cvsrc").toString, dims)
      val deduped = VoxelView.df(s, dir)
        .where(col("t") === 0)
        .groupBy(col("t"), col("x"), col("y"), col("z"))
        .agg(max(col("id")).as("value"))
        .select(col("t"), col("x"), col("y"), col("z"), col("value"))
      db.writeCuboid(deduped)
      val cvRoot = java.nio.file.Files.createTempDirectory("graft-cvlayer").toString
      db.exportPrecomputed(cvRoot)
      val cvRes = fixture.copy(channel =
        fixture.channel.copy(storageType = "precomputed", cvPath = cvRoot))
      new GraftDB(s, cvRes,
        java.nio.file.Files.createTempDirectory("graft-cvempty").toString, dims)
    })

  val defs: Map[String, QueryDef] = Map(

    // Data/index crash-window repair through the façade: the store's last
    // commit is orphaned (data committed, index commit never ran — see
    // repairDb), yet ids-in-region over BOTH time slices must still be
    // exact: IndexStore.readCurrent detects index-behind-store via the
    // _STORE_V stamp and masks the orphaned version's rows in on the fly.
    // Oracle = distinct surviving ids of the full deduped volume.
    "q91_facade_index_repair" -> QueryDef(
      (s, dir) =>
        out(repairDb(s, dir).getIdsInRegion((0, 0, 0), (64, 256, 16), 0, 0 until 2)
          .orderBy(col("id"))),
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS id FROM v GROUP BY 1, 2, 3, 4)
              |SELECT DISTINCT id FROM g WHERE id <> 0
              |ORDER BY id""".stripMargin.replace("\n", " "))),

    // Compaction is content-preserving, oracle-checked end to end: two
    // delta commits build a chain, compact() collapses BOTH planes (data
    // + id index, chain resolution inside the commit lock), and the
    // index-first ids-in-region over the COMPACTED store must still
    // equal the relational oracle. Fresh store per call (compaction
    // mutates); exercises IndexStore.compact + the post-compact read.
    "q94_facade_compact" -> QueryDef(
      (s, dir) => {
        val fixture = Resource.fixture(VoxelType.UInt64)
        val res = fixture.copy(experiment = fixture.experiment.copy(numTimeSamples = 2))
        val db = new GraftDB(
          s, res, java.nio.file.Files.createTempDirectory("graft-compactq").toString, dims)
        // NOT checkpointed: an r16 A/B measured the eager materialization
        // of the deduped frame COSTLIER than letting each writeCuboid
        // re-run the narrow groupBy under its own plan (3.25 -> 3.68 s)
        val deduped = VoxelView.df(s, dir)
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(col("id")).as("value"))
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
        db.writeCuboid(deduped.where(col("t") === 0))
        db.writeCuboid(deduped.where(col("t") === 1)) // chain depth 2 + index deltas
        db.compact()
        out(db.getIdsInRegion((0, 0, 0), (64, 256, 16), 0, 0 until 2)
          .orderBy(col("id")))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS id FROM v GROUP BY 1, 2, 3, 4)
              |SELECT DISTINCT id FROM g WHERE id <> 0
              |ORDER BY id""".stripMargin.replace("\n", " "))),

    // S13 alternate backend (`resource.py:247-280`): the deduped t=0
    // volume is exported as a neuroglancer-precomputed-style layer
    // (info + raw edge-clipped chunk objects), then read back through a
    // storage_type="precomputed" channel's cutout — the same pruned-scan
    // contract as q50, via a byte-layout second source. Oracle = the
    // relational replay of the box, t=0 only (the layout is 3-D).
    "q97_precomputed_cutout" -> QueryDef(
      (s, dir) => {
        val db = precomputedDb(s, dir)
        out(db.cutout((8, 32, 2), (32, 128, 8))
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value")))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS value FROM v GROUP BY 1, 2, 3, 4)
              |SELECT t, x, y, z, value FROM g
              |WHERE x >= 8 AND x < 40 AND y >= 32 AND y < 160 AND z >= 2 AND z < 10
              |  AND t = 0 AND value <> 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // P1-P4/S1 cutout: box + time-range predicates over the voxel plane.
    "q11_cutout" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.cutout(vox(s, dir), Box(8, 40, 32, 160, 2, 10), 0 until 2)
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V SELECT t, x, y, z, id AS value FROM v
              |WHERE x >= 8 AND x < 40 AND y >= 32 AND y < 160 AND z >= 2 AND z < 10
              |  AND t >= 0 AND t < 2
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // P5/J3 filtered cutout: short id list (isin / codegen path).
    "q12_filter_ids" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.filterIds(vox(s, dir), Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L))
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V SELECT t, x, y, z,
              |CASE WHEN id IN (1,2,3,5,8,13,21,34) THEN id ELSE 0 END AS value
              |FROM v ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // P5 large-list path: >64 ids flips to the broadcast-join branch.
    "q13_filter_ids_large" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.filterIds(vox(s, dir), (1L to 40L) ++ (100L to 130L))
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V SELECT t, x, y, z,
              |CASE WHEN id BETWEEN 1 AND 40 OR id BETWEEN 100 AND 130 THEN id ELSE 0 END AS value
              |FROM v ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // A1/A2 unique ids in region.
    "q14_ids_in_region" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.idsInRegion(vox(s, dir), Box(0, 48, 0, 192, 0, 12), 0 until 2)
          .orderBy(col("id"))),
      Some(s"""WITH $V SELECT DISTINCT id FROM v
              |WHERE x >= 0 AND x < 48 AND y >= 0 AND y < 192 AND z >= 0 AND z < 12
              |  AND t >= 0 AND t < 2 AND id <> 0
              |ORDER BY id""".stripMargin.replace("\n", " "))),

    // J5/A2 hybrid (indexed) ids-in-region — the 100 TB path: interior
    // cuboids answered from the cuboid_index id_sets alone (no voxel
    // scan), boundary slabs from a bounded voxel scan. Same relational
    // oracle as the direct path, so the index shortcut is proven exact.
    "q58_ids_in_region_indexed" -> QueryDef(
      (s, dir) => {
        val v = vox(s, dir)
        out(SpatialOps.idsInRegionIndexed(
          v, SpatialOps.buildCuboidIndex(v, dims), Box(0, 48, 0, 192, 0, 12), dims, 0 until 2)
          .orderBy(col("id")))
      },
      Some(s"""WITH $V SELECT DISTINCT id FROM v
              |WHERE x >= 0 AND x < 48 AND y >= 0 AND y < 192 AND z >= 0 AND z < 12
              |  AND t >= 0 AND t < 2 AND id <> 0
              |ORDER BY id""".stripMargin.replace("\n", " "))),

    // F6 slice render with the reference's 16→8-bit windowing (value>>8):
    // one XY plane as (u, v, pix) rows, ids scaled into uint16 range so
    // the window actually bites.
    "q59_render_slice" -> QueryDef(
      (s, dir) => {
        import graft.core.VoxelType
        import graft.engine.Render
        val v16 = vox(s, dir).where(col("t") === 0)
          .groupBy(col("lookupKey"), col("res"), col("t"),
            col("x"), col("y"), col("z"))
          .agg(max(col("value") * 1200).as("value"))
        out(Render.slice(v16, Render.XY, 5L, VoxelType.UInt16)
          .orderBy(col("u"), col("v"), col("pix")))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT x, y, max(id*1200) AS v16 FROM v
              |  WHERE t = 0 AND z = 5 GROUP BY 1, 2)
              |SELECT x AS u, y AS v, CAST(v16 // 256 AS BIGINT) AS pix
              |FROM g ORDER BY 1, 2, 3""".stripMargin.replace("\n", " "))),

    // A4 tight bounding box, all ids.
    "q15_bbox_tight" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.boundingBoxTightAll(vox(s, dir)).orderBy(col("id"))),
      Some(s"""WITH $V SELECT id, min(x) AS x_min, max(x) AS x_max,
              |min(y) AS y_min, max(y) AS y_max, min(z) AS z_min, max(z) AS z_max
              |FROM v WHERE id <> 0 GROUP BY id ORDER BY id""".stripMargin.replace("\n", " "))),

    // F1-F3 Morton encode/decode roundtrip (codegen'd Catalyst Expressions
    // vs an explicit bit-interleave oracle).
    "q16_morton_roundtrip" -> QueryDef(
      (s, dir) => {
        val m = Morton.morton_encode(col("x"), col("y"), col("z"))
        out(VoxelView.df(s, dir)
          .select(col("x"), col("y"), col("z"), m.as("m"),
            Morton.morton_x(m).as("dx"), Morton.morton_y(m).as("dy"), Morton.morton_z(m).as("dz"))
          .orderBy(col("x"), col("y"), col("z"), col("m")))
      },
      Some {
        val enc = Morton.encodeSql("x", "y", "z")
        val dx = Morton.decodeSql("m", 0)
        val dy = Morton.decodeSql("m", 1)
        val dz = Morton.decodeSql("m", 2)
        s"""WITH $V, e AS (SELECT x, y, z, $enc AS m FROM v)
           |SELECT x, y, z, m, $dx AS dx, $dy AS dy, $dz AS dz FROM e
           |ORDER BY x, y, z, m""".stripMargin.replace("\n", " ")
      }),

    // A5 annotation-vote downsample (typed Aggregator vs window oracle).
    "q17_downsample_vote" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.downsampleAnnotation(vox(s, dir))
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V, g AS (
              |  SELECT t, x // 2 AS x, y // 2 AS y, z, id,
              |         count(*) AS c, min((y % 2) * 2 + (x % 2)) AS p
              |  FROM v WHERE id <> 0 GROUP BY 1, 2, 3, 4, 5)
              |SELECT t, x, y, z, id AS value FROM (
              |  SELECT *, row_number() OVER (PARTITION BY t, x, y, z ORDER BY c DESC, p ASC, id ASC) AS rn
              |  FROM g) WHERE rn = 1
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // Hierarchy job: two chained vote-downsample levels (the reference's
    // anisotropic res-hierarchy build, `ndlib.py:430-445` applied per
    // level). The oracle composes the q17 vote emulation twice, so the
    // pyramid driver — not just one downsample step — is hash-checked.
    "q61_pyramid_level2" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.buildPyramid(vox(s, dir), 3, annotation = true)
          .collectFirst { case (2, df) => df }.get
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V, g1 AS (
              |  SELECT t, x // 2 AS x, y // 2 AS y, z, id,
              |         count(*) AS c, min((y % 2) * 2 + (x % 2)) AS p
              |  FROM v WHERE id <> 0 GROUP BY 1, 2, 3, 4, 5),
              |l1 AS (SELECT t, x, y, z, id FROM (
              |  SELECT *, row_number() OVER (PARTITION BY t, x, y, z ORDER BY c DESC, p ASC, id ASC) AS rn
              |  FROM g1) WHERE rn = 1),
              |g2 AS (
              |  SELECT t, x // 2 AS x, y // 2 AS y, z, id,
              |         count(*) AS c, min((y % 2) * 2 + (x % 2)) AS p
              |  FROM l1 GROUP BY 1, 2, 3, 4, 5)
              |SELECT t, x, y, z, id AS value FROM (
              |  SELECT *, row_number() OVER (PARTITION BY t, x, y, z ORDER BY c DESC, p ASC, id ASC) AS rn
              |  FROM g2) WHERE rn = 1
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // A6 image zoomOut: stride-2 point sampling.
    "q18_zoom_out" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.zoomOut(vox(s, dir), 1)
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V SELECT t, x // 2 AS x, y // 2 AS y, z, id AS value FROM v
              |WHERE x % 2 = 0 AND y % 2 = 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // A7 image zoomIn: nearest-neighbor 2x replication via generator.
    "q19_zoom_in" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.zoomIn(vox(s, dir), 1)
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V SELECT t, x * 2 + ox AS x, y * 2 + oy AS y, z, id AS value
              |FROM v CROSS JOIN (VALUES (0), (1)) AS o1(ox) CROSS JOIN (VALUES (0), (1)) AS o2(oy)
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // M1 overwriteDense merge rule over two voxel sets.
    "q20_overwrite_merge" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.overwriteMerge(vox(s, dir), vox2(s, dir))
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V, $V2 SELECT
              |coalesce(v.t, w.t) AS t, coalesce(v.x, w.x) AS x,
              |coalesce(v.y, w.y) AS y, coalesce(v.z, w.z) AS z,
              |CASE WHEN w.id IS NOT NULL AND w.id <> 0 THEN w.id ELSE coalesce(v.id, 0) END AS value
              |FROM v FULL OUTER JOIN w ON v.t = w.t AND v.x = w.x AND v.y = w.y AND v.z = w.z
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // M2 exceptionDense: fill-only merge.
    "q21_exception_merge" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.exceptionMerge(vox(s, dir), vox2(s, dir))
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V, $V2 SELECT
              |coalesce(v.t, w.t) AS t, coalesce(v.x, w.x) AS x,
              |coalesce(v.y, w.y) AS y, coalesce(v.z, w.z) AS z,
              |CASE WHEN (v.id IS NULL OR v.id = 0) AND w.id IS NOT NULL AND w.id <> 0
              |     THEN w.id ELSE coalesce(v.id, 0) END AS value
              |FROM v FULL OUTER JOIN w ON v.t = w.t AND v.x = w.x AND v.y = w.y AND v.z = w.z
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // M3/W8 shaveDense: erase under a non-zero mask.
    "q22_shave_merge" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.shaveMerge(vox(s, dir), vox2(s, dir))
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V, $V2 SELECT
              |coalesce(v.t, w.t) AS t, coalesce(v.x, w.x) AS x,
              |coalesce(v.y, w.y) AS y, coalesce(v.z, w.z) AS z,
              |CASE WHEN w.id IS NOT NULL AND w.id <> 0 THEN 0 ELSE coalesce(v.id, 0) END AS value
              |FROM v FULL OUTER JOIN w ON v.t = w.t AND v.x = w.x AND v.y = w.y AND v.z = w.z
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // M4 annotateEntityDense: relabel all non-zero to one entity id.
    "q23_annotate_entity" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.annotateEntity(vox(s, dir), 777L)
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V SELECT t, x, y, z,
              |CAST(CASE WHEN id <> 0 THEN 777 ELSE 0 END AS BIGINT) AS value
              |FROM v ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // M5 mergeCube: relabel oldid -> newid.
    "q24_relabel" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.relabel(vox(s, dir), 7L, 99L)
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))),
      Some(s"""WITH $V SELECT t, x, y, z,
              |CASE WHEN id = 7 THEN 99 ELSE id END AS value
              |FROM v ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // F5 recolor: palette[id % 217] for non-zero labels. The palette is a
    // deterministic formula so the oracle can inline it.
    "q25_recolor" -> QueryDef(
      (s, dir) => {
        val palette = Array.tabulate(217)(i => (i.toLong * 2654435761L) % 16777216L)
        out(SpatialOps.recolor(vox(s, dir), palette)
          .select(col("t"), col("x"), col("y"), col("z"), col("value"), col("rgb"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"), col("rgb")))
      },
      Some(s"""WITH $V SELECT t, x, y, z, id AS value,
              |CASE WHEN id <> 0 THEN ((id % 217) * 2654435761) % 16777216 ELSE 0 END AS rgb
              |FROM v ORDER BY t, x, y, z, value, rgb""".stripMargin.replace("\n", " "))),

    // A9 cuboid_index build (s3-index analog), exploded for value compare.
    "q26_cuboid_index" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.buildCuboidIndex(vox(s, dir), dims)
          .select(col("t"), col("morton"), explode(col("id_set")).as("id"))
          .orderBy(col("t"), col("morton"), col("id"))),
      Some(s"""WITH $V SELECT DISTINCT t, ${cuboidMortonSql(dims)} AS morton, id
              |FROM v WHERE id <> 0
              |ORDER BY t, morton, id""".stripMargin.replace("\n", " "))),

    // A9 inverse id_index build, exploded.
    "q27_id_index" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.buildIdIndex(vox(s, dir), dims)
          .select(col("id"), explode(col("mortons")).as("morton"))
          .orderBy(col("id"), col("morton"))),
      Some(s"""WITH $V SELECT DISTINCT id, ${cuboidMortonSql(dims)} AS morton
              |FROM v WHERE id <> 0
              |ORDER BY id, morton""".stripMargin.replace("\n", " "))),

    // S3/S6 existence probe over real cuboid keys: the covering grid of
    // a request box (extending past the occupied volume) semi/anti-
    // joined against the stored key set — the reference's
    // cuboids_exist() miss/hit split before any page-in.
    "q62_cuboids_exist" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.storage.{CuboidRow, VoxelRow}
        // the probe consumes only cuboid KEYS — deriving them as a
        // distinct projection (what the store's file listing gives for
        // free) instead of encoding blobs that would be thrown away
        val stored = vox(s, dir)
          .select(col("lookupKey"), col("res"), col("t").cast("int").as("t"),
            Morton.morton_encode(
              expr(s"x div ${dims.x}"), expr(s"y div ${dims.y}"),
              expr(s"z div ${dims.z}")).as("morton"))
          .distinct()
          .withColumn("data", lit(Array.emptyByteArray))
          .as[CuboidRow]
        val requested = SpatialOps
          .coveringMortonsDf(s, Box(0, 96, 0, 256, 0, 24), dims)
          .crossJoin(s.range(2).select(col("id").cast("int").as("t")))
          .select(lit(LK).as("lookupKey"), lit(0).as("res"), col("t"), col("morton"))
        val (hit, miss) = SpatialOps.cuboidsExist(requested, stored)
        hit.withColumn("present", lit(true))
          .union(miss.withColumn("present", lit(false)))
          .select(col("t").cast("long").as("t"), col("morton"), col("present"))
          .orderBy(col("t"), col("morton"))
      },
      Some(s"""WITH $V, stored AS (
              |  SELECT DISTINCT t, ${cuboidMortonSql(dims)} AS morton FROM v),
              |grid AS (
              |  SELECT CAST(tt.t AS BIGINT) AS t,
              |         ${Morton.encodeSql("gx.x", "gy.y", "gz.z")} AS morton
              |  FROM range(0, 6) gx(x), range(0, 16) gy(y), range(0, 6) gz(z),
              |       (VALUES (0), (1)) tt(t))
              |SELECT g.t, g.morton,
              |       EXISTS(SELECT 1 FROM stored s WHERE s.t = g.t AND s.morton = g.morton) AS present
              |FROM grid g ORDER BY t, morton""".stripMargin.replace("\n", " "))),

    // O2 cube sort (`spatialdb.py:139-185`): the time-sample assembly
    // contract — per cuboid morton, samples come back as ONE t-ascending
    // array (posexploded here so the oracle can state the ordering
    // relationally: sample_idx ≡ t-rank within the morton). n_bytes pins
    // each sample to a real dense blob (codec losslessness itself is
    // q50's subject).
    "q92_sort_cubes" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.storage.{CuboidCodec, VoxelRow}
        val deduped = VoxelView.df(s, dir)
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(col("id")).as("value"))
          .select(lit(LK).as("lookupKey"), lit(0).as("res"),
            col("t").cast("int").as("t"), col("x"), col("y"), col("z"), col("value"))
          .as[VoxelRow]
        out(SpatialOps.sortCubes(CuboidCodec.fromVoxels(deduped, VoxelType.UInt64, dims))
          .select(col("morton"), posexplode(col("samples")).as(Seq("sample_idx", "s")))
          .select(col("morton"), col("sample_idx"),
            col("s.t").cast("long").as("t"),
            length(col("s.data")).cast("long").as("n_bytes"))
          .orderBy(col("morton"), col("sample_idx")))
      },
      Some(s"""WITH $V, k AS (
              |  SELECT DISTINCT t, ${cuboidMortonSql(dims)} AS morton FROM v)
              |SELECT morton,
              |  CAST(row_number() OVER (PARTITION BY morton ORDER BY t) - 1 AS INT) AS sample_idx,
              |  t, CAST(${dims.x * dims.y * dims.z * 8} AS BIGINT) AS n_bytes
              |FROM k ORDER BY morton, sample_idx""".stripMargin.replace("\n", " "))),

    // M9 constant-volume constructor (`imagecube.py:44-69` ones()-style):
    // the distributed range→coordinate generator must cover the box
    // exactly once per (t,x,y,z) at the constant value — the oracle is
    // the cross product of ranges. (zeros() needs no constructor: the
    // sparse plane encodes all-zero as no rows.)
    "q98_volume_gen" -> QueryDef(
      (s, dir) =>
        out(graft.storage.VolumeGen.constant(s, LK, 0, Box(3, 20, 5, 21, 1, 7), 0 until 2, 9L)
          .toDF()
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"))),
      Some("""SELECT t, x, y, z, CAST(9 AS BIGINT) AS value
             |FROM range(0, 2) r1(t), range(3, 20) r2(x), range(5, 21) r3(y), range(1, 7) r4(z)
             |ORDER BY t, x, y, z""".stripMargin.replace("\n", " "))),

    // F8 catalog level math (`resource.py:21-118`): per-level extents,
    // voxel sizes and the isotropic switchover level for BOTH hierarchy
    // methods, over the reference suite's frame2048 fixture (4×4×35 nm
    // voxels). Driver-side by nature (catalog metadata); the oracle
    // recomputes every row from the same constants, including the
    // argmin-by-aspect-ratio isotropic level. Voxel sizes emitted as
    // integer nanometers (exact at these levels) to keep the compare
    // hash-exact.
    "q93_resource_levels" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val base = Resource.fixture(VoxelType.UInt64)
        val variants = Seq(
          "aniso" -> base,
          "iso" -> base.copy(experiment =
            base.experiment.copy(hierarchyMethod = graft.core.HierarchyMethod.Isotropic)))
        val rows = for {
          (method, r) <- variants
          res <- 0 until r.experiment.numHierarchyLevels
        } yield {
          val (ex, ey, ez) = r.extentAt(res)
          val (vx, vy, vz) = r.voxelDimsAt(res)
          (method, res, ex, ey, ez, vx.toLong, vy.toLong, vz.toLong, r.isotropicLevel)
        }
        out(rows.toDF("method", "res", "ex", "ey", "ez",
          "vx_nm", "vy_nm", "vz_nm", "iso_level")
          .orderBy(col("method"), col("res")))
      },
      Some("""WITH m(method, zscale) AS (VALUES ('aniso', 0), ('iso', 1)),
             |lv AS (SELECT CAST(res AS INT) AS res FROM range(0, 7) t(res)),
             |iso AS (SELECT CAST(res AS INT) AS lvl FROM range(0, 7) t(res)
             |        ORDER BY abs(4.0 * (1 << res) / 35.0 - 1.0) ASC, res ASC LIMIT 1)
             |SELECT m.method, lv.res,
             |  greatest(1, 2048 // (1 << lv.res)) AS ex,
             |  greatest(1, 2048 // (1 << lv.res)) AS ey,
             |  CAST(CASE WHEN m.zscale = 1 THEN greatest(1, 128 // (1 << lv.res)) ELSE 128 END AS BIGINT) AS ez,
             |  CAST(4 * (1 << lv.res) AS BIGINT) AS vx_nm,
             |  CAST(4 * (1 << lv.res) AS BIGINT) AS vy_nm,
             |  CAST(CASE WHEN m.zscale = 1 THEN 35 * (1 << lv.res) ELSE 35 END AS BIGINT) AS vz_nm,
             |  (SELECT lvl FROM iso) AS iso_level
             |FROM m, lv ORDER BY method, res""".stripMargin.replace("\n", " "))),

    // A9 id_index with overflow-chunk rows (the reference's 400 KB item
    // split; here the giant-row OOM guard). chunkSize 64 on a ≤256-
    // cuboid-per-id view forces real multi-chunk ids.
    "q60_id_index_chunked" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.buildIdIndexChunked(vox(s, dir), dims, chunkSize = 64)
          .select(col("id"), col("chunk_no"),
            size(col("mortons")).cast("long").as("n_mortons"),
            element_at(col("mortons"), 1).as("m_min"),
            element_at(col("mortons"), -1).as("m_max"))
          .orderBy(col("id"), col("chunk_no"))),
      Some(s"""WITH $V, m AS (
              |  SELECT DISTINCT id, ${cuboidMortonSql(dims)} AS morton FROM v WHERE id <> 0),
              |r AS (SELECT id, morton,
              |      row_number() OVER (PARTITION BY id ORDER BY morton) - 1 AS rk FROM m)
              |SELECT id, rk // 64 AS chunk_no, count(*) AS n_mortons,
              |       min(morton) AS m_min, max(morton) AS m_max
              |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    // S7 incremental index maintenance: the t=0 index merged with a
    // t=1 write delta must equal the full rebuild — the upsert path that
    // runs on every write at scale, checked against the same relational
    // oracle as q26.
    "q63_index_merge" -> QueryDef(
      (s, dir) => {
        val v = vox(s, dir)
        val merged = SpatialOps.mergeCuboidIndex(
          SpatialOps.buildCuboidIndex(v.where(col("t") === 0), dims),
          SpatialOps.buildCuboidIndex(v.where(col("t") === 1), dims))
        out(merged
          .select(col("t"), col("morton"), explode(col("id_set")).as("id"))
          .orderBy(col("t"), col("morton"), col("id")))
      },
      Some(s"""WITH $V SELECT DISTINCT t, ${cuboidMortonSql(dims)} AS morton, id
              |FROM v WHERE id <> 0
              |ORDER BY t, morton, id""".stripMargin.replace("\n", " "))),

    // A4 tight bbox through the FAÇADE (the migration surface, not the
    // query layer): GraftDB.getBoundingBox(tight) must answer loose from
    // the materialized id index first and decode only the loose box —
    // this query proves that full path (write → index commit → loose
    // lookup → bounded cutout → tight agg) against the same relational
    // oracle as q15 restricted to one id.
    "q82_facade_bbox_tight" -> QueryDef(
      (s, dir) =>
        out(facadeDb(s, dir).getBoundingBox(42L, tight = true)),
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS id FROM v GROUP BY 1, 2, 3, 4)
              |SELECT id, min(x) AS x_min, max(x) AS x_max,
              |       min(y) AS y_min, max(y) AS y_max,
              |       min(z) AS z_min, max(z) AS z_max
              |FROM g WHERE id = 42 GROUP BY id""".stripMargin.replace("\n", " "))),

    // A3 loose bbox through the façade: answered from the persistent
    // IndexStore committed by writeCuboid — no voxel IO at query time.
    "q83_facade_bbox_loose" -> QueryDef(
      (s, dir) =>
        out(facadeDb(s, dir).getBoundingBox(42L, tight = false)),
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS id FROM v GROUP BY 1, 2, 3, 4),
              |c AS (SELECT DISTINCT id, x // ${dims.x} AS cx, y // ${dims.y} AS cy, z // ${dims.z} AS cz
              |      FROM g WHERE id = 42)
              |SELECT id, min(cx) * ${dims.x} AS x_min, (max(cx) + 1) * ${dims.x} AS x_max,
              |       min(cy) * ${dims.y} AS y_min, (max(cy) + 1) * ${dims.y} AS y_max,
              |       min(cz) * ${dims.z} AS z_min, (max(cz) + 1) * ${dims.z} AS z_max
              |FROM c GROUP BY id""".stripMargin.replace("\n", " "))),

    // A3 loose bbox for every id, from the id_index (cuboid-granular).
    "q28_bbox_loose" -> QueryDef(
      (s, dir) =>
        out(SpatialOps.boundingBoxLooseAll(
          SpatialOps.buildIdIndex(vox(s, dir), dims), dims)
          .orderBy(col("id"))),
      Some(s"""WITH $V, c AS (
              |  SELECT DISTINCT id, x // ${dims.x} AS cx, y // ${dims.y} AS cy, z // ${dims.z} AS cz
              |  FROM v WHERE id <> 0)
              |SELECT id, min(cx) * ${dims.x} AS x_min, (max(cx) + 1) * ${dims.x} AS x_max,
              |       min(cy) * ${dims.y} AS y_min, (max(cy) + 1) * ${dims.y} AS y_max,
              |       min(cz) * ${dims.z} AS z_min, (max(cz) + 1) * ${dims.z} AS z_max
              |FROM c GROUP BY id ORDER BY id""".stripMargin.replace("\n", " "))),

    // S1/S2/§2.11 full storage path: voxels → dense blobs → Z-order-
    // clustered parquet store → pruned cutout back to voxels. The oracle
    // sees only the relational contract; the blob codec and store layout
    // must be lossless for the hash to match. (Coordinates are deduped
    // first: a dense blob cell holds one value.)
    "q50_store_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.storage.{CuboidCodec, CuboidStore, VoxelRow}
        import graft.core.VoxelType
        val deduped = VoxelView.df(s, dir)
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(col("id")).as("value"))
          .select(lit(LK).as("lookupKey"), lit(0).as("res"),
            col("t").cast("int").as("t"), col("x"), col("y"), col("z"), col("value"))
          .as[VoxelRow]
        val path = java.nio.file.Files.createTempDirectory("q50store").toString
        CuboidStore.write(CuboidCodec.fromVoxels(deduped, VoxelType.UInt64, dims), path)
        SpatialOps.cutoutFromStore(s, path, LK, 0, Box(8, 40, 32, 160, 2, 10),
          0 until 2, VoxelType.UInt64, dims)
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS value FROM v GROUP BY 1, 2, 3, 4)
              |SELECT t, x, y, z, value FROM g
              |WHERE x >= 8 AND x < 40 AND y >= 32 AND y < 160 AND z >= 2 AND z < 10
              |  AND t >= 0 AND t < 2 AND value <> 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // The uint8 image path through the same store machinery as q50: the
    // codec's 1-byte width (and its unsigned widening) is oracle-checked,
    // not just spec-covered — ids ≤ 51 fit uint8 so values are identical
    // to the uint64 derivation.
    "q65_store_u8" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.storage.{CuboidCodec, CuboidStore, VoxelRow}
        import graft.core.VoxelType
        val deduped = VoxelView.df(s, dir)
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(col("id")).as("value"))
          .select(lit(LK).as("lookupKey"), lit(0).as("res"),
            col("t").cast("int").as("t"), col("x"), col("y"), col("z"), col("value"))
          .as[VoxelRow]
        val path = java.nio.file.Files.createTempDirectory("q65store").toString
        CuboidStore.write(CuboidCodec.fromVoxels(deduped, VoxelType.UInt8, dims), path)
        SpatialOps.cutoutFromStore(s, path, LK, 0, Box(8, 40, 32, 160, 2, 10),
          0 until 2, VoxelType.UInt8, dims)
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS value FROM v GROUP BY 1, 2, 3, 4)
              |SELECT t, x, y, z, value FROM g
              |WHERE x >= 8 AND x < 40 AND y >= 32 AND y < 160 AND z >= 2 AND z < 10
              |  AND t >= 0 AND t < 2 AND value <> 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // F9 blosc serde, oracle-checked end to end: voxels → dense blobs →
    // blosc frames (the exact bytes a reference deployment stores,
    // `cube.py:127-140`, typesize = itemsize*8) → BloscIngest bulk-load →
    // pruned cutout. Same relational contract as q50, so any codec bit
    // error breaks the hash.
    "q78_blosc_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.sources.{BloscCodec, BloscIngest}
        import graft.storage.{CuboidCodec, VoxelRow}
        import graft.core.VoxelType
        val deduped = VoxelView.df(s, dir)
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(col("id")).as("value"))
          .select(lit(LK).as("lookupKey"), lit(0).as("res"),
            col("t").cast("int").as("t"), col("x"), col("y"), col("z"), col("value"))
          .as[VoxelRow]
        val blobs = CuboidCodec.fromVoxels(deduped, VoxelType.UInt64, dims)
          .map(c => (c.lookupKey, c.res, c.t, c.morton,
            BloscCodec.compress(c.data, typesize = 64))) // itemsize*8 quirk
          .toDF("lookupKey", "res", "t", "morton", "blob")
        SpatialOps.cutoutFromCuboids(
          BloscIngest.cuboidsFromBlosc(blobs, VoxelType.UInt64, dims),
          LK, 0, Box(8, 40, 32, 160, 2, 10), 0 until 2, VoxelType.UInt64, dims)
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS value FROM v GROUP BY 1, 2, 3, 4)
              |SELECT t, x, y, z, value FROM g
              |WHERE x >= 8 AND x < 40 AND y >= 32 AND y < 160 AND z >= 2 AND z < 10
              |  AND t >= 0 AND t < 2 AND value <> 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // The uint16 path (`imagecube.py:153`, `cube.py:442-451` treat uint16
    // as first-class) through the same store machinery: ids are scaled to
    // [1200, 51200] so every non-zero value EXCEEDS one byte — the
    // codec's 2-byte little-endian branch and its unsigned widening are
    // what the hash checks (q50 covers 8-byte, q65 1-byte).
    "q77_store_u16" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.storage.{CuboidCodec, CuboidStore, VoxelRow}
        import graft.core.VoxelType
        val deduped = VoxelView.df(s, dir)
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(col("id")).as("mid"))
          .select(lit(LK).as("lookupKey"), lit(0).as("res"),
            col("t").cast("int").as("t"), col("x"), col("y"), col("z"),
            when(col("mid") === 0, 0L).otherwise(col("mid") * 1000L + 200L).as("value"))
          .as[VoxelRow]
        val path = java.nio.file.Files.createTempDirectory("q77store").toString
        CuboidStore.write(CuboidCodec.fromVoxels(deduped, VoxelType.UInt16, dims), path)
        SpatialOps.cutoutFromStore(s, path, LK, 0, Box(8, 40, 32, 160, 2, 10),
          0 until 2, VoxelType.UInt16, dims)
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z,
              |         CASE WHEN max(id) = 0 THEN 0 ELSE max(id) * 1000 + 200 END AS value
              |  FROM v GROUP BY 1, 2, 3, 4)
              |SELECT t, x, y, z, value FROM g
              |WHERE x >= 8 AND x < 40 AND y >= 32 AND y < 160 AND z >= 2 AND z < 10
              |  AND t >= 0 AND t < 2 AND value <> 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // The uint32 path (legacy ndstore dtype, `ndlib.py:39-51`) through
    // the same store machinery: ids scaled so every non-zero value
    // EXCEEDS two bytes — the codec's 4-byte little-endian branch and
    // its unsigned widening are what the hash checks (q50 8-byte,
    // q65 1-byte, q77 2-byte).
    "q128_store_u32" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.storage.{CuboidCodec, CuboidStore, VoxelRow}
        import graft.core.VoxelType
        val deduped = VoxelView.df(s, dir)
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(col("id")).as("mid"))
          .select(lit(LK).as("lookupKey"), lit(0).as("res"),
            col("t").cast("int").as("t"), col("x"), col("y"), col("z"),
            when(col("mid") === 0, 0L).otherwise(col("mid") * 100000L + 70000L).as("value"))
          .as[VoxelRow]
        val path = java.nio.file.Files.createTempDirectory("q128store").toString
        CuboidStore.write(CuboidCodec.fromVoxels(deduped, VoxelType.UInt32, dims), path)
        SpatialOps.cutoutFromStore(s, path, LK, 0, Box(8, 40, 32, 160, 2, 10),
          0 until 2, VoxelType.UInt32, dims)
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z,
              |         CASE WHEN max(id) = 0 THEN 0 ELSE max(id) * 100000 + 70000 END AS value
              |  FROM v GROUP BY 1, 2, 3, 4)
              |SELECT t, x, y, z, value FROM g
              |WHERE x >= 8 AND x < 40 AND y >= 32 AND y < 160 AND z >= 2 AND z < 10
              |  AND t >= 0 AND t < 2 AND value <> 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // The float32 path (`ndlib.py:39-51`, `isotropicBuild.c:88`): blobs
    // hold IEEE-754 little-endian floats while the voxel plane stays
    // integral (exact for |v| < 2^24 — the VoxelType.Float32 contract),
    // so the identical relational oracle pins the float byte layout:
    // any bit slip in the float encode/decode shifts a value and breaks
    // the hash.
    "q129_store_f32" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.storage.{CuboidCodec, CuboidStore, VoxelRow}
        import graft.core.VoxelType
        val deduped = VoxelView.df(s, dir)
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(col("id")).as("mid"))
          .select(lit(LK).as("lookupKey"), lit(0).as("res"),
            col("t").cast("int").as("t"), col("x"), col("y"), col("z"),
            when(col("mid") === 0, 0L).otherwise(col("mid") * 1000L + 200L).as("value"))
          .as[VoxelRow]
        val path = java.nio.file.Files.createTempDirectory("q129store").toString
        CuboidStore.write(CuboidCodec.fromVoxels(deduped, VoxelType.Float32, dims), path)
        SpatialOps.cutoutFromStore(s, path, LK, 0, Box(8, 40, 32, 160, 2, 10),
          0 until 2, VoxelType.Float32, dims)
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z,
              |         CASE WHEN max(id) = 0 THEN 0 ELSE max(id) * 1000 + 200 END AS value
              |  FROM v GROUP BY 1, 2, 3, 4)
              |SELECT t, x, y, z, value FROM g
              |WHERE x >= 8 AND x < 40 AND y >= 32 AND y < 160 AND z >= 2 AND z < 10
              |  AND t >= 0 AND t < 2 AND value <> 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // W1-W3/S8-S11 streaming write path, oracle-checked end to end:
    // voxel write events land as files, Structured Streaming drains them
    // with AvailableNow in 1-file micro-batches (each a cuboid-plane
    // merge + atomic snapshot commit), and the final snapshot is decoded
    // back to voxels. Events are deduped voxels with non-zero-overwrite
    // merge, so the end state is batch-order independent and equals the
    // plain relational dedup the oracle computes.
    "q57_stream_ingest" -> QueryDef(
      (s0, dir) => {
        // micro-batch job sizing tracks the BATCH, not the cluster width
        // (the q121 rationale): each 1-file batch here is a few thousand
        // voxels, and its chain-read/merge/commit jobs at full batch
        // shuffle width are pure scheduler overhead
        val s = s0.newSession()
        s.conf.set("spark.sql.shuffle.partitions", "8")
        import graft.core.VoxelType
        import graft.storage.{CuboidCodec, VersionedStore}
        import graft.streaming.StreamingIngest
        // the EVENT FILES are a deterministic function of the testdata
        // dir — build them once (the jsonlFixture convention); the
        // INGEST itself (drain + merge + commits + final read) stays
        // per-pass, because that is the operator this row times
        val events = q57EventsCache.computeIfAbsent(dir, _ => {
          import s.implicits._
          val deduped = VoxelView.df(s, dir)
            .groupBy(col("t"), col("x"), col("y"), col("z"))
            .agg(max(col("id")).as("value"))
            .select(lit(LK).as("lookupKey"), lit(0).as("res"),
              col("t").cast("int").as("t"), col("x"), col("y"), col("z"), col("value"))
            .as[graft.storage.VoxelRow]
          val p = java.nio.file.Files.createTempDirectory("q57events").toString
          // range-split on x so each micro-batch touches a disjoint cuboid
          // band — each delta commit then writes ~1/3 of the cuboids
          deduped.repartitionByRange(3, col("x")).write.parquet(s"$p/events")
          p
        })
        val base = java.nio.file.Files.createTempDirectory("q57stream").toString
        StreamingIngest.runAvailableNow(s, s"$events/events", s"$base/store",
          s"$base/ckpt", VoxelType.UInt64, dims, maxFilesPerTrigger = Some(1))
        CuboidCodec.toVoxels(VersionedStore.read(s, s"$base/store"), VoxelType.UInt64, dims)
          .toDF()
          .select(col("t").cast("long").as("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))
      },
      Some(s"""WITH $V, g AS (
              |  SELECT t, x, y, z, max(id) AS value FROM v GROUP BY 1, 2, 3, 4)
              |SELECT t, x, y, z, value FROM g WHERE value <> 0
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // W7 missing-time zero-fill: materialize the full t-lattice for a
    // sub-box, absent samples as zeros (reference `spatialdb.py:187-199`).
    "q29_timeseries_fill" -> QueryDef(
      (s, dir) => {
        val present = SpatialOps.cutout(vox(s, dir), Box(0, 16, 0, 64, 0, 8), 0 until 4)
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
        val coords = present.select(col("x"), col("y"), col("z")).distinct()
        val lattice = coords.select(explode(sequence(lit(0L), lit(3L))).as("t"),
          col("x"), col("y"), col("z"))
        // max (not sum): DuckDB sum(BIGINT) widens to HUGEINT, breaking
        // schema parity; max keeps BIGINT on both sides.
        out(lattice.join(present, Seq("t", "x", "y", "z"), "left_outer")
          .groupBy(col("t"), col("x"), col("y"), col("z"))
          .agg(max(coalesce(col("value"), lit(0L))).as("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value")))
      },
      Some(s"""WITH $V, p AS (
              |  SELECT t, x, y, z, id AS value FROM v
              |  WHERE x >= 0 AND x < 16 AND y >= 0 AND y < 64 AND z >= 0 AND z < 8
              |    AND t >= 0 AND t < 4),
              |coords AS (SELECT DISTINCT x, y, z FROM p),
              |lattice AS (SELECT ts.t, x, y, z FROM coords CROSS JOIN (SELECT unnest(range(0, 4)) AS t) ts)
              |SELECT l.t AS t, l.x AS x, l.y AS y, l.z AS z, coalesce(max(p.value), 0) AS value
              |FROM lattice l LEFT JOIN p ON l.t = p.t AND l.x = p.x AND l.y = p.y AND l.z = p.z
              |GROUP BY l.t, l.x, l.y, l.z
              |ORDER BY 1, 2, 3, 4, 5""".stripMargin.replace("\n", " ")))
  )
}
