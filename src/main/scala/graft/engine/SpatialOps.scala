package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Morton, Region, VoxelType}
import graft.storage.{CuboidCodec, CuboidRow, CuboidStore, VoxelRow}

/** The engine façade: Spark-first restatements of the reference's
  * `SpatialDB` entry points (`spdb/spatialdb/spatialdb.py`). Every operator
  * is a declarative DataFrame transform — Catalyst handles pushdown,
  * pruning, and join strategy; nothing here collects large data to the
  * driver.
  */
object SpatialOps {
  import Region.{Box, CuboidDims}

  /** Integer division for non-negative coordinate columns (Spark's `/` is
    * double division). Exact for values well below 2^53 — coordinates are
    * bounded by 21 bits per axis.
    */
  private def idiv(c: Column, d: Long): Column = floor(c / d).cast("long")

  private def boxPredicate(b: Box): Column =
    col("x") >= b.x0 && col("x") < b.x1 &&
      col("y") >= b.y0 && col("y") < b.y1 &&
      col("z") >= b.z0 && col("z") < b.z1

  /** Arbitrary-region cutout over the voxel plane
    * (reference `spatialdb.py:360-715`, restated per SURVEY §3.1): the
    * 10-step fetch/assemble/trim dance collapses to one filtered scan —
    * coordinate predicates push into the parquet scan; missing cuboids
    * need no zero-fill because absent voxels simply produce no rows.
    */
  def cutout(voxels: DataFrame, box: Box, tRange: Range = 0 until 1): DataFrame =
    voxels.where(boxPredicate(box) && col("t") >= tRange.start && col("t") < tRange.end)

  /** Cutout from the cuboid store: prune to covering cuboids *before*
    * decoding blobs (the reference's index-first tactic, `spatialdb.py:
    * 451-475`), so the voxel explosion factor never touches data outside
    * the region. Pruning uses the morton range [min,max] of the covering
    * set — correct because Z-order is monotone per axis — plus an exact
    * `isin` when the covering set is small.
    */
  def cutoutFromStore(
      spark: SparkSession,
      path: String,
      lookupKey: String,
      res: Int,
      box: Box,
      tRange: Range = 0 until 1,
      vt: VoxelType = VoxelType.UInt64,
      dims: CuboidDims = CuboidDims()): DataFrame =
    cutoutFromCuboids(CuboidStore.read(spark, path), lookupKey, res, box, tRange, vt, dims)

  /** [[cutoutFromStore]] over an already-loaded cuboid set (e.g. a
    * [[graft.storage.VersionedStore]] snapshot).
    */
  def cutoutFromCuboids(
      cuboids: Dataset[CuboidRow],
      lookupKey: String,
      res: Int,
      box: Box,
      tRange: Range = 0 until 1,
      vt: VoxelType = VoxelType.UInt64,
      dims: CuboidDims = CuboidDims()): DataFrame = {
    val spark = cuboids.sparkSession
    import spark.implicits._
    if (box.isEmpty || tRange.isEmpty)
      return spark.emptyDataset[VoxelRow].toDF()
    var cubs = cuboids
      .where(col("lookupKey") === lookupKey && col("res") === res)
      .where(col("t") >= tRange.start && col("t") < tRange.end)
    if (Region.coveringCount(box, dims) <= 4096) {
      // small cover: exact literal set + min-max range both push into the
      // parquet scan (row-group pruning on the Z-ordered layout)
      val mortons = Region.coveringMortons(box, dims)
      cubs = cubs
        .where(col("morton") >= mortons.head && col("morton") <= mortons.last)
        .where(col("morton").isin(mortons: _*))
    } else {
      // huge cover: distributed morton-set semi-join; never materialize
      // the covering set on the driver
      cubs = cubs.join(
        coveringMortonsDf(spark, box, dims).hint("shuffle_hash"),
        Seq("morton"), "left_semi").as[CuboidRow]
    }
    cutout(CuboidCodec.toVoxels(cubs.as[CuboidRow], vt, dims).toDF(), box, tRange)
  }

  /** Write-merge rule M1 (`spdb/c_lib/c_version/overwriteDense.c:26`):
    * incoming non-zero voxels win; existing voxels survive where the
    * incoming write is zero/absent. Expressed as a full outer join on the
    * voxel key — on an ACID table this is a single MERGE INTO (SURVEY
    * §3.2); the reference's Redis write-buffer/page-out machinery (W2-W5)
    * disappears under atomic commits.
    */
  def overwriteMerge(existing: DataFrame, incoming: DataFrame): DataFrame =
    mergeWith(existing, incoming,
      (d, s) => when(s.isNotNull && s =!= 0, s).otherwise(coalesce(d, lit(0L))))

  /** M2 `exceptionDense.c:26`: fill-only — incoming writes only land on
    * zero/absent voxels.
    */
  def exceptionMerge(existing: DataFrame, incoming: DataFrame): DataFrame =
    mergeWith(existing, incoming,
      (d, s) => when((d.isNull || d === 0) && s.isNotNull && s =!= 0, s)
        .otherwise(coalesce(d, lit(0L))))

  /** M3 `shaveDense.c:26` / W8 cutout-to-black (`cube.py:264-291`): zero
    * voxels wherever the mask is non-zero.
    */
  def shaveMerge(existing: DataFrame, mask: DataFrame): DataFrame =
    mergeWith(existing, mask,
      (d, s) => when(s.isNotNull && s =!= 0, lit(0L)).otherwise(coalesce(d, lit(0L))))

  private def mergeWith(
      existing: DataFrame,
      incoming: DataFrame,
      rule: (Column, Column) => Column): DataFrame = {
    val keys = Seq("lookupKey", "res", "t", "x", "y", "z")
    val d = existing.withColumnRenamed("value", "dst")
    val s = incoming.withColumnRenamed("value", "src")
    d.join(s, keys, "full_outer")
      .select(
        keys.map(col) :+ rule(col("dst"), col("src")).cast("long").as("value"): _*)
  }

  /** P5 filtered cutout (`filterCutoutOMP.c:22`): zero every voxel whose
    * label is not in the filter set. Short lists stay as an `isin`
    * predicate (codegen'd); large lists become a broadcast left-semi join.
    */
  def filterIds(voxels: DataFrame, ids: Seq[Long]): DataFrame =
    if (ids.size <= 64)
      voxels.withColumn("value",
        when(col("value").isin(ids: _*), col("value")).otherwise(0L))
    else {
      val spark = voxels.sparkSession
      import spark.implicits._
      // distinct: a repeated filter id must not duplicate matching voxels
      val idDf = broadcast(ids.distinct.toDF("fid"))
      voxels.join(idDf, voxels("value") === idDf("fid"), "left_outer")
        .withColumn("value", when(col("fid").isNotNull, col("value")).otherwise(0L))
        .drop("fid")
    }

  /** M4 `annotateEntityDense.c:26`: relabel every non-zero voxel. */
  def annotateEntity(voxels: DataFrame, entityId: Long): DataFrame =
    voxels.withColumn("value", when(col("value") =!= 0, lit(entityId)).otherwise(0L))

  /** M5 `mergeCube.c:29`: relabel oldId → newId. */
  def relabel(voxels: DataFrame, oldId: Long, newId: Long): DataFrame =
    voxels.withColumn("value", when(col("value") === oldId, lit(newId)).otherwise(col("value")))

  /** A1/A2 unique ids in a region (`spdb/spatialdb/object.py:778-831`).
    * The reference's hybrid interior-index/boundary-cutout split (SURVEY
    * §3.3) is a *materialized-view substitution*: see [[idsInRegionIndexed]].
    * The direct form is one distinct aggregate — partial aggregation
    * (map-side combine) makes this shuffle only distinct ids.
    */
  def idsInRegion(voxels: DataFrame, box: Box, tRange: Range = 0 until 1): DataFrame =
    cutout(voxels, box, tRange)
      .where(col("value") =!= 0)
      .select(col("value").as("id"))
      .distinct()

  /** Index-first ids-in-region: interior cuboids answered from the
    * cuboid_index table (no voxel IO), boundary slabs from voxel data —
    * exactly the reference's plan (`object.py:778-831`) but with both
    * sides as DataFrames unioned under one distinct.
    */
  def idsInRegionIndexed(
      voxels: DataFrame,
      cuboidIndex: DataFrame,
      box: Box,
      dims: CuboidDims = CuboidDims(),
      tRange: Range = 0 until 1): DataFrame = {
    val dec = Region.decompose(box, dims)
    val interiorIds: DataFrame =
      if (dec.interior.isEmpty) voxels.sparkSession.emptyDataFrame.selectExpr("CAST(NULL AS LONG) AS id").limit(0)
      else {
        val spark = voxels.sparkSession
        val nCuboids = Region.coveringCount(dec.interior, dims)
        val ranged = cuboidIndex
          .where(col("t") >= tRange.start && col("t") < tRange.end)
        val pruned =
          if (nCuboids <= 4096) {
            // small cover: exact literal predicate (min-max + isin pushes
            // into the parquet scan)
            val ms = Region.coveringMortons(dec.interior, dims)
            ranged.where(col("morton") >= ms.head && col("morton") <= ms.last &&
              col("morton").isin(ms: _*))
          } else {
            // huge cover: never materialize the morton set on the driver —
            // generate it distributed and semi-join (VERDICT r1 #5: an
            // unbounded isin is a driver OOM / codegen blowup at 100x)
            val cover = coveringMortonsDf(spark, dec.interior, dims)
            ranged.join(cover.hint("shuffle_hash"), Seq("morton"), "left_semi")
          }
        pruned.select(explode(col("id_set")).as("id"))
      }
    // one scan with the slab predicates OR'd together — slabs are
    // disjoint, so this equals the per-slab union at 1/6th the IO
    val boundaryIds = dec.boundaries match {
      case Seq() => interiorIds.limit(0)
      case slabs =>
        voxels
          .where(slabs.map(boxPredicate).reduce(_ || _) &&
            col("t") >= tRange.start && col("t") < tRange.end)
          .where(col("value") =!= 0)
          .select(col("value").as("id"))
    }
    interiorIds.union(boundaryIds).distinct()
  }

  /** S3/S6 existence probe (`rediskvio.py:73-120`, `object.py:383-425`):
    * split a requested key set into (present, absent) against the stored
    * cuboid keys — the semi/anti join pair that replaced the reference's
    * per-key Redis/DynamoDB lookups. `requested` needs columns
    * (lookupKey, res, t, morton).
    */
  def cuboidsExist(requested: DataFrame, stored: Dataset[CuboidRow]): (DataFrame, DataFrame) = {
    val keys = Seq("lookupKey", "res", "t", "morton")
    val storedKeys = stored.toDF().select(keys.map(col): _*)
    (requested.join(storedKeys, keys, "left_semi"),
      requested.join(storedKeys, keys, "left_anti"))
  }

  /** O2 cube sort (`spatialdb.py:139-185`): group a cuboid set by morton
    * with its time samples as a t-sorted array — the shape the cutout
    * assembly consumed in the reference.
    */
  def sortCubes(cuboids: Dataset[CuboidRow]): DataFrame =
    cuboids.toDF()
      .groupBy(col("lookupKey"), col("res"), col("morton"))
      .agg(sort_array(collect_list(struct(col("t"), col("data")))).as("samples"))

  /** Distributed covering-morton generation: the morton ids of every
    * cuboid intersecting `box`, built with `spark.range` (no driver-side
    * materialization — scales to arbitrarily large regions).
    */
  def coveringMortonsDf(spark: SparkSession, box: Box, dims: CuboidDims): DataFrame = {
    val ((cx0, cx1), (cy0, cy1), (cz0, cz1)) = Region.gridBounds(box, dims)
    val nx = cx1 - cx0 + 1; val ny = cy1 - cy0 + 1; val nz = cz1 - cz0 + 1
    spark.range(nx * ny * nz)
      .select(Morton.morton_encode(
        lit(cx0) + col("id") % nx,
        lit(cy0) + expr(s"id div $nx") % ny,
        lit(cz0) + expr(s"id div ${nx * ny}")).as("morton"))
  }

  /** A9 index-maintenance job (`spdb/spatialdb/object_indices.py:730-817`):
    * one pass builds the cuboid→ids index (the reference's DynamoDB
    * s3-index) — per-cuboid id sets, sorted for determinism. The 400 KB
    * chunking/CAS machinery disappears: Parquet has no item ceiling.
    */
  def buildCuboidIndex(voxels: DataFrame, dims: CuboidDims = CuboidDims()): DataFrame =
    voxels.where(col("value") =!= 0)
      .groupBy(
        col("lookupKey"), col("res"), col("t"),
        Morton.morton_encode(
          idiv(col("x"), dims.x),
          idiv(col("y"), dims.y),
          idiv(col("z"), dims.z)).as("morton"))
      .agg(sort_array(collect_set(col("value"))).as("id_set"))

  /** A9 flat form: one (lookupKey, res, t, morton, id) row per cuboid×id —
    * the layout [[graft.storage.IndexStore]] persists. Serves both index
    * directions: group by morton for the cuboid index, filter by id for
    * the id index.
    */
  def buildFlatIndex(voxels: DataFrame, dims: CuboidDims = CuboidDims()): DataFrame =
    voxels.where(col("value") =!= 0)
      .select(
        col("lookupKey"), col("res"), col("t"),
        Morton.morton_encode(
          idiv(col("x"), dims.x),
          idiv(col("y"), dims.y),
          idiv(col("z"), dims.z)).as("morton"),
        col("value").as("id"))
      .distinct()

  /** A9 inverse: id→cuboids index (the reference's DynamoDB id-index). */
  def buildIdIndex(voxels: DataFrame, dims: CuboidDims = CuboidDims()): DataFrame =
    voxels.where(col("value") =!= 0)
      .groupBy(
        col("lookupKey"), col("res"), col("value").as("id"))
      .agg(sort_array(collect_set(
        Morton.morton_encode(
          idiv(col("x"), dims.x),
          idiv(col("y"), dims.y),
          idiv(col("z"), dims.z)))).as("mortons"))

  /** A9 id-index with the reference's overflow-chunk semantics
    * (`object_indices.py:167-347`, `test_object_indices.py:515-602`: a
    * DynamoDB item caps at 400 KB, so an id's cuboid list splits into
    * numbered chunk rows). The same cap matters in Spark for a different
    * reason: one id touching 10^8 cuboids would otherwise become a
    * single multi-GB array in one row — a guaranteed executor OOM that
    * no partitioning setting can fix. Chunk rows bound every row at
    * `chunkSize` mortons regardless of total scale. (The per-id
    * row_number is a single streaming pass per id — the same serial
    * order the reference's CAS append imposed.)
    */
  def buildIdIndexChunked(
      voxels: DataFrame,
      dims: CuboidDims = CuboidDims(),
      chunkSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lookupKey"), col("res"), col("id"))
      .orderBy(col("morton"))
    voxels.where(col("value") =!= 0)
      .select(col("lookupKey"), col("res"), col("value").as("id"),
        Morton.morton_encode(
          idiv(col("x"), dims.x),
          idiv(col("y"), dims.y),
          idiv(col("z"), dims.z)).as("morton"))
      .distinct()
      .withColumn("rk", (row_number().over(w) - 1).cast("long"))
      .groupBy(col("lookupKey"), col("res"), col("id"),
        expr(s"rk div $chunkSize").as("chunk_no"))
      .agg(sort_array(collect_list(col("morton"))).as("mortons"))
  }

  /** A3 loose bounding box (`object_indices.py:373-432`): min/max cuboid
    * extents from the id_index — no voxel IO.
    */
  def boundingBoxLoose(idIndex: DataFrame, id: Long, dims: CuboidDims = CuboidDims()): DataFrame =
    idIndex.where(col("id") === id)
      .select(col("id"), explode(col("mortons")).as("m"))
      .select(
        col("id"),
        Morton.morton_x(col("m")).as("cx"),
        Morton.morton_y(col("m")).as("cy"),
        Morton.morton_z(col("m")).as("cz"))
      .groupBy(col("id"))
      .agg(
        (min("cx") * dims.x).as("x_min"), ((max("cx") + 1) * dims.x).as("x_max"),
        (min("cy") * dims.y).as("y_min"), ((max("cy") + 1) * dims.y).as("y_max"),
        (min("cz") * dims.z).as("z_min"), ((max("cz") + 1) * dims.z).as("z_max"))

  /** A3 loose bounding box from FLAT index rows (`object_indices.py:
    * 373-432` answered from the persistent id-index): same cuboid-granular
    * extents as [[boundingBoxLoose]], plus the id's time-sample span —
    * which the loose-first tight path needs to bound its cutout. No voxel
    * IO; with an id-clustered index the `id = X` predicate prunes the
    * index scan itself.
    */
  def boundingBoxLooseFlat(flatIdx: DataFrame, id: Long, dims: CuboidDims = CuboidDims()): DataFrame =
    flatIdx.where(col("id") === id)
      .select(
        col("id"), col("t"),
        Morton.morton_x(col("morton")).as("cx"),
        Morton.morton_y(col("morton")).as("cy"),
        Morton.morton_z(col("morton")).as("cz"))
      .groupBy(col("id"))
      .agg(
        (min("cx") * dims.x).as("x_min"), ((max("cx") + 1) * dims.x).as("x_max"),
        (min("cy") * dims.y).as("y_min"), ((max("cy") + 1) * dims.y).as("y_max"),
        (min("cz") * dims.z).as("z_min"), ((max("cz") + 1) * dims.z).as("z_max"),
        min("t").as("t_min"), max("t").as("t_max"))

  /** A1/A2 ids-in-region against the materialized store: interior cuboids
    * answered from flat index rows alone (NO voxel IO — the reference's
    * index-first tactic, `object.py:778-831`), boundary slabs from
    * morton-pruned cutouts. The union's distinct is the only shuffle.
    */
  def idsInRegionFromStore(
      cuboids: Dataset[CuboidRow],
      flatIdx: DataFrame,
      lookupKey: String,
      res: Int,
      box: Box,
      tRange: Range = 0 until 1,
      vt: VoxelType = VoxelType.UInt64,
      dims: CuboidDims = CuboidDims()): DataFrame = {
    val spark = cuboids.sparkSession
    def noIds: DataFrame = spark.range(0).select(col("id"))
    val dec = Region.decompose(box, dims)
    val interior: DataFrame =
      if (dec.interior.isEmpty) noIds
      else {
        val ranged = flatIdx.where(col("t") >= tRange.start && col("t") < tRange.end)
        val pruned =
          if (Region.coveringCount(dec.interior, dims) <= 4096) {
            val ms = Region.coveringMortons(dec.interior, dims)
            ranged.where(col("morton") >= ms.head && col("morton") <= ms.last &&
              col("morton").isin(ms: _*))
          } else
            ranged.join(coveringMortonsDf(spark, dec.interior, dims).hint("shuffle_hash"),
              Seq("morton"), "left_semi")
        pruned.select(col("id"))
      }
    // ONE pruned scan for all ≤6 boundary slabs (not a scan per slab):
    // the covering sets union into a single morton prune, and the slabs
    // are disjoint so their box predicates OR together over one decode
    val boundary: DataFrame = dec.boundaries match {
      case Seq() => noIds
      case slabs =>
        import spark.implicits._
        val ranged = cuboids
          .where(col("lookupKey") === lookupKey && col("res") === res)
          .where(col("t") >= tRange.start && col("t") < tRange.end)
        val cubs =
          if (slabs.map(Region.coveringCount(_, dims)).sum <= 4096) {
            val ms = slabs.flatMap(Region.coveringMortons(_, dims)).distinct.sorted
            ranged
              .where(col("morton") >= ms.head && col("morton") <= ms.last)
              .where(col("morton").isin(ms: _*))
          } else {
            val cover = slabs.map(coveringMortonsDf(spark, _, dims)).reduce(_ union _)
            ranged.join(cover.hint("shuffle_hash"), Seq("morton"), "left_semi").as[CuboidRow]
          }
        CuboidCodec.toVoxels(cubs, vt, dims).toDF()
          .where(slabs.map(boxPredicate).reduce(_ || _) &&
            col("t") >= tRange.start && col("t") < tRange.end)
          .where(col("value") =!= 0).select(col("value").as("id"))
    }
    interior.union(boundary).distinct()
  }

  /** A3 loose bounding box for every id at once — the batch form of
    * [[boundingBoxLoose]] (one grouped aggregate instead of per-id index
    * lookups; same cuboid-granular extents).
    */
  def boundingBoxLooseAll(idIndex: DataFrame, dims: CuboidDims = CuboidDims()): DataFrame =
    idIndex
      .select(col("id"), explode(col("mortons")).as("m"))
      .select(
        col("id"),
        Morton.morton_x(col("m")).as("cx"),
        Morton.morton_y(col("m")).as("cy"),
        Morton.morton_z(col("m")).as("cz"))
      .groupBy(col("id"))
      .agg(
        (min("cx") * dims.x).as("x_min"), ((max("cx") + 1) * dims.x).as("x_max"),
        (min("cy") * dims.y).as("y_min"), ((max("cy") + 1) * dims.y).as("y_max"),
        (min("cz") * dims.z).as("z_min"), ((max("cz") + 1) * dims.z).as("z_max"))

  /** A4 tight bounding box (`object_indices.py:434-623`): the reference's
    * six-face-cutout dance is a single grouped min/max over the voxel
    * plane.
    */
  def boundingBoxTight(voxels: DataFrame, id: Long): DataFrame =
    voxels.where(col("value") === id)
      .groupBy(col("value").as("id"))
      .agg(
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"),
        min("z").as("z_min"), max("z").as("z_max"))

  /** A4 batch form: tight bbox of every id in one aggregate. */
  def boundingBoxTightAll(voxels: DataFrame): DataFrame =
    voxels.where(col("value") =!= 0)
      .groupBy(col("value").as("id"))
      .agg(
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"),
        min("z").as("z_min"), max("z").as("z_max"))

  /** A6 image downsample / zoomOut (`spdb/c_lib/c_version/zoomData.c:
    * 29-74`): stride-2^f point sampling (the reference samples, it does
    * not average) + coordinate rescale.
    */
  def zoomOut(voxels: DataFrame, factor: Int): DataFrame = {
    val f = 1L << factor
    voxels.where(col("x") % f === 0 && col("y") % f === 0)
      .select(
        col("lookupKey"), col("res"), col("t"),
        idiv(col("x"), f).as("x"),
        idiv(col("y"), f).as("y"),
        col("z"), col("value"))
  }

  /** A7 image upsample / zoomIn (`zoomData.c:77-146`): nearest-neighbor
    * 2^f replication via a generator (explode), fully distributed.
    */
  def zoomIn(voxels: DataFrame, factor: Int): DataFrame = {
    val f = (1L << factor).toInt
    val offsets = array((0 until f).map(lit(_)): _*)
    voxels
      .withColumn("ox", explode(offsets))
      .withColumn("oy", explode(offsets))
      .select(
        col("lookupKey"), col("res"), col("t"),
        (col("x") * f + col("ox")).as("x"),
        (col("y") * f + col("oy")).as("y"),
        col("z"), col("value"))
  }

  /** A5 annotation downsample: 2x2x(1|2) reduction with the reference's
    * vote rule (`spdb/c_lib/c_version/addData.c:28-70`): prefer a repeated
    * non-zero value, else the first non-zero in scan order. Grouped by the
    * parent-cell coordinate; the vote itself is [[VoteAggregator]] (a
    * typed `Aggregator`, since mode-with-tiebreak is not a Spark
    * built-in).
    */
  def downsampleAnnotation(voxels: DataFrame, scaleZ: Boolean = false): DataFrame = {
    val zDiv = if (scaleZ) 2L else 1L
    voxels.where(col("value") =!= 0)
      .groupBy(
        col("lookupKey"), col("res"), col("t"),
        idiv(col("x"), 2).as("x"),
        idiv(col("y"), 2).as("y"),
        idiv(col("z"), zDiv).as("z"))
      // scan order inside the 2x2x(1|2) cell: z-major then y then x,
      // matching the C kernel's slice-then-row iteration order. VoteAgg
      // is the native TypedImperativeAggregate form (no per-row object
      // churn; VoteAggregator.asUdaf remains the Column-API variant).
      .agg(VoteAgg(
        (col("z") % zDiv) * 4 + (col("y") % 2) * 2 + col("x") % 2,
        col("value")).as("value"))
  }

  /** F7 dynamic resampling between resolution levels — the capability the
    * reference declares but raises NotImplemented on (`spatialdb.py:413,
    * 425,661,677`). `levels > 0` zooms out (image: stride sampling A6;
    * annotation: vote downsample A5 per level); `levels < 0` zooms in
    * (A7).
    */
  def resample(voxels: DataFrame, levels: Int, annotation: Boolean = false): DataFrame =
    if (levels == 0) voxels
    else if (levels < 0) zoomIn(voxels, -levels)
    else if (!annotation) zoomOut(voxels, levels)
    else (1 to levels).foldLeft(voxels)((v, _) => downsampleAnnotation(v))

  /** Resolution-hierarchy build — the reference's downsample worker
    * (SURVEY §1.1.4, `resource.py:45-118` scaling rules): produce levels
    * `1..numLevels-1` from base voxels. Anisotropic levels halve x/y only;
    * once `res >= isoLevel` (annotation channels) z halves too
    * (`scaleZ`). Images stride-sample (A6); annotations majority-vote
    * (A5). Returns (res, voxels-at-res) pairs including the base.
    */
  def buildPyramid(
      base: DataFrame,
      numLevels: Int,
      annotation: Boolean,
      isoLevel: Int = Int.MaxValue): Seq[(Int, DataFrame)] = {
    val levels = Seq.newBuilder[(Int, DataFrame)]
    var cur = base
    levels += 0 -> cur
    for (res <- 1 until numLevels) {
      val scaleZ = annotation && res > isoLevel
      cur =
        if (annotation) downsampleAnnotation(cur, scaleZ)
        else zoomOut(cur, 1)
      val bumped = cur.withColumn("res", col("res") + 1)
      levels += res -> bumped
      cur = bumped
    }
    levels.result()
  }

  /** P7 zero/missing detection (`cube.py:308-322`), batch form: non-zero
    * voxel count per cuboid — occupancy 0 never appears (sparse), so
    * "from_zeros" cuboids are exactly the keys absent from this index.
    */
  def cuboidOccupancy(voxels: DataFrame, dims: CuboidDims = CuboidDims()): DataFrame =
    voxels.where(col("value") =!= 0)
      .groupBy(
        col("lookupKey"), col("res"), col("t"),
        Morton.morton_encode(
          idiv(col("x"), dims.x),
          idiv(col("y"), dims.y),
          idiv(col("z"), dims.z)).as("morton"))
      .agg(count(lit(1)).as("n_nonzero"))

  /** S7 incremental index upsert: merge a delta cuboid-index into an
    * existing one (union + re-aggregate of the affected keys only — the
    * reference's per-object `put_item` upsert, `object.py:427-471`).
    */
  def mergeCuboidIndex(existing: DataFrame, delta: DataFrame): DataFrame =
    existing.union(delta)
      .select(col("lookupKey"), col("res"), col("t"), col("morton"),
        explode(col("id_set")).as("id"))
      .groupBy(col("lookupKey"), col("res"), col("t"), col("morton"))
      .agg(sort_array(collect_set(col("id"))).as("id_set"))

  /** F5 false-color recolor (`spdb/c_lib/c_version/recolorCube.c:28-56`):
    * non-zero label → palette[id % 217] packed RGB. The palette is a
    * broadcast-free literal array; lookup stays in codegen via
    * `element_at`.
    */
  def recolor(voxels: DataFrame, palette: Array[Long]): DataFrame = {
    val pal = array(palette.toIndexedSeq.map(lit(_)): _*)
    voxels.withColumn("rgb",
      when(col("value") =!= 0, element_at(pal, (col("value") % palette.length).cast("int") + 1))
        .otherwise(0L))
  }
}
