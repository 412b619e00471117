package graft.storage

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Morton, Region, VoxelType}

/** One stored chunk: the unit of IO, mirroring the reference's cuboid
  * (`spdb/spatialdb/cube.py:51-73`): dense C-order `[z,y,x]` voxels for one
  * (channel, resolution, time sample, morton address). `data` holds
  * little-endian fixed-width voxels (1/2/8 bytes per the channel datatype);
  * on disk Parquet's own page encodings replace the reference's blosc
  * (`cube.py:127-140`).
  */
final case class CuboidRow(
    lookupKey: String,
    res: Int,
    t: Int,
    morton: Long,
    data: Array[Byte])

/** Voxel-plane row: the relational face of the engine. Coordinates are
  * global (world space at the row's resolution), so assembly/stitching of
  * cutouts is just a range predicate — no positional join needed.
  */
final case class VoxelRow(
    lookupKey: String,
    res: Int,
    t: Int,
    x: Long,
    y: Long,
    z: Long,
    value: Long)

/** Codec between the cuboid plane (binary blobs, bulk IO) and the voxel
  * plane (exploded rows, analytics) — the custom Generator/flatMap pair the
  * survey calls the single most important custom op (SURVEY §2.11).
  */
object CuboidCodec {

  /** Decode blobs to voxel rows. Streams each blob through an iterator so a
    * 4 MiB cuboid never materializes 4M row objects at once; runs inside a
    * typed `flatMap` (task-parallel, no driver involvement).
    */
  def toVoxels(
      cuboids: Dataset[CuboidRow],
      vt: VoxelType,
      dims: Region.CuboidDims,
      keepZeros: Boolean = false): Dataset[VoxelRow] = {
    val spark = cuboids.sparkSession
    import spark.implicits._
    val (dx, dy, dz) = (dims.x.toInt, dims.y.toInt, dims.z.toInt)
    cuboids.flatMap { c =>
      val bx = Morton.decodeX(c.morton) * dx
      val by = Morton.decodeY(c.morton) * dy
      val bz = Morton.decodeZ(c.morton) * dz
      val buf = ByteBuffer.wrap(c.data).order(ByteOrder.LITTLE_ENDIAN)
      val n = dx * dy * dz
      Iterator.range(0, n).flatMap { i =>
        val v = vt.read(buf, i)
        if (v == 0L && !keepZeros) Iterator.empty
        else {
          // C-order [z,y,x]: x fastest
          val xi = i % dx
          val yi = (i / dx) % dy
          val zi = i / (dx * dy)
          Iterator.single(VoxelRow(c.lookupKey, c.res, c.t, bx + xi, by + yi, bz + zi, v))
        }
      }
    }
  }

  /** Inverse codec: voxel rows → dense zero-filled blobs, grouped by
    * (lookupKey, res, t, morton). Shuffles once on the cuboid key; each
    * group is bounded by the cuboid size so executor memory is safe at any
    * total scale.
    */
  def fromVoxels(
      voxels: Dataset[VoxelRow],
      vt: VoxelType,
      dims: Region.CuboidDims): Dataset[CuboidRow] = {
    val spark = voxels.sparkSession
    import spark.implicits._
    val (dx, dy, dz) = (dims.x.toInt, dims.y.toInt, dims.z.toInt)
    val width = vt.byteWidth
    voxels
      .groupByKey(v => (v.lookupKey, v.res, v.t, Morton.encode(v.x / dx, v.y / dy, v.z / dz)))
      .mapGroups { (key: (String, Int, Int, Long), it: Iterator[VoxelRow]) =>
        val (lk, res, t, m) = key
        val arr = new Array[Byte](dx * dy * dz * width)
        val buf = ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
        val bx = Morton.decodeX(m) * dx
        val by = Morton.decodeY(m) * dy
        val bz = Morton.decodeZ(m) * dz
        it.foreach { v =>
          val i = ((v.z - bz) * dy * dx + (v.y - by) * dx + (v.x - bx)).toInt
          vt.write(buf, i, v.value)
        }
        CuboidRow(lk, res, t, m, arr)
      }
  }
}

/** Parquet-backed cuboid store. Replaces the reference's Redis + S3 +
  * DynamoDB tiering (`spdb/spatialdb/rediskvio.py`, `object.py`) with one
  * columnar table: partitioned by (lookupKey, res) for partition pruning,
  * range-clustered by morton so Z-order locality turns region predicates
  * into parquet row-group min/max prunes (SURVEY §4 "chunk pruning").
  */
object CuboidStore {

  def write(
      cuboids: Dataset[CuboidRow],
      path: String,
      mode: String = "overwrite",
      clustered: Boolean = true): Unit = {
    // clustered=false skips the Z-order range shuffle (and its boundary-
    // sampling pass) — right for short-lived delta commits whose footprint
    // the chain read resolves by key anyway; compaction restores global
    // clustering when it folds the chain.
    val arranged =
      if (clustered)
        cuboids.repartitionByRange(col("morton")).sortWithinPartitions("morton", "t")
      else cuboids.sortWithinPartitions("morton", "t")
    arranged.write
      .mode(mode)
      .partitionBy("lookupKey", "res")
      .parquet(path)
  }

  /** Bucketed variant: hash-bucket by morton into a catalog table so
    * repeated cuboid-key joins (merge jobs, index probes) are co-located —
    * both sides scan pre-bucketed files and the join plans with NO
    * shuffle exchange. The main store stays path-based; bucketing is for
    * hot merge pipelines where the extra catalog dependency pays for
    * itself.
    */
  def writeBucketed(
      cuboids: Dataset[CuboidRow],
      tableName: String,
      path: String,
      buckets: Int = 64): Unit = {
    cuboids.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, "morton")
      .sortBy("morton")
      .saveAsTable(tableName)
  }

  /** Read schema, explicit: schema INFERENCE throws on a version
    * directory holding no parquet files (an empty delta commit — legal:
    * a write whose merge produced zero cuboids), where an explicit
    * schema correctly yields an empty dataset. Partition columns
    * (lookupKey, res) resolve from the directory layout as usual.
    */
  private val readSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("morton", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("data", org.apache.spark.sql.types.BinaryType),
    org.apache.spark.sql.types.StructField("lookupKey", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("res", org.apache.spark.sql.types.IntegerType)))

  def read(spark: SparkSession, path: String): Dataset[CuboidRow] = {
    import spark.implicits._
    spark.read.schema(readSchema).parquet(path)
      .select(
        col("lookupKey").cast("string"),
        col("res").cast("int"),
        col("t").cast("int"),
        col("morton").cast("long"),
        col("data"))
      .as[CuboidRow]
  }
}

/** Deterministic synthetic volume generator — the Spark analog of the
  * reference test suite's `cube.random()` (`spdb/spatialdb/imagecube.py:
  * 53-61`, `annocube.py:51-60`): uint8 values in [1,255), annotation ids in
  * [1,256). Generated distributed via `spark.range` + a hash mix, never on
  * the driver.
  */
object VolumeGen {

  /** M9 `ones()`-style constant constructor (`imagecube.py:44-69`): every
    * voxel of the box at `value`. (`zeros()` needs no constructor — the
    * sparse voxel plane represents all-zero as no rows; the dense blob
    * form is `CuboidCodec.fromVoxels` of an empty set.)
    */
  def constant(
      spark: SparkSession,
      lookupKey: String,
      res: Int,
      box: Region.Box,
      tRange: Range = 0 until 1,
      value: Long = 1L): Dataset[VoxelRow] =
    voxels(spark, lookupKey, res, box, tRange, seed = 0L, zeroFraction = 0.0)
      .map(v => v.copy(value = value))(
        org.apache.spark.sql.Encoders.product[VoxelRow])

  def voxels(
      spark: SparkSession,
      lookupKey: String,
      res: Int,
      box: Region.Box,
      tRange: Range = 0 until 1,
      vt: VoxelType = VoxelType.UInt64,
      seed: Long = 42L,
      zeroFraction: Double = 0.5): Dataset[VoxelRow] = {
    import spark.implicits._
    val nx = box.x1 - box.x0
    val ny = box.y1 - box.y0
    val nz = box.z1 - box.z0
    val nt = tRange.size.toLong
    val maxVal = vt match {
      case VoxelType.UInt8   => 254L
      case VoxelType.UInt16  => 65534L
      case VoxelType.UInt32  => 4294967294L
      case VoxelType.Float32 => 16777215L // 2^24 - 1: the exact integral float range
      case VoxelType.UInt64  => 255L
    }
    val t0 = tRange.start
    val zeroMod = math.max(1L, math.round(1.0 / math.max(1e-9, zeroFraction)))
    // `div` = integer division (Spark's `/` is double division)
    spark.range(nt * nz * ny * nx)
      .select(
        lit(lookupKey).as("lookupKey"),
        lit(res).as("res"),
        (lit(t0) + expr(s"id div ${nz * ny * nx}")).cast("int").as("t"),
        (lit(box.x0) + col("id") % nx).as("x"),
        (lit(box.y0) + expr(s"id div $nx") % ny).as("y"),
        (lit(box.z0) + expr(s"id div ${nx * ny}") % nz).as("z"),
        col("id"))
      .withColumn("h", abs(xxhash64(col("id"), lit(seed))))
      .withColumn("value",
        when(col("h") % zeroMod === 0, lit(0L))
          .otherwise(col("h") % maxVal + 1))
      .select(col("lookupKey"), col("res"), col("t"), col("x"), col("y"), col("z"), col("value"))
      .as[VoxelRow]
  }
}
