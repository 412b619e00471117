package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.parallel.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Morton, Region, Resource, VoxelType}
import graft.storage.{CuboidRow, VoxelRow}

/** Neuroglancer-"precomputed"-style chunked volume layout: the alternate
  * channel storage backend the reference selects with
  * `Channel.storage_type == 'cloudvol'` (`spdb/project/resource.py:247-280`,
  * `is_cloudvolume()` at `:273`). The reference only carries the switch and
  * the layer path (`cv_path`) — the actual IO lives outside spdb — so the
  * Spark analog implements the public precomputed layout directly:
  *
  *   - `<root>/info` — JSON catalog: data type, num_channels, and one
  *     `scales` entry per resolution with `size`, `chunk_sizes`,
  *     `voxel_offset`, `resolution`, `encoding: "raw"`.
  *   - `<root>/<scaleKey>/<x0>-<x1>_<y0>-<y1>_<z0>-<z1>` — one object per
  *     chunk, raw little-endian voxels, x-fastest (offset = x + cx*(y +
  *     cy*z)), edge chunks clipped to the volume size. Missing chunk ⇒
  *     all-zero, like the reference store's absent cuboids.
  *
  * Scale design: a cutout enumerates only the chunk grid cells that
  * intersect the request box (O(request), never O(store)); chunk bodies are
  * read task-parallel through Spark's `binaryFile` source with an explicit
  * path list, and writes stream partition-local through the Hadoop
  * FileSystem API — no driver materialization in either direction.
  */
object Precomputed {
  import Region.{Box, CuboidDims}

  /** One resolution level of the layer ("scales" entry). */
  final case class Scale(
      key: String,
      sizeX: Long, sizeY: Long, sizeZ: Long,
      chunkX: Int, chunkY: Int, chunkZ: Int,
      offX: Long, offY: Long, offZ: Long,
      resX: Double, resY: Double, resZ: Double)

  final case class Info(dataType: VoxelType, layerType: String, scales: Seq[Scale]) {
    def scale(key: String): Scale =
      scales.find(_.key == key).getOrElse(
        throw new IllegalArgumentException(
          s"no scale '$key' in info (have ${scales.map(_.key).mkString(",")})"))
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---------------------------------------------------------------- info

  def infoJson(info: Info): String = {
    val root = mapper.createObjectNode()
    root.put("type", info.layerType)
    root.put("data_type", info.dataType.name)
    root.put("num_channels", 1)
    val scales = root.putArray("scales")
    info.scales.foreach { s =>
      val n = scales.addObject()
      n.put("key", s.key)
      n.put("encoding", "raw")
      n.putArray("size").add(s.sizeX).add(s.sizeY).add(s.sizeZ)
      n.putArray("voxel_offset").add(s.offX).add(s.offY).add(s.offZ)
      n.putArray("resolution").add(s.resX).add(s.resY).add(s.resZ)
      n.putArray("chunk_sizes").addArray().add(s.chunkX).add(s.chunkY).add(s.chunkZ)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def parseInfo(json: String): Info = {
    val root = mapper.readTree(json)
    val scales = (0 until root.get("scales").size()).map { i =>
      val n = root.get("scales").get(i)
      def arr(name: String, j: Int): Long = n.get(name).get(j).asLong()
      val ch = n.get("chunk_sizes").get(0)
      require(n.get("encoding").asText() == "raw",
        s"only 'raw' encoding supported, got ${n.get("encoding").asText()}")
      Scale(n.get("key").asText(),
        arr("size", 0), arr("size", 1), arr("size", 2),
        ch.get(0).asInt(), ch.get(1).asInt(), ch.get(2).asInt(),
        arr("voxel_offset", 0), arr("voxel_offset", 1), arr("voxel_offset", 2),
        n.get("resolution").get(0).asDouble(), n.get("resolution").get(1).asDouble(),
        n.get("resolution").get(2).asDouble())
    }
    Info(VoxelType.parse(root.get("data_type").asText()), root.get("type").asText(), scales)
  }

  /** Derive the Info catalog for a channel from its [[Resource]]: one scale
    * per hierarchy level, sizes/voxel-dims from the catalog math
    * (`resource.py:45-118` — same derivations as `Resource.extentAt`).
    */
  def infoFor(resource: Resource, dims: CuboidDims, levels: Int = 1): Info = {
    val layerType = if (resource.channel.isAnnotation) "segmentation" else "image"
    val scales = (0 until math.max(1, levels)).map { r =>
      val (ex, ey, ez) = resource.extentAt(r)
      val (vx, vy, vz) = resource.voxelDimsAt(r)
      Scale(r.toString, ex, ey, ez, dims.x.toInt, dims.y.toInt, dims.z.toInt,
        0L, 0L, 0L, vx, vy, vz)
    }
    Info(resource.channel.datatype, layerType, scales)
  }

  private def fs(p: Path): FileSystem = p.getFileSystem(new Configuration())

  def readInfo(root: String): Info = {
    val p = new Path(root, "info")
    val in = fs(p).open(p)
    try parseInfo(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
    finally in.close()
  }

  def writeInfo(root: String, info: Info): Unit = {
    val p = new Path(root, "info")
    val f = fs(p)
    f.mkdirs(new Path(root))
    val out = f.create(p, true)
    try out.write(infoJson(info).getBytes("UTF-8")) finally out.close()
  }

  // -------------------------------------------------------------- chunks

  /** Chunk object name: world-space half-open ranges, clipped at the
    * volume bounds (the precomputed convention — edge chunk files carry
    * only the in-bounds voxels).
    */
  def chunkName(s: Scale, cx: Long, cy: Long, cz: Long): String = {
    val x0 = s.offX + cx * s.chunkX; val x1 = math.min(x0 + s.chunkX, s.offX + s.sizeX)
    val y0 = s.offY + cy * s.chunkY; val y1 = math.min(y0 + s.chunkY, s.offY + s.sizeY)
    val z0 = s.offZ + cz * s.chunkZ; val z1 = math.min(z0 + s.chunkZ, s.offZ + s.sizeZ)
    s"$x0-${x1}_$y0-${y1}_$z0-$z1"
  }

  private val ChunkRe = raw"(\d+)-(\d+)_(\d+)-(\d+)_(\d+)-(\d+)".r

  def parseChunkName(name: String): Box = name match {
    case ChunkRe(x0, x1, y0, y1, z0, z1) =>
      Box(x0.toLong, x1.toLong, y0.toLong, y1.toLong, z0.toLong, z1.toLong)
    case other => throw new IllegalArgumentException(s"not a chunk name: $other")
  }

  /** Export a cuboid snapshot as one precomputed scale. Partition-local
    * writes through the Hadoop FS API — each task writes its own chunk
    * objects, nothing funnels through the driver. Only t=0 is exported
    * (the precomputed layout has no time axis; the reference's cloudvol
    * channels are likewise 3-D).
    */
  def exportScale(
      cuboids: Dataset[CuboidRow],
      root: String,
      info: Info,
      scaleKey: String,
      dims: CuboidDims): Unit = {
    val s = info.scale(scaleKey)
    require(s.chunkX == dims.x && s.chunkY == dims.y && s.chunkZ == dims.z,
      s"scale chunk ${(s.chunkX, s.chunkY, s.chunkZ)} != cuboid dims $dims")
    val width = info.dataType.byteWidth
    val res = scaleKey.toInt
    val (dx, dy, dz) = (dims.x.toInt, dims.y.toInt, dims.z.toInt)
    val scaleDir = new Path(root, scaleKey).toString
    cuboids.filter(c => c.res == res && c.t == 0).foreachPartition {
      (it: Iterator[CuboidRow]) =>
        val dir = new Path(scaleDir)
        val f = dir.getFileSystem(new Configuration())
        f.mkdirs(dir)
        it.foreach { c =>
          val cx = Morton.decodeX(c.morton); val cy = Morton.decodeY(c.morton)
          val cz = Morton.decodeZ(c.morton)
          val name = chunkName(s, cx, cy, cz)
          val clip = parseChunkName(name)
          val (nx, ny, nz) =
            ((clip.x1 - clip.x0).toInt, (clip.y1 - clip.y0).toInt, (clip.z1 - clip.z0).toInt)
          val outArr = new Array[Byte](nx * ny * nz * width)
          // clip the dense cuboid body (x-fastest both sides)
          var z = 0
          while (z < nz) {
            var y = 0
            while (y < ny) {
              val src = ((z * dy + y) * dx) * width
              val dst = ((z * ny + y) * nx) * width
              System.arraycopy(c.data, src, outArr, dst, nx * width)
              y += 1
            }
            z += 1
          }
          val out = f.create(new Path(dir, name), true)
          try out.write(outArr) finally out.close()
        }
    }
  }

  /** Bulk-load one scale of a precomputed layer as cuboid rows — the
    * reverse of [[exportScale]], for migrating a cloudvol deployment INTO
    * the engine (the counterpart of `BloscIngest.cuboidsFromBlosc` for
    * the other reference storage tier). The whole scale directory is read
    * (this is a bulk load; per-chunk work is task-parallel via the
    * `binaryFile` source), edge-clipped chunks are zero-padded back to
    * full cuboid bodies, and chunk grid == cuboid grid is required so the
    * mapping is positional, never a shuffle.
    */
  def toCuboids(
      spark: SparkSession,
      root: String,
      scaleKey: String,
      lookupKey: String,
      dims: CuboidDims): Dataset[CuboidRow] = {
    import spark.implicits._
    val info = readInfo(root)
    val s = info.scale(scaleKey)
    require(s.chunkX == dims.x && s.chunkY == dims.y && s.chunkZ == dims.z,
      s"scale chunk ${(s.chunkX, s.chunkY, s.chunkZ)} != cuboid dims $dims")
    val width = info.dataType.byteWidth
    val res = scaleKey.toInt
    val (dx, dy, dz) = (dims.x.toInt, dims.y.toInt, dims.z.toInt)
    spark.read.format("binaryFile")
      .load(new Path(root, scaleKey).toString + "/*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val chunk = parseChunkName(path.substring(path.lastIndexOf('/') + 1))
        val (nx, ny, nz) =
          ((chunk.x1 - chunk.x0).toInt, (chunk.y1 - chunk.y0).toInt, (chunk.z1 - chunk.z0).toInt)
        require(bytes.length == nx * ny * nz * width,
          s"chunk $path: ${bytes.length} bytes != $nx*$ny*$nz*$width")
        val full =
          if (nx == dx && ny == dy && nz == dz) bytes
          else {
            // zero-pad a clipped edge chunk back to the dense cuboid body
            val arr = new Array[Byte](dx * dy * dz * width)
            var z = 0
            while (z < nz) {
              var y = 0
              while (y < ny) {
                System.arraycopy(bytes, ((z * ny + y) * nx) * width,
                  arr, ((z * dy + y) * dx) * width, nx * width)
                y += 1
              }
              z += 1
            }
            arr
          }
        val m = Morton.encode(
          (chunk.x0 - s.offX) / dims.x, (chunk.y0 - s.offY) / dims.y,
          (chunk.z0 - s.offZ) / dims.z)
        CuboidRow(lookupKey, res, 0, m, full)
      }
  }

  /** Pruned cutout from a precomputed layer: enumerate only the chunk grid
    * cells intersecting `box` (O(request) driver work, existence-probed in
    * parallel like the reference's S3-index checks), then decode the
    * surviving chunk objects task-parallel via the `binaryFile` source.
    * Missing chunks are zero ⇒ absent from the sparse result. Non-zero
    * voxels only, same contract as [[graft.engine.SpatialOps.cutoutFromCuboids]].
    */
  def cutout(
      spark: SparkSession,
      root: String,
      scaleKey: String,
      box: Box,
      lookupKey: String): DataFrame = {
    import spark.implicits._
    val info = readInfo(root)
    val s = info.scale(scaleKey)
    val vt = info.dataType
    val res = scaleKey.toInt
    val clipped = Box(
      math.max(box.x0, s.offX), math.min(box.x1, s.offX + s.sizeX),
      math.max(box.y0, s.offY), math.min(box.y1, s.offY + s.sizeY),
      math.max(box.z0, s.offZ), math.min(box.z1, s.offZ + s.sizeZ))
    if (clipped.isEmpty) return spark.emptyDataset[VoxelRow].toDF()
    val scaleDir = new Path(root, scaleKey)
    val candidates = for {
      cz <- (clipped.z0 - s.offZ) / s.chunkZ to (clipped.z1 - 1 - s.offZ) / s.chunkZ
      cy <- (clipped.y0 - s.offY) / s.chunkY to (clipped.y1 - 1 - s.offY) / s.chunkY
      cx <- (clipped.x0 - s.offX) / s.chunkX to (clipped.x1 - 1 - s.offX) / s.chunkX
    } yield new Path(scaleDir, chunkName(s, cx, cy, cz))
    val f = fs(scaleDir)
    val present = candidates.par.filter(f.exists).seq.map(_.toString)
    if (present.isEmpty) return spark.emptyDataset[VoxelRow].toDF()
    val width = vt.byteWidth
    spark.read.format("binaryFile").load(present: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val chunk = parseChunkName(path.substring(path.lastIndexOf('/') + 1))
        val (nx, ny) = ((chunk.x1 - chunk.x0).toInt, (chunk.y1 - chunk.y0).toInt)
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val inter = Box(
          math.max(chunk.x0, clipped.x0), math.min(chunk.x1, clipped.x1),
          math.max(chunk.y0, clipped.y0), math.min(chunk.y1, clipped.y1),
          math.max(chunk.z0, clipped.z0), math.min(chunk.z1, clipped.z1))
        for {
          z <- Iterator.range(inter.z0, inter.z1)
          y <- Iterator.range(inter.y0, inter.y1)
          x <- Iterator.range(inter.x0, inter.x1)
          i = (((z - chunk.z0) * ny + (y - chunk.y0)) * nx + (x - chunk.x0)).toInt
          v = width match {
            case 1 => buf.get(i) & 0xffL
            case 2 => buf.getShort(i * 2) & 0xffffL
            case _ => buf.getLong(i * 8)
          }
          if v != 0L
        } yield VoxelRow(lookupKey, res, 0, x, y, z, v)
      }
      .toDF()
  }
}
