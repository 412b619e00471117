package graft.core

/** Catalog ("resource") model: Collection → Experiment → CoordinateFrame →
  * Channel, mirroring the reference's schema hierarchy
  * (`spdb/project/resource.py:121,138,172,225`). In the Spark engine this is
  * plain driver-side metadata: it selects the voxel datatype, chunk geometry,
  * resolution scaling, and the `lookupKey` used in every physical key.
  */
final case class Collection(name: String, description: String = "")

/** Hierarchy method for the resolution pyramid (`resource.py:45-118`). */
sealed trait HierarchyMethod
object HierarchyMethod {
  case object Isotropic extends HierarchyMethod
  case object Anisotropic extends HierarchyMethod
  def parse(s: String): HierarchyMethod = s.toLowerCase match {
    case "isotropic" => Isotropic
    case _           => Anisotropic
  }
}

final case class CoordinateFrame(
    name: String,
    xStart: Long, xStop: Long,
    yStart: Long, yStop: Long,
    zStart: Long, zStop: Long,
    xVoxelSize: Double = 1.0, yVoxelSize: Double = 1.0, zVoxelSize: Double = 1.0,
    voxelUnit: String = "nanometers") {
  def extent: (Long, Long, Long) = (xStop - xStart, yStop - yStart, zStop - zStart)
}

final case class Experiment(
    name: String,
    numHierarchyLevels: Int = 1,
    hierarchyMethod: HierarchyMethod = HierarchyMethod.Anisotropic,
    numTimeSamples: Int = 1,
    timeStep: Long = 0,
    timeStepUnit: String = "milliseconds")

/** Voxel datatypes the reference supports (`spdb/spatialdb/cube.py:442-451`
  * for the Cube.create_cube surface; uint32/float32 are the legacy ndstore
  * dtypes of `spdb/c_lib/ndlib.py:39-51` / `isotropicBuild.c:88`).
  * Stored in Spark as the narrowest signed type and widened/masked in
  * compute (uint8 → Byte & 0xFF, uint16 → Short & 0xFFFF, uint32 →
  * Int & 0xFFFFFFFF, uint64 → Long). Float32 blobs hold IEEE-754
  * little-endian floats while the voxel plane stays integral Longs —
  * exact for |v| < 2^24 (every id/intensity the surface produces), so
  * the relational contract and its oracles are unchanged; fractional
  * intensities would need a separate double-valued plane, which no
  * reachable reference op emits.
  *
  * [[read]]/[[write]] are the single widen/narrow point for every blob
  * codec (cuboid codec, id index, precomputed/blosc ingest).
  */
sealed abstract class VoxelType(val byteWidth: Int, val name: String) {
  /** Widened value of voxel `i` in a little-endian blob. */
  def read(buf: java.nio.ByteBuffer, i: Int): Long
  /** Store widened value `v` as voxel `i` of a little-endian blob. */
  def write(buf: java.nio.ByteBuffer, i: Int, v: Long): Unit
}
object VoxelType {
  case object UInt8 extends VoxelType(1, "uint8") {
    def read(buf: java.nio.ByteBuffer, i: Int): Long = buf.get(i) & 0xffL
    def write(buf: java.nio.ByteBuffer, i: Int, v: Long): Unit = { buf.put(i, (v & 0xff).toByte); () }
  }
  case object UInt16 extends VoxelType(2, "uint16") {
    def read(buf: java.nio.ByteBuffer, i: Int): Long = buf.getShort(i * 2) & 0xffffL
    def write(buf: java.nio.ByteBuffer, i: Int, v: Long): Unit = { buf.putShort(i * 2, (v & 0xffff).toShort); () }
  }
  case object UInt32 extends VoxelType(4, "uint32") {
    def read(buf: java.nio.ByteBuffer, i: Int): Long = buf.getInt(i * 4) & 0xffffffffL
    def write(buf: java.nio.ByteBuffer, i: Int, v: Long): Unit = { buf.putInt(i * 4, (v & 0xffffffffL).toInt); () }
  }
  case object Float32 extends VoxelType(4, "float32") {
    def read(buf: java.nio.ByteBuffer, i: Int): Long =
      java.lang.Float.intBitsToFloat(buf.getInt(i * 4)).toLong
    def write(buf: java.nio.ByteBuffer, i: Int, v: Long): Unit = {
      buf.putInt(i * 4, java.lang.Float.floatToRawIntBits(v.toFloat)); ()
    }
  }
  case object UInt64 extends VoxelType(8, "uint64") {
    def read(buf: java.nio.ByteBuffer, i: Int): Long = buf.getLong(i * 8)
    def write(buf: java.nio.ByteBuffer, i: Int, v: Long): Unit = { buf.putLong(i * 8, v); () }
  }
  def parse(s: String): VoxelType = s.toLowerCase match {
    case "uint8"   => UInt8
    case "uint16"  => UInt16
    case "uint32"  => UInt32
    case "float32" => Float32
    case "uint64"  => UInt64
    case other     => throw new IllegalArgumentException(s"unsupported datatype: $other")
  }
}

sealed trait ChannelType
object ChannelType {
  case object Image extends ChannelType
  case object Annotation extends ChannelType
}

final case class Channel(
    name: String,
    channelType: ChannelType,
    datatype: VoxelType,
    baseResolution: Int = 0,
    sources: Seq[String] = Nil,
    related: Seq[String] = Nil,
    defaultTimeSample: Int = 0,
    storageType: String = "graft",
    cvPath: String = "") {
  def isImage: Boolean = channelType == ChannelType.Image
  def isAnnotation: Boolean = channelType == ChannelType.Annotation

  /** Alternate-backend switch, mirroring the reference's per-channel
    * `storage_type`/`cv_path` selector and `is_cloudvolume()` guard
    * (`spdb/project/resource.py:247-259,273-280`): a "precomputed"
    * channel answers cutouts from a neuroglancer-precomputed-style chunk
    * layout ([[graft.sources.Precomputed]]) at `cvPath` instead of the
    * engine's versioned cuboid store.
    */
  def isCloudVolume: Boolean = storageType == "precomputed" && cvPath.nonEmpty
}

/** A fully-resolved resource: everything a query needs to address and
  * decode a channel's cuboids (`spdb/project/basicresource.py:20`).
  *
  * `bossKey` is the human key `col&exp&chan`; `lookupKey` is the stable
  * numeric form used in physical storage keys (`resource.py:292-295`).
  */
final case class Resource(
    collection: Collection,
    experiment: Experiment,
    coordFrame: CoordinateFrame,
    channel: Channel,
    lookupKey: String) {
  def bossKey: String = s"${collection.name}&${experiment.name}&${channel.name}"

  /** Extent at a resolution level: 2x downscale per level in x/y; z only
    * scales under the isotropic method (`resource.py:45-118`).
    */
  def extentAt(res: Int): (Long, Long, Long) = {
    val (ex, ey, ez) = coordFrame.extent
    val f = 1L << res
    val zf = experiment.hierarchyMethod match {
      case HierarchyMethod.Isotropic => f
      case HierarchyMethod.Anisotropic => 1L
    }
    (math.max(1L, ex / f), math.max(1L, ey / f), math.max(1L, ez / zf))
  }

  /** F8 voxel dimensions at a level (`resource.py:45-80`): x/y double per
    * level; z stays fixed anisotropically until [[isotropicLevel]].
    */
  def voxelDimsAt(res: Int): (Double, Double, Double) = {
    val f = (1L << res).toDouble
    val zf = experiment.hierarchyMethod match {
      case HierarchyMethod.Isotropic => f
      case HierarchyMethod.Anisotropic => 1.0
    }
    (coordFrame.xVoxelSize * f, coordFrame.yVoxelSize * f, coordFrame.zVoxelSize * zf)
  }

  /** F8 isotropic level (`resource.py:21-42`): the level whose x/z voxel
    * aspect ratio is closest to 1 — where an anisotropic pyramid starts
    * scaling z too.
    */
  def isotropicLevel: Int =
    (0 until experiment.numHierarchyLevels).minBy { r =>
      val xs = coordFrame.xVoxelSize * (1L << r)
      math.abs(xs / coordFrame.zVoxelSize - 1.0)
    }
}

object Resource {
  /** Test fixture mirroring the reference suite's channel dicts
    * (`spdb/project/test/resource_setup.py:1-93`).
    */
  def fixture(datatype: VoxelType, lookupKey: String = "4&3&2"): Resource = {
    val ct = if (datatype == VoxelType.UInt64) ChannelType.Annotation else ChannelType.Image
    Resource(
      Collection("col1"),
      Experiment("exp1", numHierarchyLevels = 7),
      CoordinateFrame("frame1", 0, 2048, 0, 2048, 0, 128, 4, 4, 35),
      Channel("ch1", ct, datatype),
      lookupKey)
  }
}
