package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.core.{Region, VoxelType}
import graft.storage.CuboidRow

/** Bulk-load path for an existing reference deployment's blosc-packed
  * cuboid blobs (`cube.py:127-140`: every stored object is
  * `blosc.compress(ndarray, typesize=itemsize*8)` of a C-order
  * `[t=1, z, y, x]` matrix — byte-identical to [[CuboidRow.data]]'s
  * little-endian dense layout once decompressed).
  *
  * Decoding runs inside a typed `map` on executors — one frame in, one
  * cuboid out, no driver involvement and no shuffle: the migration job is
  * scan → decode → [[graft.storage.CuboidStore.write]].
  */
object BloscIngest {

  /** Decode `(lookupKey, res, t, morton, blob)` rows of blosc frames into
    * [[CuboidRow]]s. `vt`/`dims` give the expected decoded size; a frame
    * that decodes to any other size fails loudly (a wrong-channel blob,
    * not data).
    *
    * NOTE the reference passes `typesize = itemsize * 8` (BITS — a quirk
    * its own blobs embed, `cube.py:140`); the codec honors whatever
    * typesize the frame header carries, so both quirky and correct
    * frames load.
    */
  def cuboidsFromBlosc(
      blobs: DataFrame,
      vt: VoxelType,
      dims: Region.CuboidDims): Dataset[CuboidRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val want = (dims.x * dims.y * dims.z * vt.byteWidth).toInt
    blobs
      .select(col("lookupKey").cast("string"), col("res").cast("int"),
        col("t").cast("int"), col("morton").cast("long"), col("blob").cast("binary"))
      .as[(String, Int, Int, Long, Array[Byte])]
      .map { case (lk, res, t, m, blob) =>
        val data = BloscCodec.decompress(blob)
        require(data.length == want,
          s"blosc blob for morton $m decoded to ${data.length} bytes, expected $want")
        CuboidRow(lk, res, t, m, data)
      }
  }

  /** Inverse of [[cuboidsFromBlosc]]: pack cuboids into the exact frames
    * the reference's `Cube.from_blosc` reads back (typesize =
    * itemsize*8, per `cube.py:140`) — the reverse-migration / hybrid-
    * deployment egress. Same executor-side one-in-one-out shape.
    */
  def blobsFromCuboids(
      cuboids: Dataset[CuboidRow],
      vt: VoxelType): DataFrame = {
    val spark = cuboids.sparkSession
    import spark.implicits._
    cuboids
      .map(c => (c.lookupKey, c.res, c.t, c.morton,
        BloscCodec.compress(c.data, typesize = vt.byteWidth * 8)))
      .toDF("lookupKey", "res", "t", "morton", "blob")
  }
}
