package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Region, VoxelType}
import graft.sources.{BloscCodec, BloscIngest}

/** The blosc ingest-compat codec: format-level fixtures (hand-built
  * frames and blosclz streams that pin the c-blosc 1.11 wire layout the
  * reference's blosc==1.5.0 emits) plus round-trips through every
  * compressor path, corruption fuzzing of the bounds guards, and the
  * Spark bulk-load into CuboidRows.
  *
  * SECOND-SOURCE VALIDATION: every frame `BloscCodec.compress` emits is
  * additionally decoded by [[BloscRefDecoder]] — a clean-room decoder
  * written independently from the same public format documentation, in a
  * different shape — so egress frames are validated against something
  * other than the encoder's own inverse (the hand-built fixtures pin the
  * byte layout; the ref decoder pins the full block/split/shuffle/lz
  * pipeline). REMAINING GAP (accepted): no frame produced by the actual
  * pinned python-blosc binary exists here — this environment has neither
  * the package nor network egress — so before a real migration, vendor a
  * handful of frames from the pinned python-blosc (typesizes 8/16/64,
  * compressible + incompressible, >16 KB multi-block) and assert
  * byte-exact decode against them.
  */
class BloscSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-blosc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def le(bs: ByteBuffer): ByteBuffer = bs.order(ByteOrder.LITTLE_ENDIAN)

  test("hand-built memcpy frame decodes to its payload") {
    val payload = (0 until 40).map(_.toByte).toArray
    val frame = le(ByteBuffer.allocate(16 + payload.length))
      .put(2.toByte).put(1.toByte).put(0x2.toByte).put(8.toByte)
      .putInt(payload.length).putInt(16384).putInt(16 + payload.length)
      .put(payload).array()
    assert(BloscCodec.decompress(frame).toSeq == payload.toSeq)
  }

  test("hand-built blosclz stream: literals, short match, RLE run, extended length") {
    // literal run of 4: token 3, bytes 1,2,3,4
    // match len 4 dist 4 (d=3): token (2<<5)|0, byte 3  -> copies 1,2,3,4
    // RLE: match dist 1 (d=0) len 5: token (3<<5)|0, byte 0 -> 4,4,4,4,4
    val stream = Array[Byte](3, 1, 2, 3, 4, (2 << 5).toByte, 3, (3 << 5).toByte, 0)
    val out = new Array[Byte](13)
    val n = BloscCodec.lzDecompress(stream, 0, stream.length, out, 0, out.length)
    assert(n == 13)
    assert(out.toSeq == Seq[Byte](1, 2, 3, 4, 1, 2, 3, 4, 4, 4, 4, 4, 4))
    // extended length: literal 1 byte 7, then match d=0 len code 7 with
    // ext byte 4 -> len = 6+4+3 = 13 copies of 7
    val s2 = Array[Byte](0, 7, (7 << 5).toByte, 4, 0)
    val out2 = new Array[Byte](14)
    val n2 = BloscCodec.lzDecompress(s2, 0, s2.length, out2, 0, out2.length)
    assert(n2 == 14 && out2.toSeq.forall(_ == 7.toByte))
  }

  test("unsupported filter flags are rejected, not decoded as garbage") {
    val payload = Array.fill[Byte](32)(1)
    def frame(flags: Int) = le(ByteBuffer.allocate(16 + payload.length))
      .put(2.toByte).put(1.toByte).put(flags.toByte).put(8.toByte)
      .putInt(payload.length).putInt(16384).putInt(16 + payload.length)
      .put(payload).array()
    intercept[IllegalArgumentException](BloscCodec.decompress(frame(0x4))) // bitshuffle
    intercept[IllegalArgumentException](BloscCodec.decompress(frame(0x8))) // delta
    intercept[IllegalArgumentException](BloscCodec.decompress(frame(0x2 | (1 << 5)))) // lz4 code
  }

  test("compress/decompress round-trips across dtypes, sizes and entropy") {
    val rnd = new scala.util.Random(5)
    val cases = Seq(
      ("u8-zeros", Array.fill[Byte](64 * 64 * 4)(0), 8),
      ("u8-random", Array.fill[Byte](10000)(rnd.nextInt(256).toByte), 8),
      ("u16-repeat", Array.tabulate[Byte](32768)(i => (i % 6).toByte), 16),
      ("u64-sparse", {
        val a = new Array[Byte](65536)
        (0 until 100).foreach(_ => a(rnd.nextInt(a.length)) = rnd.nextInt(256).toByte)
        a
      }, 64),
      ("tiny", Array[Byte](1, 2, 3), 8),
      ("empty", Array.empty[Byte], 8),
      // non-multiple-of-typesize tail exercises the shuffle leftover path
      ("ragged", Array.fill[Byte](1003)(rnd.nextInt(4).toByte), 16))
    cases.foreach { case (name, data, ts) =>
      val frame = BloscCodec.compress(data, ts)
      val hdr = le(ByteBuffer.wrap(frame))
      assert(hdr.getInt(12) == frame.length, s"$name: cbytes header")
      assert(hdr.getInt(4) == data.length, s"$name: nbytes header")
      val back = BloscCodec.decompress(frame)
      assert(back.toSeq == data.toSeq, s"$name: round-trip")
      // compressible inputs must actually shrink (not memcpy-fallback)
      if (name == "u8-zeros" || name == "u16-repeat" || name == "u64-sparse")
        assert(frame.length < data.length, s"$name: expected compression, got ${frame.length}")
    }
  }

  test("randomized round-trips: sizes x typesizes x entropy profiles") {
    val rnd = new scala.util.Random(42)
    for (ts <- Seq(1, 2, 4, 8, 16, 64, 255); trial <- 0 until 6) {
      val n = rnd.nextInt(70000)
      val data = new Array[Byte](n)
      trial % 3 match {
        case 0 => rnd.nextBytes(data) // incompressible
        case 1 => (0 until n).foreach(i => data(i) = (i % 7).toByte) // repetitive
        case 2 => (0 until n / 50).foreach(_ => data(rnd.nextInt(math.max(n, 1))) = 1) // sparse
      }
      val back = BloscCodec.decompress(BloscCodec.compress(data, ts))
      assert(back.toSeq == data.toSeq, s"typesize=$ts trial=$trial n=$n")
    }
  }

  test("second-source validation: an independent decoder reads every egress frame") {
    // the frames a migrating deployment would hand to the REAL blosc:
    // multi-block (>16 KiB), split (typesize ≤ 16) and unsplit (> 16),
    // shuffled and not, compressible / sparse / incompressible, ragged
    // tails, RLE-heavy runs — each decoded by BloscRefDecoder, which
    // shares no code with BloscCodec (see its scaladoc)
    val rnd = new scala.util.Random(9)
    val cases = Seq(
      ("zeros-multiblock", Array.fill[Byte](40000)(0), 8, true),
      ("rle-runs", Array.tabulate[Byte](33000)(i => (i / 5000).toByte), 8, true),
      ("repeat-u16", Array.tabulate[Byte](70000)(i => (i % 6).toByte), 16, true),
      ("sparse-u64", {
        val a = new Array[Byte](65536)
        (0 until 200).foreach(_ => a(rnd.nextInt(a.length)) = rnd.nextInt(256).toByte)
        a
      }, 64, true),
      ("random-memcpy", Array.fill[Byte](20000)(rnd.nextInt(256).toByte), 8, true),
      ("noshuffle", Array.tabulate[Byte](30000)(i => (i % 11).toByte), 8, false),
      ("ragged-tail", Array.tabulate[Byte](16411)(i => (i % 9).toByte), 16, true),
      ("single-block", Array.tabulate[Byte](512)(i => (i % 3).toByte), 4, true),
      ("tiny", Array[Byte](5, 5, 5), 8, true),
      ("empty", Array.empty[Byte], 8, true))
    cases.foreach { case (name, data, ts, sh) =>
      val frame = BloscCodec.compress(data, ts, shuffle = sh)
      assert(BloscRefDecoder.decode(frame).toSeq == data.toSeq,
        s"$name: independent decoder disagreed with the source bytes")
    }
    // and across the randomized sweep, both decoders agree byte-for-byte
    for (ts <- Seq(1, 2, 8, 16, 64); trial <- 0 until 4) {
      val n = rnd.nextInt(50000)
      val data = new Array[Byte](n)
      if (trial % 2 == 0) rnd.nextBytes(data)
      else (0 until n).foreach(i => data(i) = (i % 13).toByte)
      val frame = BloscCodec.compress(data, ts)
      assert(BloscRefDecoder.decode(frame).toSeq == data.toSeq,
        s"ref decode typesize=$ts trial=$trial n=$n")
    }
  }

  test("corrupt frames fail with clear requires, never raw index exceptions") {
    val rnd = new scala.util.Random(31)
    // a real compressible frame so corruption lands in live stream bytes
    val data = Array.tabulate[Byte](4096)(i => (i % 17).toByte)
    val good = BloscCodec.compress(data, typesize = 8)
    assert(BloscCodec.decompress(good).toSeq == data.toSeq)
    var checked = 0
    for (_ <- 0 until 300) {
      val bad = good.clone()
      // corrupt 1-4 bytes anywhere past the magic fields (version bytes
      // stay valid so we exercise the decoder, not the version check)
      for (_ <- 0 to rnd.nextInt(4)) {
        val pos = 2 + rnd.nextInt(bad.length - 2)
        bad(pos) = (bad(pos) ^ (1 + rnd.nextInt(255))).toByte
      }
      try { BloscCodec.decompress(bad); () }
      catch {
        case _: IllegalArgumentException => checked += 1 // require(...) — the contract
        case e: ArrayIndexOutOfBoundsException =>
          fail(s"raw AIOOBE escaped the bounds guards: $e")
        case e: IndexOutOfBoundsException =>
          fail(s"raw IOOBE escaped the bounds guards: $e")
        case _: NegativeArraySizeException =>
          fail("negative allocation escaped the header guard")
      }
    }
    // the fuzz must actually exercise the failure paths, not no-op
    assert(checked > 50, s"only $checked corruptions hit a guard")
    // truncated frame: clear message, not a buffer exception
    val truncated = java.util.Arrays.copyOf(good, good.length - 7)
    val e = intercept[IllegalArgumentException](BloscCodec.decompress(truncated))
    assert(e.getMessage.contains("cbytes"))
  }

  test("shuffle/unshuffle are exact inverses incl. ragged tail") {
    val rnd = new scala.util.Random(9)
    val data = Array.fill[Byte](1001)(rnd.nextInt(256).toByte)
    val sh = new Array[Byte](1001)
    val back = new Array[Byte](1001)
    BloscCodec.shuffleBytes(8, data, 0, sh, data.length)
    BloscCodec.unshuffle(8, sh, data.length, back, 0)
    assert(back.toSeq == data.toSeq)
  }

  test("bidirectional migration: cuboids -> blosc egress -> bulk-load round-trips") {
    import spark.implicits._
    import graft.storage.CuboidRow
    val dims = Region.CuboidDims(8, 8, 4)
    val vt = VoxelType.UInt64
    val rnd = new scala.util.Random(31)
    val rows = (0 until 4).map { i =>
      val data = new Array[Byte](8 * 8 * 4 * 8)
      rnd.nextBytes(data)
      CuboidRow("chan", 0, 0, i.toLong, data)
    }
    val blobs = BloscIngest.blobsFromCuboids(spark.createDataset(rows), vt)
    val back = BloscIngest.cuboidsFromBlosc(blobs, vt, dims).collect()
      .map(c => c.morton -> c.data.toSeq).toMap
    rows.foreach(r => assert(back(r.morton) == r.data.toSeq))
  }

  test("bulk-load: blosc blobs -> CuboidRows -> voxels matches the source volume") {
    import spark.implicits._
    import graft.storage.{CuboidCodec, VoxelRow}
    val dims = Region.CuboidDims(8, 8, 4)
    val vt = VoxelType.UInt16
    // a dense source cuboid with values > 255 (2-byte path), packed the
    // reference way: C-order [z,y,x] LE bytes, typesize = itemsize*8
    val vox = for {
      z <- 0 until 4; y <- 0 until 8; x <- 0 until 8
    } yield VoxelRow("chan", 0, 0, x.toLong, y.toLong, z.toLong, (300 + x + 10 * y + 100 * z).toLong)
    val raw = new Array[Byte](8 * 8 * 4 * 2)
    val bb = le(ByteBuffer.wrap(raw))
    vox.foreach(v => bb.putShort(((v.z * 64 + v.y * 8 + v.x) * 2).toInt, (v.value & 0xffff).toShort))
    val blob = BloscCodec.compress(raw, typesize = 16) // itemsize*8 quirk
    val blobs = Seq(("chan", 0, 0, 0L, blob)).toDF("lookupKey", "res", "t", "morton", "blob")
    val rows = BloscIngest.cuboidsFromBlosc(blobs, vt, dims)
    val got = CuboidCodec.toVoxels(rows, vt, dims).collect().map(v => (v.x, v.y, v.z) -> v.value).toMap
    assert(got.size == vox.size)
    vox.foreach(v => assert(got((v.x, v.y, v.z)) == v.value))
  }
}
