package graft

import java.nio.{ByteBuffer, ByteOrder}

/** Clean-room SECOND-SOURCE decoder for the c-blosc 1.11 / blosclz 1.x
  * frame format (the wire format pinned by the reference's
  * `requirements.txt` blosc==1.5.0; layout documented at
  * `graft.sources.BloscCodec`'s scaladoc and in the public c-blosc 1.11
  * sources). Written independently of `BloscCodec.decompress` — different
  * structure (streaming ByteBuffer reader, opcode-first match decode,
  * distances materialized as positive ints rather than back-references) —
  * so BloscSpec can validate frames `BloscCodec.compress` emits against
  * something other than the encoder's own inverse. A shared misreading of
  * the format would have to be made twice, in different shapes, to pass.
  *
  * Deliberately minimal: no corruption guards beyond what prevents JVM
  * faults — this is a test oracle for well-formed frames, not the ingest
  * codec.
  */
object BloscRefDecoder {

  def decode(frame: Array[Byte]): Array[Byte] = {
    val hdr = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val flags = frame(2) & 0xff
    val typesize = frame(3) & 0xff
    val nbytes = hdr.getInt(4)
    val blocksize = hdr.getInt(8)
    val out = new Array[Byte](nbytes)
    if (nbytes == 0) return out
    if ((flags & 0x2) != 0) { // pure memcpy frame
      System.arraycopy(frame, 16, out, 0, nbytes)
      return out
    }
    val nblocks = (nbytes + blocksize - 1) / blocksize
    for (j <- 0 until nblocks) {
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      val splits =
        if (typesize >= 1 && typesize <= 16 && bsize == blocksize &&
          blocksize / typesize >= 128) typesize
        else 1
      val neblock = bsize / splits
      val block = new Array[Byte](bsize)
      var pos = hdr.getInt(16 + 4 * j)
      for (s <- 0 until splits) {
        val clen = hdr.getInt(pos)
        pos += 4
        if (clen == neblock) // stored stream
          System.arraycopy(frame, pos, block, s * neblock, neblock)
        else
          lz(frame, pos, clen, block, s * neblock, neblock)
        pos += clen
      }
      val dst = j * blocksize
      if ((flags & 0x1) != 0 && typesize > 1) {
        // inverse byte-shuffle: plane-major → element-major
        val nel = bsize / typesize
        for (i <- 0 until nel; p <- 0 until typesize)
          out(dst + i * typesize + p) = block(p * nel + i)
        for (k <- nel * typesize until bsize) out(dst + k) = block(k)
      } else System.arraycopy(block, 0, out, dst, bsize)
    }
    out
  }

  /** blosclz 1.x stream decode: token < 32 is a literal run of token+1
    * bytes; otherwise a match whose copy count is (token>>>5)+2, with
    * 7 extending by continuation bytes (each added, chained while 255),
    * 13-bit distance (hi 5 bits in the token) encoded minus one, the
    * all-ones distance escaping to a 16-bit big-endian far distance
    * biased by 8192, and distance-0 meaning "repeat the previous output
    * byte". The byte after each op is the next token.
    */
  private def lz(
      in: Array[Byte], off: Int, len: Int,
      out: Array[Byte], outOff: Int, outLen: Int): Unit = {
    var ip = off
    val end = off + len
    var op = outOff
    val opEnd = outOff + outLen
    def next(): Int = { val b = in(ip) & 0xff; ip += 1; b }
    var token = next()
    var done = false
    while (!done) {
      if (token < 32) {
        val run = token + 1
        System.arraycopy(in, ip, out, op, run)
        ip += run; op += run
        if (ip < end) token = next() else done = true
      } else {
        var count = (token >>> 5) + 2
        if (count == 9) { // 7+2: extended
          var c = 0
          do { c = next(); count += c } while (c == 255)
        }
        val hi = token & 31
        val lo = next()
        val far = hi == 31 && lo == 255
        val dist =
          if (far) (next() << 8 | next()) + 8192
          else (hi << 8 | lo) + 1
        if (ip < end) token = next() else done = true
        if (!far && hi == 0 && lo == 0) { // RLE of the previous byte
          val b = out(op - 1)
          for (_ <- 0 until count) { out(op) = b; op += 1 }
        } else {
          var src = op - dist
          for (_ <- 0 until count) { out(op) = out(src); op += 1; src += 1 }
        }
      }
      if (op >= opEnd) done = true
    }
  }
}
