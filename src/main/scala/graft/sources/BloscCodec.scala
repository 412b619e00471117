package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codec for the blosc chunk format as pinned by the reference
  * (`requirements.txt:8` pins python-blosc 1.5.0 → c-blosc 1.11, blosclz
  * 1.x): `Cube.pack_array` stores every cuboid blob as
  * `blosc.compress(data, typesize=itemsize*8)` (`cube.py:127-140`), so a
  * migrating deployment's existing S3 blobs are blosc frames. This codec
  * is the ingest-compat path that bulk-loads them without an external
  * conversion step; the engine's own store keeps Parquet encodings.
  *
  * Format (16-byte header, all ints little-endian):
  * {{{
  *   0: version   1: versionlz   2: flags   3: typesize
  *   4-7: nbytes  8-11: blocksize  12-15: cbytes (total, incl header)
  * }}}
  * flags bit0 = byte-shuffle, bit1 = pure memcpy frame; compressor code
  * in bits 5-7 (0 = blosclz — the only one the reference's default path
  * emits). A non-memcpy frame carries `nblocks` int32 block offsets
  * (absolute within the frame), then per block `nsplits` streams of
  * `[int32 cbytes][payload]`, where a stream with `cbytes == neblock` is
  * stored raw. Splitting and shuffling follow c-blosc 1.11: a block is
  * split into `typesize` byte-plane streams iff `typesize <= 16 &&
  * blocksize/typesize >= 128 && !leftoverblock`; shuffle is applied per
  * block before splitting.
  */
object BloscCodec {

  private val MaxDistance = 8191
  private val MaxSplits = 16
  private val MinBufferSize = 128

  // ---------------------------------------------------------------- decode

  /** Decompress one blosc frame to its original bytes. */
  def decompress(frame: Array[Byte]): Array[Byte] = {
    require(frame.length >= 16, s"blosc frame too short: ${frame.length}")
    val hdr = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val flags = frame(2) & 0xff
    val typesize = frame(3) & 0xff
    val nbytes = hdr.getInt(4)
    val blocksize = hdr.getInt(8)
    val cbytes = hdr.getInt(12)
    require(cbytes == frame.length,
      s"blosc frame length ${frame.length} != header cbytes $cbytes")
    require((flags >>> 5) == 0, s"unsupported compressor code ${flags >>> 5} (blosclz only)")
    // fail loudly on filters we do not implement — decoding a BITSHUFFLE
    // (0x4) or DELTA (0x8) frame as plain bytes would return garbage of
    // the CORRECT length, sailing straight past callers' size checks
    require((flags & 0xc) == 0, s"unsupported blosc filter flags 0x${flags.toHexString}")
    // corrupt-header guard: nbytes sizes the output allocation and
    // blocksize is a divisor below — fail with a clear message instead
    // of a negative-size allocation or divide-by-zero
    require(nbytes >= 0 && blocksize > 0,
      s"blosc header corrupt: nbytes=$nbytes blocksize=$blocksize")
    val out = new Array[Byte](nbytes)
    if (nbytes == 0) return out
    if ((flags & 0x2) != 0) { // memcpy frame: raw original buffer
      System.arraycopy(frame, 16, out, 0, nbytes)
      return out
    }
    val shuffled = (flags & 0x1) != 0 && typesize > 1
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val block = new Array[Byte](blocksize)
    var j = 0
    while (j < nblocks) {
      val bstart = hdr.getInt(16 + 4 * j)
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      val leftover = bsize != blocksize
      val nsplits =
        if (typesize <= MaxSplits && typesize > 0 && blocksize / math.max(typesize, 1) >= MinBufferSize && !leftover)
          math.max(typesize, 1)
        else 1
      val neblock = bsize / nsplits
      // compliant frames always split exactly (blosc forces blocksize to
      // a typesize multiple); fail loudly rather than drop a remainder
      require(neblock * nsplits == bsize,
        s"blosc block $j: $bsize bytes not coverable by $nsplits streams")
      // corrupt-offset guard: a bad block start would otherwise send
      // lzDecompress reading outside the frame entirely
      require(bstart >= 16 + 4 * nblocks && bstart <= frame.length,
        s"blosc block $j: start offset $bstart outside frame")
      var ip = bstart
      var op = 0
      var s = 0
      while (s < nsplits) {
        require(ip + 4 <= frame.length, s"blosc block $j: truncated stream header")
        val sc = hdr.getInt(ip); ip += 4
        require(sc >= 0 && ip + sc <= frame.length,
          s"blosc block $j: stream of $sc bytes overruns frame")
        if (sc == neblock) { // raw stream
          System.arraycopy(frame, ip, block, op, neblock)
        } else {
          val got = lzDecompress(frame, ip, sc, block, op, neblock)
          require(got == neblock, s"blosclz stream decoded $got of $neblock bytes")
        }
        ip += sc
        op += neblock
        s += 1
      }
      if (shuffled) unshuffle(typesize, block, bsize, out, j * blocksize)
      else System.arraycopy(block, 0, out, j * blocksize, bsize)
      j += 1
    }
    out
  }

  /** blosclz 1.x (fastlz-derived) stream decoder — the faithful port of
    * c-blosc 1.11 `blosclz_decompress`, including RLE runs, extended
    * match lengths and far (16-bit) distances.
    */
  private[graft] def lzDecompress(
      in: Array[Byte], inOff: Int, inLen: Int,
      out: Array[Byte], outOff: Int, outLen: Int): Int = {
    var ip = inOff
    val ipLimit = inOff + inLen
    var op = outOff
    val opLimit = outOff + outLen
    if (inLen == 0) return 0
    var ctrl = in(ip) & 31
    ip += 1
    var loop = true
    while (loop) {
      if (ctrl >= 32) { // match
        var len = (ctrl >>> 5) - 1
        val ofs = (ctrl & 31) << 8
        var ref = op - ofs
        if (len == 6) { // 7 - 1: extended length
          var code = 0
          do {
            require(ip < ipLimit, "blosclz: truncated extended match length")
            code = in(ip) & 0xff; ip += 1; len += code
          } while (code == 255)
        }
        require(ip < ipLimit, "blosclz: truncated match offset")
        val code = in(ip) & 0xff; ip += 1
        ref -= code
        if (code == 255 && ofs == (31 << 8)) { // far distance
          require(ip + 2 <= ipLimit, "blosclz: truncated far distance")
          var o = (in(ip) & 0xff) << 8; ip += 1
          o += in(ip) & 0xff; ip += 1
          ref = op - o - MaxDistance
        }
        if (ip < ipLimit) { ctrl = in(ip) & 0xff; ip += 1 } else loop = false
        if (ref == op) { // run of the previous byte
          require(op > outOff, "blosclz: run with no previous byte")
          val b = out(op - 1)
          var k = len + 3
          require(op + k <= opLimit, "blosclz: output overrun")
          while (k > 0) { out(op) = b; op += 1; k -= 1 }
        } else {
          ref -= 1
          // ref < op: a match may only copy already-written bytes
          // (overlapping forward copies are legal and handled byte-wise)
          require(op + len + 3 <= opLimit && ref >= outOff && ref < op, "blosclz: bad match")
          var k = len + 3
          while (k > 0) { out(op) = out(ref); op += 1; ref += 1; k -= 1 }
        }
      } else { // literal run of ctrl + 1 bytes
        val k = ctrl + 1
        require(op + k <= opLimit && ip + k <= ipLimit, "blosclz: literal overrun")
        System.arraycopy(in, ip, out, op, k)
        ip += k; op += k
        if (ip < ipLimit) { ctrl = in(ip) & 0xff; ip += 1 } else loop = false
      }
    }
    op - outOff
  }

  // ---------------------------------------------------------------- encode

  /** Compress `data` into a blosc frame the reference can read back with
    * `blosc.decompress` — same header/blocking/split/shuffle rules as
    * [[decompress]]. Falls back to a memcpy frame when compression does
    * not pay, exactly like c-blosc.
    */
  def compress(data: Array[Byte], typesize: Int, shuffle: Boolean = true): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"typesize $typesize out of byte range")
    val nbytes = data.length
    val doShuffle = shuffle && typesize > 1
    // block size: ≤16 KiB, rounded DOWN to a typesize multiple — like
    // c-blosc, so split streams (bsize/nsplits) always cover the block
    // exactly; a trailing non-multiple remainder becomes a leftover
    // block, which is never split
    val blocksize =
      if (nbytes == 0) 1
      else math.max(typesize, math.min(nbytes, 16384) / typesize * typesize)
    val nblocks = if (nbytes == 0) 0 else (nbytes + blocksize - 1) / blocksize
    val outBuf = ByteBuffer.allocate(16 + 4 * nblocks + nbytes + 4 * nblocks * math.max(typesize, 1) + 64)
      .order(ByteOrder.LITTLE_ENDIAN)
    outBuf.position(16 + 4 * nblocks)
    val block = new Array[Byte](blocksize)
    val bstarts = new Array[Int](nblocks)
    var j = 0
    var ok = true
    while (j < nblocks && ok) {
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      val leftover = bsize != blocksize
      if (doShuffle) shuffleBytes(typesize, data, j * blocksize, block, bsize)
      else System.arraycopy(data, j * blocksize, block, 0, bsize)
      val nsplits =
        if (typesize <= MaxSplits && blocksize / typesize >= MinBufferSize && !leftover) typesize
        else 1
      val neblock = bsize / nsplits
      bstarts(j) = outBuf.position()
      var s = 0
      while (s < nsplits) {
        val comp = lzCompress(block, s * neblock, neblock)
        if (comp != null && comp.length < neblock) {
          outBuf.putInt(comp.length); outBuf.put(comp)
        } else {
          outBuf.putInt(neblock); outBuf.put(block, s * neblock, neblock)
        }
        s += 1
      }
      // a frame that grew past the raw size falls back to memcpy mode
      if (outBuf.position() >= 16 + nbytes) ok = false
      j += 1
    }
    if (!ok || nblocks == 0) {
      val frame = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      frame.put(2.toByte).put(1.toByte).put(0x2.toByte).put(typesize.toByte)
      frame.putInt(nbytes).putInt(blocksize).putInt(16 + nbytes)
      frame.put(data)
      return frame.array()
    }
    val cbytes = outBuf.position()
    val frame = new Array[Byte](cbytes)
    outBuf.flip()
    outBuf.get(frame)
    val hdr = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    hdr.put(2.toByte).put(1.toByte)
      .put(((if (doShuffle) 0x1 else 0x0)).toByte).put(typesize.toByte)
    hdr.putInt(nbytes).putInt(blocksize).putInt(cbytes)
    var b = 0
    while (b < nblocks) { hdr.putInt(bstarts(b)); b += 1 }
    frame
  }

  /** Greedy hash-chain blosclz 1.x encoder: literal runs ≤ 32, matches of
    * length ≥ 3 at distance ≤ [[MaxDistance]] (extended-length encoding
    * past 8). Returns null when the stream would not shrink.
    */
  private[graft] def lzCompress(in: Array[Byte], off: Int, len: Int): Array[Byte] = {
    if (len < 16) return null
    val out = new Array[Byte](len) // give up past break-even
    var op = 0
    val htab = new Array[Int](1 << 14)
    java.util.Arrays.fill(htab, -1)
    def hash(p: Int): Int =
      (((in(p) & 0xff) | ((in(p + 1) & 0xff) << 8) | ((in(p + 2) & 0xff) << 16)) * 2654435761L >>> 18).toInt & 16383
    var anchor = off // first unemitted literal
    var ip = off
    val end = off + len
    def emitLiterals(upTo: Int): Boolean = {
      var a = anchor
      while (a < upTo) {
        val run = math.min(32, upTo - a)
        if (op + 1 + run > out.length) return false
        out(op) = (run - 1).toByte; op += 1
        System.arraycopy(in, a, out, op, run); op += run
        a += run
      }
      anchor = upTo
      true
    }
    while (ip + 3 <= end - 2) {
      val h = hash(ip)
      val cand = htab(h)
      htab(h) = ip
      val dist = ip - cand
      if (cand >= off && dist <= MaxDistance && dist >= 1 &&
        in(cand) == in(ip) && in(cand + 1) == in(ip + 1) && in(cand + 2) == in(ip + 2)) {
        var l = 3
        while (ip + l < end && in(cand + l) == in(ip + l)) l += 1
        if (!emitLiterals(ip)) return null
        val d = dist - 1
        if (l <= 8) {
          if (op + 2 > out.length) return null
          out(op) = (((l - 2) << 5) | (d >>> 8)).toByte; op += 1
          out(op) = (d & 0xff).toByte; op += 1
        } else {
          if (op + 2 > out.length) return null
          out(op) = ((7 << 5) | (d >>> 8)).toByte; op += 1
          var rem = l - 9
          while (rem >= 255) {
            if (op + 1 > out.length) return null
            out(op) = 255.toByte; op += 1; rem -= 255
          }
          if (op + 2 > out.length) return null
          out(op) = rem.toByte; op += 1
          out(op) = (d & 0xff).toByte; op += 1
        }
        ip += l
        anchor = ip
      } else ip += 1
    }
    if (!emitLiterals(end)) return null
    java.util.Arrays.copyOfRange(out, 0, op)
  }

  // --------------------------------------------------------------- shuffle

  /** Byte shuffle: gather byte-plane `j` of every `typesize`-wide element
    * (`dst(j*n + i) = src(i*typesize + j)`); the trailing partial element
    * is copied through.
    */
  private[graft] def shuffleBytes(
      typesize: Int, src: Array[Byte], srcOff: Int, dst: Array[Byte], bsize: Int): Unit = {
    val nel = bsize / typesize
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < nel) {
        dst(j * nel + i) = src(srcOff + i * typesize + j)
        i += 1
      }
      j += 1
    }
    var k = nel * typesize
    while (k < bsize) { dst(k) = src(srcOff + k); k += 1 }
  }

  /** Inverse of [[shuffleBytes]], writing into `dst` at `dstOff`. */
  private[graft] def unshuffle(
      typesize: Int, src: Array[Byte], bsize: Int, dst: Array[Byte], dstOff: Int): Unit = {
    val nel = bsize / typesize
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < nel) {
        dst(dstOff + i * typesize + j) = src(j * nel + i)
        i += 1
      }
      j += 1
    }
    var k = nel * typesize
    while (k < bsize) { dst(dstOff + k) = src(k); k += 1 }
  }
}
