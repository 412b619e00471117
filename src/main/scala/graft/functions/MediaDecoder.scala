package graft.functions

/** Pluggable media-decode surface for the multimodal pipeline: a
  * deployment binds a real video/audio codec (javacv / FFmpeg JNI)
  * WITHOUT forking — implement this trait, prepend it to the decoder
  * chain, and every `mapPartitions` stage ([[Multimodal.decodeMeta]],
  * [[Multimodal.sampleFrames]]) uses it with once-per-partition init.
  *
  * The chain is first-match-wins: a decoder returns `None` from [[meta]]
  * for blobs it does not handle and the next decoder gets a look. Two
  * implementations ship: [[MediaDecoder.ImageIO]] (REAL image decode via
  * the JDK — PNG/JPEG/GIF/BMP magic-byte sniff) and [[MediaDecoder.Stub]]
  * (the clearly-marked deterministic stand-in for video/audio; this
  * container ships no media codec, so the stub keeps the Spark-side
  * plumbing — schema, batching, frame explode — real and tested until a
  * codec is bound).
  *
  * Implementations must be Serializable (they ride to executors inside
  * task closures) and thread-safe after [[init]] (one partition = one
  * task thread, but a JVM hosts many).
  */
trait MediaDecoder extends Serializable {

  /** Called once per partition before any decode — codec/context/model
    * initialization (an FFmpeg binding allocates its demuxer pool here;
    * [[MediaDecoder.ImageIO]] disables the JDK's disk cache).
    */
  def init(): Unit = ()

  /** `Some((format, width, height))` when this decoder recognizes AND
    * successfully decodes the blob; `None` passes to the next decoder in
    * the chain. Corrupt bodies behind a recognized header must yield
    * `None` (one bad blob never fails a partition).
    */
  def meta(bytes: Array[Byte]): Option[(String, Int, Int)]

  /** Decoded frames `(frame_idx, frame_bytes)` for media this decoder
    * handles; `None` (the default) falls back to the caller's byte-window
    * framing. A real video codec emits `stride`-spaced decoded frames of
    * roughly `frameBytes` each here.
    */
  def frames(bytes: Array[Byte], frameBytes: Int, stride: Int): Option[Iterator[(Int, Array[Byte])]] =
    None
}

object MediaDecoder {

  /** JDK-ImageIO image decoder: real decode, true dimensions. */
  object ImageIO extends MediaDecoder {
    override def init(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def meta(bytes: Array[Byte]): Option[(String, Int, Int)] =
      Multimodal.decodeImage(bytes).map { case (fmt, img) =>
        (fmt, img.getWidth, img.getHeight)
      }
  }

  /** JDK audio decoder (`javax.sound.sampled`) — REAL decode for the
    * formats the JDK ships parsers for (WAV/PCM, AIFF, AU), no external
    * codec. Metadata mapping for the (format, width, height) surface:
    * width = sample rate in Hz, height = frame count (samples per
    * channel). `frames` decodes the actual PCM payload and windows it,
    * so [[Multimodal.sampleFrames]] over audio emits real sample
    * windows, not raw container bytes (header included). Blobs are
    * magic-byte sniffed first (`RIFF…WAVE` / `FORM…AIFF` / `.snd`) so
    * the chain never pays a thrown `UnsupportedAudioFileException` per
    * non-audio blob; a sniffed-but-corrupt body yields None (next
    * decoder gets a look) — same robustness contract as
    * [[Multimodal.decodeImage]].
    */
  object JdkAudio extends MediaDecoder {
    private def sniff(b: Array[Byte]): Option[String] =
      if (b.length < 12) None
      else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') Some("wav")
      else if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F') Some("aiff")
      else if (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') Some("au")
      else None

    override def meta(bytes: Array[Byte]): Option[(String, Int, Int)] =
      sniff(bytes).flatMap { fmt =>
        try {
          val ff = javax.sound.sampled.AudioSystem
            .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
          val rate = ff.getFormat.getSampleRate.toInt
          val nFrames = ff.getFrameLength
          // AU/streamed headers can report NOT_SPECIFIED (-1) — decline
          // rather than leak the sentinel into the (format, w, h) surface
          if (rate <= 0 || nFrames < 0) None else Some((fmt, rate, nFrames))
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException                               => None
          case _: IllegalArgumentException                          => None
          case _: IndexOutOfBoundsException                         => None
        }
      }

    /** Decoded PCM windows: `frameBytes` bytes of raw sample payload per
      * emitted frame, every `stride`-th window — the audio analog of
      * video frame sampling (header/container bytes never leak into a
      * frame).
      */
    override def frames(
        bytes: Array[Byte], frameBytes: Int, stride: Int): Option[Iterator[(Int, Array[Byte])]] =
      sniff(bytes).flatMap { _ =>
        try {
          val in = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          val pcm = in.readAllBytes()
          in.close()
          val nFrames = pcm.length / frameBytes
          Some((0 until nFrames by stride).iterator.map { f =>
            (f, java.util.Arrays.copyOfRange(pcm, f * frameBytes, (f + 1) * frameBytes))
          })
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException                               => None
          case _: IllegalArgumentException                          => None
          case _: IndexOutOfBoundsException                         => None
        }
      }

    /** Full decoded 16-bit PCM of channel 0 (sample rate, samples) —
      * the sample-exact surface [[Multimodal.audioFingerprint]] hashes.
      * Honors the container's endianness (WAV is LE, AIFF/AU BE) so the
      * same clip fingerprints identically from any of the three
      * containers; declines (None) on non-16-bit or non-PCM encodings
      * and on any parse failure — the chain's never-throw contract.
      */
    def pcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] =
      sniff(bytes).flatMap { _ =>
        try {
          val in = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.getChannels < 1) {
            in.close(); None
          } else {
            val pcm = in.readAllBytes()
            in.close()
            val frame = fmt.getChannels * 2
            val big = fmt.isBigEndian
            val n = pcm.length / frame
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              val o = i * frame
              out(i) =
                if (big) (((pcm(o) & 0xff) << 8) | (pcm(o + 1) & 0xff)).toShort
                else (((pcm(o + 1) & 0xff) << 8) | (pcm(o) & 0xff)).toShort
              i += 1
            }
            Some((fmt.getSampleRate.toInt, out))
          }
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException                               => None
          case _: IllegalArgumentException                          => None
          case _: IndexOutOfBoundsException                         => None
        }
      }
  }

  /** Pure-JVM VIDEO decode: AVI (RIFF) container parse + per-frame
    * decode, no external codec — the video analog of [[JdkAudio]]'s
    * hand-rolled RIFF audio path. Two codecs:
    *
    *  - uncompressed DIB frames (`00db`, BI_RGB 24-bit): bottom-up padded
    *    BGR rows un-padded and flipped to top-down `w*h*3` byte frames —
    *    bit-exact, so a synthesize→encode→decode round trip is
    *    oracle-checkable (q120, the video analog of q84/q109);
    *  - MJPEG frames (`00dc`, 'MJPG' handler): each frame is a JPEG
    *    decoded through JDK ImageIO — the most common capture container
    *    whose frames the JDK CAN decode (AVI is just RIFF chunk framing
    *    around them; the reference has no video analog at all).
    *
    * Anything else (unknown compression, malformed structure, truncated
    * body) declines with `None` so the next decoder — ultimately the
    * documented [[Stub]] — gets a look; one bad blob never fails a
    * partition. The container layout follows the public AVI/RIFF spec
    * (`avih`/`strh`/`strf` headers, `movi` chunk list).
    */
  object AviVideo extends MediaDecoder {

    /** Parsed container: frame dimensions, stream compression, and the
      * (offset, size) of every movi frame chunk in document order.
      */
    private final case class AviInfo(
        width: Int, height: Int, bitCount: Int, compression: Int,
        frames: Vector[(Int, Int)])

    private val FccDib = 0 // BI_RGB
    private def fcc(s: String): Int =
      (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
    private val FccMjpg = fcc("MJPG")

    private def sniff(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

    /** Full-structure parse; None on ANY malformed/truncated structure. */
    private def parse(b: Array[Byte]): Option[AviInfo] = {
      if (!sniff(b)) return None
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      try {
        val riffEnd = math.min(8L + bb.getInt(4), b.length.toLong).toInt
        var width, height, bitCount, compression = -1
        var sawVids = false
        val frames = Vector.newBuilder[(Int, Int)]

        // walk one chunk run [pos, end); `inMovi` collects frame chunks,
        // `inStrl` reads the video stream's strh/strf pair. Depth-capped:
        // real AVI nests ≤3 lists; a crafted deep-nest blob must decline,
        // not overflow the stack
        def walk(start: Int, end: Int, inMovi: Boolean, inStrl: Boolean, depth: Int): Unit = {
          if (depth > 16) throw new IllegalArgumentException("nesting")
          var pos = start
          while (pos + 8 <= end) {
            val id = bb.getInt(pos)
            val size = bb.getInt(pos + 4)
            if (size < 0 || pos + 8 + size > end) throw new IllegalArgumentException("bounds")
            if (id == fcc("LIST")) {
              if (size < 4) throw new IllegalArgumentException("list")
              val listType = bb.getInt(pos + 8)
              walk(pos + 12, pos + 8 + size,
                inMovi = listType == fcc("movi") || (inMovi && listType == fcc("rec ")),
                inStrl = listType == fcc("strl"), depth = depth + 1)
            } else if (inStrl && id == fcc("strh")) {
              if (size < 8) throw new IllegalArgumentException("strh")
              sawVids = bb.getInt(pos + 8) == fcc("vids")
            } else if (inStrl && sawVids && id == fcc("strf") && width < 0) {
              if (size < 40) throw new IllegalArgumentException("strf")
              width = bb.getInt(pos + 12)
              height = bb.getInt(pos + 16)
              bitCount = bb.getShort(pos + 22).toInt
              compression = bb.getInt(pos + 24)
            } else if (inMovi && (id == fcc("00db") || id == fcc("00dc"))) {
              frames += ((pos + 8, size))
            }
            pos += 8 + size + (size & 1)
          }
        }
        walk(12, riffEnd, inMovi = false, inStrl = false, depth = 0)
        val fs = frames.result()
        if (width <= 0 || height <= 0 || fs.isEmpty) None
        else Some(AviInfo(width, height, bitCount, compression, fs))
      } catch {
        case _: IllegalArgumentException  => None
        case _: IndexOutOfBoundsException => None
      }
    }

    /** Decode one frame chunk to a top-down pixel byte array: BGR
      * `w*h*3` for raw DIB, interleaved band samples for MJPEG. None for
      * codecs this decoder does not handle or frames that fail decode.
      */
    private def decodeFrame(b: Array[Byte], info: AviInfo, off: Int, size: Int): Option[Array[Byte]] =
      if (info.compression == FccDib && info.bitCount == 24) {
        // LONG arithmetic: adversarial header dims must not overflow into
        // a negative allocation size — `size` is bounded by the actual
        // blob length (parse checks chunk bounds), so the `need > size`
        // guard also bounds every allocation by real input bytes
        val rowBytesL = (info.width.toLong * 3 + 3) & ~3L
        val need = rowBytesL * info.height
        if (need > size || need > Int.MaxValue) None
        else {
          val rowBytes = rowBytesL.toInt
          val out = new Array[Byte](info.width * info.height * 3)
          var y = 0
          while (y < info.height) {
            // DIB rows are bottom-up; emit top-down
            System.arraycopy(b, off + (info.height - 1 - y) * rowBytes,
              out, y * info.width * 3, info.width * 3)
            y += 1
          }
          Some(out)
        }
      } else if (info.compression == FccMjpg) {
        Multimodal.decodeImage(java.util.Arrays.copyOfRange(b, off, off + size)).map {
          case (_, img) =>
            val raster = img.getRaster
            val bands = raster.getNumBands
            val out = new Array[Byte](img.getWidth * img.getHeight * bands)
            var i = 0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                var c = 0
                while (c < bands) { out(i) = raster.getSample(x, y, c).toByte; i += 1; c += 1 }
                x += 1
              }
              y += 1
            }
            out
        }
      } else None

    override def init(): Unit = javax.imageio.ImageIO.setUseCache(false)

    /** ("avi", width, height) — only when the container parses AND the
      * stream is a codec this decoder can actually decode (first frame
      * proves it; a recognized-but-undecodable stream falls through).
      */
    override def meta(bytes: Array[Byte]): Option[(String, Int, Int)] =
      parse(bytes).flatMap { info =>
        val (off, size) = info.frames.head
        decodeFrame(bytes, info, off, size).map(_ => ("avi", info.width, info.height))
      }

    /** Every `stride`-th DECODED frame (frame_idx = movi position;
      * `frameBytes` is ignored — a video frame's natural size is
      * `w*h*bands`). Declines the whole blob unless every sampled frame
      * decodes, keeping the all-or-nothing contract of [[meta]] — but
      * WITHOUT holding all decoded frames at once: a validation pass
      * decodes-and-drops each sampled frame first (one frame live at a
      * time; a minute of 640×480 held eagerly would be ~1.6 GB of
      * heap), then the returned iterator re-decodes lazily as the
      * consumer pulls. Sampled frames decode twice — the price of
      * all-or-nothing at O(1 frame) memory; raw-DIB "decode" is a row
      * copy, and MJPEG re-decode is still cheaper than spilling a
      * whole-video buffer.
      */
    override def frames(
        bytes: Array[Byte], frameBytes: Int, stride: Int): Option[Iterator[(Int, Array[Byte])]] =
      parse(bytes).flatMap { info =>
        val idxs = 0 until info.frames.length by stride
        val allOk = idxs.forall { i =>
          val (off, size) = info.frames(i)
          decodeFrame(bytes, info, off, size).isDefined
        }
        if (!allOk) None
        else Some(idxs.iterator.map { i =>
          val (off, size) = info.frames(i)
          (i, decodeFrame(bytes, info, off, size).get)
        })
      }

    /** Fold over the decoded frames IN STREAMING ORDER — one decoded
      * frame (w·h·3 bytes) live at a time, never the whole video
      * (a minute of 640×480 held eagerly is ~1.6 GB of heap). The
      * all-or-nothing contract of [[meta]] holds by aborting on the
      * first undecodable frame: the partial fold is discarded and the
      * row declines. Returns (width, height, n_frames, folded value).
      */
    private[functions] def foldFrames[A](bytes: Array[Byte], zero: A)(
        f: (A, Array[Byte]) => A): Option[(Int, Int, Int, A)] =
      parse(bytes).flatMap { info =>
        var acc = zero
        var i = 0
        var ok = true
        while (ok && i < info.frames.length) {
          val (off, size) = info.frames(i)
          decodeFrame(bytes, info, off, size) match {
            case Some(fr) => acc = f(acc, fr); i += 1
            case None     => ok = false
          }
        }
        if (ok) Some((info.width, info.height, info.frames.length, acc)) else None
      }

    /** Probe individual pixels of SELECTED frames: `pick(w, h, nf)`
      * returns (frameIdx, x, y) triples; only the picked frames decode
      * (one at a time — per-row heap is a single decoded frame, never
      * the whole clip), and each probe yields the first channel byte
      * (gray for DIB-gray content, blue plane otherwise — deterministic
      * either way). Declines on any undecodable picked frame or
      * out-of-range pick — the chain's never-throw contract.
      */
    private[functions] def probePixels(
        bytes: Array[Byte],
        pick: (Int, Int, Int) => Array[(Int, Int, Int)]): Option[(Int, Int, Int, Array[Int])] =
      parse(bytes).flatMap { info =>
        val (w, h, nf) = (info.width, info.height, info.frames.length)
        val picks = pick(w, h, nf)
        if (picks.exists { case (f, x, y) =>
            f < 0 || f >= nf || x < 0 || x >= w || y < 0 || y >= h }) None
        else {
          val out = new Array[Int](picks.length)
          var ok = true
          picks.zipWithIndex.groupBy(_._1._1).toSeq.sortBy(_._1).foreach {
            case (fi, ps) =>
              if (ok) {
                val (off, size) = info.frames(fi)
                decodeFrame(bytes, info, off, size) match {
                  case Some(fr) =>
                    ps.foreach { case ((_, x, y), oi) =>
                      out(oi) = fr((y * w + x) * 3) & 0xff
                    }
                  case None => ok = false
                }
              }
          }
          if (ok) Some((w, h, nf, out)) else None
        }
      }
  }

  /** Deterministic STUB for media with no bound codec — fake dimensions
    * from a byte mix, stable for tests ([[Multimodal.stubDecode]]). Keep
    * it LAST in the chain: it accepts everything.
    */
  object Stub extends MediaDecoder {
    override def meta(bytes: Array[Byte]): Option[(String, Int, Int)] =
      Some(Multimodal.stubDecode(bytes))
  }

  /** Default chain: real image decode, real JDK audio decode, real AVI
    * video decode (raw-DIB + MJPEG), stub for everything else (non-AVI
    * video containers need an external codec — bind one by prepending).
    */
  val default: Seq[MediaDecoder] = Seq(ImageIO, JdkAudio, AviVideo, Stub)
}
