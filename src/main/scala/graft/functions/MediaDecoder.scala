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
  }

  /** Deterministic STUB for media with no bound codec — fake dimensions
    * from a byte mix, stable for tests ([[Multimodal.stubDecode]]). Keep
    * it LAST in the chain: it accepts everything.
    */
  object Stub extends MediaDecoder {
    override def meta(bytes: Array[Byte]): Option[(String, Int, Int)] =
      Some(Multimodal.stubDecode(bytes))
  }

  /** Default chain: real image decode, real JDK audio decode, stub for
    * everything else (video stays stubbed: the JDK ships no video codec).
    */
  val default: Seq[MediaDecoder] = Seq(ImageIO, JdkAudio, Stub)
}
