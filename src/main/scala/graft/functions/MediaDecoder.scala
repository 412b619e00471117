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

  /** Deterministic STUB for media with no bound codec — fake dimensions
    * from a byte mix, stable for tests ([[Multimodal.stubDecode]]). Keep
    * it LAST in the chain: it accepts everything.
    */
  object Stub extends MediaDecoder {
    override def meta(bytes: Array[Byte]): Option[(String, Int, Int)] =
      Some(Multimodal.stubDecode(bytes))
  }

  /** Default chain: real image decode, stub for everything else. */
  val default: Seq[MediaDecoder] = Seq(ImageIO, Stub)
}
