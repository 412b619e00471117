package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One decoded-media row: typed metadata extracted from an opaque blob. */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    format: String,
    width: Int,
    height: Int)

/** A sampled frame/patch: the unit a feature-extraction stage consumes. */
final case class MediaFrame(
    doc_id: Long,
    frame_idx: Int,
    frame_bytes: Array[Byte])

/** Multimodal-column support: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise in `mapPartitions`.
  *
  * IMAGES decode for real through the JDK's `javax.imageio` (PNG, JPEG,
  * GIF, BMP — no external codec needed): [[decodeMeta]] sniffs the magic
  * bytes and returns true dimensions; [[imageStats]] adds decoded-pixel
  * statistics. Audio/video blobs keep the clearly-marked deterministic
  * stub ([[stubDecode]]) — the container ships no FFmpeg — but the
  * Spark-side plumbing is identical either way: the binary column schema,
  * the partition-batched decode loop (one codec init per partition, not
  * per row — the same shape a JNI/FFmpeg decoder needs), the explode to
  * frames, and the downstream feature pipeline contract.
  */
object Multimodal {

  /** Magic-byte sniff: Some(format) when the JDK can decode the blob. */
  def imageFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length < 4) None
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      Some("png")
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff)
      Some("jpeg")
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8')
      Some("gif")
    else if (bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else None

  /** Modality sniff over the magic bytes — the routing step of a mixed
    * media ingest: Some("image" | "audio" | "video") for blobs one of
    * the real decode paths can open, None for junk. AVI is checked
    * before WAVE (both are RIFF containers); the audio forms match
    * [[MediaDecoder.JdkAudio]]'s sniff (RIFF/WAVE, FORM/AIFF, .snd).
    */
  def sniffModality(b: Array[Byte]): Option[String] =
    if (b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') Some("video")
    else if (b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') Some("audio")
    else if (b.length >= 12 &&
      b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F') Some("audio")
    else if (b.length >= 4 &&
      b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') Some("audio")
    else imageFormat(b).map(_ => "image")

  /** Decode failures outside the KNOWN broken-codec shapes, counted per
    * JVM so a systematic bug in the decode path (an NPE / ClassCast from
    * a plugin lookup) is observable instead of silently misclassified as
    * corrupt media. On a cluster each executor counts its own; wire into
    * a metrics sink or accumulator at deployment. The first few are also
    * logged with their stack for diagnosis.
    */
  private val unexpectedDecodeFailures = new java.util.concurrent.atomic.AtomicLong
  def unexpectedDecodeFailureCount: Long = unexpectedDecodeFailures.get

  /** Real image decode (JDK ImageIO). None when the blob is not a
    * decodable image — including one whose magic bytes sniff as an image
    * but whose body is corrupt or truncated (`ImageIO.read` throws
    * `IIOException`/`IOException`, and the JDK codecs throw unchecked
    * `IllegalArgumentException`/`IndexOutOfBoundsException`/
    * `NegativeArraySizeException` on malformed headers) — so callers fall
    * back to [[stubDecode]] and one bad blob never fails a whole
    * partition; corrupt media is routine in a large multimodal ingest.
    * Any OTHER RuntimeException still yields None (robustness) but is
    * counted and sampled to stderr ([[unexpectedDecodeFailureCount]]) —
    * a genuine bug in our own path must not masquerade as corrupt data.
    * Call `ImageIO.setUseCache(false)` once per partition first so decode
    * never touches a disk cache (see [[decodeMeta]]).
    */
  def decodeImage(bytes: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] =
    imageFormat(bytes).flatMap { fmt =>
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map(img => (fmt, img))
      catch {
        case _: java.io.IOException            => None // IIOException incl.
        case _: IllegalArgumentException       => None // malformed header
        case _: IndexOutOfBoundsException      => None // truncated body
        case _: NegativeArraySizeException     => None // bogus dimensions
        case e: RuntimeException =>
          if (unexpectedDecodeFailures.getAndIncrement() < 5)
            e.printStackTrace(System.err)
          None
      }
    }

  /** Grayscale PNG encoder (JDK ImageIO) — the test/fixture twin of
    * [[decodeImage]]: pixel (x, y) = `pix(x, y) & 0xff`.
    */
  def encodeGrayPng(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pix(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, "png", out), "JDK PNG writer unavailable")
    out.toByteArray
  }

  /** Canonical 16-bit mono PCM WAV encoder (hand-rolled 44-byte RIFF
    * header + LE samples — deliberately NOT `AudioSystem`, so an
    * encode→decode round trip exercises two independent implementations
    * of the format; the fixture twin of [[MediaDecoder.JdkAudio]], same
    * role [[encodeGrayPng]] plays for image decode).
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Canonical uncompressed-DIB AVI encoder (hand-rolled RIFF writer —
    * deliberately independent of [[MediaDecoder.AviVideo]]'s parser, so
    * an encode→decode round trip exercises two implementations of the
    * container; the video twin of [[encodeWavPcm16]]/[[encodeGrayPng]]).
    * Each frame is `width*height` top-down row-major GRAY bytes; the
    * encoder expands to the container's bottom-up 4-byte-padded 24-bit
    * BGR rows (B = G = R = gray).
    */
  def encodeAviDib(width: Int, height: Int, frames: Seq[Array[Byte]], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height), "bad frame shape")
    val rowBytes = (width * 3 + 3) & ~3
    val chunks = frames.map { f =>
      val dib = new Array[Byte](rowBytes * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = f(y * width + x)
          val o = (height - 1 - y) * rowBytes + x * 3 // DIB rows bottom-up
          dib(o) = v; dib(o + 1) = v; dib(o + 2) = v
          x += 1
        }
        y += 1
      }
      dib
    }
    writeAvi(width, height, "DIB ", 0, 24, "00db", chunks, fps)
  }

  /** MJPEG-in-AVI encoder: each frame an already-encoded JPEG blob (the
    * common capture container whose frames the JDK can decode). Shares
    * the RIFF writer with [[encodeAviDib]].
    */
  def encodeAviMjpg(width: Int, height: Int, jpegFrames: Seq[Array[Byte]], fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty, "no frames")
    val mjpg = 'M' | ('J' << 8) | ('P' << 16) | ('G' << 24)
    writeAvi(width, height, "MJPG", mjpg, 24, "00dc", jpegFrames, fps)
  }

  /** RIFF/AVI container writer: `hdrl` (avih + one vids strl) + `movi`
    * with one `chunkId` chunk per frame payload.
    */
  private def writeAvi(
      width: Int, height: Int, handler: String, compression: Int, bitCount: Int,
      chunkId: String, frameChunks: Seq[Array[Byte]], fps: Int): Array[Byte] = {
    val bufSize = frameChunks.map(_.length).max
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl' + avih + LIST strl(strh+strf)
    val moviSize = 4 + frameChunks.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
    tag("RIFF"); bb.putInt(riffSize); tag("AVI ")
    tag("LIST"); bb.putInt(hdrlSize); tag("hdrl")
    tag("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps).putInt(bufSize * fps).putInt(0).putInt(0)
    bb.putInt(frameChunks.length).putInt(0).putInt(1).putInt(bufSize)
    bb.putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); bb.putInt(56)
    tag("vids"); tag(handler); bb.putInt(0).putInt(0).putInt(0)
    bb.putInt(1).putInt(fps).putInt(0).putInt(frameChunks.length)
    bb.putInt(bufSize).putInt(-1).putInt(0)
    bb.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    tag("strf"); bb.putInt(40)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(bitCount.toShort)
    bb.putInt(compression).putInt(bufSize).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); bb.putInt(moviSize); tag("movi")
    frameChunks.foreach { f =>
      tag(chunkId); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  /** Decoded-pixel statistics for VIDEO blobs: (id, format, width,
    * height, n_frames, px_sum) with px_sum = Σ over every decoded frame
    * of Σ (byte & 0xff) over its pixel payload — integer-exact for raw-
    * DIB AVI, so a synthesize→encode→decode round trip is
    * oracle-checkable (q120; the video analog of [[imageStats]]/q84 and
    * [[audioStats]]/q109). Non-video blobs (and AVI streams whose codec
    * [[MediaDecoder.AviVideo]] cannot decode) are dropped — strict
    * decode surface. Partition-batched like every extractor here.
    */
  def videoStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          // streaming fold: one decoded frame live at a time; a failed
          // frame aborts and drops the row (all-or-nothing contract)
          MediaDecoder.AviVideo.foldFrames(bytes, 0L) { (sum0, f) =>
            var sum = sum0
            var i = 0
            while (i < f.length) { sum += (f(i) & 0xff); i += 1 }
            sum
          }.map { case (w, h, nf, sum) =>
            (id, "avi", w.toLong, h.toLong, nf.toLong, sum)
          }
        }
      }.toDF(idCol, "format", "width", "height", "n_frames", "px_sum")
  }

  /** Decoded-sample statistics for AUDIO blobs: (id, format, sample_rate,
    * n_frames, amp_sum) with amp_sum = Σ of the decoded signed 16-bit
    * samples — integer-exact, so a WAV encode→decode round trip is
    * oracle-checkable (q109, the audio analog of [[imageStats]]/q84).
    * Non-audio blobs are dropped (strict decode surface). Partition-
    * batched like every extractor here.
    */
  def audioStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaDecoder.JdkAudio.meta(bytes).flatMap { case (fmt, rate, nFrames) =>
            try {
              val raw = javax.sound.sampled.AudioSystem
                .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
              // the JDK decodes AIFF/AU big-endian and WAV can be 8-bit:
              // normalize EVERY stream to signed 16-bit little-endian PCM
              // before summing (AudioSystem conversion), declining streams
              // the JDK can't convert — amp_sum is then format-independent
              // instead of silently byte-swapped for non-16LE inputs
              val f = raw.getFormat
              val target = new javax.sound.sampled.AudioFormat(
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
                f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
                f.getSampleRate, false)
              val in =
                if (f.matches(target)) raw
                else javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
              val pcm = try in.readAllBytes() finally { in.close(); raw.close() }
              var sum = 0L
              var i = 0
              while (i + 1 < pcm.length) { // signed LE 16-bit samples
                sum += ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
                i += 2
              }
              Some((id, fmt, rate.toLong, nFrames.toLong, sum))
            } catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => None
              case _: IllegalArgumentException                          => None
              case _: java.io.IOException                               => None
            }
          }
        }
      }.toDF(idCol, "format", "sample_rate", "n_frames", "amp_sum")
  }

  /** STUB decoder for non-image media: derives metadata deterministically
    * from the blob bytes. Swap for a real codec (FFmpeg) behind the same
    * signature — the Spark plumbing does not change.
    */
  def stubDecode(bytes: Array[Byte]): (String, Int, Int) = {
    val n = bytes.length
    val fmt = (n % 3) match {
      case 0 => "img"; case 1 => "audio"; case _ => "video"
    }
    // fake dimensions from a cheap byte mix — stable for tests
    var h = 17L
    var i = 0
    while (i < math.min(n, 64)) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    val w = math.floorMod(h, 1920L).toInt + 1
    val ht = math.floorMod(h / 1920L, 1080L).toInt + 1
    (fmt, w, ht)
  }

  /** Decode a blob table (doc_id, blob: binary) to typed metadata rows
    * through the [[MediaDecoder]] chain (first match wins; the default
    * chain is real JDK-ImageIO for images, deterministic stub for
    * everything else — bind an FFmpeg-style decoder by prepending it).
    * `mapPartitions` so decoder init is once per partition.
    */
  def decodeMeta(
      df: DataFrame, idCol: String, blobCol: String,
      decoders: Seq[MediaDecoder] = MediaDecoder.default): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        decoders.foreach(_.init())
        it.map { case (id, bytes) =>
          val (fmt, w, h) = decoders.iterator.flatMap(_.meta(bytes)).nextOption()
            .getOrElse(stubDecode(bytes)) // chain exhausted: stub semantics
          MediaMeta(id, bytes.length.toLong, fmt, w, h)
        }
      }
  }

  /** Decoded-pixel statistics for IMAGE blobs: (id, format, width, height,
    * px_sum) with px_sum = Σ over all pixels of the first band's sample —
    * integer-exact, so a PNG encode→decode round trip is oracle-checkable
    * (q84). Non-image blobs are dropped (strict decode surface, unlike
    * [[decodeMeta]]'s stub fallback). Same partition-batched shape as the
    * other extractors.
    */
  def imageStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { case (fmt, img) =>
            val raster = img.getRaster
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            (id, fmt, w.toLong, h.toLong, sum)
          }
        }
      }.toDF(idCol, "format", "width", "height", "px_sum")
  }

  /** Frame sampling: the video → frames explode. A [[MediaDecoder]] in
    * the chain that implements `frames` (a real codec) emits decoded
    * frames; otherwise every `stride`-th fixed-size byte window of the
    * blob becomes a frame row (the default chain's behavior — its
    * decoders all decline `frames`). Output is safe to re-partition for
    * downstream feature extraction.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      frameBytes: Int = 64,
      stride: Int = 4,
      decoders: Seq[MediaDecoder] = MediaDecoder.default): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    // clamp ONCE at the public entry: a non-positive stride/frameBytes
    // would otherwise escape the decoder chain's never-throw contract
    // inside every decoder's `by stride` range (and the fallback's
    // division) — an executor-side IllegalArgumentException from a
    // caller typo, not a data problem
    val st = math.max(1, stride)
    val fb = math.max(1, frameBytes)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        decoders.foreach(_.init())
        it.flatMap { case (id, bytes) =>
          decoders.iterator.flatMap(_.frames(bytes, fb, st)).nextOption() match {
            case Some(fs) => fs.map { case (i, b) => MediaFrame(id, i, b) }
            case None =>
              val nFrames = bytes.length / fb
              (0 until nFrames by st).iterator.map { f =>
                MediaFrame(id, f,
                  java.util.Arrays.copyOfRange(bytes, f * fb, (f + 1) * fb))
              }
          }
        }
      }
  }

  /** Resize/downsample stage: keep every `factor`-th byte of each frame
    * (with a real codec this is the pixel-resample; the partition-batched
    * shape — frames in, smaller frames out, no shuffle — is what matters).
    */
  def resizeFrames(frames: Dataset[MediaFrame], factor: Int = 2): Dataset[MediaFrame] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { it =>
      it.map { f =>
        val out = Array.ofDim[Byte]((f.frame_bytes.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = f.frame_bytes(i * factor); i += 1 }
        MediaFrame(f.doc_id, f.frame_idx, out)
      }
    }
  }

  /** Feature extraction over sampled frames: a byte-value histogram per
    * frame (`bins` buckets over 0..255), emitted as (doc_id, frame_idx,
    * bin, n) rows — the batch-imperative extractor stage of a multimodal
    * pipeline. The histogram is a real, deterministic feature (not a
    * stub), and the `mapPartitions` shape — one extractor/model handle
    * per partition, a reused scratch buffer, frames streamed through —
    * is exactly where an ONNX/JNI embedding model slots in behind the
    * same signature. Only non-empty bins are emitted, so output size is
    * bounded by occupied buckets, not `bins`.
    */
  def extractFeatures(frames: Dataset[MediaFrame], bins: Int = 16): DataFrame = {
    require(256 % bins == 0, s"bins $bins must divide 256")
    val spark = frames.sparkSession
    import spark.implicits._
    val width = 256 / bins
    frames.mapPartitions { it =>
      // model/extractor init would happen HERE, once per partition; the
      // scratch histogram is reused across frames (strict per-frame
      // materialization below, so reuse is safe)
      val hist = new Array[Long](bins)
      it.flatMap { f =>
        java.util.Arrays.fill(hist, 0L)
        var i = 0
        while (i < f.frame_bytes.length) {
          hist((f.frame_bytes(i) & 0xff) / width) += 1
          i += 1
        }
        (0 until bins).withFilter(hist(_) > 0)
          .map(b => (f.doc_id, f.frame_idx, b, hist(b))).toVector
      }
    }.toDF("doc_id", "frame_idx", "bin", "n")
  }

  /** Column-only metadata (no decode): blob length and a format tag by
    * length mod — the part of [[decodeMeta]] that stays in codegen, used
    * by the oracle-checked query.
    */
  def blobMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(blobCol)).cast("long").as("n_bytes"),
      when(length(col(blobCol)) % 3 === 0, "img")
        .when(length(col(blobCol)) % 3 === 1, "audio")
        .otherwise("video").as("format"))

  /** Perceptual difference-hash (dHash) of IMAGE blobs through the REAL
    * decode path ([[decodeImage]] — q84's strict surface; non-image
    * blobs drop): the decoded first band is sampled on a fixed 9×8
    * nearest-neighbor grid — `sx(i) = i·w div 9`, `sy(j) = j·h div 8`,
    * pure integer math so the oracle can replay the sampling
    * relationally from the fixture's pixel formula — and each of the 64
    * bits is `sample(i+1, j) > sample(i, j)`. The hash is emitted as 8
    * row-BANDS of 8 bits (`bands[j] = Σ_i bit(i,j) << i`, each in
    * [0, 255]) rather than one 64-bit word: the banded layout is what
    * the near-dup join keys on (the simhash/LSH banding discipline), and
    * it keeps every value unsigned-small in both engines.
    *
    * Output: (id, width, height, bands array<long>[8]). Decode is
    * `mapPartitions` (one codec init per partition, no disk cache);
    * everything downstream is columnar.
    */
  def imageDHash(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // bytes-weighted fan-out (no-op when the source is already wide):
    // decode cost tracks blob BYTES, so a low-split source of skewed
    // blob sizes must split by cumulative bytes, not row count
    Par.fanOut(df.select(col(idCol).cast("long"), col(blobCol)),
        length(col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { case (_, img) =>
            val raster = img.getRaster
            val (w, h) = (img.getWidth, img.getHeight)
            val grid = Array.ofDim[Int](8, 9)
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 9) {
                grid(j)(i) = raster.getSample(i * w / 9, j * h / 8, 0)
                i += 1
              }
              j += 1
            }
            val bands = new Array[Long](8)
            j = 0
            while (j < 8) {
              var v = 0L
              var i = 0
              while (i < 8) {
                if (grid(j)(i + 1) > grid(j)(i)) v |= (1L << i)
                i += 1
              }
              bands(j) = v
              j += 1
            }
            (id, w.toLong, h.toLong, bands)
          }
        }
      }.toDF(idCol, "width", "height", "bands")
  }

  /** Image near-duplicate pairs by banded dHash — multimodal dedup for
    * a vision-training corpus: two images are candidates iff at least
    * one of their `numBands` hash bands matches exactly (exact — no
    * false negatives — by pigeonhole whenever `maxHamming < numBands`),
    * and a candidate is a near-dup iff the full 64-bit Hamming distance
    * `Σ_j bit_count(a.bands[j] xor b.bands[j]) ≤ maxHamming`.
    *
    * Plan: [[bandedHammingPairs]] — a (band_idx, band_val) self
    * equi-join with corpus-cardinality 16-bit-band keys (the q32/q49
    * banding shape applied to images; see the engine's scaladoc for the
    * band-width/candidate-volume math), pair dedup through a compact
    * (id, id)-keyed aggregate, codegen Hamming verify with no second
    * join. Decode happens once per image in [[imageDHash]]'s map stage.
    */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      maxHamming: Int = 3,
      numBands: Int = 4): DataFrame =
    bandedHammingPairs(
      imageDHash(df, idCol, blobCol).select(col(idCol).as("id"), col("bands")),
      maxHamming, numBands)

  /** Shared banded-Hamming candidate join + exact verify over any
    * 8×8-bit banded hash frame (id, bands array<long>[8]) — the engine
    * under [[imageNearDupPairs]] and [[audioNearDupPairs]].
    *
    * The 64 hash bits regroup into `numBands` join bands of `64/numBands`
    * bits (adjacent 8-bit rows packed little-endian). Pigeonhole makes
    * the (band_idx, band_val) equi-join EXACT — zero false negatives —
    * whenever `maxHamming < numBands`: a pair within maxHamming can't
    * put a differing bit in every band. The band width is the scale
    * knob: 4 bands of 16 bits give a 65536-value bucket space per band,
    * so candidate volume on an N-item corpus with d-duplicate cliques is
    * ~4·(N²/65536 + Σd²) — linear until N approaches millions per
    * executor-reachable bucket space (8 bands of 8 bits would be N²/32:
    * quadratic at any interesting N; that's why maxHamming > 7 isn't a
    * supported regime on a 64-bit hash).
    *
    * Verification never joins again: both 8-row band arrays ride the
    * candidate join, pairs dedup through a (id_a, id_b)-keyed aggregate
    * (`first` over the functionally-dependent arrays — narrower shuffle
    * keys than a 4-column distinct, and a barrier Catalyst cannot push
    * the Hamming filter below, keeping it OUT of the join's bound
    * condition), and the full 64-bit Hamming distance is an unrolled
    * codegen `bit_count(xor)` sum — no interpreted higher-order
    * functions anywhere on the hot path.
    */
  private def requireBanding(maxHamming: Int, numBands: Int): Unit = {
    require(Set(1, 2, 4, 8)(numBands), "numBands must be 1, 2, 4, or 8")
    require(maxHamming >= 0 && maxHamming < numBands,
      s"banding is exact only for maxHamming < numBands ($maxHamming >= $numBands)")
  }

  /** The `numBands` join-band values of an 8×8-bit `bands` column:
    * adjacent 8-bit rows packed little-endian into 64/numBands-bit
    * values — the writer, the self-join and the index probe all band
    * with this one expression, so a batch's band keys always land in
    * the buckets the index wrote. */
  private def joinBandsExpr(numBands: Int) = {
    val w = 8 / numBands
    array((0 until numBands).map { j =>
      (0 until w).map { t =>
        shiftleft(element_at(col("bands"), j * w + t + 1), 8 * t)
      }.reduce(_ + _)
    }: _*)
  }

  /** Unrolled codegen 64-bit Hamming distance between band arrays `a`
    * and `b` — no interpreted higher-order functions. */
  private def hammingExpr(a: String, b: String) =
    (1 to 8).map { t =>
      expr(s"bit_count(element_at($a, $t) ^ element_at($b, $t))")
    }.reduce(_ + _)

  private[graft] def bandedHammingPairs(
      hashed: DataFrame, maxHamming: Int, numBands: Int): DataFrame = {
    requireBanding(maxHamming, numBands)
    val joinBands = joinBandsExpr(numBands)
    val e = hashed.select(col("id"), col("bands"),
      posexplode(joinBands).as(Seq("b_idx", "b_val")))
    val cand = e.as("a").join(e.as("b"),
        col("a.b_idx") === col("b.b_idx") &&
          col("a.b_val") === col("b.b_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.bands").as("ba"), col("b.bands").as("bb"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("ba")).as("ba"), first(col("bb")).as("bb"))
    cand
      .select(col("id_a"), col("id_b"),
        hammingExpr("ba", "bb").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Band-key bucket column — writer and probe compute it with the same
    * hash, so a batch's distinct `bk` values select exactly the index
    * partitions its band keys could live in (the `Dedup.bandBucket`
    * discipline for media fingerprints). */
  private def fpBucket(buckets: Int) =
    pmod(hash(col("b_idx"), col("b_val")), lit(buckets))

  /** Materialize a persistent banded-fingerprint index over any hashed
    * media frame (id, bands array<long>[8]) — the standing state of a
    * continuously-fed MULTIMODAL dedup pipeline (the media analog of
    * `Dedup.writeSignatureIndex`). Two tables under `path`:
    *
    *  - `bands/`, partitioned by `bk` = hash bucket of the (b_idx,
    *    b_val) band key — a probing batch prunes to its own bucket
    *    footprint at the directory level;
    *  - `hashes/` — the full 8-row band arrays for exact Hamming
    *    verification of candidates.
    *
    * `hashes/` is written BEFORE `bands/` (same crash-ordering argument
    * as the signature index: orphan verification rows are harmless,
    * band rows whose hashes are missing would silently drop candidates
    * in the verify inner join).
    *
    * `buckets = 0` (the default) sizes the bucket count from the index
    * itself ([[IndexMeta.adaptiveBuckets]] over the band-row count,
    * ~256 Ki rows/bucket, floor 64 — fixed 64 stops pruning once every
    * batch's footprint covers all 64 directories) and records it in
    * `<path>/buckets.json` for the append/probe paths. The count is
    * taken from the just-written `hashes/` table, NOT the input frame —
    * `hashed` is usually a decode pipeline, and counting it would run
    * every codec twice.
    */
  def writeFingerprintIndex(
      hashed: DataFrame,
      path: String,
      numBands: Int = 4,
      buckets: Int = 0,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite): Unit = {
    requireBanding(0, numBands)
    val spark = hashed.sparkSession
    // the band count is part of the key derivation — recorded indexes
    // refuse an APPEND under a different value; a REBUILD (Overwrite)
    // replaces both tables and rewrites the meta, so it may change it
    if (mode == org.apache.spark.sql.SaveMode.Append) {
      IndexMeta.requireParam(spark, path, "bands", numBands)
      IndexMeta.validated(spark, path, buckets, "bands", "bk")
    }
    hashed.select(col("id"), col("bands"))
      .write.mode(mode).parquet(s"$path/hashes")
    val b =
      if (mode == org.apache.spark.sql.SaveMode.Append)
        IndexMeta.resolveAndRecord(spark, path, buckets, Map("bands" -> numBands))
      else if (buckets > 0) buckets
      else {
        val n = spark.read.parquet(s"$path/hashes").count()
        IndexMeta.adaptiveBuckets(n * numBands)
      }
    hashed.select(col("id"),
        posexplode(joinBandsExpr(numBands)).as(Seq("b_idx", "b_val")))
      .withColumn("bk", fpBucket(b))
      .write.mode(mode).partitionBy("bk").parquet(s"$path/bands")
    // meta LAST on a rebuild (the Dedup.writeIndexTables argument): a
    // crash after re-partitioning bands/ under a grown modulus leaves
    // directories >= the stale count — probes detect and refuse rather
    // than silently pruning matches away
    if (mode != org.apache.spark.sql.SaveMode.Append)
      IndexMeta.write(spark, path, b, Map("bands" -> numBands))
  }

  /** Grow a standing [[writeFingerprintIndex]] by an ingested batch —
    * O(batch) on both tables, existing partitions never rewritten.
    * `buckets = 0` (default) follows the count recorded at build time. */
  def appendFingerprintIndex(
      hashed: DataFrame,
      path: String,
      numBands: Int = 4,
      buckets: Int = 0): Unit =
    writeFingerprintIndex(hashed, path, numBands, buckets,
      org.apache.spark.sql.SaveMode.Append)

  /** Incremental media near-dup against a materialized
    * [[writeFingerprintIndex]]: hashes ONLY the new batch, probes the
    * index's band table with partition pruning on the batch's bucket
    * footprint (≤ `buckets` ints, driver-bounded by construction — the
    * isin reaches the scan as a partition filter), and Hamming-verifies
    * candidates against the index's stored `hashes/` arrays semi-joined
    * down to the candidates — the per-batch cost a deployment pays once
    * the fingerprint index stands. Output: (id_new, id_old, hamming).
    *
    * Self-matches are EXCLUDED (`id_new =!= id_old` in the candidate
    * join): a batch doc whose own fingerprint is already indexed — an
    * at-least-once replay after [[appendFingerprintIndex]], or an
    * accidental re-ingest — would otherwise report itself as a
    * hamming-0 near-dup of itself, which downstream resolution would
    * read as "drop the doc". Re-probed docs therefore see only their
    * GENUINE neighbors, same verdicts as the first run.
    */
  def nearDupAgainstFingerprintIndex(
      batchHashed: DataFrame,
      indexPath: String,
      maxHamming: Int = 3,
      numBands: Int = 4,
      buckets: Int = 0): DataFrame =
    nearDupAgainstFingerprintIndexImpl(
      batchHashed, indexPath, maxHamming, numBands, buckets,
      materialize = true)

  /** [[nearDupAgainstFingerprintIndex]] with stage materialization
    * switchable — `materialize = false` keeps everything lazy in ONE
    * returned plan so PlanContractSpec can assert the pruned-scan shape
    * of the subtrees production checkpoints (the
    * [[Dedup.nearDupAgainstIndexedImpl]] pattern). */
  private[graft] def nearDupAgainstFingerprintIndexImpl(
      batchHashed: DataFrame,
      indexPath: String,
      maxHamming: Int,
      numBands: Int,
      buckets: Int,
      materialize: Boolean): DataFrame = {
    def mat(df: DataFrame): DataFrame =
      if (materialize) Stages.mat(df) else df
    requireBanding(maxHamming, numBands)
    val spark = batchHashed.sparkSession
    IndexMeta.requireParam(spark, indexPath, "bands", numBands)
    // Materialize the batch's band rows ONCE (eager localCheckpoint,
    // ContextCleaner-released): `batchHashed` is usually a media DECODE
    // pipeline (ImageIO / AudioSystem / AVI walk per blob), and without
    // this the bucket-footprint collect below — a separate job — decoded
    // every blob a second time before the probe plan decoded it again.
    // 4 compact rows per item (band key + the 8-long hash array), so the
    // checkpoint is batch-sized.
    val a = mat(batchHashed.select(col("id"), col("bands"),
        posexplode(joinBandsExpr(numBands)).as(Seq("b_idx", "b_val")))
      .withColumn("bk",
        fpBucket(IndexMeta.validated(spark, indexPath, buckets, "bands", "bk"))))
    val bks = a.select(col("bk")).distinct().collect().map(_.getInt(0)).toSeq
    // explicit schemas: an index seeded from an EMPTY frame (a streaming
    // deployment's cold start) has zero data files, which would fail
    // schema inference — same contract as Dedup.exactDupsAgainstIndexed.
    // The id type follows the BATCH (the public wrappers accept any
    // idCol — hard-coding long here would fail probes of indexes built
    // with e.g. int or string ids on a parquet type mismatch)
    import org.apache.spark.sql.types._
    val idType = batchHashed.schema("id").dataType
    val bandsSchema = StructType(Seq(
      StructField("id", idType), StructField("b_idx", IntegerType),
      StructField("b_val", LongType), StructField("bk", IntegerType)))
    val hashesSchema = StructType(Seq(
      StructField("id", idType),
      StructField("bands", ArrayType(LongType))))
    val idxBands = spark.read.schema(bandsSchema).parquet(s"$indexPath/bands")
      .where(col("bk").isin(bks: _*))
      .select(col("id").as("id_old"), col("b_idx"), col("b_val"))
    // candidates are consumed twice (the hashes semi-join + the verify
    // join) and the band join has no reusable shuffle exchange (broadcast
    // batch onto the pruned scan) — materialize once, candidate-bounded
    val cand = mat(a
      .select(col("id").as("id_new"), col("bands").as("ba"),
        col("b_idx"), col("b_val"))
      .join(idxBands, Seq("b_idx", "b_val"))
      .where(col("id_new") =!= col("id_old"))
      .groupBy(col("id_new"), col("id_old"))
      .agg(first(col("ba")).as("ba")))
    val idxHashes = spark.read.schema(hashesSchema).parquet(s"$indexPath/hashes")
      .join(cand.select(col("id_old").as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id").as("id_old"), col("bands").as("bb"))
    cand.join(idxHashes, "id_old")
      .select(col("id_new"), col("id_old"),
        hammingExpr("ba", "bb").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Spatio-temporal fingerprint of VIDEO blobs through the REAL AVI
    * decode path ([[MediaDecoder.AviVideo]] — q120's strict surface;
    * non-video blobs drop): 8 temporally-sampled frames
    * (`t(j) = j·nf div 8` — short clips repeat frames rather than drop)
    * × 9 spatial probes along the middle row
    * (`x(i) = i·w div 9`, `y = h div 2`), pure integer geometry so the
    * oracle can replay the sampling relationally; the 64 bits are the
    * per-frame horizontal gradient `P(j, i+1) > P(j, i)` — [[imageDHash]]
    * per sampled frame, one 8-bit band per frame. Only the ≤8 picked
    * frames decode, one at a time (never the whole clip in memory).
    *
    * Output: (id, width, height, n_frames, bands array<long>[8]).
    */
  def videoFingerprint(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // bytes-weighted fan-out — the imageDHash rationale
    Par.fanOut(df.select(col(idCol).cast("long"), col(blobCol)),
        length(col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          MediaDecoder.AviVideo.probePixels(bytes, (w, h, nf) =>
            Array.tabulate(72) { k =>
              val j = k / 9; val i = k % 9
              (j * nf / 8, i * w / 9, h / 2)
            }
          ).map { case (w, h, nf, p) =>
            val bands = new Array[Long](8)
            var j = 0
            while (j < 8) {
              var v = 0L
              var i = 0
              while (i < 8) {
                if (p(9 * j + i + 1) > p(9 * j + i)) v |= (1L << i)
                i += 1
              }
              bands(j) = v
              j += 1
            }
            (id, w.toLong, h.toLong, nf.toLong, bands)
          }
        }
      }.toDF(idCol, "width", "height", "n_frames", "bands")
  }

  /** Video near-duplicate pairs — the fourth modality leg (text LSH /
    * image dHash / audio energy-gradient / video spatio-temporal
    * gradient), same [[bandedHammingPairs]] engine: 16-bit band
    * candidates, pigeonhole-exact at maxHamming < numBands, codegen
    * Hamming verify. Decode touches only the 8 sampled frames per clip,
    * once, in [[videoFingerprint]]'s map stage.
    */
  def videoNearDupPairs(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      maxHamming: Int = 3,
      numBands: Int = 4): DataFrame =
    bandedHammingPairs(
      videoFingerprint(df, idCol, blobCol)
        .select(col(idCol).as("id"), col("bands")),
      maxHamming, numBands)

  /** [[writeFingerprintIndex]] fed by the image dHash path. */
  def writeImageFingerprintIndex(
      df: DataFrame, idCol: String, blobCol: String, path: String,
      numBands: Int = 4, buckets: Int = 0): Unit =
    writeFingerprintIndex(
      imageDHash(df, idCol, blobCol).select(col(idCol).as("id"), col("bands")),
      path, numBands, buckets)

  /** Incremental image near-dup: decode + hash ONLY the batch, probe the
    * standing index ([[nearDupAgainstFingerprintIndex]]). */
  def imageNearDupAgainstIndex(
      df: DataFrame, idCol: String, blobCol: String, indexPath: String,
      maxHamming: Int = 3, numBands: Int = 4, buckets: Int = 0): DataFrame =
    nearDupAgainstFingerprintIndex(
      imageDHash(df, idCol, blobCol).select(col(idCol).as("id"), col("bands")),
      indexPath, maxHamming, numBands, buckets)

  /** [[writeFingerprintIndex]] fed by the video spatio-temporal path —
    * the fourth modality's standing index (decode cost is paid once at
    * build; each ingest batch decodes only its own clips). */
  def writeVideoFingerprintIndex(
      df: DataFrame, idCol: String, blobCol: String, path: String,
      numBands: Int = 4, buckets: Int = 0): Unit =
    writeFingerprintIndex(
      videoFingerprint(df, idCol, blobCol).select(col(idCol).as("id"), col("bands")),
      path, numBands, buckets)

  /** Incremental video near-dup against a standing fingerprint index:
    * decode + fingerprint ONLY the batch's clips (8 sampled frames
    * each), probe the index's band table bucket-pruned, Hamming-verify
    * against stored arrays — the steady-state per-batch path for the
    * video modality ([[nearDupAgainstFingerprintIndex]]). */
  def videoNearDupAgainstIndex(
      df: DataFrame, idCol: String, blobCol: String, indexPath: String,
      maxHamming: Int = 3, numBands: Int = 4, buckets: Int = 0): DataFrame =
    nearDupAgainstFingerprintIndex(
      videoFingerprint(df, idCol, blobCol).select(col(idCol).as("id"), col("bands")),
      indexPath, maxHamming, numBands, buckets)

  /** [[writeFingerprintIndex]] fed by the audio fingerprint path. */
  def writeAudioFingerprintIndex(
      df: DataFrame, idCol: String, blobCol: String, path: String,
      numBands: Int = 4, buckets: Int = 0): Unit =
    writeFingerprintIndex(
      audioFingerprint(df, idCol, blobCol).select(col(idCol).as("id"), col("bands")),
      path, numBands, buckets)

  /** Incremental audio near-dup against a standing fingerprint index. */
  def audioNearDupAgainstIndex(
      df: DataFrame, idCol: String, blobCol: String, indexPath: String,
      maxHamming: Int = 3, numBands: Int = 4, buckets: Int = 0): DataFrame =
    nearDupAgainstFingerprintIndex(
      audioFingerprint(df, idCol, blobCol).select(col(idCol).as("id"), col("bands")),
      indexPath, maxHamming, numBands, buckets)

  /** Acoustic fingerprint of AUDIO blobs through the REAL decode path
    * ([[MediaDecoder.JdkAudio.pcm16]] — the q109 strict surface;
    * non-audio / non-PCM16 blobs drop): channel-0 samples are cut into
    * 72 integer slices (`slice s = samples[s·n div 72, (s+1)·n div 72)`,
    * pure integer bounds so the oracle can replay the windowing
    * relationally), each slice's energy is `Σ|sample| div count`, and
    * the 64 fingerprint bits are the energy GRADIENT `e(9j+i+1) >
    * e(9j+i)` — time-domain dHash, the audio twin of [[imageDHash]]'s
    * spatial gradient. Emitted as 8 bands of 8 bits for the banded
    * near-dup join. Clips shorter than 72 samples drop (no slice may be
    * empty).
    *
    * Output: (id, sample_rate, n_samples, bands array<long>[8]).
    */
  def audioFingerprint(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // bytes-weighted fan-out — the imageDHash rationale
    Par.fanOut(df.select(col(idCol).cast("long"), col(blobCol)),
        length(col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaDecoder.JdkAudio.pcm16(bytes).flatMap { case (rate, samples) =>
            val n = samples.length
            if (n < 72) None
            else {
              val e = new Array[Long](72)
              var s = 0
              while (s < 72) {
                val lo = s.toLong * n / 72
                val hi = (s + 1).toLong * n / 72
                var sum = 0L
                var k = lo
                while (k < hi) {
                  sum += math.abs(samples(k.toInt).toLong); k += 1
                }
                e(s) = sum / (hi - lo)
                s += 1
              }
              val bands = new Array[Long](8)
              var j = 0
              while (j < 8) {
                var v = 0L
                var i = 0
                while (i < 8) {
                  if (e(9 * j + i + 1) > e(9 * j + i)) v |= (1L << i)
                  i += 1
                }
                bands(j) = v
                j += 1
              }
              Some((id, rate.toLong, n.toLong, bands))
            }
          }
        }
      }.toDF(idCol, "sample_rate", "n_samples", "bands")
  }

  /** Audio near-duplicate pairs by banded acoustic fingerprint — the
    * audio leg of the multimodal dedup triad ([[imageNearDupPairs]] for
    * images, `Dedup`/LSH for text): candidates iff ≥1 of the `numBands`
    * fingerprint bands matches exactly (pigeonhole-exact whenever
    * `maxHamming < numBands`), verified by the full 64-bit Hamming
    * distance. Decode runs once per clip in [[audioFingerprint]]'s map
    * stage; the join/verify plan is [[bandedHammingPairs]]'s.
    */
  def audioNearDupPairs(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      maxHamming: Int = 3,
      numBands: Int = 4): DataFrame =
    bandedHammingPairs(
      audioFingerprint(df, idCol, blobCol)
        .select(col(idCol).as("id"), col("bands")),
      maxHamming, numBands)
}
