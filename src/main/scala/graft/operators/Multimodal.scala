package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark side is real — schema, partition-preserving batched
  * `mapPartitions` (the Scala analog of `mapInPandas` batches), typed
  * rows, deterministic output. The codec itself is STUBBED (this
  * container has no image/audio libraries): `StubCodec.decode` derives
  * metadata deterministically from the bytes, and is the single point
  * to swap for a real JNI/javax.imageio decoder.
  *
  * Scale notes: binary payloads stay in the executor partition they
  * were read in (no shuffle in decode/resize/feature stages — pure
  * mapPartitions); only the small feature output ever moves.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Int, width: Int, height: Int, n_frames: Int,
      channels: Int, sig: Long)

  /** STUB decoder — deterministic fake standing in for the real codec.
    * Swap this object to integrate javax.imageio / ffmpeg / JNI.
    */
  object StubCodec {
    def decode(m: MediaRow): MediaFeatures = {
      val n = m.media.length
      // ??? real decode goes here — deterministic fake below
      val h64 = m.media.foldLeft(1125899906842597L)((a, b) => 31 * a + b)
      MediaFeatures(
        doc_id = m.doc_id,
        media_type = m.media_type,
        n_bytes = n,
        width = 64 + (n % 1024),
        height = 64 + ((n * 7) % 768),
        n_frames = if (m.media_type == "video") n / 1000 + 1 else 1,
        channels = 3,
        sig = h64)
    }

    /** resize stub: returns the byte budget a real resizer would hit */
    def resizedBytes(f: MediaFeatures, maxSide: Int): Int = {
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      (f.n_bytes * scale * scale).toInt
    }
  }

  /** Real image decode behind a classpath probe — the integration seam
    * the stub documents. javax.imageio ships with the JDK, so IMAGE
    * rows whose bytes actually decode (PNG/JPEG/BMP/GIF) get real
    * width/height/channels; everything else — audio/video (no codecs
    * in this container) and non-decodable payloads (the m01/m02 gates
    * feed UTF-8 text as the opaque binary) — falls through to the
    * deterministic stub, byte-identically to a stub-only build. The
    * probe guards against stripped JREs; swapping in an ffmpeg/JNI
    * codec means adding another `tryDecode` before the fallback.
    */
  object ImageIoCodec {
    private lazy val available: Boolean =
      try {
        Class.forName("javax.imageio.ImageIO")
        // decode from memory: the JDK default spills every payload to
        // a FileCacheImageInputStream temp file — per-row disk I/O on
        // the executor hot path (and a hard failure in containers with
        // an unwritable tmpdir)
        javax.imageio.ImageIO.setUseCache(false)
        true
      }
      catch { case _: Throwable => false }

    private[operators] def tryDecode(m: MediaRow): Option[MediaFeatures] =
      if (!available || m.media_type != "image") None
      else
        try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.media))).map { img =>
          val stub = StubCodec.decode(m) // sig/n_bytes stay codec-independent
          stub.copy(
            width = img.getWidth,
            height = img.getHeight,
            n_frames = 1,
            channels = img.getColorModel.getNumComponents)
        }
        catch { case _: Exception => None }

    def decode(m: MediaRow): MediaFeatures =
      tryDecode(m).orElse(AudioCodec.tryDecode(m))
        .orElse(VideoCodec.tryDecode(m))
        .getOrElse(StubCodec.decode(m))
  }

  /** Real audio METADATA decode behind the same classpath-probe seam:
    * javax.sound.sampled ships with the JDK (like ImageIO), so AUDIO
    * rows whose bytes parse as WAV/AU/AIFF headers get their real frame
    * count, channel count, sample rate, and sample width — header
    * reads only, the PCM payload is never inflated. The fixed
    * MediaFeatures schema carries the audio-specific fields in the
    * geometry slots: `width` = sample rate (Hz), `height` = bits per
    * sample. Non-parseable payloads (the m01/m02 gates feed UTF-8 text)
    * fall through to the deterministic stub byte-identically; a real
    * compressed-codec integration (mp3/ogg) adds another `tryDecode`
    * before the fallback.
    */
  object AudioCodec {
    private lazy val available: Boolean =
      try { Class.forName("javax.sound.sampled.AudioSystem"); true }
      catch { case _: Throwable => false }

    private[operators] def tryDecode(m: MediaRow): Option[MediaFeatures] =
      if (!available || m.media_type != "audio") None
      else
        try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(m.media))
          val fmt = aff.getFormat
          val ns = javax.sound.sampled.AudioSystem.NOT_SPECIFIED
          val stub = StubCodec.decode(m) // sig/n_bytes codec-independent
          Some(stub.copy(
            width =
              if (fmt.getSampleRate > 0) fmt.getSampleRate.toInt
              else stub.width,
            height =
              if (fmt.getSampleSizeInBits != ns) fmt.getSampleSizeInBits
              else stub.height,
            n_frames =
              if (aff.getFrameLength != ns) aff.getFrameLength
              else stub.n_frames,
            channels =
              if (fmt.getChannels != ns) fmt.getChannels
              else stub.channels))
        }
        catch { case _: Exception => None }

    def decode(m: MediaRow): MediaFeatures =
      tryDecode(m).getOrElse(StubCodec.decode(m))
  }

  /** Real video CONTAINER-HEADER metadata — no JDK video codec exists,
    * but the container formats are public byte layouts parseable with
    * zero dependencies: ISO BMFF (MP4/MOV — `tkhd` 16.16-fixed
    * width/height, `stsz` sample_count = frame count) and RIFF AVI
    * (`avih` dwWidth/dwHeight/dwTotalFrames). Header reads only; the
    * coded payload is never touched. Non-parseable payloads (the
    * m01/m02 gates feed UTF-8 text) fall through to the deterministic
    * stub byte-identically; a real ffmpeg/JNI integration adds another
    * `tryDecode` before the fallback.
    */
  object VideoCodec {
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def le32(b: Array[Byte], o: Int): Long =
      ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
        ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    private def cc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "ISO-8859-1")

    // ISO BMFF containers worth descending into for tkhd/stsz
    private val boxDirs = Set("moov", "trak", "mdia", "minf", "stbl")
    private final class Mp4Meta {
      var w = 0; var h = 0; var frames = 0
      def done: Boolean = w > 0 && h > 0 && frames > 0
    }
    private def walkBoxes(b: Array[Byte], from: Int, to: Int,
        m: Mp4Meta, depth: Int): Unit = {
      if (depth > 8) return
      var o = from
      while (o + 8 <= to && !m.done) {
        val sz = be32(b, o)
        val typ = cc(b, o + 4)
        // only plain 32-bit sizes: extended (1) / to-eof (0) boxes are
        // legal MP4 but not worth the complexity on a metadata probe
        if (sz < 8 || o + sz > to) return
        val end = (o + sz).toInt
        typ match {
          case t if boxDirs(t) => walkBoxes(b, o + 8, end, m, depth + 1)
          case "tkhd" =>
            val p = o + 8 // FullBox payload: version(1) flags(3) ...
            val v = b(p) & 0xff
            val (wo, ho) = if (v == 1) (p + 88, p + 92) else (p + 76, p + 80)
            if (ho + 4 <= end) {
              val w = (be32(b, wo) >> 16).toInt // 16.16 fixed
              val h = (be32(b, ho) >> 16).toInt
              // audio/hint tracks carry 0x0 — keep the first video one
              if (w > 0 && h > 0 && m.w == 0) { m.w = w; m.h = h }
            }
          case "stsz" =>
            val p = o + 8
            if (p + 12 <= end && m.frames == 0) {
              val n = be32(b, p + 8).toInt // sample_count
              if (n > 0) m.frames = n
            }
          case _ => ()
        }
        o = end
      }
    }

    private def tryMp4(b: Array[Byte]): Option[(Int, Int, Int)] = {
      // every ISO BMFF file leads with a box whose type is well-known
      if (b.length < 12) return None
      val head = cc(b, 4)
      if (head != "ftyp" && head != "moov" && head != "mdat" &&
          head != "free" && head != "wide") return None
      val m = new Mp4Meta
      walkBoxes(b, 0, b.length, m, 0)
      if (m.w > 0 && m.h > 0) Some((m.w, m.h, math.max(m.frames, 1))) else None
    }

    private def tryAvi(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (b.length < 64 || cc(b, 0) != "RIFF" || cc(b, 8) != "AVI ")
        return None
      // the avih chunk sits inside the first hdrl LIST; a bounded
      // forward scan for its fourcc is robust to padding variations
      var o = 12
      val limit = math.min(b.length - 8, 1024)
      while (o < limit) {
        if (cc(b, o) == "avih") {
          val p = o + 8 // fourcc + chunk size
          if (p + 40 > b.length) return None
          val frames = le32(b, p + 16).toInt
          val w = le32(b, p + 32).toInt
          val h = le32(b, p + 36).toInt
          if (w > 0 && h > 0) return Some((w, h, math.max(frames, 1)))
          return None
        }
        o += 4
      }
      None
    }

    private[operators] def tryDecode(m: MediaRow): Option[MediaFeatures] =
      if (m.media_type != "video") None
      else
        try tryMp4(m.media).orElse(tryAvi(m.media)).map { case (w, h, n) =>
          val stub = StubCodec.decode(m) // sig/n_bytes codec-independent
          stub.copy(width = w, height = h, n_frames = n, channels = 3)
        }
        catch { case _: Exception => None }
  }

  /** documents table → synthetic media table (UTF-8 payload as the
    * opaque binary), exercising the exact schema/partitioning a real
    * media corpus would use.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // deterministic round-robin media type
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("media"))

  /** batched decode / feature extraction — partition-preserving. Real
    * decode where a codec is present and the bytes decode; the stub
    * otherwise (see [[ImageIoCodec]]).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(ImageIoCodec.decode))
  }

  /** frame sampling plan for video rows: every `stride`-th frame */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, media)
      .filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"))
  }
}
