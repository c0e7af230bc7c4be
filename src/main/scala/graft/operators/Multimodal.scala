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
