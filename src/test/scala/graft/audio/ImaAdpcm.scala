package graft.audio

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, FormatConversionProvider}

/** Test-scope REAL compressed-audio SPI for the `javax.sound` seam
  * that [[graft.operators.Multimodal.pcmFeatures]] converts through:
  * IMA/DVI ADPCM in WAV (format tag 0x11 — the classic 4:1 compressed
  * telephony/game codec, IMA "Recommended Practices for Enhancing
  * Digital Audio Compatibility", 1992). A stock JVM reads PCM/A-law/
  * µ-law WAVs only, so an ADPCM WAV exercises exactly what an MP3/OGG
  * SPI would in production: AudioSystem discovers the file reader,
  * `isConversionSupported` finds the format converter, the stream
  * decodes through it, and the decode-twice determinism fence runs
  * against a real codec instead of canceling. Registered only on the
  * TEST classpath (META-INF/services); main-scope builds are
  * byte-identical to an SPI-free JVM.
  *
  * The codec itself is the published IMA algorithm: 4-bit codes, the
  * canonical 89-entry step table, index adjustments
  * {-1,-1,-1,-1,2,4,6,8}, block header (int16 predictor, uint8 step
  * index, reserved byte), low nibble first.
  */
object ImaAdpcm {
  val Encoding = new AudioFormat.Encoding("IMA_ADPCM")

  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampS16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v
  private def clampIdx(v: Int): Int = if (v < 0) 0 else if (v > 88) 88 else v

  /** (nextPredictor, nextIndex) after decoding one 4-bit code */
  def step(code: Int, pred: Int, idx: Int): (Int, Int) = {
    val s = StepTable(idx)
    var diff = s >> 3
    if ((code & 4) != 0) diff += s
    if ((code & 2) != 0) diff += s >> 1
    if ((code & 1) != 0) diff += s >> 2
    val p = clampS16(if ((code & 8) != 0) pred - diff else pred + diff)
    (p, clampIdx(idx + IndexTable(code & 7)))
  }

  /** encode one sample against the current state -> (code, next state) */
  private def encodeStep(sample: Int, pred: Int, idx: Int): (Int, Int, Int) = {
    val s = StepTable(idx)
    var diff = sample - pred
    var code = if (diff < 0) { diff = -diff; 8 } else 0
    if (diff >= s) { code |= 4; diff -= s }
    if (diff >= (s >> 1)) { code |= 2; diff -= s >> 1 }
    if (diff >= (s >> 2)) code |= 1
    val (p, i) = step(code, pred, idx)
    (code, p, i)
  }

  /** mono single-block encode: sample 0 rides in the header, the
    * remaining (odd-count-enforced) samples pack two codes per byte,
    * low nibble first — so require an ODD total sample count
    */
  def encodeBlock(samples: Array[Short]): Array[Byte] = {
    require(samples.length >= 1 && (samples.length - 1) % 2 == 0,
      "one header sample + an even number of coded samples")
    var pred: Int = samples(0)
    var idx = 0
    val data = new Array[Byte](4 + (samples.length - 1) / 2)
    data(0) = (pred & 0xff).toByte
    data(1) = ((pred >> 8) & 0xff).toByte
    data(2) = idx.toByte
    data(3) = 0
    var i = 1
    while (i < samples.length) {
      val (c1, p1, i1) = encodeStep(samples(i), pred, idx)
      val (c2, p2, i2) = encodeStep(samples(i + 1), p1, i1)
      pred = p2; idx = i2
      data(4 + (i - 1) / 2) = ((c2 << 4) | c1).toByte
      i += 2
    }
    data
  }

  /** reference block decode (the spec checks the SPI's output against
    * this, sample for sample)
    */
  def decodeBlock(block: Array[Byte]): Array[Short] = {
    require(block.length >= 4)
    var pred = ((block(1) << 8) | (block(0) & 0xff)).toShort.toInt
    var idx = clampIdx(block(2) & 0xff)
    val out = new Array[Short](1 + (block.length - 4) * 2)
    out(0) = pred.toShort
    var o = 1
    var i = 4
    while (i < block.length) {
      val b = block(i) & 0xff
      val (p1, i1) = step(b & 0xf, pred, idx)
      out(o) = p1.toShort
      val (p2, i2) = step(b >> 4, p1, i1)
      out(o + 1) = p2.toShort
      pred = p2; idx = i2
      o += 2; i += 1
    }
    out
  }

  /** a complete mono fmt-0x11 WAV holding `samples` in one block */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val block = encodeBlock(samples)
    val blockAlign = block.length
    val samplesPerBlock = 1 + (blockAlign - 4) * 2
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def tag(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    tag("RIFF"); le32(4 + 8 + 20 + 8 + 4 + 8 + blockAlign); tag("WAVE")
    tag("fmt "); le32(20)
    le16(0x11) // wFormatTag = IMA ADPCM
    le16(1) // channels
    le32(sampleRate)
    le32(sampleRate * blockAlign / samplesPerBlock) // avg bytes/sec
    le16(blockAlign)
    le16(4) // bits per (coded) sample
    le16(2) // cbSize
    le16(samplesPerBlock)
    tag("fact"); le32(4); le32(samples.length)
    tag("data"); le32(blockAlign)
    bos.write(block)
    bos.toByteArray
  }

  /** parse (sampleRate, blockAlign, samplesPerBlock, data) from a
    * fmt-0x11 mono WAV; None when the payload is anything else
    */
  private[audio] def parseWav(b: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
    def four(o: Int): String = new String(b, o, 4, "ISO-8859-1")
    if (b.length < 12 || four(0) != "RIFF" || four(8) != "WAVE") return None
    var o = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[Array[Byte]] = None
    while (o + 8 <= b.length) {
      val id = four(o); val sz = le32(o + 4)
      if (sz < 0 || o + 8 + sz > b.length) return None
      if (id == "fmt " && sz >= 16) {
        if (le16(o + 8) != 0x11 || le16(o + 10) != 1) return None
        val spb = if (sz >= 20) le16(o + 26)
          else 1 + (le16(o + 20) - 4) * 2
        fmt = Some((le32(o + 12), le16(o + 20), spb))
      } else if (id == "data")
        data = Some(java.util.Arrays.copyOfRange(b, o + 8, o + 8 + sz))
      o += 8 + sz + (sz & 1)
    }
    for ((rate, ba, spb) <- fmt; d <- data) yield (rate, ba, spb, d)
  }

  private[audio] def format(rate: Int, blockAlign: Int, spb: Int)
      : AudioFormat =
    new AudioFormat(Encoding, rate.toFloat, 4, 1, blockAlign,
      rate.toFloat / spb, false)
}

/** AudioSystem SPI: recognizes fmt-0x11 mono WAVs, rejects everything
  * else with the standard reset+throw so the JDK's own readers keep
  * serving PCM/A-law/µ-law payloads untouched
  */
class AdpcmWavFileReader extends AudioFileReader {
  private def read(stream: java.io.InputStream)
      : (AudioFileFormat, Array[Byte]) = {
    stream.mark(1 << 26)
    val bytes = stream.readAllBytes()
    ImaAdpcm.parseWav(bytes) match {
      case None =>
        stream.reset()
        throw new UnsupportedAudioFileException("not an IMA ADPCM WAV")
      case Some((rate, ba, spb, data)) =>
        val fmt = ImaAdpcm.format(rate, ba, spb)
        (new AudioFileFormat(AudioFileFormat.Type.WAVE, fmt,
          data.length / ba), data)
    }
  }
  override def getAudioFileFormat(stream: java.io.InputStream)
      : AudioFileFormat = {
    val (aff, _) = read(stream)
    stream.reset() // file-format probe must not consume the stream
    aff
  }
  override def getAudioInputStream(stream: java.io.InputStream)
      : AudioInputStream = {
    val (aff, data) = read(stream)
    new AudioInputStream(new java.io.ByteArrayInputStream(data),
      aff.getFormat, aff.getFrameLength.toLong)
  }
  override def getAudioFileFormat(url: java.net.URL): AudioFileFormat =
    getAudioFileFormat(new java.io.BufferedInputStream(url.openStream()))
  override def getAudioInputStream(url: java.net.URL): AudioInputStream =
    getAudioInputStream(new java.io.BufferedInputStream(url.openStream()))
  override def getAudioFileFormat(file: java.io.File): AudioFileFormat =
    getAudioFileFormat(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file)))
  override def getAudioInputStream(file: java.io.File): AudioInputStream =
    getAudioInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file)))
}

/** AudioSystem SPI: IMA_ADPCM -> 16-bit signed little-endian PCM */
class AdpcmToPcmProvider extends FormatConversionProvider {
  private def pcmFor(src: AudioFormat): AudioFormat =
    new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate,
      16, 1, 2, src.getSampleRate, false)
  override def getSourceEncodings: Array[AudioFormat.Encoding] =
    Array(ImaAdpcm.Encoding)
  override def getTargetEncodings: Array[AudioFormat.Encoding] =
    Array(AudioFormat.Encoding.PCM_SIGNED)
  override def getTargetEncodings(src: AudioFormat)
      : Array[AudioFormat.Encoding] =
    if (src.getEncoding == ImaAdpcm.Encoding)
      Array(AudioFormat.Encoding.PCM_SIGNED)
    else Array.empty
  override def getTargetFormats(target: AudioFormat.Encoding,
      src: AudioFormat): Array[AudioFormat] =
    if (src.getEncoding == ImaAdpcm.Encoding &&
        target == AudioFormat.Encoding.PCM_SIGNED)
      Array(pcmFor(src))
    else Array.empty
  override def getAudioInputStream(target: AudioFormat.Encoding,
      src: AudioInputStream): AudioInputStream =
    getAudioInputStream(pcmFor(src.getFormat), src)
  override def getAudioInputStream(target: AudioFormat,
      src: AudioInputStream): AudioInputStream = {
    val sf = src.getFormat
    require(sf.getEncoding == ImaAdpcm.Encoding &&
      target.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
      "unsupported conversion")
    val ba = sf.getFrameSize
    val data = src.readAllBytes()
    val out = new java.io.ByteArrayOutputStream()
    var o = 0
    while (o + ba <= data.length) {
      val samples = ImaAdpcm.decodeBlock(
        java.util.Arrays.copyOfRange(data, o, o + ba))
      samples.foreach { s =>
        out.write(s & 0xff); out.write((s >> 8) & 0xff)
      }
      o += ba
    }
    val pcm = out.toByteArray
    new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
      target, pcm.length / 2)
  }
}
