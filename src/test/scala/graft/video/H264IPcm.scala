package graft.video

import graft.operators.Multimodal
import graft.operators.Multimodal.SampledFrame

/** Test-scope REAL H.264 provider for the [[Multimodal.VideoFrameDecoder]]
  * ServiceLoader seam: a from-scratch decoder of the conformant subset
  * "Annex-B baseline stream whose coded pictures are single-slice IDR
  * pictures of I_PCM macroblocks" (ITU-T H.264 §7.3/§9.1 — I_PCM
  * stores raw uncompressed samples inside a fully standard bitstream,
  * which is exactly what x264 emits at `--qp 0 --ipratio 1` when PCM
  * wins RD, and what conformance suites use to pin the NAL/RBSP
  * layer). Decoding it exercises every piece of real H.264 plumbing
  * short of entropy-coded residuals: start-code scan, EBSP emulation-
  * prevention removal, Exp-Golomb, SPS/PPS parsing, slice headers,
  * macroblock iteration, and exact pixel recovery.
  *
  * The provider is strictly validating: anything outside the subset
  * (non-IDR, non-I_PCM macroblocks, CABAC, interlace, unknown NAL
  * types) returns None so the production fall-through chain keeps its
  * contract. Main-scope builds never see this class — it lives on the
  * TEST classpath only, registered through
  * META-INF/services/graft.operators.Multimodal$VideoFrameDecoder.
  */
class H264IPcmDecoder extends Multimodal.VideoFrameDecoder {
  override def decodeFrames(bytes: Array[Byte], stride: Int)
      : Option[Seq[SampledFrame]] = H264IPcm.decode(bytes, stride)
}

object H264IPcm {

  // ------------------------------------------------------------ bits
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def bit(): Int = {
      require(pos < b.length * 8, "past end of RBSP")
      val v = (b(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def ue(): Int = {
      var z = 0
      while (bit() == 0) { z += 1; require(z < 32, "ue too long") }
      if (z == 0) 0 else ((1 << z) | u(z)) - 1
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    /** pcm_alignment_zero_bit* — every pad bit MUST be zero */
    def byteAlign(): Unit =
      while ((pos & 7) != 0) require(bit() == 0, "pcm alignment bit != 0")
    def rawBytes(n: Int): Array[Byte] = {
      require((pos & 7) == 0 && (pos >>> 3) + n <= b.length, "pcm overrun")
      val out = java.util.Arrays.copyOfRange(b, pos >>> 3, (pos >>> 3) + n)
      pos += n * 8
      out
    }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); n += 1
      if (n == 8) { buf.write(cur); cur = 0; n = 0 }
    }
    def u(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val k = v + 1L
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(k)
      var i = 0
      while (i < bits - 1) { bit(0); i += 1 }
      u(k, bits)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def alignZero(): Unit = while (n != 0) bit(0)
    def rawBytes(a: Array[Byte]): Unit = {
      require(n == 0, "unaligned raw write")
      buf.write(a, 0, a.length)
    }
    def rbspTrailing(): Unit = { bit(1); alignZero() }
    def rbsp: Array[Byte] = { require(n == 0); buf.toByteArray }
  }

  // --------------------------------------------------- NAL / RBSP
  /** payloads (header byte included) of every NAL unit, start codes
    * and trailing_zero_8bits stripped; rejects junk before the first
    * start code
    */
  private def nalUnits(b: Array[Byte]): Seq[Array[Byte]] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) {
        starts += i + 3; i += 3
      } else i += 1
    }
    require(starts.nonEmpty, "no start code")
    require(b.take(starts.head - 3).forall(_ == 0), "junk before start")
    starts.toSeq.zipWithIndex.map { case (s, j) =>
      var e = if (j + 1 < starts.length) starts(j + 1) - 3 else b.length
      while (e > s && b(e - 1) == 0) e -= 1 // trailing zeros / 4-byte codes
      require(e > s, "empty NAL")
      java.util.Arrays.copyOfRange(b, s, e)
    }
  }

  /** EBSP -> RBSP: drop each emulation_prevention_three_byte */
  private def unescape(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var zeros = 0; var i = 0
    while (i < nal.length) {
      val v = nal(i)
      if (zeros >= 2 && v == 3) zeros = 0 // the escape byte itself
      else { out.write(v); zeros = if (v == 0) zeros + 1 else 0 }
      i += 1
    }
    out.toByteArray
  }

  /** RBSP -> EBSP: insert 0x03 whenever two zeros precede a byte <= 3 */
  private def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 16)
    var zeros = 0; var i = 0
    while (i < rbsp.length) {
      val v = rbsp(i)
      if (zeros >= 2 && (v & 0xff) <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------- decoder
  private final case class Sps(log2MaxFrameNum: Int, pocType: Int,
      log2MaxPocLsb: Int, widthMbs: Int, heightMbs: Int)

  private def parseSps(r: BitReader): Sps = {
    val profile = r.u(8)
    require(profile == 66 || profile == 77 || profile == 88,
      s"profile $profile outside the baseline/main/extended subset")
    r.u(8) // constraint flags + reserved
    r.u(8) // level_idc
    require(r.ue() == 0, "sps_id != 0")
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    require(pocType == 0 || pocType == 2, s"poc type $pocType unsupported")
    val log2MaxPocLsb = if (pocType == 0) r.ue() + 4 else 0
    r.ue() // max_num_ref_frames
    r.bit() // gaps_in_frame_num_value_allowed
    val widthMbs = r.ue() + 1
    val heightMbs = r.ue() + 1
    require(r.bit() == 1, "interlace (frame_mbs_only=0) unsupported")
    r.bit() // direct_8x8_inference
    require(r.bit() == 0, "frame cropping unsupported in this subset")
    r.bit() // vui_parameters_present (payload ignored)
    Sps(log2MaxFrameNum, pocType, log2MaxPocLsb, widthMbs, heightMbs)
  }

  private def parsePps(r: BitReader): Unit = {
    require(r.ue() == 0, "pps_id != 0")
    require(r.ue() == 0, "sps_id != 0")
    require(r.bit() == 0, "CABAC unsupported (CAVLC subset)")
    r.bit() // bottom_field_pic_order_in_frame_present
    require(r.ue() == 0, "slice groups unsupported")
    r.ue(); r.ue() // num_ref_idx_l0/l1_default_active_minus1
    r.bit() // weighted_pred
    r.u(2) // weighted_bipred_idc
    r.se() // pic_init_qp_minus26
    r.se() // pic_init_qs_minus26
    r.se() // chroma_qp_index_offset
    r.bit() // deblocking_filter_control_present (0 in the subset fixtures)
    r.bit() // constrained_intra_pred
    r.bit() // redundant_pic_cnt_present
  }

  /** deterministic pixel signature over the decoded samples, luma then
    * chroma in macroblock order — the value the spec checks against
    * the encoder's known input
    */
  def pixelSig(mbs: Seq[(Array[Byte], Array[Byte], Array[Byte])]): Long = {
    var h = 1125899906842597L
    def mix(a: Array[Byte]): Unit = {
      var i = 0
      while (i < a.length) { h = h * 31 + (a(i) & 0xff); i += 1 }
    }
    mbs.foreach { case (y, cb, cr) => mix(y); mix(cb); mix(cr) }
    h
  }

  /** one IDR slice -> (frame pixels as mb triples); throws on anything
    * outside the subset
    */
  private def decodeIdrSlice(r: BitReader, sps: Sps,
      deblockingPresent: Boolean)
      : Seq[(Array[Byte], Array[Byte], Array[Byte])] = {
    require(r.ue() == 0, "first_mb_in_slice != 0 (multi-slice)")
    val sliceType = r.ue()
    require(sliceType == 2 || sliceType == 7, s"slice type $sliceType not I")
    require(r.ue() == 0, "pps_id != 0")
    r.u(sps.log2MaxFrameNum) // frame_num (0 for IDR)
    r.ue() // idr_pic_id
    if (sps.pocType == 0) r.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb
    // dec_ref_pic_marking for IDR (nal_ref_idc != 0 by subset contract)
    r.bit(); r.bit() // no_output_of_prior_pics, long_term_reference
    r.se() // slice_qp_delta
    val nMbs = sps.widthMbs * sps.heightMbs
    (0 until nMbs).map { _ =>
      val mbType = r.ue()
      require(mbType == 25, s"mb_type $mbType is not I_PCM")
      r.byteAlign()
      (r.rawBytes(256), r.rawBytes(64), r.rawBytes(64)) // 4:2:0, 8-bit
    }
  }

  /** full-stream decode: None unless the ENTIRE stream is the subset
    * (same all-or-nothing determinism fence as the MJPEG walker)
    */
  def decode(bytes: Array[Byte], stride: Int): Option[Seq[SampledFrame]] =
    try {
      require(stride > 0)
      var sps: Option[Sps] = None
      var ppsSeen = false
      val frames = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Array[Byte], Array[Byte], Array[Byte])]]
      nalUnits(bytes).foreach { nal =>
        val header = nal(0) & 0xff
        require((header & 0x80) == 0, "forbidden_zero_bit set")
        val refIdc = (header >> 5) & 3
        val typ = header & 0x1f
        val r = new BitReader(
          unescape(java.util.Arrays.copyOfRange(nal, 1, nal.length)))
        typ match {
          case 7 => sps = Some(parseSps(r))
          case 8 => require(sps.isDefined, "PPS before SPS"); parsePps(r)
            ppsSeen = true
          case 5 =>
            require(sps.isDefined && ppsSeen, "IDR before SPS/PPS")
            require(refIdc != 0, "IDR with nal_ref_idc 0")
            frames += decodeIdrSlice(r, sps.get, deblockingPresent = false)
          case 6 | 9 | 10 | 11 => () // SEI / AUD / end markers: skip
          case other => throw new IllegalArgumentException(
            s"NAL type $other outside the I_PCM subset")
        }
      }
      val s = sps.getOrElse(throw new IllegalArgumentException("no SPS"))
      require(frames.nonEmpty, "no coded pictures")
      Some(frames.zipWithIndex.toSeq.collect {
        case (mbs, idx) if idx % stride == 0 =>
          SampledFrame(-1L, idx, s.widthMbs * 16, s.heightMbs * 16,
            pixelSig(mbs), decoded = true)
      })
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------- encoder
  private def nal(refIdc: Int, typ: Int, rbsp: Array[Byte]): Array[Byte] =
    Array[Byte](0, 0, 0, 1, ((refIdc << 5) | typ).toByte) ++ escape(rbsp)

  /** Annex-B stream of `frames` I_PCM IDR pictures (each frame =
    * widthMbs*heightMbs triples of (256 luma, 64 cb, 64 cr) bytes)
    */
  def encode(widthMbs: Int, heightMbs: Int,
      frames: Seq[Seq[(Array[Byte], Array[Byte], Array[Byte])]])
      : Array[Byte] = {
    val sps = new BitWriter
    sps.u(66, 8); sps.u(0, 8); sps.u(10, 8) // baseline, level 1.0
    sps.ue(0) // sps_id
    sps.ue(0) // log2_max_frame_num_minus4 -> 4 bits
    sps.ue(2) // pic_order_cnt_type = 2 (no POC fields in slices)
    sps.ue(0) // max_num_ref_frames
    sps.bit(0) // gaps_in_frame_num
    sps.ue(widthMbs - 1); sps.ue(heightMbs - 1)
    sps.bit(1) // frame_mbs_only
    sps.bit(0) // direct_8x8_inference
    sps.bit(0) // frame_cropping
    sps.bit(0) // vui_parameters_present
    sps.rbspTrailing()
    val pps = new BitWriter
    pps.ue(0); pps.ue(0) // pps_id, sps_id
    pps.bit(0) // entropy_coding_mode = CAVLC
    pps.bit(0) // bottom_field_pic_order_in_frame_present
    pps.ue(0) // num_slice_groups_minus1
    pps.ue(0); pps.ue(0) // num_ref_idx_l0/l1
    pps.bit(0) // weighted_pred
    pps.u(0, 2) // weighted_bipred_idc
    pps.se(0); pps.se(0); pps.se(0) // init qp/qs, chroma_qp_offset
    pps.bit(0) // deblocking_filter_control_present
    pps.bit(0) // constrained_intra_pred
    pps.bit(0) // redundant_pic_cnt_present
    pps.rbspTrailing()
    val out = new java.io.ByteArrayOutputStream()
    out.write(nal(3, 7, sps.rbsp)); out.write(nal(3, 8, pps.rbsp))
    frames.zipWithIndex.foreach { case (mbs, idx) =>
      require(mbs.length == widthMbs * heightMbs, "mb count mismatch")
      val w = new BitWriter
      w.ue(0) // first_mb_in_slice
      w.ue(7) // slice_type: I (all slices of the picture are I)
      w.ue(0) // pps_id
      w.u(0, 4) // frame_num (log2_max_frame_num = 4); 0 for every IDR
      w.ue(idx & 0xffff) // idr_pic_id (differs between consecutive IDRs)
      w.bit(0); w.bit(0) // dec_ref_pic_marking (IDR)
      w.se(0) // slice_qp_delta
      mbs.foreach { case (y, cb, cr) =>
        require(y.length == 256 && cb.length == 64 && cr.length == 64)
        w.ue(25) // I_PCM
        w.alignZero() // pcm_alignment_zero_bit*
        w.rawBytes(y); w.rawBytes(cb); w.rawBytes(cr)
      }
      w.rbspTrailing()
      out.write(nal(3, 5, w.rbsp))
    }
    out.toByteArray
  }

  /** deterministic sample generator for fixtures (values cover the
    * full byte range, including 0x00 runs that force EBSP escapes)
    */
  def testFrame(widthMbs: Int, heightMbs: Int, seed: Long)
      : Seq[(Array[Byte], Array[Byte], Array[Byte])] =
    (0 until widthMbs * heightMbs).map { mb =>
      def gen(n: Int, salt: Long): Array[Byte] = {
        val a = new Array[Byte](n)
        var x = seed * 1000003L + mb * 31L + salt
        var i = 0
        while (i < n) {
          x = x * 6364136223846793005L + 1442695040888963407L
          // every 7th byte forced to zero: adjacent zeros exercise the
          // emulation-prevention escape path in both directions
          a(i) = if (i % 7 == 0) 0 else (x >>> 56).toByte
          i += 1
        }
        a
      }
      (gen(256, 1), gen(64, 2), gen(64, 3))
    }
}
