package graft.llmops

/** Cleanroom H.264/AVC BASELINE I-frame codec (ITU-T H.264 / ISO 14496-10,
  * public spec) — the real-decode replacement for the modern-codec slice
  * of [[MultimodalOps.StubCodec]] (reference context: the multimodal
  * training-data pipeline treats video as opaque binary columns; frame
  * decode happens executor-side, SURVEY §"multimodal columns").
  *
  * Scope (honest subset, explicit errors outside it):
  *  - Annex B elementary streams (start codes + emulation prevention);
  *  - SPS/PPS/IDR slice headers for progressive 4:2:0 baseline
  *    (frame_mbs_only, CAVLC, no FMO/ASO, pic_order_cnt_type 2);
  *  - I slices with I_PCM and Intra_16x16 macroblocks (DC / vertical /
  *    horizontal luma prediction; chroma DC), CAVLC residual decode for
  *    the Intra16x16 luma DC plane, luma AC, and chroma DC blocks;
  *  - dequantization + inverse transforms exactly per spec 8.5 (4x4
  *    core, 4x4 luma-DC Hadamard, 2x2 chroma-DC);
  *  - deblocking honored only as `disable_deblocking_filter_idc == 1`
  *    (streams that enable the in-loop filter are REFUSED, not decoded
  *    approximately — exactness over coverage);
  *  - I_NxN (4x4 prediction), inter slices and CABAC are out of scope
  *    and fail fast with a pointer here.
  *
  * The VLC tables below are transcribed from spec Tables 9-5/9-7/9-9/
  * 9-10 for the regions this subset can emit; untrusted deep rows
  * throw rather than guess. The fixture ENCODER ([[H264.Fixtures]])
  * authors conformant streams by construction (flat frames seeded by
  * one I_PCM macroblock, neighbors reconstructed through real DC
  * prediction plus exactly-dequantizable DC residuals), so the decode
  * gate's oracle can recompute every expected pixel from the spec's
  * own dequant arithmetic in SQL — no codec in the oracle's loop.
  */
object H264 {

  final case class FrameYuv(width: Int, height: Int,
      y: Array[Int], cb: Array[Int], cr: Array[Int]) {
    private def mean(a: Array[Int]): Double = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i); i += 1 }
      s.toDouble / a.length
    }
    def yMean: Double = mean(y)
    def cbMean: Double = mean(cb)
    def crMean: Double = mean(cr)
  }

  // ---------------------------------------------------------------- bits

  /** MSB-first bit reader over an RBSP (emulation prevention already
    * stripped).
    */
  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    def bitPos: Int = pos
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = pos >> 3
        require(byteIdx < bytes.length, "h264: bitstream underrun")
        val bit = (bytes(byteIdx) >> (7 - (pos & 7))) & 1
        v = (v << 1) | bit
        pos += 1
        i += 1
      }
      v
    }
    def flag(): Boolean = u(1) == 1
    /** ue(v) Exp-Golomb (spec 9.1). */
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) { zeros += 1; require(zeros < 32, "h264: bad ue(v)") }
      if (zeros == 0) 0 else ((1 << zeros) - 1) + u(zeros)
    }
    /** se(v) signed Exp-Golomb (spec 9.1.1). */
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
    def byteAlign(): Unit = while ((pos & 7) != 0) pos += 1
    def readByte(): Int = { require((pos & 7) == 0); val b = bytes(pos >> 3) & 0xFF; pos += 8; b }
    def moreRbspData(): Boolean = {
      // more data iff bits remain before the rbsp_stop_one_bit
      var last = bytes.length * 8 - 1
      while (last >= 0 && ((bytes(last >> 3) >> (7 - (last & 7))) & 1) == 0) last -= 1
      pos < last
    }
  }

  /** MSB-first bit writer producing an RBSP; [[toNal]] adds the start
    * code and emulation prevention.
    */
  private final class BitWriter {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def put(bit: Int): Unit = {
      cur = (cur << 1) | (bit & 1)
      nbits += 1
      if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
    }
    def u(v: Int, n: Int): Unit = { var i = n - 1; while (i >= 0) { put((v >> i) & 1); i -= 1 } }
    def ue(v: Int): Unit = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(0, len - 1); u(k, len)
    }
    def se(v: Int): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def bits(code: String): Unit = code.foreach(c => put(c - '0'))
    def byteAlignZero(): Unit = while (nbits != 0) put(0)
    def trailingBits(): Unit = { put(1); byteAlignZero() }
    def bytes: Array[Byte] = { require(nbits == 0, "h264: unaligned rbsp"); out.toArray }
  }

  private def stripEmulation(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var i = 0
    var zeros = 0
    while (i < nal.length) {
      val b = nal(i) & 0xFF
      if (zeros >= 2 && b == 3 && i + 1 < nal.length && (nal(i + 1) & 0xFF) <= 3) {
        zeros = 0 // emulation_prevention_three_byte: drop
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private def addEmulation(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    for (b0 <- rbsp) {
      val b = b0 & 0xFF
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  // ------------------------------------------------------- parameter sets

  final case class Sps(widthMbs: Int, heightMbs: Int, log2MaxFrameNum: Int)
  final case class Pps(initQp: Int, deblockControl: Boolean,
      chromaQpOffset: Int)

  private def parseSps(rbsp: Array[Byte]): Sps = {
    val br = new BitReader(rbsp)
    val profile = br.u(8)
    br.u(8) // constraint flags + reserved
    br.u(8) // level_idc
    br.ue() // sps id
    require(profile == 66, s"h264: only baseline (66) supported, got $profile")
    val log2MaxFrameNum = br.ue() + 4
    val pocType = br.ue()
    require(pocType == 2, s"h264: only pic_order_cnt_type 2 supported, got $pocType")
    br.ue() // max_num_ref_frames
    br.flag() // gaps_in_frame_num
    val wMbs = br.ue() + 1
    val hMbs = br.ue() + 1
    val frameMbsOnly = br.flag()
    require(frameMbsOnly, "h264: interlace unsupported")
    br.flag() // direct_8x8_inference
    val crop = br.flag()
    require(!crop, "h264: frame cropping unsupported")
    br.flag() // vui
    Sps(wMbs, hMbs, log2MaxFrameNum)
  }

  private def parsePps(rbsp: Array[Byte]): Pps = {
    val br = new BitReader(rbsp)
    br.ue(); br.ue() // pps id, sps id
    val cabac = br.flag()
    require(!cabac, "h264: CABAC unsupported (baseline is CAVLC)")
    br.flag() // bottom_field_pic_order_in_frame_present
    val sliceGroups = br.ue()
    require(sliceGroups == 0, "h264: FMO unsupported")
    br.ue(); br.ue() // num_ref_idx defaults
    br.flag() // weighted_pred
    br.u(2) // weighted_bipred_idc
    val initQp = br.se() + 26
    br.se() // pic_init_qs
    val chromaQpOffset = br.se()
    val deblockControl = br.flag()
    br.flag() // constrained_intra_pred
    br.flag() // redundant_pic_cnt_present
    Pps(initQp, deblockControl, chromaQpOffset)
  }

  // ------------------------------------------------------- CAVLC tables

  /** coeff_token VLCs (spec Table 9-5), "(bits)" strings keyed by
    * (TrailingOnes, TotalCoeff). Only the table regions this codec's
    * subset can produce are transcribed; a lookup miss throws.
    */
  private val CoeffTokenNc0: Map[(Int, Int), String] = Map(
    (0, 0) -> "1",
    (0, 1) -> "000101", (1, 1) -> "01",
    (0, 2) -> "00000111", (1, 2) -> "000100", (2, 2) -> "001",
    (0, 3) -> "000000111", (1, 3) -> "00000110", (2, 3) -> "0000101", (3, 3) -> "00011",
    (0, 4) -> "0000000111", (1, 4) -> "000000110", (2, 4) -> "00000101", (3, 4) -> "000011")

  private val CoeffTokenNc2: Map[(Int, Int), String] = Map(
    (0, 0) -> "11",
    (0, 1) -> "001011", (1, 1) -> "10",
    (0, 2) -> "000111", (1, 2) -> "00111", (2, 2) -> "011",
    (0, 3) -> "0000111", (1, 3) -> "001010", (2, 3) -> "001001", (3, 3) -> "0101",
    (0, 4) -> "00000111", (1, 4) -> "000110", (2, 4) -> "000101", (3, 4) -> "0100")

  private val CoeffTokenNc4: Map[(Int, Int), String] = Map(
    (0, 0) -> "1111",
    (0, 1) -> "001111", (1, 1) -> "1110",
    (0, 2) -> "001011", (1, 2) -> "01111", (2, 2) -> "1101",
    (0, 3) -> "001000", (1, 3) -> "01100", (2, 3) -> "01110", (3, 3) -> "1100",
    (0, 4) -> "0001111", (1, 4) -> "01010", (2, 4) -> "01011", (3, 4) -> "1011")

  /** chroma DC (4:2:0) coeff_token, nC == -1 (Table 9-5 last column). */
  private val CoeffTokenChromaDc: Map[(Int, Int), String] = Map(
    (0, 0) -> "01",
    (0, 1) -> "000111", (1, 1) -> "1",
    (0, 2) -> "000100", (1, 2) -> "000110", (2, 2) -> "001",
    (0, 3) -> "000011", (1, 3) -> "0000011", (2, 3) -> "0000010", (3, 3) -> "000101",
    (0, 4) -> "000010", (1, 4) -> "00000011", (2, 4) -> "00000010", (3, 4) -> "0000000")

  /** total_zeros for 4x4 blocks (Table 9-7), rows TotalCoeff 1..4 —
    * the subset's maximum; deeper rows throw at the lookup.
    */
  private val TotalZeros4x4: Map[Int, Map[Int, String]] = Map(
    1 -> Map(0 -> "1", 1 -> "011", 2 -> "010", 3 -> "0011", 4 -> "0010",
      5 -> "00011", 6 -> "00010", 7 -> "000011", 8 -> "000010",
      9 -> "0000011", 10 -> "0000010", 11 -> "00000011", 12 -> "00000010",
      13 -> "000000011", 14 -> "000000010", 15 -> "000000001"),
    2 -> Map(0 -> "111", 1 -> "110", 2 -> "101", 3 -> "100", 4 -> "011",
      5 -> "0101", 6 -> "0100", 7 -> "0011", 8 -> "0010", 9 -> "00011",
      10 -> "00010", 11 -> "000011", 12 -> "000010", 13 -> "000001", 14 -> "000000"),
    3 -> Map(0 -> "0101", 1 -> "111", 2 -> "110", 3 -> "101", 4 -> "0100",
      5 -> "0011", 6 -> "100", 7 -> "011", 8 -> "0010", 9 -> "00011",
      10 -> "00010", 11 -> "000001", 12 -> "00001", 13 -> "000000"),
    4 -> Map(0 -> "00011", 1 -> "111", 2 -> "0101", 3 -> "0100", 4 -> "110",
      5 -> "101", 6 -> "100", 7 -> "0011", 8 -> "011", 9 -> "0010",
      10 -> "00010", 11 -> "00001", 12 -> "00000"))

  /** total_zeros for chroma DC 2x2 blocks, 4:2:0 (Table 9-9(a)). */
  private val TotalZerosChromaDc: Map[Int, Map[Int, String]] = Map(
    1 -> Map(0 -> "1", 1 -> "01", 2 -> "001", 3 -> "000"),
    2 -> Map(0 -> "1", 1 -> "01", 2 -> "00"),
    3 -> Map(0 -> "1", 1 -> "0"))

  /** run_before (Table 9-10), keyed by min(zerosLeft, 7). */
  private val RunBefore: Map[Int, Map[Int, String]] = Map(
    1 -> Map(0 -> "1", 1 -> "0"),
    2 -> Map(0 -> "1", 1 -> "01", 2 -> "00"),
    3 -> Map(0 -> "11", 1 -> "10", 2 -> "01", 3 -> "00"),
    4 -> Map(0 -> "11", 1 -> "10", 2 -> "01", 3 -> "001", 4 -> "000"),
    5 -> Map(0 -> "11", 1 -> "10", 2 -> "011", 3 -> "010", 4 -> "001", 5 -> "000"),
    6 -> Map(0 -> "11", 1 -> "000", 2 -> "001", 3 -> "011", 4 -> "010",
      5 -> "101", 6 -> "100"),
    7 -> Map(0 -> "111", 1 -> "110", 2 -> "101", 3 -> "100", 4 -> "011",
      5 -> "010", 6 -> "001", 7 -> "0001", 8 -> "00001", 9 -> "000001",
      10 -> "0000001", 11 -> "00000001", 12 -> "000000001",
      13 -> "0000000001", 14 -> "00000000001"))

  private def coeffTokenTable(nC: Int): Map[(Int, Int), String] =
    if (nC == -1) CoeffTokenChromaDc
    else if (nC < 2) CoeffTokenNc0
    else if (nC < 4) CoeffTokenNc2
    else if (nC < 8) CoeffTokenNc4
    else null // FLC form

  /** Longest-prefix VLC decode against a (key → bits) table. */
  private def readVlc[K](br: BitReader, table: Map[K, String], what: String): K = {
    var code = ""
    var i = 0
    while (i < 19) {
      code += (if (br.u(1) == 1) "1" else "0")
      table.find(_._2 == code) match {
        case Some((k, _)) => return k
        case None => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"h264: no $what VLC matches '$code' — outside the transcribed table subset")
  }

  /** residual_block_cavlc (spec 9.2): returns coefficient array in
    * scan order, length `maxCoeffs`.
    */
  private def residualBlock(br: BitReader, nC: Int, maxCoeffs: Int): Array[Int] = {
    // table keys are (TrailingOnes, TotalCoeff)
    val (trailingOnes, totalCoeff) =
      if (nC >= 8) {
        val fixed = br.u(6)
        if (fixed == 3) (0, 0) else (fixed & 3, (fixed >> 2) + 1)
      } else readVlc(br, coeffTokenTable(nC), s"coeff_token(nC=$nC)")
    if (sys.env.contains("GRAFT_H264_DEBUG"))
      println(s"[h264]   residual nC=$nC tc=$totalCoeff t1=$trailingOnes bit=${br.bitPos}")
    val coeffs = new Array[Int](maxCoeffs)
    if (totalCoeff == 0) return coeffs
    require(totalCoeff <= maxCoeffs, "h264: TotalCoeff exceeds block size")
    val levels = new Array[Int](totalCoeff)
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      if (i < trailingOnes) {
        levels(i) = if (br.u(1) == 1) -1 else 1
      } else {
        var prefix = 0
        while (br.u(1) == 0) { prefix += 1; require(prefix <= 15, "h264: level_prefix > 15 unsupported") }
        var levelCode =
          if (prefix == 14 && suffixLength == 0) 14 + br.u(4)
          else if (prefix == 15) (15 << suffixLength) + br.u(12)
          else (prefix << suffixLength) + (if (suffixLength > 0) br.u(suffixLength) else 0)
        if (i == trailingOnes && trailingOnes < 3) levelCode += 2
        levels(i) = if (levelCode % 2 == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }
    val totalZeros =
      if (totalCoeff == maxCoeffs) 0
      else if (nC == -1)
        readVlc(br, TotalZerosChromaDc.getOrElse(totalCoeff,
          throw new IllegalArgumentException("h264: chroma-dc total_zeros row missing")),
          "total_zeros(chromaDC)")
      else
        readVlc(br, TotalZeros4x4.getOrElse(totalCoeff,
          throw new IllegalArgumentException(
            s"h264: total_zeros row TotalCoeff=$totalCoeff outside transcribed subset")),
          "total_zeros")
    var zerosLeft = totalZeros
    var pos = totalCoeff - 1 + totalZeros // scan index of the highest coeff
    i = 0
    while (i < totalCoeff) {
      coeffs(pos) = levels(i)
      if (i < totalCoeff - 1) {
        val run =
          if (zerosLeft == 0) 0
          else readVlc(br, RunBefore(math.min(zerosLeft, 7)), "run_before")
        zerosLeft -= run
        pos -= (1 + run)
      }
      i += 1
    }
    coeffs
  }

  // --------------------------------------------- transforms & dequant

  /** normAdjust4x4(m, (0,0)) — spec Table 8-15 first position. */
  private[llmops] val VDc = Array(10, 11, 13, 14, 16, 18)

  /** Intra16x16 luma DC dequant (spec 8.5.10): `f` is the inverse-
    * Hadamard-transformed DC value, qp the luma QP; LevelScale(m,0,0)
    * = 16·normAdjust = 16·VDc(m). SQL-replayable: pure integer ops.
    */
  private[llmops] def dequantLumaDc(f: Int, qp: Int): Int = {
    val ls = 16 * VDc(qp % 6)
    if (qp >= 36) (f * ls) << (qp / 6 - 6)
    else (f * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** Chroma DC dequant (spec 8.5.11, 4:2:0). */
  private[llmops] def dequantChromaDc(f: Int, qpc: Int): Int =
    ((f * (16 * VDc(qpc % 6))) << (qpc / 6)) >> 5

  /** AC/general 4x4 dequant for scan position > 0 (spec 8.5.12.2,
    * folded flat-scaling form): d = c · normAdjust(m, pos) · 2^(qp/6).
    */
  private val VByPos: Array[Array[Int]] = {
    // normAdjust4x4 groups: (0,0),(0,2),(2,0),(2,2) → v0; (1,1),(1,3),
    // (3,1),(3,3) → v1; rest → v2
    val v0 = Array(10, 11, 13, 14, 16, 18)
    val v1 = Array(16, 18, 20, 23, 25, 29)
    val v2 = Array(13, 14, 16, 18, 20, 23)
    Array.tabulate(16) { raster =>
      val (r, c) = (raster / 4, raster % 4)
      if (r % 2 == 0 && c % 2 == 0) v0 else if (r % 2 == 1 && c % 2 == 1) v1 else v2
    }
  }

  /** zigzag scan order → raster index (spec 8.5.6). */
  private[llmops] val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** 4x4 inverse core transform (spec 8.5.12.2) on RASTER-ordered
    * dequantized coefficients; output residuals include the final
    * (x + 32) >> 6 rounding.
    */
  private[llmops] def idct4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) { // horizontal
      val p0 = d(i * 4); val p1 = d(i * 4 + 1); val p2 = d(i * 4 + 2); val p3 = d(i * 4 + 3)
      val a = p0 + p2; val b = p0 - p2; val c = (p1 >> 1) - p3; val t = p1 + (p3 >> 1)
      e(i * 4) = a + t; e(i * 4 + 1) = b + c; e(i * 4 + 2) = b - c; e(i * 4 + 3) = a - t
      i += 1
    }
    val r = new Array[Int](16)
    i = 0
    while (i < 4) { // vertical
      val p0 = e(i); val p1 = e(4 + i); val p2 = e(8 + i); val p3 = e(12 + i)
      val a = p0 + p2; val b = p0 - p2; val c = (p1 >> 1) - p3; val t = p1 + (p3 >> 1)
      r(i) = (a + t + 32) >> 6; r(4 + i) = (b + c + 32) >> 6
      r(8 + i) = (b - c + 32) >> 6; r(12 + i) = (a - t + 32) >> 6
      i += 1
    }
    r
  }

  /** 4x4 Hadamard (spec 8.5.10, ±1 butterflies, no scaling) — its own
    * inverse up to the dequant scaling applied afterwards.
    */
  private[llmops] def hadamard4x4(c: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val p0 = c(i * 4); val p1 = c(i * 4 + 1); val p2 = c(i * 4 + 2); val p3 = c(i * 4 + 3)
      val a = p0 + p2; val b = p0 - p2; val g = p1 - p3; val t = p1 + p3
      e(i * 4) = a + t; e(i * 4 + 1) = b + g; e(i * 4 + 2) = b - g; e(i * 4 + 3) = a - t
      i += 1
    }
    val r = new Array[Int](16)
    i = 0
    while (i < 4) {
      val p0 = e(i); val p1 = e(4 + i); val p2 = e(8 + i); val p3 = e(12 + i)
      val a = p0 + p2; val b = p0 - p2; val g = p1 - p3; val t = p1 + p3
      r(i) = a + t; r(4 + i) = b + g; r(8 + i) = b - g; r(12 + i) = a - t
      i += 1
    }
    r
  }

  /** chroma QP mapping (spec Table 8-12) for qpi in 30..51; identity
    * below 30.
    */
  private[llmops] def chromaQp(qpY: Int, offset: Int): Int = {
    val qpi = math.max(0, math.min(51, qpY + offset))
    if (qpi < 30) qpi
    else Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
      38, 38, 38, 39, 39, 39, 39)(qpi - 30)
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** coded_block_pattern me(v) mapping for Intra_4x4 macroblocks
    * (spec Table 9-4, ChromaArrayType = 1, Intra column): codeNum →
    * cbp. The fixture encoder inverts it for the cbps it writes.
    */
  private[llmops] val CbpIntraByCodeNum: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  /** Intra_4x4 luma prediction (spec 8.3.1.2, all nine modes) over a
    * neighbour-sample accessor pair: `pT(x)` = p[x, -1] for x in
    * -1..7 (x = -1 the corner sample p[-1,-1], 4..7 the top-right
    * extension — the CALLER substitutes p[3,-1] when top-right is not
    * decoded), `pL(y)` = p[-1, y] for y in -1..3 (y = -1 the corner).
    * Pure integer arithmetic on the accessors; returns the 16
    * predicted samples raster-ordered. Exposed package-private so the
    * spec pins every mode against hand-computed grids on a linear
    * boundary (where each mode has a distinct closed form).
    */
  private[llmops] def intra4x4Predict(mode: Int, hasLeft: Boolean,
      hasTop: Boolean, pT: Int => Int, pL: Int => Int): Array[Int] = {
    val pred = new Array[Int](16)
    def fill(f: (Int, Int) => Int): Unit =
      for (yy <- 0 until 4; xx <- 0 until 4) pred(yy * 4 + xx) = f(xx, yy)
    mode match {
      case 0 => // Vertical
        require(hasTop, "h264: Intra4x4 V without top samples")
        fill((x, _) => pT(x))
      case 1 => // Horizontal
        require(hasLeft, "h264: Intra4x4 H without left samples")
        fill((_, yy) => pL(yy))
      case 2 => // DC (partial availability per 8.3.1.2.3)
        val dc =
          if (hasLeft && hasTop)
            ((0 until 4).map(pT).sum + (0 until 4).map(pL).sum + 4) >> 3
          else if (hasLeft) ((0 until 4).map(pL).sum + 2) >> 2
          else if (hasTop) ((0 until 4).map(pT).sum + 2) >> 2
          else 128
        java.util.Arrays.fill(pred, dc)
      case 3 => // Diagonal-Down-Left (8.3.1.2.4)
        require(hasTop, "h264: Intra4x4 DDL without top samples")
        fill((x, yy) =>
          if (x == 3 && yy == 3) (pT(6) + 3 * pT(7) + 2) >> 2
          else (pT(x + yy) + 2 * pT(x + yy + 1) + pT(x + yy + 2) + 2) >> 2)
      case 4 => // Diagonal-Down-Right (8.3.1.2.5)
        require(hasLeft && hasTop, "h264: Intra4x4 DDR without left+top samples")
        fill((x, yy) =>
          if (x > yy) (pT(x - yy - 2) + 2 * pT(x - yy - 1) + pT(x - yy) + 2) >> 2
          else if (x < yy) (pL(yy - x - 2) + 2 * pL(yy - x - 1) + pL(yy - x) + 2) >> 2
          else (pT(0) + 2 * pT(-1) + pL(0) + 2) >> 2)
      case 5 => // Vertical-Right (8.3.1.2.6)
        require(hasLeft && hasTop, "h264: Intra4x4 VR without left+top samples")
        fill { (x, yy) =>
          val zVR = 2 * x - yy
          val i = x - (yy >> 1)
          if (zVR >= 0 && zVR % 2 == 0) (pT(i - 1) + pT(i) + 1) >> 1
          else if (zVR >= 0) (pT(i - 2) + 2 * pT(i - 1) + pT(i) + 2) >> 2
          else if (zVR == -1) (pL(0) + 2 * pT(-1) + pT(0) + 2) >> 2
          else (pL(yy - 2 * x - 1) + 2 * pL(yy - 2 * x - 2) +
            pL(yy - 2 * x - 3) + 2) >> 2
        }
      case 6 => // Horizontal-Down (8.3.1.2.7)
        require(hasLeft && hasTop, "h264: Intra4x4 HD without left+top samples")
        fill { (x, yy) =>
          val zHD = 2 * yy - x
          val i = yy - (x >> 1)
          if (zHD >= 0 && zHD % 2 == 0) (pL(i - 1) + pL(i) + 1) >> 1
          else if (zHD >= 0) (pL(i - 2) + 2 * pL(i - 1) + pL(i) + 2) >> 2
          else if (zHD == -1) (pL(0) + 2 * pT(-1) + pT(0) + 2) >> 2
          else (pT(x - 2 * yy - 1) + 2 * pT(x - 2 * yy - 2) +
            pT(x - 2 * yy - 3) + 2) >> 2
        }
      case 7 => // Vertical-Left (8.3.1.2.8)
        require(hasTop, "h264: Intra4x4 VL without top samples")
        fill((x, yy) =>
          if (yy % 2 == 0) (pT(x + (yy >> 1)) + pT(x + (yy >> 1) + 1) + 1) >> 1
          else (pT(x + (yy >> 1)) + 2 * pT(x + (yy >> 1) + 1) +
            pT(x + (yy >> 1) + 2) + 2) >> 2)
      case 8 => // Horizontal-Up (8.3.1.2.9)
        require(hasLeft, "h264: Intra4x4 HU without left samples")
        fill { (x, yy) =>
          val zHU = x + 2 * yy
          if (zHU > 5) pL(3)
          else if (zHU == 5) (pL(2) + 3 * pL(3) + 2) >> 2
          else if (zHU % 2 == 0) (pL(yy + (x >> 1)) + pL(yy + (x >> 1) + 1) + 1) >> 1
          else (pL(yy + (x >> 1)) + 2 * pL(yy + (x >> 1) + 1) +
            pL(yy + (x >> 1) + 2) + 2) >> 2
        }
      case m => throw new IllegalArgumentException(s"h264: Intra4x4 mode $m out of range")
    }
    pred
  }

  // ------------------------------------------------------------ decoder

  /** Split an Annex B byte stream on 00 00 01 / 00 00 00 01 start
    * codes into raw NAL units (header byte included, EP bytes kept).
    */
  private def splitAnnexB(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val nals = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    var start = -1
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        if (start >= 0) nals += bytes.slice(start, if (i > 0 && bytes(i - 1) == 0) i - 1 else i)
        start = i + 3
        i += 3
      } else i += 1
    }
    if (start >= 0) nals += bytes.slice(start, bytes.length)
    nals.toSeq
  }

  /** Decode every IDR frame of an Annex B elementary stream. */
  def decodeAnnexB(bytes: Array[Byte]): Seq[FrameYuv] = {
    val nals = splitAnnexB(bytes)
    require(nals.nonEmpty, "h264: no NAL units (not an Annex B stream?)")

    var sps: Sps = null
    var pps: Pps = null
    val frames = scala.collection.mutable.ArrayBuffer.empty[FrameYuv]
    for (nal <- nals) {
      val nalType = nal(0) & 0x1F
      val rbsp = stripEmulation(nal.drop(1))
      nalType match {
        case 7 => sps = parseSps(rbsp)
        case 8 => pps = parsePps(rbsp)
        case 5 =>
          require(sps != null && pps != null, "h264: slice before SPS/PPS")
          frames += decodeIdrSlice(rbsp, sps, pps)
        case 1 => throw new IllegalArgumentException(
          "h264: non-IDR slices unsupported (keyframe decoder)")
        case 6 | 9 | 10 | 11 | 12 => () // SEI / AUD / end markers: skip
        case other => throw new IllegalArgumentException(s"h264: NAL type $other unsupported")
      }
    }
    frames.toSeq
  }

  private def decodeIdrSlice(rbsp: Array[Byte], sps: Sps, pps: Pps): FrameYuv = {
    val br = new BitReader(rbsp)
    val firstMb = br.ue()
    require(firstMb == 0, "h264: multi-slice frames unsupported")
    val sliceType = br.ue()
    require(sliceType == 2 || sliceType == 7, s"h264: only I slices supported, got $sliceType")
    br.ue() // pps id
    br.u(sps.log2MaxFrameNum) // frame_num
    br.ue() // idr_pic_id
    val qpSlice = pps.initQp + br.se()
    if (pps.deblockControl) {
      val disableIdc = br.ue()
      require(disableIdc == 1,
        "h264: in-loop deblocking enabled — this subset refuses to decode approximately")
      // no alpha/beta offsets when disabled
    }

    val w = sps.widthMbs * 16
    val h = sps.heightMbs * 16
    val y = new Array[Int](w * h)
    val cbP = new Array[Int]((w / 2) * (h / 2))
    val crP = new Array[Int]((w / 2) * (h / 2))
    // per-MB state for CAVLC contexts: luma 4x4 TotalCoeffs (AC
    // convention — 0 inside I16x16 with cbpL=0), chroma per-block TCs,
    // PCM flag (neighbors read as 16)
    val lumaTc = Array.fill(sps.heightMbs * 4, sps.widthMbs * 4)(-1) // -1 = unavailable
    val chromaTc = Array.fill(2, sps.heightMbs * 2, sps.widthMbs * 2)(-1)
    // Intra4x4PredMode per 4x4 block; -1 = the block's MB is not
    // I_NxN (PCM / I16x16) — the spec substitutes DC (2) for such
    // neighbours in the most-probable-mode derivation (8.3.1.1)
    val i4mode = Array.fill(sps.heightMbs * 4, sps.widthMbs * 4)(-1)
    var qp = qpSlice

    def nCfor(tc: Array[Array[Int]], bx: Int, by: Int): Int = {
      val nA = if (bx > 0) tc(by)(bx - 1) else -1
      val nB = if (by > 0) tc(by - 1)(bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }

    /** Most-probable Intra4x4 mode (spec 8.3.1.1): DC when either
      * neighbour BLOCK's macroblock is unavailable (frame edge);
      * otherwise min over the two neighbour modes, each defaulting to
      * DC when its macroblock is not I_NxN.
      */
    def predIntra4x4Mode(gbx: Int, gby: Int): Int = {
      if (gbx == 0 || gby == 0) 2
      else {
        val a = i4mode(gby)(gbx - 1)
        val b = i4mode(gby - 1)(gbx)
        math.min(if (a < 0) 2 else a, if (b < 0) 2 else b)
      }
    }

    /** Chroma decode shared by the I16x16 and I_4x4 branches: intra
      * prediction per 8.3.4 — `mode` 0 = DC per 4x4 sub-block, 1 =
      * Horizontal, 2 = Vertical, 3 = Plane — plus the optional chroma
      * DC residual (2x2 Hadamard plane; AC stays outside the subset).
      */
    def decodeChroma(mbX: Int, mbY: Int, cbpChroma: Int, qpNow: Int,
        mode: Int = 0): Unit = {
      val qpc = chromaQp(qpNow, pps.chromaQpOffset)
      for ((plane, cIdx) <- Seq((cbP, 0), (crP, 1))) {
        val cw = w / 2
        val cpx = mbX * 8; val cpy = mbY * 8
        val cpred = new Array[Int](64)
        def cpt(x: Int): Int = plane((cpy - 1) * cw + cpx + x) // p[x,-1]
        def cpl(yy: Int): Int = plane((cpy + yy) * cw + cpx - 1) // p[-1,y]
        if (mode == 1) { // Horizontal (8.3.4.2)
          require(mbX > 0, "h264: chroma H prediction needs a left neighbor")
          for (yy <- 0 until 8; xx <- 0 until 8) cpred(yy * 8 + xx) = cpl(yy)
        } else if (mode == 2) { // Vertical (8.3.4.3)
          require(mbY > 0, "h264: chroma V prediction needs a top neighbor")
          for (yy <- 0 until 8; xx <- 0 until 8) cpred(yy * 8 + xx) = cpt(xx)
        } else if (mode == 3) { // Plane (8.3.4.4, 4:2:0 constants)
          require(mbX > 0 && mbY > 0, "h264: chroma plane prediction needs left+top neighbors")
          val hG = (0 until 4).map(x => (x + 1) * (cpt(4 + x) - cpt(2 - x))).sum
          val vG = (0 until 4).map(yy => (yy + 1) * (cpl(4 + yy) - cpl(2 - yy))).sum
          val a = 16 * (cpl(7) + cpt(7))
          val b = (17 * hG + 16) >> 5
          val cGrad = (17 * vG + 16) >> 5
          for (yy <- 0 until 8; xx <- 0 until 8)
            cpred(yy * 8 + xx) = clip255((a + b * (xx - 3) + cGrad * (yy - 3) + 16) >> 5)
        } else require(mode == 0,
          s"h264: intra_chroma_pred_mode $mode out of range")
        if (mode == 0) for (sby <- 0 until 2; sbx <- 0 until 2) {
          def leftSum = (0 until 4).map(r => plane((cpy + sby * 4 + r) * cw + cpx - 1)).sum
          def topSum = (0 until 4).map(c => plane((cpy - 1) * cw + cpx + sbx * 4 + c)).sum
          val hasLeft = mbX > 0
          val hasTop = mbY > 0
          val dc =
            if (sbx == 0 && sby == 0)
              if (hasLeft && hasTop) (leftSum + topSum + 4) >> 3
              else if (hasLeft) (leftSum + 2) >> 2
              else if (hasTop) (topSum + 2) >> 2 else 128
            else if (sbx == 1 && sby == 0)
              if (hasTop) (topSum + 2) >> 2
              else if (hasLeft) (leftSum + 2) >> 2 else 128
            else if (sbx == 0 && sby == 1)
              if (hasLeft) (leftSum + 2) >> 2
              else if (hasTop) (topSum + 2) >> 2 else 128
            else
              if (hasLeft && hasTop) (leftSum + topSum + 4) >> 3
              else if (hasLeft) (leftSum + 2) >> 2
              else if (hasTop) (topSum + 2) >> 2 else 128
          for (r <- 0 until 4; c <- 0 until 4) cpred((sby * 4 + r) * 8 + sbx * 4 + c) = dc
        }
        val cresid = new Array[Int](64)
        if (cbpChroma != 0) {
          val dcC = residualBlock(br, -1, 4)
          // 2x2 inverse Hadamard (butterflies)
          val f0 = dcC(0) + dcC(1) + dcC(2) + dcC(3)
          val f1 = dcC(0) - dcC(1) + dcC(2) - dcC(3)
          val f2 = dcC(0) + dcC(1) - dcC(2) - dcC(3)
          val f3 = dcC(0) - dcC(1) - dcC(2) + dcC(3)
          val dq = Array(f0, f1, f2, f3).map(dequantChromaDc(_, qpc))
          require(cbpChroma == 1, "h264: chroma AC residuals not implemented")
          for (sb <- 0 until 4) {
            val d = new Array[Int](16)
            d(0) = dq(sb)
            val r = idct4x4(d)
            val sbx = sb % 2; val sby = sb / 2
            for (rr <- 0 until 4; cc <- 0 until 4)
              cresid((sby * 4 + rr) * 8 + sbx * 4 + cc) = r(rr * 4 + cc)
            chromaTc(cIdx)(mbY * 2 + sby)(mbX * 2 + sbx) = 0
          }
        } else for (sby <- 0 until 2; sbx <- 0 until 2)
          chromaTc(cIdx)(mbY * 2 + sby)(mbX * 2 + sbx) = 0
        for (k <- 0 until 64)
          plane((cpy + k / 8) * cw + cpx + k % 8) = clip255(cpred(k) + cresid(k))
      }
    }

    // z-scan index of a 4x4 block from its in-MB (bx, by) coords
    def zIndex(bx: Int, by: Int): Int =
      (by >> 1) * 8 + (bx >> 1) * 4 + (by & 1) * 2 + (bx & 1)

    /** Intra_4x4 macroblock (spec 7.3.5.1 syntax, 8.3.1 prediction):
      * 16 pred-mode entries, chroma mode, me()-mapped CBP, then per
      * 4x4 block in z-scan order — predict from RECONSTRUCTED
      * neighbour samples (earlier blocks of the same MB included),
      * decode the full 16-coefficient residual, reconstruct before
      * the next block. All nine 8.3.1.2 prediction modes implemented;
      * missing-sample cases the spec marks unavailable refuse loudly.
      */
    def decodeI4x4(mbX: Int, mbY: Int, mbIdx: Int): Unit = {
      val modes = new Array[Int](16)
      for (blk <- 0 until 16) {
        val bx = (blk % 2) + ((blk / 4) % 2) * 2
        val by = ((blk / 2) % 2) + (blk / 8) * 2
        val gbx = mbX * 4 + bx; val gby = mbY * 4 + by
        val mpm = predIntra4x4Mode(gbx, gby)
        val mode =
          if (br.flag()) mpm
          else { val rem = br.u(3); if (rem < mpm) rem else rem + 1 }
        modes(blk) = mode
        i4mode(gby)(gbx) = mode
      }
      val chromaMode = br.ue() // 0=DC 1=H 2=V 3=Plane
      val cbpCode = br.ue()
      require(cbpCode < 48, s"h264: coded_block_pattern codeNum $cbpCode out of range")
      val cbp = CbpIntraByCodeNum(cbpCode)
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      if (cbp != 0) qp += br.se() // mb_qp_delta
      for (blk <- 0 until 16) {
        val bx = (blk % 2) + ((blk / 4) % 2) * 2
        val by = ((blk / 2) % 2) + (blk / 8) * 2
        val gbx = mbX * 4 + bx; val gby = mbY * 4 + by
        val px = mbX * 16 + bx * 4; val py = mbY * 16 + by * 4
        val hasLeft = px > 0
        val hasTop = py > 0
        // top-right samples p[4..7,-1]: inside the frame AND decoded
        // before this block (earlier MB, or earlier z-index here)
        val hasTopRight = hasTop && px + 4 < w && {
          val nMbIdx = ((py - 1) / 16) * sps.widthMbs + (px + 4) / 16
          if (nMbIdx < mbIdx) true
          else if (nMbIdx > mbIdx) false
          else zIndex(((px + 4) % 16) / 4, ((py - 1) % 16) / 4) < blk
        }
        def Y(r: Int, c: Int): Int = y(r * w + c)
        // spec sample naming: pT(x) = p[x,-1] for x in -1..7 (x = -1 is
        // the corner p[-1,-1]; top-right x in 4..7 substituted by
        // p[3,-1] when not yet decoded), pL(y) = p[-1,y], y = -1 corner
        def pT(x: Int): Int =
          if (x <= 3) Y(py - 1, px + x)
          else if (hasTopRight) Y(py - 1, px + x)
          else Y(py - 1, px + 3)
        def pL(yy: Int): Int = Y(py + yy, px - 1)
        val pred = intra4x4Predict(modes(blk), hasLeft, hasTop, pT, pL)
        // residual: full 16-coefficient 4x4 block, gated by the 8x8
        // group's cbp bit (z-scan groups four blocks per 8x8)
        val coeffRaster = new Array[Int](16)
        var tc = 0
        if (((cbpLuma >> (blk / 4)) & 1) != 0) {
          val nc = nCfor(lumaTc, gbx, gby)
          val ac = residualBlock(br, nc, 16)
          tc = ac.count(_ != 0)
          for (k <- 0 until 16) coeffRaster(Zigzag(k)) = ac(k)
        }
        lumaTc(gby)(gbx) = tc
        val d = new Array[Int](16)
        for (k <- 0 until 16)
          d(k) = (coeffRaster(k) * VByPos(k)(qp % 6)) << (qp / 6)
        val r = idct4x4(d)
        for (rr <- 0 until 4; cc <- 0 until 4)
          y((py + rr) * w + px + cc) = clip255(pred(rr * 4 + cc) + r(rr * 4 + cc))
      }
      decodeChroma(mbX, mbY, cbpChroma, qp, chromaMode)
    }

    var mb = 0
    val nMbs = sps.widthMbs * sps.heightMbs
    while (mb < nMbs) {
      val mbX = mb % sps.widthMbs
      val mbY = mb / sps.widthMbs
      val mbType = br.ue()
      if (sys.env.contains("GRAFT_H264_DEBUG"))
        println(s"[h264] mb=$mb ($mbX,$mbY) type=$mbType bit=${br.bitPos}")
      if (mbType == 25) { // I_PCM
        br.byteAlign()
        var i = 0
        while (i < 256) { y((mbY * 16 + i / 16) * w + mbX * 16 + i % 16) = br.readByte(); i += 1 }
        i = 0
        while (i < 64) { cbP((mbY * 8 + i / 8) * (w / 2) + mbX * 8 + i % 8) = br.readByte(); i += 1 }
        i = 0
        while (i < 64) { crP((mbY * 8 + i / 8) * (w / 2) + mbX * 8 + i % 8) = br.readByte(); i += 1 }
        for (by <- 0 until 4; bx <- 0 until 4) lumaTc(mbY * 4 + by)(mbX * 4 + bx) = 16
        for (c <- 0 until 2; by <- 0 until 2; bx <- 0 until 2)
          chromaTc(c)(mbY * 2 + by)(mbX * 2 + bx) = 16
      } else if (mbType >= 1 && mbType <= 24) { // Intra_16x16
        val code = mbType - 1
        val predMode = code % 4 // 0=V 1=H 2=DC 3=Plane
        val cbpChroma = (code / 4) % 3
        val cbpLuma = if (code >= 12) 15 else 0
        val chromaMode = br.ue() // 0=DC 1=H 2=V 3=Plane (8.3.4)
        qp += br.se() // mb_qp_delta
        // --- luma prediction
        val px = mbX * 16; val py = mbY * 16
        val pred = new Array[Int](256)
        predMode match {
          case 0 => // vertical
            require(mbY > 0, "h264: V prediction without top neighbor")
            for (c <- 0 until 16; r <- 0 until 16) pred(r * 16 + c) = y((py - 1) * w + px + c)
          case 1 => // horizontal
            require(mbX > 0, "h264: H prediction without left neighbor")
            for (r <- 0 until 16; c <- 0 until 16) pred(r * 16 + c) = y((py + r) * w + px - 1)
          case 2 => // DC
            val left = if (mbX > 0) Some((0 until 16).map(r => y((py + r) * w + px - 1)).sum) else None
            val top = if (mbY > 0) Some((0 until 16).map(c => y((py - 1) * w + px + c)).sum) else None
            val dc = (left, top) match {
              case (Some(l), Some(t)) => (l + t + 16) >> 5
              case (Some(l), None) => (l + 8) >> 4
              case (None, Some(t)) => (t + 8) >> 4
              case (None, None) => 128
            }
            java.util.Arrays.fill(pred, dc)
          case 3 => // Plane (spec 8.3.3.4): least-squares-flavoured
            // gradient fit over the boundary samples; on a linear
            // context it continues the plane EXACTLY (the fixture gate
            // pins that closed form)
            require(mbX > 0 && mbY > 0, "h264: plane prediction needs left+top neighbors")
            def pt(x: Int): Int = y((py - 1) * w + px + x) // p[x,-1], x in -1..15
            def pl(yy: Int): Int = y((py + yy) * w + px - 1) // p[-1,y]
            val hG = (0 until 8).map(x => (x + 1) * (pt(8 + x) - pt(6 - x))).sum
            val vG = (0 until 8).map(yy => (yy + 1) * (pl(8 + yy) - pl(6 - yy))).sum
            val a = 16 * (pl(15) + pt(15))
            val b = (5 * hG + 32) >> 6
            val cc = (5 * vG + 32) >> 6
            for (yy <- 0 until 16; xx <- 0 until 16)
              pred(yy * 16 + xx) = clip255((a + b * (xx - 7) + cc * (yy - 7) + 16) >> 5)
        }
        // --- luma DC residual (always present for I16x16)
        val dcNc = nCfor(lumaTc, mbX * 4, mbY * 4)
        val dcScan = residualBlock(br, dcNc, 16)
        val dcRaster = new Array[Int](16)
        for (k <- 0 until 16) dcRaster(Zigzag(k)) = dcScan(k)
        val f = hadamard4x4(dcRaster)
        val dcDeq = f.map(dequantLumaDc(_, qp))
        // --- luma AC residuals
        val resid = new Array[Int](256)
        for (blk <- 0 until 16) {
          val bx = (blk % 2) + ((blk / 4) % 2) * 2  // z-order block coords
          val by = ((blk / 2) % 2) + (blk / 8) * 2
          val coeffRaster = new Array[Int](16)
          var tc = 0
          if (cbpLuma != 0) {
            val nc = nCfor(lumaTc, mbX * 4 + bx, mbY * 4 + by)
            val ac = residualBlock(br, nc, 15)
            tc = ac.count(_ != 0)
            for (k <- 0 until 15) coeffRaster(Zigzag(k + 1)) = ac(k)
          }
          lumaTc(mbY * 4 + by)(mbX * 4 + bx) = tc
          // dequant AC, insert DC from the Hadamard plane
          val d = new Array[Int](16)
          d(0) = dcDeq(by * 4 + bx)
          for (k <- 1 until 16)
            d(k) = (coeffRaster(k) * VByPos(k)(qp % 6)) << (qp / 6)
          val r = idct4x4(d)
          for (rr <- 0 until 4; cc <- 0 until 4)
            resid((by * 4 + rr) * 16 + bx * 4 + cc) = r(rr * 4 + cc)
        }
        for (k <- 0 until 256)
          y((py + k / 16) * w + px + k % 16) = clip255(pred(k) + resid(k))
        decodeChroma(mbX, mbY, cbpChroma, qp, chromaMode)
      } else if (mbType == 0) { // Intra_4x4 (I_NxN; baseline has no 8x8 transform)
        decodeI4x4(mbX, mbY, mb)
      } else throw new IllegalArgumentException(
        s"h264: mb_type $mbType unsupported (inter needs the full codec)")
      mb += 1
    }
    FrameYuv(w, h, y, cbP, crP)
  }

  // ---------------------------------------------------------------- mp4

  /** Minimal REAL ISO-BMFF (MP4) carriage of the baseline stream —
    * the container modern encoders actually ship (ISO 14496-12/-15,
    * public spec): `avc1`/`avcC` sample description carrying SPS/PPS,
    * length-prefixed AVCC samples in `mdat`, `stsz`/`stco` indexing.
    * [[Mp4.mux]] wraps an Annex B stream; [[Mp4.demuxToAnnexB]] walks
    * the real box tree back to the elementary stream, so
    * [[decodeMp4]] = demux ∘ [[decodeAnnexB]].
    */
  object Mp4 {
    import java.nio.ByteBuffer
    import java.nio.charset.StandardCharsets.US_ASCII

    private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(tpe.getBytes(US_ASCII))
      bb.put(payload)
      bb.array()
    }
    private def full(tpe: String, payload: Array[Byte]): Array[Byte] =
      box(tpe, Array[Byte](0, 0, 0, 0) ++ payload)
    private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    private def be32(v: Int) = ByteBuffer.allocate(4).putInt(v).array()

    /** Annex B → MP4: SPS/PPS land in `avcC`, each remaining NAL is
      * one 4-byte-length-prefixed sample in one `mdat` chunk.
      */
    def mux(annexB: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val nals = splitAnnexB(annexB)
      require(nals.nonEmpty, "mp4: no NAL units to mux")
      val sps = nals.find(n => (n(0) & 0x1F) == 7).getOrElse(
        throw new IllegalArgumentException("mp4: stream has no SPS"))
      val pps = nals.find(n => (n(0) & 0x1F) == 8).getOrElse(
        throw new IllegalArgumentException("mp4: stream has no PPS"))
      val samples = nals.filter(n => { val t = n(0) & 0x1F; t != 7 && t != 8 })
      val mdatPayload = samples.flatMap(n => be32(n.length) ++ n).toArray

      val ftyp = box("ftyp",
        "isom".getBytes(US_ASCII) ++ be32(0) ++ "isomavc1".getBytes(US_ASCII))
      val firstSampleOff = ftyp.length + 8 // into the mdat payload
      val mdat = box("mdat", mdatPayload)

      val avcC = box("avcC", Array[Byte](1, sps(1), sps(2), sps(3),
          (0xFC | 3).toByte, // 4-byte NAL lengths
          (0xE0 | 1).toByte) ++ be16(sps.length) ++ sps ++
        Array[Byte](1) ++ be16(pps.length) ++ pps)
      val avc1 = {
        // VisualSampleEntry: 6 reserved + data_ref_index, then 70
        // bytes of predefined/extent fields before the avcC sub-box
        val p = ByteBuffer.allocate(78)
        p.position(6); p.putShort(1) // data_reference_index
        p.putShort(0); p.putShort(0) // pre_defined, reserved
        p.putInt(0); p.putInt(0); p.putInt(0)
        p.putShort(width.toShort); p.putShort(height.toShort)
        p.putInt(0x00480000); p.putInt(0x00480000) // 72 dpi
        p.putInt(0) // reserved
        p.putShort(1) // frame_count
        p.position(p.position() + 32) // compressorname
        p.putShort(24) // depth
        p.putShort(-1) // pre_defined
        box("avc1", p.array() ++ avcC)
      }
      val stsd = full("stsd", be32(1) ++ avc1)
      val stts = full("stts", be32(1) ++ be32(samples.length) ++ be32(1000))
      val stsc = full("stsc", be32(1) ++ be32(1) ++ be32(samples.length) ++ be32(1))
      val stsz = full("stsz", be32(0) ++ be32(samples.length) ++
        samples.flatMap(n => be32(n.length + 4)).toArray)
      val stco = full("stco", be32(1) ++ be32(firstSampleOff))
      val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val dinf = box("dinf", full("dref", be32(1) ++ full("url ", Array.empty)))
      val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0))
      val minf = box("minf", vmhd ++ dinf ++ stbl)
      val hdlr = full("hdlr", be32(0) ++ "vide".getBytes(US_ASCII) ++
        new Array[Byte](12) ++ "graft".getBytes(US_ASCII) ++ Array[Byte](0))
      val mdhd = full("mdhd", be32(0) ++ be32(0) ++ be32(1000) ++
        be32(samples.length * 1000) ++ be16(0x55C4) ++ be16(0))
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val tkhd = full("tkhd", be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
        be32(samples.length * 1000) ++ new Array[Byte](16) ++
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .flatMap(be32).toArray ++
        be32(width << 16) ++ be32(height << 16))
      val mvhd = full("mvhd", be32(0) ++ be32(0) ++ be32(1000) ++
        be32(samples.length * 1000) ++ be32(0x00010000) ++ be16(0x0100) ++
        new Array[Byte](10) ++
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .flatMap(be32).toArray ++ new Array[Byte](24) ++ be32(2))
      val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia))
      ftyp ++ mdat ++ moov
    }

    /** Walk the real box tree back to an Annex B stream: `avcC` gives
      * SPS/PPS and the NAL length size, `stsz`/`stco` index the
      * samples inside `mdat`.
      */
    def demuxToAnnexB(mp4: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.wrap(mp4)
      var avcC: Array[Byte] = null
      var sizes: Array[Int] = null
      var chunkOff = -1
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val size = bb.getInt(off)
          require(size >= 8, s"mp4: bad box size $size at $off")
          val tpe = new String(mp4, off + 4, 4, US_ASCII)
          tpe match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              walk(off + 8, off + size)
            case "stsd" =>
              // entries header (version/flags + count) then the first
              // sample entry; avc1's sub-boxes start after the 78-byte
              // VisualSampleEntry body
              val entry = off + 16
              val entryType = new String(mp4, entry + 4, 4, US_ASCII)
              require(entryType == "avc1",
                s"mp4: only avc1 sample entries decode, got $entryType")
              walk(entry + 8 + 78, entry + bb.getInt(entry))
            case "avcC" => avcC = mp4.slice(off + 8, off + size)
            case "stsz" =>
              val n = bb.getInt(off + 16)
              sizes = Array.tabulate(n)(i => bb.getInt(off + 20 + 4 * i))
            case "stco" => chunkOff = bb.getInt(off + 16)
            case _ => ()
          }
          off += size
        }
      }
      walk(0, mp4.length)
      require(avcC != null, "mp4: no avcC configuration record")
      require(sizes != null && chunkOff >= 0, "mp4: no stsz/stco sample index")
      val lengthSize = (avcC(4) & 3) + 1
      require(lengthSize == 4, s"mp4: only 4-byte NAL lengths supported")
      val out = new java.io.ByteArrayOutputStream()
      val start = Array[Byte](0, 0, 0, 1)
      // parameter sets from avcC
      var p = 6
      val nSps = avcC(5) & 0x1F
      for (_ <- 0 until nSps) {
        val len = ((avcC(p) & 0xFF) << 8) | (avcC(p + 1) & 0xFF)
        out.write(start); out.write(avcC, p + 2, len)
        p += 2 + len
      }
      val nPps = avcC(p) & 0xFF
      p += 1
      for (_ <- 0 until nPps) {
        val len = ((avcC(p) & 0xFF) << 8) | (avcC(p + 1) & 0xFF)
        out.write(start); out.write(avcC, p + 2, len)
        p += 2 + len
      }
      var off = chunkOff
      for (sz <- sizes) {
        val end = off + sz
        while (off < end) {
          val len = bb.getInt(off)
          out.write(start); out.write(mp4, off + 4, len)
          off += 4 + len
        }
      }
      out.toByteArray
    }
  }

  /** Decode every IDR frame of an MP4-carried baseline stream. */
  def decodeMp4(bytes: Array[Byte]): Seq[FrameYuv] =
    decodeAnnexB(Mp4.demuxToAnnexB(bytes))

  // ----------------------------------------------------------- fixtures

  /** Minimal conformant ENCODER for the decode gate's fixtures: flat
    * frames seeded by one I_PCM macroblock at (0,0), every other MB
    * Intra_16x16 DC-predicted; the MBs adjacent to the seed carry a
    * single CAVLC-coded luma-DC coefficient L whose dequantized,
    * inverse-transformed value lifts them exactly from the seed value
    * to the frame value — so decoded pixels follow a closed integer
    * formula the SQL oracle replays from the spec arithmetic.
    */
  object Fixtures {

    /** Spatial delta produced by a single Intra16x16 DC-plane
      * coefficient L (all 16 inverse-Hadamard outputs equal L; each
      * 4x4 block reconstructs the constant (dequant + 32) >> 6).
      */
    def lumaDelta(L: Int, qp: Int): Int = (dequantLumaDc(L, qp) + 32) >> 6

    /** Spatial delta of a single chroma-DC coefficient Lc (all four
      * 2x2-Hadamard outputs equal Lc).
      */
    def chromaDelta(Lc: Int, qpc: Int): Int = (dequantChromaDc(Lc, qpc) + 32) >> 6

    private def nal(nalRefIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] =
      Array[Byte](0, 0, 0, 1, ((nalRefIdc << 5) | nalType).toByte) ++ addEmulation(rbsp)

    def sps(widthMbs: Int, heightMbs: Int): Array[Byte] = {
      val w = new BitWriter
      w.u(66, 8); w.u(0, 8); w.u(10, 8) // baseline, no constraints, level 1
      w.ue(0) // sps id
      w.ue(0) // log2_max_frame_num_minus4
      w.ue(2) // pic_order_cnt_type
      w.ue(0) // max_num_ref_frames
      w.u(0, 1) // gaps_in_frame_num
      w.ue(widthMbs - 1); w.ue(heightMbs - 1)
      w.u(1, 1) // frame_mbs_only
      w.u(0, 1) // direct_8x8_inference
      w.u(0, 1) // frame_cropping
      w.u(0, 1) // vui
      w.trailingBits()
      nal(3, 7, w.bytes)
    }

    def pps(qp: Int): Array[Byte] = {
      val w = new BitWriter
      w.ue(0); w.ue(0) // pps id, sps id
      w.u(0, 1) // CAVLC
      w.u(0, 1) // bottom_field_poc
      w.ue(0) // slice groups − 1
      w.ue(0); w.ue(0) // ref idx defaults
      w.u(0, 1); w.u(0, 2) // weighted pred / bipred
      w.se(qp - 26) // pic_init_qp_minus26
      w.se(0) // pic_init_qs
      w.se(0) // chroma_qp_index_offset
      w.u(1, 1) // deblocking_filter_control_present
      w.u(0, 1) // constrained_intra_pred
      w.u(0, 1) // redundant_pic_cnt_present
      w.trailingBits()
      nal(3, 8, w.bytes)
    }

    /** One IDR frame: MB(0,0) I_PCM at (yPcm, cbPcm, crPcm); every
      * other MB Intra_16x16 DC; MBs with the PCM seed as their DC
      * source (the rest of row 0's first neighbor and column 0's
      * first neighbor) code luma coefficient L (and chroma Lc when
      * nonzero) to land exactly on (yPcm + lumaDelta, …).
      */
    def idrFrame(widthMbs: Int, heightMbs: Int, qp: Int,
        yPcm: Int, cbPcm: Int, crPcm: Int, l: Int, lc: Int): Array[Byte] = {
      val w = new BitWriter
      w.ue(0) // first_mb_in_slice
      w.ue(7) // slice_type I (all slices)
      w.ue(0) // pps id
      w.u(0, 4) // frame_num (log2 = 4)
      w.ue(0) // idr_pic_id
      w.se(0) // slice_qp_delta
      w.ue(1) // disable_deblocking_filter_idc
      // --- macroblocks
      for (mb <- 0 until widthMbs * heightMbs) {
        val mbX = mb % widthMbs
        val mbY = mb / widthMbs
        if (mb == 0) {
          w.ue(25) // I_PCM
          w.byteAlignZero()
          for (_ <- 0 until 256) w.u(yPcm, 8)
          for (_ <- 0 until 64) w.u(cbPcm, 8)
          for (_ <- 0 until 64) w.u(crPcm, 8)
        } else {
          // seed-adjacent MBs: (1,0) predicts from the PCM MB on its
          // left, (0,1) from the PCM MB above — they carry residuals;
          // everything else predicts flat and codes zero
          val needsResidual = (mbX == 1 && mbY == 0) || (mbX == 0 && mbY == 1)
          val codeChroma = needsResidual && lc != 0
          w.ue(if (codeChroma) 7 else 3) // I16x16: DC pred, cbpC∈{1,0}, cbpL 0
          w.ue(0) // intra_chroma_pred_mode DC
          w.se(0) // mb_qp_delta
          // Intra16x16DCLevel — nC from luma blk0 neighbors: AC totals
          // are 0 everywhere except PCM MBs which read 16
          val leftPcm = mbX == 1 && mbY == 0
          val topPcm = mbX == 0 && mbY == 1
          val nc =
            if (leftPcm && mbY == 0) 16 // left is PCM, no top (row 0)
            else if (topPcm && mbX == 0) 16 // top is PCM, no left (col 0)
            else if (mbX == 0 || mbY == 0) 0 // one zero neighbor only
            else 0 // (0 + 0 + 1) >> 1
          if (needsResidual && l != 0) writeSingleDcCoeff(w, nc, l, chromaDc = false)
          else writeEmptyBlock(w, nc, chromaDc = false)
          if (codeChroma) { // chroma DC blocks: Cb then Cr, nC = -1
            writeSingleDcCoeff(w, -1, lc, chromaDc = true)
            writeSingleDcCoeff(w, -1, lc, chromaDc = true)
          }
        }
      }
      w.trailingBits()
      nal(3, 5, w.bytes)
    }

    /** coeff_token(TotalCoeff=0) for the given context. */
    private def writeEmptyBlock(w: BitWriter, nc: Int, chromaDc: Boolean): Unit =
      if (nc >= 8) w.u(3, 6) // FLC: TotalCoeff 0 → 000011
      else w.bits(coeffTokenTable(if (chromaDc) -1 else nc)((0, 0)))

    /** A block with exactly one coefficient at scan position 0 (the
      * DC): |L| == 1 codes as a trailing one; |L| >= 2 as coeff_token
      * (T1s=0, TC=1) + level with the first-level +2 adjustment.
      */
    private def writeSingleDcCoeff(w: BitWriter, nc: Int, level: Int,
        chromaDc: Boolean): Unit = {
      val one = math.abs(level) == 1
      val t1s = if (one) 1 else 0
      if (nc >= 8) w.u(((1 - 1) << 2) | t1s, 6)
      else w.bits(coeffTokenTable(if (chromaDc) -1 else nc)((t1s, 1)))
      if (one) w.u(if (level < 0) 1 else 0, 1) // trailing-one sign
      else {
        // suffixLength 0; levelCode = 2|L|−2 (positive) − 2 for the
        // implicit ≥2 of a non-trailing first level
        val levelCode = (if (level > 0) 2 * level - 2 else -2 * level - 1) - 2
        require(levelCode >= 0 && levelCode < 14, s"h264 fixtures: level $level out of simple-prefix range")
        w.u(0, levelCode); w.u(1, 1) // unary level_prefix
      }
      // total_zeros (TC=1 < maxCoeffs): 0 zeros before the DC
      if (chromaDc) w.bits(TotalZerosChromaDc(1)(0))
      else w.bits(TotalZeros4x4(1)(0))
      // run_before loop is empty for TC = 1
    }

    /** Spatial delta of one Intra_4x4 residual coefficient at scan
      * position 0: plain 4x4 dequant (no Hadamard plane) + flat IDCT.
      */
    def luma4x4Delta(c: Int, qp: Int): Int =
      (((c * VDc(qp % 6)) << (qp / 6)) + 32) >> 6 // normAdjust(qp%6, pos 0)

    /** One IDR frame on a 2x1-MB canvas: MB0 = I_PCM flat planes,
      * MB1 = Intra_4x4 with per-block modes H (block row 0, chaining
      * left from the PCM seed), V (block column 0 below row 0) and DC
      * (interior), cbp 15 (every 4x4 carries ONE coefficient at scan
      * position 0, level = `level(bx, by)`), no chroma residual. Each
      * block reconstructs FLAT at pred + luma4x4Delta, so the frame
      * mean follows the closed recurrence the SQL oracle replays:
      * v(bx,0) = v(bx-1,0) + d; v(0,by) = v(0,by-1) + d;
      * v(bx,by) = ((v(bx-1,by) + v(bx,by-1) + 1) >> 1) + d.
      * The mode spread exercises the most-probable-mode derivation
      * (prev flag hits and misses), the 3-bit rem path, the me()-coded
      * CBP, and FLC coeff_token contexts against the PCM neighbour.
      */
    def i4x4Frame(qp: Int, yPcm: Int, cbPcm: Int, crPcm: Int,
        level: (Int, Int) => Int): Array[Byte] = {
      val w = new BitWriter
      w.ue(0) // first_mb_in_slice
      w.ue(7) // slice_type I
      w.ue(0) // pps id
      w.u(0, 4) // frame_num
      w.ue(0) // idr_pic_id
      w.se(0) // slice_qp_delta
      w.ue(1) // disable_deblocking_filter_idc
      // MB0: PCM flat
      w.ue(25); w.byteAlignZero()
      for (_ <- 0 until 256) w.u(yPcm, 8)
      for (_ <- 0 until 64) w.u(cbPcm, 8)
      for (_ <- 0 until 64) w.u(crPcm, 8)
      // MB1: I_NxN
      w.ue(0) // mb_type Intra_4x4
      def want(bx: Int, by: Int): Int = if (by == 0) 1 else if (bx == 0) 0 else 2
      // most-probable-mode per 8.3.1.1: top row has no mbAddrB (frame
      // edge) → DC; left column's A neighbour is the PCM MB → DC
      val stored = Array.fill(4, 4)(-1)
      for (blk <- 0 until 16) {
        val bx = (blk % 2) + ((blk / 4) % 2) * 2
        val by = ((blk / 2) % 2) + (blk / 8) * 2
        val mpm =
          if (by == 0) 2
          else math.min(if (bx == 0) 2 else stored(by)(bx - 1), stored(by - 1)(bx))
        val m = want(bx, by)
        stored(by)(bx) = m
        if (m == mpm) w.u(1, 1)
        else { w.u(0, 1); w.u(if (m < mpm) m else m - 1, 3) }
      }
      w.ue(0) // intra_chroma_pred_mode DC
      w.ue(2) // coded_block_pattern me(): codeNum 2 → cbp 15 (Table 9-4 intra)
      w.se(0) // mb_qp_delta
      // residuals in z-scan; nC from the running TotalCoeff grid
      // (left column reads the PCM MB's 16, top row has no top)
      val tc = Array.fill(4, 4)(-1)
      for (blk <- 0 until 16) {
        val bx = (blk % 2) + ((blk / 4) % 2) * 2
        val by = ((blk / 2) % 2) + (blk / 8) * 2
        val nA = if (bx == 0) 16 else tc(by)(bx - 1)
        val nB = if (by == 0) -1 else tc(by - 1)(bx)
        val nc =
          if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
          else if (nA >= 0) nA else if (nB >= 0) nB else 0
        writeSingleDcCoeff(w, nc, level(bx, by), chromaDc = false)
        tc(by)(bx) = 1
      }
      w.trailingBits()
      nal(3, 5, w.bytes)
    }

    /** A complete Annex B stream of Intra_4x4 frames on the 2x1 canvas. */
    def i4x4Stream(qp: Int, frames: Seq[(Int, Int, Int)],
        level: (Int, Int) => Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(sps(2, 1))
      out.write(pps(qp))
      for ((yP, cbP, crP) <- frames) out.write(i4x4Frame(qp, yP, cbP, crP, level))
      out.toByteArray
    }

    /** Diagonal-mode exercise stream: a 2x2-MB frame whose first three
      * macroblocks are I_PCM seeds carrying a per-pixel luma formula
      * (so every neighbour sample is distinct) and MB(1,1) is
      * Intra_4x4 with `mode(bx, by)` per block and ZERO residual
      * (cbp 0) — the decoded MB(1,1) pixels are pure prediction, which
      * the spec compares block-by-block against [[intra4x4Predict]]
      * run on the reconstructed context. Drives the mode syntax
      * (prev/rem for all nine modes), z-scan reconstruction order,
      * and the frame-edge top-right substitution (bx = 3, by = 0)
      * through a REAL bitstream.
      */
    def i4x4DiagStream(seed: (Int, Int) => Int,
        mode: (Int, Int) => Int): Array[Byte] = {
      val qp = 26
      val out = new java.io.ByteArrayOutputStream()
      out.write(sps(2, 2))
      out.write(pps(qp))
      val w = new BitWriter
      w.ue(0); w.ue(7); w.ue(0) // first_mb, I slice, pps id
      w.u(0, 4) // frame_num
      w.ue(0) // idr_pic_id
      w.se(0) // slice_qp_delta
      w.ue(1) // deblocking disabled
      // MBs 0,1,2: PCM with the seed formula at GLOBAL pixel coords
      for (mb <- 0 until 3) {
        val ox = (mb % 2) * 16; val oy = (mb / 2) * 16
        w.ue(25); w.byteAlignZero()
        for (i <- 0 until 256) w.u(seed(ox + i % 16, oy + i / 16) & 0xFF, 8)
        for (_ <- 0 until 64) w.u(90, 8)
        for (_ <- 0 until 64) w.u(110, 8)
      }
      // MB(1,1): I_NxN, zero residual
      w.ue(0) // mb_type
      val stored = Array.fill(4, 4)(-1)
      for (blk <- 0 until 16) {
        val bx = (blk % 2) + ((blk / 4) % 2) * 2
        val by = ((blk / 2) % 2) + (blk / 8) * 2
        // neighbours: left column's A = MB(0,1) (PCM → 2), row 0's B =
        // MB(1,0) (PCM → 2); both MBs exist, so no unavailability DC
        val mpm = math.min(
          if (bx == 0) 2 else stored(by)(bx - 1),
          if (by == 0) 2 else stored(by - 1)(bx))
        val m = mode(bx, by)
        stored(by)(bx) = m
        if (m == mpm) w.u(1, 1)
        else { w.u(0, 1); w.u(if (m < mpm) m else m - 1, 3) }
      }
      w.ue(0) // intra_chroma_pred_mode DC
      w.ue(3) // coded_block_pattern me(): codeNum 3 → cbp 0 (Table 9-4 intra)
      // cbp == 0 → no mb_qp_delta, no residual blocks
      w.trailingBits()
      out.write(nal(3, 5, w.bytes))
      out.toByteArray
    }

    /** Plane-prediction stream: a 2x2-MB frame whose first three
      * macroblocks are I_PCM carrying LINEAR planes — luma
      * `ybase + sx·x + sy·y`, chroma `cbase + cx·x + cy·y` at global
      * coords — and MB(1,1) is Intra_16x16 PLANE (mb_type 4, cbp 0)
      * with `chromaMode` (3 = plane by default). On a linear context
      * the spec's gradient fit reproduces the plane EXACTLY for slopes
      * ≤ 4 (b = (5·408·s + 32) >> 6 = 32s ⇔ s ≤ 4), so the decoded
      * frame IS the global plane and every mean is closed-form — the
      * gate oracle replays `base + 15.5(sx+sy)` with zero codec code.
      */
    def planeStream(ybase: Int, sx: Int, sy: Int,
        cbBase: Int, crBase: Int, cx: Int, cy: Int,
        chromaMode: Int = 3): Array[Byte] = {
      require(sx.abs <= 4 && sy.abs <= 4 && cx.abs <= 4 && cy.abs <= 4,
        "plane fixture: slopes beyond 4 break the exact-continuation argument")
      val out = new java.io.ByteArrayOutputStream()
      out.write(sps(2, 2))
      out.write(pps(26))
      val w = new BitWriter
      w.ue(0); w.ue(7); w.ue(0) // first_mb, I slice, pps id
      w.u(0, 4); w.ue(0); w.se(0) // frame_num, idr_pic_id, slice_qp_delta
      w.ue(1) // deblocking disabled
      for (mb <- 0 until 3) {
        val ox = (mb % 2) * 16; val oy = (mb / 2) * 16
        val cox = (mb % 2) * 8; val coy = (mb / 2) * 8
        w.ue(25); w.byteAlignZero()
        for (i <- 0 until 256) w.u(ybase + sx * (ox + i % 16) + sy * (oy + i / 16), 8)
        for (i <- 0 until 64) w.u(cbBase + cx * (cox + i % 8) + cy * (coy + i / 8), 8)
        for (i <- 0 until 64) w.u(crBase + cx * (cox + i % 8) + cy * (coy + i / 8), 8)
      }
      // MB(1,1): Intra_16x16 PLANE, cbpLuma 0, cbpChroma 0 → mb_type 4
      w.ue(4)
      w.ue(chromaMode)
      w.se(0) // mb_qp_delta (always present for I16x16)
      writeEmptyBlock(w, 16, chromaDc = false) // luma DC block vs PCM neighbors
      w.trailingBits()
      out.write(nal(3, 5, w.bytes))
      out.toByteArray
    }

    /** A complete Annex B stream: SPS, PPS, then `frames` IDR frames. */
    def stream(widthMbs: Int, heightMbs: Int, qp: Int,
        frames: Seq[(Int, Int, Int, Int, Int)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(sps(widthMbs, heightMbs))
      out.write(pps(qp))
      for ((yP, cbP, crP, l, lc) <- frames)
        out.write(idrFrame(widthMbs, heightMbs, qp, yP, cbP, crP, l, lc))
      out.toByteArray
    }

    /** Directional-prediction fixture: a 1x2-MB (vertical=true) or
      * 2x1-MB frame whose PCM seed carries a column- (resp. row-)
      * striped luma pattern; the second MB is Intra_16x16 VERTICAL
      * (resp. HORIZONTAL) with zero residual, so a correct directional
      * predictor reproduces the stripes EXACTLY and a DC-averaging
      * bug cannot pass. Chroma stays flat (directional chroma modes
      * are out of the subset). `lumaPattern(k)` gives the stripe value
      * for column (resp. row) k, 0..15.
      */
    def directionalStream(vertical: Boolean, qp: Int,
        lumaPattern: Int => Int, cbFlat: Int, crFlat: Int): Array[Byte] = {
      val (wMbs, hMbs) = if (vertical) (1, 2) else (2, 1)
      val out = new java.io.ByteArrayOutputStream()
      out.write(sps(wMbs, hMbs))
      out.write(pps(qp))
      val w = new BitWriter
      w.ue(0); w.ue(7); w.ue(0) // first_mb, I slice, pps id
      w.u(0, 4) // frame_num
      w.ue(0) // idr_pic_id
      w.se(0) // slice_qp_delta
      w.ue(1) // deblocking disabled
      // MB0: PCM with the striped luma
      w.ue(25)
      w.byteAlignZero()
      for (i <- 0 until 256)
        w.u(lumaPattern(if (vertical) i % 16 else i / 16), 8)
      for (_ <- 0 until 64) w.u(cbFlat, 8)
      for (_ <- 0 until 64) w.u(crFlat, 8)
      // MB1: Intra16x16 V (mb_type 1) below, or H (mb_type 2) right
      w.ue(if (vertical) 1 else 2)
      w.ue(0) // intra_chroma_pred_mode DC
      w.se(0) // mb_qp_delta
      writeEmptyBlock(w, 16, chromaDc = false) // luma DC vs the PCM neighbor
      w.trailingBits()
      out.write(nal(3, 5, w.bytes))
      out.toByteArray
    }
  }
}
