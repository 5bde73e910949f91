package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Cleanroom H.264 baseline codec: spec-derived golden values for the
  * arithmetic pieces, then full encode→decode round trips checked
  * PIXEL-EXACTLY against the closed-form construction the gate oracle
  * replays.
  */
class H264Spec extends AnyFunSuite {
  import H264._

  test("Intra16x16 luma DC dequant matches hand-computed spec values") {
    // qp=28: LevelScale = 16·VDc(4)=256; (1·256 + 2^(5−4)) >> (6−4) = 64
    assert(dequantLumaDc(1, 28) == 64)
    // the reconstructed spatial constant: (64 + 32) >> 6 = 1
    assert(Fixtures.lumaDelta(1, 28) == 1)
    // qp=20: q6=3, v=13 → (1·208 + 4) >> 3 = 26 → (26+32)>>6 = 0
    assert(dequantLumaDc(1, 20) == 26)
    assert(Fixtures.lumaDelta(1, 20) == 0)
    // qp=40 (≥36 branch): (1·16·16) << (6−6) = 256 → delta 4
    assert(dequantLumaDc(1, 40) == 256)
    assert(Fixtures.lumaDelta(1, 40) == 4)
  }

  test("chroma DC dequant and QP mapping match the spec tables") {
    // qpc=26: ((1·16·13) << 4) >> 5 = 104 → delta (104+32)>>6 = 2
    assert(dequantChromaDc(1, 26) == 104)
    assert(Fixtures.chromaDelta(1, 26) == 2)
    assert(chromaQp(26, 0) == 26) // identity below 30
    assert(chromaQp(30, 0) == 29) // Table 8-12 start
    assert(chromaQp(51, 0) == 39) // Table 8-12 end
  }

  test("4x4 inverse core transform: DC-only input gives a constant block") {
    val d = new Array[Int](16); d(0) = 64
    assert(idct4x4(d).forall(_ == 1)) // (64+32)>>6
    val d2 = new Array[Int](16); d2(0) = 640
    assert(idct4x4(d2).forall(_ == 10))
  }

  test("4x4 Hadamard of a DC-only plane is the constant plane") {
    val c = new Array[Int](16); c(0) = 5
    assert(hadamard4x4(c).forall(_ == 5))
  }

  test("an all-PCM stream decodes bit-exactly") {
    // force the PCM path for every MB by building a frame by hand:
    // easiest is a 1x1-MB stream where the only MB is the PCM seed
    val bytes = Fixtures.stream(1, 1, 26, Seq((123, 45, 210, 0, 0)))
    val frames = decodeAnnexB(bytes)
    assert(frames.size == 1)
    val f = frames.head
    assert(f.width == 16 && f.height == 16)
    assert(f.y.forall(_ == 123))
    assert(f.cb.forall(_ == 45))
    assert(f.cr.forall(_ == 210))
  }

  test("full fixture round trip: every pixel equals the closed-form construction") {
    for (i <- 0 until 12) {
      val qp = 20 + (i % 8)
      val nf = 2 + (i % 3)
      val frames = (0 until nf).map { fr =>
        val l = 2 + ((i + fr) % 5)
        val lc = if (fr % 2 == 1) 2 + (i % 3) else 0
        (40 + ((i * 29 + fr * 13) % 160), 50 + ((i * 7 + fr * 11) % 140),
          60 + ((i * 13 + fr * 5) % 120), l, lc)
      }
      val decoded = decodeAnnexB(Fixtures.stream(3, 2, qp, frames))
      assert(decoded.size == nf, s"media $i frame count")
      for ((f, fr) <- decoded.zipWithIndex) {
        val (yP, cbP, crP, l, lc) = frames(fr)
        val d = Fixtures.lumaDelta(l, qp)
        val e = if (lc == 0) 0 else Fixtures.chromaDelta(lc, qp)
        assert(f.width == 48 && f.height == 32)
        // luma: seed MB (0,0) at yP; every other MB at yP + d
        for (yy <- 0 until 32; xx <- 0 until 48) {
          val expected = if (yy < 16 && xx < 16) yP else yP + d
          assert(f.y(yy * 48 + xx) == expected,
            s"media $i frame $fr luma ($xx,$yy): got ${f.y(yy * 48 + xx)}, want $expected (qp=$qp L=$l d=$d)")
        }
        for (yy <- 0 until 16; xx <- 0 until 24) {
          val expCb = if (yy < 8 && xx < 8) cbP else cbP + e
          val expCr = if (yy < 8 && xx < 8) crP else crP + e
          assert(f.cb(yy * 24 + xx) == expCb, s"media $i frame $fr cb ($xx,$yy)")
          assert(f.cr(yy * 24 + xx) == expCr, s"media $i frame $fr cr ($xx,$yy)")
        }
      }
    }
  }

  test("Intra4x4 prediction: all nine modes match hand-computed grids on a linear boundary") {
    // boundary: one linear sequence through the corner — pL(3..0) =
    // 0,2,4,6; corner 8; pT(0..7) = 10..24 step 2. Every mode has a
    // distinct closed form here (derived by hand from 8.3.1.2's
    // direction + weights, independently of the implementation), so a
    // transcription slip in any index or weight shifts some cell.
    val pT: Int => Int = x => 10 + 2 * x // pT(-1) = 8 = corner
    val pL: Int => Int = y => 6 - 2 * y  // pL(-1) = 8 = corner
    def grid(mode: Int): Seq[Int] =
      H264.intra4x4Predict(mode, hasLeft = true, hasTop = true, pT, pL).toSeq
    assert(grid(0) == Seq(10, 12, 14, 16, 10, 12, 14, 16, 10, 12, 14, 16, 10, 12, 14, 16), "V")
    assert(grid(1) == Seq(6, 6, 6, 6, 4, 4, 4, 4, 2, 2, 2, 2, 0, 0, 0, 0), "H")
    assert(grid(2) == Seq.fill(16)(8), "DC")
    assert(grid(3) == Seq(12, 14, 16, 18, 14, 16, 18, 20, 16, 18, 20, 22, 18, 20, 22, 24), "DDL")
    assert(grid(4) == Seq(8, 10, 12, 14, 6, 8, 10, 12, 4, 6, 8, 10, 2, 4, 6, 8), "DDR")
    assert(grid(5) == Seq(9, 11, 13, 15, 8, 10, 12, 14, 6, 9, 11, 13, 4, 8, 10, 12), "VR")
    assert(grid(6) == Seq(7, 8, 10, 12, 5, 6, 7, 8, 3, 4, 5, 6, 1, 2, 3, 4), "HD")
    assert(grid(7) == Seq(11, 13, 15, 17, 12, 14, 16, 18, 13, 15, 17, 19, 14, 16, 18, 20), "VL")
    assert(grid(8) == Seq(5, 4, 3, 2, 3, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0), "HU")
    // partial-availability DC forms
    assert(H264.intra4x4Predict(2, hasLeft = true, hasTop = false, pT, pL)
      .forall(_ == ((6 + 4 + 2 + 0 + 2) >> 2)), "DC left-only")
    assert(H264.intra4x4Predict(2, hasLeft = false, hasTop = true, pT, pL)
      .forall(_ == ((10 + 12 + 14 + 16 + 2) >> 2)), "DC top-only")
    assert(H264.intra4x4Predict(2, hasLeft = false, hasTop = false, pT, pL)
      .forall(_ == 128), "DC none")
    // unavailable-sample fences refuse loudly
    intercept[IllegalArgumentException](
      H264.intra4x4Predict(4, hasLeft = false, hasTop = true, pT, pL))
    intercept[IllegalArgumentException](
      H264.intra4x4Predict(0, hasLeft = true, hasTop = false, pT, pL))
  }

  test("Intra_4x4 fixture round trip: every pixel equals the closed-form recurrence") {
    for (i <- 0 until 12) {
      val qp = 20 + (i % 8)
      val level = (bx: Int, by: Int) => 1 + ((i + bx + 2 * by) % 3)
      val nf = 1 + (i % 2)
      val frames = (0 until nf).map { fr =>
        (30 + ((i * 23 + fr * 17) % 120), 50 + (i % 100), 60 + (i % 90))
      }
      val decoded = decodeAnnexB(Fixtures.i4x4Stream(qp, frames, level))
      assert(decoded.size == nf)
      for ((f, fr) <- decoded.zipWithIndex) {
        val (yP, cbP, crP) = frames(fr)
        assert(f.width == 32 && f.height == 16)
        // block values per the H/V/DC recurrence
        val v = Array.ofDim[Int](4, 4)
        for (by <- 0 until 4; bx <- 0 until 4) {
          val d = Fixtures.luma4x4Delta(level(bx, by), qp)
          v(by)(bx) =
            if (by == 0) (if (bx == 0) yP else v(0)(bx - 1)) + d
            else if (bx == 0) v(by - 1)(0) + d
            else ((v(by)(bx - 1) + v(by - 1)(bx) + 1) >> 1) + d
        }
        for (yy <- 0 until 16; xx <- 0 until 32) {
          val expected = if (xx < 16) yP else v(yy / 4)((xx - 16) / 4)
          assert(f.y(yy * 32 + xx) == expected,
            s"media $i frame $fr luma ($xx,$yy): got ${f.y(yy * 32 + xx)}, want $expected (qp=$qp)")
        }
        // chroma: MB1 DC-predicts flat from the PCM seed, no residual
        for (yy <- 0 until 8; xx <- 0 until 16) {
          assert(f.cb(yy * 16 + xx) == cbP, s"cb ($xx,$yy)")
          assert(f.cr(yy * 16 + xx) == crP, s"cr ($xx,$yy)")
        }
      }
    }
  }

  test("Intra_4x4 diagonal modes through a REAL bitstream match the predictor") {
    // distinct value at every pixel so any index slip in mode syntax,
    // z-order, or neighbour access shifts some sample
    val seed = (x: Int, y: Int) => 16 + ((x * 7 + y * 13) % 200)
    // per-block mode assignment covering all nine modes, diagonals on
    // blocks whose neighbours exist; (3,0) exercises the frame-edge
    // top-right substitution under VL
    val modeOf = Array(
      Array(3, 4, 5, 7), // by=0: DDL, DDR, VR, VL (VL at bx=3: TR substituted)
      Array(6, 8, 3, 4), // by=1: HD, HU, DDL, DDR
      Array(5, 6, 7, 8), // by=2: VR, HD, VL, HU
      Array(0, 1, 2, 3)) // by=3: V, H, DC, DDL
    val f = decodeAnnexB(Fixtures.i4x4DiagStream(
      (x, y) => seed(x, y), (bx, by) => modeOf(by)(bx))).head
    assert(f.width == 32 && f.height == 32)
    // the three PCM seeds decode bit-exactly
    for (y <- 0 until 32; x <- 0 until 32; if !(x >= 16 && y >= 16))
      assert(f.y(y * 32 + x) == seed(x, y), s"seed ($x,$y)")
    // MB(1,1): each block equals intra4x4Predict over the RECONSTRUCTED
    // context, replaying the decoder's availability/substitution rules
    // on the final frame (valid because residuals are zero, so the
    // frame IS the prediction)
    def zIdx(bx: Int, by: Int) = (by >> 1) * 8 + (bx >> 1) * 4 + (by & 1) * 2 + (bx & 1)
    for (blk <- 0 until 16) {
      val bx = (blk % 2) + ((blk / 4) % 2) * 2
      val by = ((blk / 2) % 2) + (blk / 8) * 2
      val px = 16 + bx * 4; val py = 16 + by * 4
      val hasTR = px + 4 < 32 && (py - 1 < 16 || zIdx((px + 4 - 16) / 4, (py - 1 - 16) / 4) < blk)
      def pT(x: Int): Int =
        if (x <= 3 || hasTR) f.y((py - 1) * 32 + px + x)
        else f.y((py - 1) * 32 + px + 3)
      def pL(yy: Int): Int = f.y((py + yy) * 32 + px - 1)
      val pred = H264.intra4x4Predict(modeOf(by)(bx), hasLeft = true,
        hasTop = true, pT, pL)
      for (r <- 0 until 4; c <- 0 until 4)
        assert(f.y((py + r) * 32 + px + c) == math.max(0, math.min(255, pred(r * 4 + c))),
          s"block ($bx,$by) mode ${modeOf(by)(bx)} pixel ($c,$r)")
    }
  }

  test("Intra16x16 PLANE and chroma H/V/plane continue a linear seed exactly") {
    // exact-continuation argument (planeStream scaladoc): on a linear
    // boundary with |slope| <= 4 the spec's gradient fit lands on
    // b = 32·slope exactly, so the predicted MB IS the global plane —
    // a closed form derived from the formula, not from the decoder
    for ((sx, sy, cx, cy) <- Seq((3, 2, 2, 1), (1, 4, 1, 1), (4, 1, 2, 2))) {
      val (ybase, cbB, crB) = (20, 30, 40)
      val f = decodeAnnexB(Fixtures.planeStream(ybase, sx, sy, cbB, crB, cx, cy)).head
      for (y <- 0 until 32; x <- 0 until 32)
        assert(f.y(y * 32 + x) == ybase + sx * x + sy * y,
          s"luma ($x,$y) slopes ($sx,$sy)")
      for (y <- 0 until 16; x <- 0 until 16) {
        assert(f.cb(y * 16 + x) == cbB + cx * x + cy * y, s"cb ($x,$y)")
        assert(f.cr(y * 16 + x) == crB + cx * x + cy * y, s"cr ($x,$y)")
      }
    }
    // chroma H: every row of the predicted 8x8 equals p[-1,y]
    val h = decodeAnnexB(Fixtures.planeStream(20, 2, 2, 30, 40, 2, 1,
      chromaMode = 1)).head
    for (y <- 0 until 8; x <- 0 until 8)
      assert(h.cb((8 + y) * 16 + 8 + x) == 30 + 2 * 7 + 1 * (8 + y), s"chroma-H ($x,$y)")
    // chroma V: every column equals p[x,-1]
    val v = decodeAnnexB(Fixtures.planeStream(20, 2, 2, 30, 40, 2, 1,
      chromaMode = 2)).head
    for (y <- 0 until 8; x <- 0 until 8)
      assert(v.cb((8 + y) * 16 + 8 + x) == 30 + 2 * (8 + x) + 1 * 7, s"chroma-V ($x,$y)")
  }

  test("vertical and horizontal prediction reproduce a striped seed exactly") {
    val pattern = (k: Int) => 30 + k * 12 // distinct per stripe, ≤ 210
    val v = decodeAnnexB(Fixtures.directionalStream(
      vertical = true, qp = 26, pattern, cbFlat = 90, crFlat = 110)).head
    assert(v.width == 16 && v.height == 32)
    for (yy <- 0 until 32; xx <- 0 until 16)
      assert(v.y(yy * 16 + xx) == pattern(xx),
        s"V-pred luma ($xx,$yy): ${v.y(yy * 16 + xx)} != ${pattern(xx)}")
    assert(v.cb.forall(_ == 90) && v.cr.forall(_ == 110))

    val h = decodeAnnexB(Fixtures.directionalStream(
      vertical = false, qp = 26, pattern, cbFlat = 90, crFlat = 110)).head
    assert(h.width == 32 && h.height == 16)
    for (yy <- 0 until 16; xx <- 0 until 32)
      assert(h.y(yy * 32 + xx) == pattern(yy),
        s"H-pred luma ($xx,$yy): ${h.y(yy * 32 + xx)} != ${pattern(yy)}")
    assert(h.cb.forall(_ == 90) && h.cr.forall(_ == 110))
  }

  test("emulation prevention survives payloads full of zero bytes") {
    // PCM zeros force 00 00 00 sequences in the RBSP; the encoder must
    // escape them and the decoder unescape identically
    val bytes = Fixtures.stream(1, 1, 26, Seq((0, 0, 1, 0, 0)))
    val f = decodeAnnexB(bytes).head
    assert(f.y.forall(_ == 0) && f.cb.forall(_ == 0) && f.cr.forall(_ == 1))
  }

  test("MP4 carriage round-trips: mux then demux reproduces the elementary stream") {
    val annexB = Fixtures.stream(3, 2, 24,
      Seq((100, 60, 70, 3, 0), (110, 65, 75, 4, 2)))
    val mp4 = Mp4.mux(annexB, 48, 32)
    // genuine box leader
    assert(new String(mp4.slice(4, 8)) == "ftyp")
    val back = Mp4.demuxToAnnexB(mp4)
    // same NAL payloads in the same order (start-code spelling may
    // normalize), so the decode is bit-identical
    val a = decodeAnnexB(annexB); val b = decodeAnnexB(back)
    assert(a.size == b.size)
    for ((x, y) <- a.zip(b)) {
      assert(x.y.sameElements(y.y) && x.cb.sameElements(y.cb) &&
        x.cr.sameElements(y.cr))
    }
  }

  test("subset fences fail fast, not wrong") {
    val ex = intercept[IllegalArgumentException] {
      decodeAnnexB(Array[Byte](1, 2, 3, 4))
    }
    assert(ex.getMessage.contains("Annex B"))
  }
}
