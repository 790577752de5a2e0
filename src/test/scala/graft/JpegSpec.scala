package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaCodecs

/** Baseline-JPEG decoder guards for the paths the DC-only oracle fixtures
  * cannot pin: AC run/size codes, ZRL, non-trivial dequantization, the
  * general (non-flat) IDCT — checked against an INDEPENDENT direct-form
  * double-sum IDCT written here — plus entropy byte-stuffing (FF00) and
  * the progressive-reject contract. The test carries its own tiny encoder
  * (bit writer + canonical tables), mirroring tools/gen_media_fixture.py's
  * but with an AC table that can code nonzero coefficients.
  */
class JpegSpec extends AnyFunSuite {

  // ---- tiny test encoder ----
  private class BitWriter {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    private var acc = 0
    private var n = 0
    def put(value: Int, length: Int): Unit = {
      var b = length - 1
      while (b >= 0) {
        acc = (acc << 1) | ((value >> b) & 1)
        n += 1
        if (n == 8) {
          out += acc.toByte
          if (acc == 0xff) out += 0x00.toByte // stuffing
          acc = 0; n = 0
        }
        b -= 1
      }
    }
    def pad(): Unit = while (n != 0) put(1, 1)
  }

  /** canonical codes: symbol -> (code, len) */
  private def canon(bits: Seq[Int], vals: Seq[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }

  private val dcBits = Seq(0, 0, 0, 9) ++ Seq.fill(12)(0)
  private val dcVals = 0 to 8
  private val acBits = Seq(0, 3, 1) ++ Seq.fill(13)(0)
  private val acVals = Seq(0x00, 0x01, 0x22, 0xf0) // EOB, (0,1), (2,2), ZRL
  private val dcCodes = canon(dcBits, dcVals)
  private val acCodes = canon(acBits, acVals.map(_.toInt))

  private val quant: Array[Int] = Array.tabulate(64)(k => 1 + k % 3)

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload

  private def grayHeader(w: Int, h: Int): Array[Byte] = {
    val dqt = seg(0xdb, Array(0x00.toByte) ++ quant.map(_.toByte))
    val dht = seg(0xc4,
      Array(0x00.toByte) ++ dcBits.map(_.toByte) ++ dcVals.map(_.toByte) ++
      Array(0x10.toByte) ++ acBits.map(_.toByte) ++ acVals.map(_.toByte))
    val sof = seg(0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 1, 1, 0x11, 0))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ dht ++ sof ++ sos
  }

  private def putDc(bw: BitWriter, diff: Int): Unit = {
    var t = 0; var a = math.abs(diff)
    while (a != 0) { t += 1; a >>= 1 }
    val (c, l) = dcCodes(t)
    bw.put(c, l)
    if (t > 0) bw.put(if (diff > 0) diff else diff + (1 << t) - 1, t)
  }

  /** Independent direct-form IDCT over a natural-order coefficient block. */
  private def directIdct(f: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv * f(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      out(y * 8 + x) = math.max(0, math.min(255, math.round(s / 4.0 + 128.0).toInt))
    }
    out
  }

  private val zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  test("AC coefficients, ZRL and dequant decode against a direct-form IDCT") {
    // one 8x8 gray block: DC diff 5, AC: +1 at zz1, (run2,size2)=+2 at zz4,
    // ZRL (16 zeros), -1 at zz21, EOB
    val bw = new BitWriter
    putDc(bw, 5)
    val (c01, l01) = acCodes(0x01); val (c22, l22) = acCodes(0x22)
    val (czrl, lzrl) = acCodes(0xf0); val (ceob, leob) = acCodes(0x00)
    bw.put(c01, l01); bw.put(1, 1)      // zz1 = +1
    bw.put(c22, l22); bw.put(2, 2)      // skip 2, zz4 = +2
    bw.put(czrl, lzrl)                  // 16 zeros
    bw.put(c01, l01); bw.put(0, 1)      // zz21 = -1
    bw.put(ceob, leob)
    bw.pad()
    val jpg = grayHeader(8, 8) ++ bw.out ++ Array(0xff.toByte, 0xd9.toByte)
    val img = MediaCodecs.decodeJpeg(jpg)
    assert(img.width === 8 && img.height === 8)

    val f = new Array[Int](64)
    f(0) = 5 * quant(0)
    f(zigzag(1)) = 1 * quant(1)
    f(zigzag(4)) = 2 * quant(4)
    f(zigzag(21)) = -1 * quant(21)
    val want = directIdct(f)
    for (p <- 0 until 64) {
      val got = img.pixels(p * 3) & 0xff
      assert(got === want(p), s"pixel $p")
      assert((img.pixels(p * 3 + 1) & 0xff) === want(p)) // gray: r=g=b
    }
  }

  test("entropy byte-stuffing (FF00) round-trips") {
    // search a 2-block (16x8) DC-only stream whose bytes contain a stuffed
    // FF — the decoder must unstuff it and still track both DC predictors
    val found = (for {
      d1 <- 0 to 255; d2 <- 0 to 255
      bw = new BitWriter
      _ = { putDc(bw, d1); bw.put(acCodes(0x00)._1, acCodes(0x00)._2)
            putDc(bw, d2 - d1); bw.put(acCodes(0x00)._1, acCodes(0x00)._2)
            bw.pad() }
      if bw.out.containsSlice(Seq(0xff.toByte, 0x00.toByte))
    } yield (d1, d2, bw.out.toArray)).headOption
    assert(found.isDefined, "no stuffed-byte stream found in search space")
    val (d1, d2, ent) = found.get
    val jpg = grayHeader(16, 8) ++ ent ++ Array(0xff.toByte, 0xd9.toByte)
    val img = MediaCodecs.decodeJpeg(jpg)
    val b1 = directIdct { val f = new Array[Int](64); f(0) = d1 * quant(0); f }
    val b2 = directIdct { val f = new Array[Int](64); f(0) = d2 * quant(0); f }
    for (y <- 0 until 8; x <- 0 until 16) {
      val want = if (x < 8) b1(y * 8 + x) else b2(y * 8 + (x - 8))
      assert((img.pixels((y * 16 + x) * 3) & 0xff) === want, s"($x,$y)")
    }
  }

  test("0xFF fill bytes before header markers are skipped (T.81 B.1.1.2)") {
    val bw = new BitWriter
    putDc(bw, 42)
    bw.put(acCodes(0x00)._1, acCodes(0x00)._2)
    bw.pad()
    val hdr = grayHeader(8, 8)
    // inject two fill bytes before the SOF0 marker
    val at = hdr.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val filled = hdr.take(at) ++ Array(0xff.toByte, 0xff.toByte) ++ hdr.drop(at)
    val jpg = filled ++ bw.out ++ Array(0xff.toByte, 0xd9.toByte)
    val img = MediaCodecs.decodeJpeg(jpg)
    val want = directIdct { val f = new Array[Int](64); f(0) = 42 * quant(0); f }
    for (p <- 0 until 64)
      assert((img.pixels(p * 3) & 0xff) === want(p))
  }

  test("malformed progressive scan headers are rejected loudly") {
    // flipping SOF0→SOF2 on a baseline stream leaves a full-band SOS
    // (Ss=0, Se=63) — illegal in progressive (T.81 G.1: DC-only or an
    // AC band), so the decoder must reject the SCAN header, not decode
    val prog = grayHeader(8, 8)
    prog(prog.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte)) + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeJpeg(prog))
    assert(e.getMessage.contains("spectral band"))
  }

  // ---- progressive (SOF2) encoder pieces for the multi-scan test ----
  // AC table with the symbols the refinement scan needs: EOB0, (0,1),
  // (1,1), (2,2), (10,1)
  private val pAcBits = Seq(0, 1, 4) ++ Seq.fill(13)(0)
  private val pAcVals = Seq(0x00, 0x01, 0x11, 0x22, 0xa1)
  private val pAcCodes = canon(pAcBits, pAcVals)

  private def progGrayHeader(w: Int, h: Int): Array[Byte] = {
    val dqt = seg(0xdb, Array(0x00.toByte) ++ quant.map(_.toByte))
    val dht = seg(0xc4,
      Array(0x00.toByte) ++ dcBits.map(_.toByte) ++ dcVals.map(_.toByte) ++
      Array(0x10.toByte) ++ pAcBits.map(_.toByte) ++ pAcVals.map(_.toByte))
    val sof = seg(0xc2, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 1, 1, 0x11, 0))
    Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ dht ++ sof
  }

  private def sosGray(ss: Int, se: Int, ah: Int, al: Int): Array[Byte] =
    seg(0xda, Array[Byte](1, 1, 0x00, ss.toByte, se.toByte,
      ((ah << 4) | al).toByte))

  test("progressive multi-scan reassembly with nonzero AC matches the direct-form IDCT") {
    // two 8x8 blocks (16x8 gray), coefficients exercising every annex-G
    // path: DC first pass at Al=1 + DC refinement bit; AC first pass at
    // Al=1 (run/size with EOB per block); AC refinement placing NEW ±1
    // coefficients (after 1 and after 10 zero-history skips) while
    // emitting correction bits for the already-nonzero ones
    //   block A: DC 5, zz1 = 3, zz4 = -4, zz13 = 1
    //   block B: DC -6, zz2 = -1
    val dcs = Seq(5, -6)
    val bw = new BitWriter
    // scan 1: DC first, Al=1 — arithmetic-shifted diffs
    var pred = 0
    dcs.foreach { c => putDc(bw, (c >> 1) - pred); pred = c >> 1 }
    bw.pad()
    val scan1 = sosGray(0, 0, 0, 1) ++ bw.out
    // scan 2: AC first, Ss=1..63, Al=1 — v0 = orig/2 toward zero
    val bw2 = new BitWriter
    def put(sym: Int): Unit = { val (c, l) = pAcCodes(sym); bw2.put(c, l) }
    put(0x01); bw2.put(1, 1)     // A zz1: v0 = 3/2 = 1
    put(0x22); bw2.put(1, 2)     // A zz4: run 2, v0 = -4/2 = -2 → '01'
    put(0x00)                    // A EOB (zz13's 1/2 = 0 stays hidden)
    put(0x00)                    // B: all v0 = 0 → EOB
    bw2.pad()
    val scan2 = sosGray(1, 63, 0, 1) ++ bw2.out
    // scan 3: DC refinement, Ah=1, Al=0 — one raw bit per block
    val bw3 = new BitWriter
    dcs.foreach(c => bw3.put(c & 1, 1))
    bw3.pad()
    val scan3 = sosGray(0, 0, 1, 0) ++ bw3.out
    // scan 4: AC refinement, Ah=1, Al=0
    val bw4 = new BitWriter
    def put4(sym: Int): Unit = { val (c, l) = pAcCodes(sym); bw4.put(c, l) }
    // block A: (10,1) — skip 10 zero-history (zz2,3 then zz5..12), new +1
    // at zz13; sign bit, then correction bits for zz1 (3&1=1) and zz4
    // (|−4|&1=0) traversed on the way; then EOB
    put4(0xa1); bw4.put(1, 1); bw4.put(1, 1); bw4.put(0, 1); put4(0x00)
    // block B: (1,1) — skip zz1, new −1 at zz2; then EOB
    put4(0x11); bw4.put(0, 1); put4(0x00)
    bw4.pad()
    val scan4 = sosGray(1, 63, 1, 0) ++ bw4.out
    val jpg = progGrayHeader(16, 8) ++ scan1 ++ scan2 ++ scan3 ++ scan4 ++
      Array(0xff.toByte, 0xd9.toByte)
    val img = MediaCodecs.decodeJpeg(jpg)
    assert(img.width === 16 && img.height === 8)
    val fA = new Array[Int](64)
    fA(0) = 5 * quant(0)
    fA(zigzag(1)) = 3 * quant(1)
    fA(zigzag(4)) = -4 * quant(4)
    fA(zigzag(13)) = 1 * quant(13)
    val fB = new Array[Int](64)
    fB(0) = -6 * quant(0)
    fB(zigzag(2)) = -1 * quant(2)
    val wantA = directIdct(fA)
    val wantB = directIdct(fB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val want = if (x < 8) wantA(y * 8 + x) else wantB(y * 8 + (x - 8))
      assert((img.pixels((y * 16 + x) * 3) & 0xff) === want, s"($x,$y)")
    }
  }

  test("progressive spectral-band split: coefficients land from separate band scans") {
    // the libjpeg progression-script shape: the AC band split across TWO
    // single-component scans (Ss=1..5 then Ss=6..63) with nonzero
    // coefficients in BOTH bands — the second scan must start its run
    // arithmetic at k=6, not k=1
    //   block A: DC 5, zz1 = +1 (band 1), zz8 = -2 (band 2)
    //   block B: DC -6, zz1 = -1 (band 1)
    val bw = new BitWriter
    var pred = 0
    Seq(5, -6).foreach { c => putDc(bw, c - pred); pred = c }
    bw.pad()
    val dcScan = sosGray(0, 0, 0, 0) ++ bw.out
    val bw1 = new BitWriter
    def p1(sym: Int): Unit = { val (c, l) = pAcCodes(sym); bw1.put(c, l) }
    p1(0x01); bw1.put(1, 1); p1(0x00) // A: zz1 = +1, EOB
    p1(0x01); bw1.put(0, 1); p1(0x00) // B: zz1 = -1, EOB
    bw1.pad()
    val band1 = sosGray(1, 5, 0, 0) ++ bw1.out
    val bw2 = new BitWriter
    def p2(sym: Int): Unit = { val (c, l) = pAcCodes(sym); bw2.put(c, l) }
    p2(0x22); bw2.put(1, 2); p2(0x00) // A: skip 2 from k=6, zz8 = -2, EOB
    p2(0x00)                          // B: empty band
    bw2.pad()
    val band2 = sosGray(6, 63, 0, 0) ++ bw2.out
    val img = MediaCodecs.decodeJpeg(progGrayHeader(16, 8) ++ dcScan ++
      band1 ++ band2 ++ Array(0xff.toByte, 0xd9.toByte))
    val fA = new Array[Int](64)
    fA(0) = 5 * quant(0)
    fA(zigzag(1)) = 1 * quant(1)
    fA(zigzag(8)) = -2 * quant(8)
    val fB = new Array[Int](64)
    fB(0) = -6 * quant(0)
    fB(zigzag(1)) = -1 * quant(1)
    val wantA = directIdct(fA)
    val wantB = directIdct(fB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val want = if (x < 8) wantA(y * 8 + x) else wantB(y * 8 + (x - 8))
      assert((img.pixels((y * 16 + x) * 3) & 0xff) === want, s"($x,$y)")
    }
  }

  test("progressive scan order is free: DC refinement after the AC scans decodes identically") {
    // same coefficients, scans reordered [DC1, AC1, ACr, DCr] — the
    // coefficient buffer makes scan order irrelevant for the final IDCT
    val dcs = Seq(5, -6)
    val bw = new BitWriter
    var pred = 0
    dcs.foreach { c => putDc(bw, (c >> 1) - pred); pred = c >> 1 }
    bw.pad()
    val scan1 = sosGray(0, 0, 0, 1) ++ bw.out
    val bw2 = new BitWriter
    def put(sym: Int): Unit = { val (c, l) = pAcCodes(sym); bw2.put(c, l) }
    put(0x01); bw2.put(1, 1); put(0x22); bw2.put(1, 2); put(0x00); put(0x00)
    bw2.pad()
    val scan2 = sosGray(1, 63, 0, 1) ++ bw2.out
    val bw4 = new BitWriter
    def put4(sym: Int): Unit = { val (c, l) = pAcCodes(sym); bw4.put(c, l) }
    put4(0xa1); bw4.put(1, 1); bw4.put(1, 1); bw4.put(0, 1); put4(0x00)
    put4(0x11); bw4.put(0, 1); put4(0x00)
    bw4.pad()
    val scan4 = sosGray(1, 63, 1, 0) ++ bw4.out
    val bw3 = new BitWriter
    dcs.foreach(c => bw3.put(c & 1, 1))
    bw3.pad()
    val scan3 = sosGray(0, 0, 1, 0) ++ bw3.out
    val a = MediaCodecs.decodeJpeg(progGrayHeader(16, 8) ++ scan1 ++ scan2 ++
      scan3 ++ scan4 ++ Array(0xff.toByte, 0xd9.toByte))
    val b = MediaCodecs.decodeJpeg(progGrayHeader(16, 8) ++ scan1 ++ scan2 ++
      scan4 ++ scan3 ++ Array(0xff.toByte, 0xd9.toByte))
    assert(a.pixels.toSeq === b.pixels.toSeq)
  }

  test("a standalone marker between scans is rejected, not parsed as length-bearing") {
    // RST0/TEM outside entropy data carry NO length field; the segment
    // dispatch would otherwise read a bogus u16 "length" from the bytes
    // that follow and misparse the malformed stream instead of failing
    // with the codec contract's loud reject (ADVICE r13)
    val bw = new BitWriter
    putDc(bw, 4)
    bw.pad()
    for (marker <- Seq(0xd0, 0xd7, 0x01)) {
      val jpg = progGrayHeader(8, 8) ++ sosGray(0, 0, 0, 0) ++ bw.out ++
        Array(0xff.toByte, marker.toByte) ++ Array(0xff.toByte, 0xd9.toByte)
      val e = intercept[IllegalArgumentException](MediaCodecs.decodeJpeg(jpg))
      assert(e.getMessage.contains("standalone marker"), s"marker=$marker")
    }
  }
}
