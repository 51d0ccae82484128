package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JpegCodec

/** Pins the progressive AC-REFINEMENT path (T.81 G.1.2.3) against
  * hand-derived bitstreams and baseline twins: the refinement
  * traversal (correction bits on already-nonzero coefficients, ±1
  * placements after zero-history runs, EOB-runs whose covered blocks
  * still consume correction bits) must land on the EXACT coefficients
  * a baseline scan of the same values produces — pixel equality
  * against the independently-verified baseline decoder is the
  * oracle. */
class JpegAcRefineSpec extends AnyFunSuite {

  // shared canonical tables: DC cats 0-11 at 4 bits; AC symbols
  // [EOB, (0,1), (1,0)=EOBRUN2-class, (3,1), (0,2)] at 3-bit codes
  // 000, 001, 010, 011, 100
  private val AcSyms = Seq(0x00, 0x01, 0x10, 0x31, 0x02)
  private def acCode(sym: Int): (Int, Int) = (AcSyms.indexOf(sym), 3)

  private final class Bits {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); cnt += 1
        if (cnt == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00)
          acc = 0; cnt = 0
        }
        i -= 1
      }
    }
    def sym(s: Int): Unit = { val (c, n) = acCode(s); put(c, n) }
    def flush(): Array[Byte] = {
      if (cnt > 0) {
        val pad = (acc << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
        out.write(pad & 0xFF)
        if ((pad & 0xFF) == 0xFF) out.write(0x00)
        acc = 0; cnt = 0
      }
      out.toByteArray
    }
  }

  /** Assemble a JPEG from header parts + scans. `sofMarker` 0xC0/0xC2;
    * each scan is ((Ss, Se, AhAl), entropyBytes). */
  private def file(w: Int, h: Int, sofMarker: Int,
      scans: Seq[((Int, Int, Int), Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)
    marker(0xDB); u16(67); out.write(0x00)
    (0 until 64).foreach(_ => out.write(16))
    marker(0xC4); u16(2 + 17 + 12); out.write(0x00)
    (1 to 16).foreach(l => out.write(if (l == 4) 12 else 0))
    (0 until 12).foreach(out.write)
    marker(0xC4); u16(2 + 17 + AcSyms.length); out.write(0x10)
    (1 to 16).foreach(l => out.write(if (l == 3) AcSyms.length else 0))
    AcSyms.foreach(out.write)
    marker(sofMarker); u16(11); out.write(8); u16(h); u16(w)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    scans.foreach { case ((ss, se, ahal), data) =>
      marker(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write(ahal)
      out.write(data, 0, data.length)
    }
    marker(0xD9)
    out.toByteArray
  }

  test("single block: a new -1 placement after a run, with a correction bit in transit") {
    // coefficients (zigzag): k=1 -> +3, k=5 -> -1, dc 0
    // baseline: DC cat0; (0,2) mag '11'; (3,1) mag '0'; EOB
    val base = {
      val b = new Bits
      b.put(0, 4)          // DC cat 0
      b.sym(0x02); b.put(3, 2)
      b.sym(0x31); b.put(0, 1)
      b.sym(0x00)
      file(8, 8, 0xC0, Seq(((0, 63, 0x00), b.flush())))
    }
    // progressive: DC first (Al=0); AC first at Al=1 sends only
    // k=1 -> +1 (3>>1; |-1|>>1 truncates to 0); AC refinement at Al=0
    // places the NEW -1 at k=5 via (3,1)+sign, with k=1's correction
    // bit (|3|&1 = 1) emitted in transit, then EOB
    val prog = {
      val dc = new Bits; dc.put(0, 4)
      val ac1 = new Bits
      ac1.sym(0x01); ac1.put(1, 1) // k=1: +1
      ac1.sym(0x00)                // EOB
      val acr = new Bits
      acr.sym(0x31)                // run 3 zeros, new |1|
      acr.put(0, 1)                // sign: negative
      acr.put(1, 1)                // correction for k=1 (appended)
      acr.sym(0x00)                // EOB (no pending corrections)
      file(8, 8, 0xC2, Seq(
        ((0, 0, 0x00), dc.flush()),
        ((1, 63, 0x01), ac1.flush()),
        ((1, 63, 0x10), acr.flush())))
    }
    val pb = JpegCodec.decode(base).getOrElse(fail("baseline rejected"))
    val pp = JpegCodec.decode(prog).getOrElse(fail("refinement stream rejected"))
    assert(java.util.Arrays.equals(pp.pixels, pb.pixels),
      "AC refinement decoded different pixels than the baseline twin")
    // the coefficients are genuinely non-flat: pixels vary
    assert(pb.pixels.toSet.size > 1)
  }

  test("EOB-run blocks still consume correction bits (two-block run)") {
    // 16x8, two blocks; block1 k=1 -> +2, block2 k=1 -> +3, dc 0
    val base = {
      val b = new Bits
      b.put(0, 4); b.sym(0x02); b.put(2, 2); b.sym(0x00) // +2: cat2 mag '10'
      b.put(0, 4); b.sym(0x02); b.put(3, 2); b.sym(0x00) // +3: cat2 mag '11'
      file(16, 8, 0xC0, Seq(((0, 63, 0x00), b.flush())))
    }
    val prog = {
      val dc = new Bits; dc.put(0, 4); dc.put(0, 4)
      val ac1 = new Bits
      ac1.sym(0x01); ac1.put(1, 1); ac1.sym(0x00) // block1: k=1 -> 1 (2>>1)
      ac1.sym(0x01); ac1.put(1, 1); ac1.sym(0x00) // block2: k=1 -> 1 (3>>1)
      val acr = new Bits
      acr.sym(0x10)        // EOBRUN class r=1: run = 2 + extra
      acr.put(0, 1)        // extra bit 0 -> run covers exactly 2 blocks
      acr.put(0, 1)        // block1 correction for k=1: |2|&1 = 0
      acr.put(1, 1)        // block2 correction for k=1: |3|&1 = 1
      file(16, 8, 0xC2, Seq(
        ((0, 0, 0x00), dc.flush()),
        ((1, 63, 0x01), ac1.flush()),
        ((1, 63, 0x10), acr.flush())))
    }
    val pb = JpegCodec.decode(base).getOrElse(fail("baseline rejected"))
    val pp = JpegCodec.decode(prog).getOrElse(fail("refinement EOB-run rejected"))
    assert(java.util.Arrays.equals(pp.pixels, pb.pixels),
      "EOB-run corrections decoded different pixels than the baseline twin")
    // and the two blocks genuinely differ (the correction bit matters)
    val left = (0 until 8).flatMap(y => (0 until 8).map(x => pp.pixels(y * 16 + x)))
    val right = (0 until 8).flatMap(y => (8 until 16).map(x => pp.pixels(y * 16 + x)))
    assert(left != right, "blocks should differ by the corrected bit")
  }

  test("a refinement scan with s>1 or mismatched Ah degrades to None") {
    val dc = new Bits; dc.put(0, 4)
    val acr = new Bits; acr.sym(0x02); acr.put(3, 2); acr.sym(0x00)
    // (0,2) inside a refinement scan is malformed (only ±1 appears)
    val bad = file(8, 8, 0xC2, Seq(
      ((0, 0, 0x00), dc.flush()),
      ((1, 63, 0x10), acr.flush())))
    assert(JpegCodec.decode(bad).isEmpty)
    // Ah must be Al+1
    val dc2 = new Bits; dc2.put(0, 4)
    val acr2 = new Bits; acr2.sym(0x00)
    val badAh = file(8, 8, 0xC2, Seq(
      ((0, 0, 0x00), dc2.flush()),
      ((1, 63, 0x20), acr2.flush())))
    assert(JpegCodec.decode(badAh).isEmpty)
  }
}
