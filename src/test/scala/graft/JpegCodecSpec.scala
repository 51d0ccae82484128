package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JpegCodec, JpegGen}

/** Pins the baseline-JPEG grayscale decoder behind `mm_decode_jpeg`:
  * closed-form DC-only recovery through real Huffman decoding, DC
  * prediction, byte un-stuffing and the float IDCT; zigzag
  * correctness; and PdfText-class totality. */
class JpegCodecSpec extends AnyFunSuite {

  test("the zigzag table is the T.81 order") {
    val zz = JpegCodec.Zigzag
    assert(zz.length == 64 && zz.toSet.size == 64)
    // first and last runs, straight from Figure A.6 (row*8+col)
    assert(zz.take(16).sameElements(
      Array(0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5)))
    assert(zz.drop(60).sameElements(Array(47, 55, 62, 63)))
    assert(zz(35) == 56) // the long anti-diagonal bottoms out at (7,0)
  }

  test("JpegGen blocks match the closed form after a real decode") {
    Seq(0L, 1L, 3L, 7L, 12L, 123L, 9999L).foreach { id =>
      val g = JpegCodec.decode(JpegGen.jpeg(id)).getOrElse(fail(s"id=$id"))
      assert(g.width == 8 * (1 + id % 4) && g.height == 8 * (1 + (id * 3) % 4))
      for (y <- 0 until g.height; x <- 0 until g.width) {
        val want = 128 + 2 * JpegGen.dc(id, x / 8, y / 8)
        assert((g.pixels(y * g.width + x) & 0xFF) == want, s"id=$id ($x,$y)")
      }
    }
  }

  test("byte stuffing is load-bearing: a hand-built stream with FF00 decodes right") {
    // The gate's DC-only streams (EOB every ~6-13 bits) can never run
    // eight 1-bits together, so stuffing is exercised with a
    // hand-assembled file: four 8x8 blocks with DC diffs
    // (255, 255, 255, 0) — categories (8, 8, 8, 0) under the gate's
    // uniform 4-bit DC table pack to exactly
    // 8F F2 3F C8 FF 00(pad-free), and the 0xFF data byte MUST be
    // written stuffed (FF 00) for any conformant encoder; a decoder
    // that drops or double-reads the stuff byte shears the whole
    // stream. Pixels clamp at 255 for every block (2·dc+128 > 255).
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)
    marker(0xDB); u16(67); out.write(0x00)
    (0 until 64).foreach(_ => out.write(16))
    marker(0xC4); u16(2 + 17 + 12); out.write(0x00)
    (1 to 16).foreach(l => out.write(if (l == 4) 12 else 0))
    (0 until 12).foreach(out.write)
    marker(0xC4); u16(2 + 17 + 1); out.write(0x10)
    (1 to 16).foreach(l => out.write(if (l == 2) 1 else 0))
    out.write(0)
    marker(0xC0); u16(11); out.write(8); u16(8); u16(32)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    marker(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // 1000 11111111 00 | 1000 11111111 00 | 1000 11111111 00 | 0000 00
    // = 8F F2 3F C8 FF 00 -> the FF is data, so it ships stuffed
    Seq(0x8F, 0xF2, 0x3F, 0xC8, 0xFF, 0x00, 0x00).foreach(out.write)
    marker(0xD9)
    val bytes = out.toByteArray
    assert((4 until bytes.length - 2).exists(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0x00))
    val g = JpegCodec.decode(bytes).getOrElse(fail("stuffed stream rejected"))
    assert(g.width == 32 && g.height == 8)
    assert(g.pixels.forall(p => (p & 0xFF) == 255))
    // un-stuffing is not optional: deleting the 00 turns the FF into
    // a marker mid-scan and the file must degrade to None
    val ffAt = bytes.length - 2 - 3 // the data FF sits before 00 00 FF D9
    assert((bytes(ffAt) & 0xFF) == 0xFF && (bytes(ffAt + 1) & 0xFF) == 0x00)
    val unstuffed = bytes.take(ffAt + 1) ++ bytes.drop(ffAt + 2)
    assert(JpegCodec.decode(unstuffed).isEmpty)
  }

  test("the general AC path: one (0,1) coefficient makes a y-invariant cosine ramp") {
    // hand-built 8x8: DC 0, one AC coefficient at zigzag k=1 (u=1,
    // v=0, value +1, dequantized 16). The IDCT then is
    // 128 + (16/(4*sqrt(2)))*cos((2x+1)*pi/16): constant down columns,
    // antisymmetric about the block center, strictly decreasing in x.
    // An AC table with three 2-bit codes (EOB, size-1, size-2+run)
    // exercises the non-trivial canonical build.
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)
    marker(0xDB); u16(67); out.write(0x00)
    (0 until 64).foreach(_ => out.write(16))
    marker(0xC4); u16(2 + 17 + 12); out.write(0x00)
    (1 to 16).foreach(l => out.write(if (l == 4) 12 else 0))
    (0 until 12).foreach(out.write)
    marker(0xC4); u16(2 + 17 + 3); out.write(0x10)
    (1 to 16).foreach(l => out.write(if (l == 2) 3 else 0))
    out.write(0x00); out.write(0x01); out.write(0x11) // EOB='00' (0,1)='01' (1,1)='10'
    marker(0xC0); u16(11); out.write(8); u16(8); u16(8)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    marker(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // DC cat0 '0000' + AC (0,1) '01' + mag '1' + EOB '00' = 9 bits,
    // ones-padded to 0x05 0xFF?? -> 0000 01 1 00 + 1111111 pad:
    // 00000110 01111111 = 0x06 0x7F
    Seq(0x06, 0x7F).foreach(out.write)
    marker(0xD9)
    val g = JpegCodec.decode(out.toByteArray).getOrElse(fail("AC stream rejected"))
    assert(g.width == 8 && g.height == 8)
    val row0 = (0 until 8).map(x => g.pixels(x) & 0xFF)
    // y-invariance: F(u,v)=0 for v>0
    for (y <- 1 until 8; x <- 0 until 8)
      assert((g.pixels(y * 8 + x) & 0xFF) == row0(x), s"($x,$y)")
    // antisymmetry about the center (cos((2(7-x)+1)pi/16) = -cos(...))
    for (x <- 0 until 4) assert(row0(x) + row0(7 - x) == 256, s"x=$x")
    // cosine ramp (non-increasing; adjacent samples may tie after
    // rounding), with the exact endpoint values
    for (x <- 0 until 7) assert(row0(x) >= row0(x + 1), s"x=$x")
    assert(row0(0) == 131 && row0(7) == 125) // 128 +- 2.77
  }

  test("4:2:0 color: MCU interleave, chroma predictors, and BT.601 match the closed form") {
    Seq(0L, 1L, 2L, 3L, 7L, 123L).foreach { id =>
      val c = JpegCodec.decodeColor(JpegGen.jpegColor(id)).getOrElse(fail(s"id=$id"))
      assert(c.width == 16 * (1 + id % 2) && c.height == 16 * (1 + (id * 3) % 2))
      for (y <- 0 until c.height; x <- 0 until c.width) {
        val mx = x / 16; val my = y / 16
        val j = (y % 16) / 8 * 2 + (x % 16) / 8
        val yv = (128 + 2 * JpegGen.dcY(id, mx, my, j)).toDouble
        val cb = 2 * JpegGen.dcCb(id, mx, my)
        val cr = 2 * JpegGen.dcCr(id, mx, my)
        def cl(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
        val i = (y * c.width + x) * 3
        assert((c.pixels(i) & 0xFF) == cl(math.round(yv + 1.402 * cr)), s"r $id ($x,$y)")
        assert((c.pixels(i + 1) & 0xFF) ==
          cl(math.round(yv - 0.344136 * cb - 0.714136 * cr)), s"g $id ($x,$y)")
        assert((c.pixels(i + 2) & 0xFF) == cl(math.round(yv + 1.772 * cb)), s"b $id ($x,$y)")
      }
    }
    // the two decode fronts are mutually exclusive on ncomp
    assert(JpegCodec.decode(JpegGen.jpegColor(5L)).isEmpty)
    assert(JpegCodec.decodeColor(JpegGen.jpeg(5L)).isEmpty)
  }

  test("restart markers: DRI streams decode; sequence and presence are checked") {
    // odd ids carry DRI=1 with RST0..RST2 between their four MCUs —
    // covered by the closed-form test above; here pin the checking:
    val base = JpegGen.jpegColor(7L)
    // locate the first RST marker (FF D0 after the SOS header)
    val sos = base.indices.find(i => (base(i) & 0xFF) == 0xFF &&
      (base(i + 1) & 0xFF) == 0xDA).get
    val rst0 = (sos until base.length - 1).find(i =>
      (base(i) & 0xFF) == 0xFF && (base(i + 1) & 0xFF) == 0xD0)
      .getOrElse(fail("no RST0 in an odd-id color stream"))
    // out-of-sequence: RST0 -> RST5 must shear to None
    val wrongSeq = base.clone(); wrongSeq(rst0 + 1) = 0xD5.toByte
    assert(JpegCodec.decodeColor(wrongSeq).isEmpty)
    // missing restart: excising the marker must shear to None (the
    // decoder EXPECTS a restart exactly there)
    val excised = base.take(rst0) ++ base.drop(rst0 + 2)
    assert(JpegCodec.decodeColor(excised).isEmpty)
    // even ids have no DRI and no restarts — and decode fine
    assert(JpegCodec.decodeColor(JpegGen.jpegColor(6L)).isDefined)
  }

  test("progressive: three scans reconstruct the baseline image exactly") {
    Seq(0L, 1L, 3L, 7L, 12L, 123L, 9999L).foreach { id =>
      val p = JpegCodec.decode(JpegGen.jpegProgressive(id)).getOrElse(fail(s"id=$id"))
      val b = JpegCodec.decode(JpegGen.jpeg(id)).get
      assert(p.width == b.width && p.height == b.height, s"id=$id dims")
      assert(java.util.Arrays.equals(p.pixels, b.pixels),
        s"id=$id progressive != baseline")
    }
  }

  test("progressive: refinement and EOB-runs are load-bearing; AC refinement degrades") {
    val base = JpegGen.jpegProgressive(42L) // 24x8: 3 blocks, odd dcs exist
    // dropping the EOI leaves the accumulation unfinalized -> None
    assert(JpegCodec.decode(base.dropRight(2)).isEmpty)
    // flipping a refinement bit changes a dc by exactly 1 -> pixels
    // shift by 2 in one block (proves the scan is actually read):
    // find scan 2 (the second SOS) and flip its first payload bit
    val sosIdx = base.indices.filter(i => (base(i) & 0xFF) == 0xFF &&
      (base(i + 1) & 0xFF) == 0xDA)
    assert(sosIdx.length == 3)
    val scan2Payload = sosIdx(1) + 2 + 8 // marker + len(2+6) header
    val flipped = base.clone()
    flipped(scan2Payload) = (flipped(scan2Payload) ^ 0x80).toByte
    val f = JpegCodec.decode(flipped)
    if (f.isDefined) {
      val orig = JpegCodec.decode(base).get
      assert(!java.util.Arrays.equals(f.get.pixels, orig.pixels),
        "flipped refinement bit decoded to identical pixels")
    }
    // an AC REFINEMENT scan (Ss>0, Ah>0) is supported since the r17
    // review round (JpegAcRefineSpec pins its semantics): patching
    // scan 3's AhAl from 0x00 to 0x10 turns the all-zero EOB-run band
    // into a refinement that corrects nothing — the image must decode
    // IDENTICALLY (the EOBRUN extra-bit reads are the same either
    // way, and no correction bits are consumed on an all-zero band)
    val scan3AhAl = sosIdx(2) + 2 + 2 + 5 // marker, len, ns+comp+Ss+Se
    val acr = base.clone()
    assert((acr(scan3AhAl) & 0xFF) == 0x00)
    acr(scan3AhAl) = 0x10.toByte
    val refined = JpegCodec.decode(acr)
    assert(refined.isDefined, "no-op AC refinement must decode")
    assert(java.util.Arrays.equals(refined.get.pixels,
      JpegCodec.decode(base).get.pixels))
  }

  test("decode is total and rejects the unsupported forms as None") {
    val base = JpegGen.jpeg(42L)
    // a decoder is conventionally lenient about a missing EOI once
    // every block has decoded, so truncation must yield None only
    // once the cut reaches the entropy data; before that, no throw
    val sosAt = base.indices.find(i => (base(i) & 0xFF) == 0xFF &&
      (base(i + 1) & 0xFF) == 0xDA).get
    var n = base.length - 1
    while (n > 0) {
      val r = JpegCodec.decode(base.take(n))
      if (n <= sosAt + 10) assert(r.isEmpty, s"truncated to $n decoded")
      n = n * 3 / 4 - 1
    }
    assert(JpegCodec.decode(null).isEmpty)
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    // progressive (SOF2) and restart intervals (DRI) degrade, not lie
    val prog = base.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xFF) == 0xFF &&
      (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // flip every byte once: never a throw (the entropy stream has no
    // CRC; wrong-but-decodable pixels are the oracle gate's job)
    base.indices.foreach { k =>
      val m = base.clone(); m(k) = (m(k) ^ 0x5A).toByte
      JpegCodec.decode(m)
    }
  }
}
