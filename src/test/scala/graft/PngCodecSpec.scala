package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PixelGen, PngCodec}

/** Pins the real PNG codec behind `mm_decode_pixels`: exact
  * round-trips under every filter type, closed-form pixel recovery
  * through deflate + unfiltering, chunk-CRC rejection, and
  * PdfText-class totality (truncation/mutation ladders never throw). */
class PngCodecSpec extends AnyFunSuite {

  private def rgbOf(w: Int, h: Int)(f: (Int, Int, Int) => Int): Array[Byte] = {
    val a = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 to 2)
      a((y * w + x) * 3 + c) = (f(x, y, c) & 0xFF).toByte
    a
  }

  test("encode/decode round-trips under each filter type and the cycling mix") {
    val w = 13; val h = 11
    val rgb = rgbOf(w, h)((x, y, c) => x * 31 + y * 17 + c * 97)
    (0 to 4).foreach { f =>
      val img = PngCodec.decode(PngCodec.encode(w, h, rgb, _ => f))
        .getOrElse(fail(s"filter $f failed to decode"))
      assert(img.width == w && img.height == h && img.channels == 3)
      assert(java.util.Arrays.equals(img.pixels, rgb), s"filter $f mismatch")
    }
    val mixed = PngCodec.decode(PngCodec.encode(w, h, rgb, _ % 5)).get
    assert(java.util.Arrays.equals(mixed.pixels, rgb))
    // degenerate dims round-trip too (1-pixel rows exercise the
    // no-left-neighbor edge of Sub/Average/Paeth)
    val thin = rgbOf(1, 7)((x, y, c) => y * 40 + c)
    assert(java.util.Arrays.equals(
      PngCodec.decode(PngCodec.encode(1, 7, thin, _ % 5)).get.pixels, thin))
  }

  test("PixelGen pixels match the closed form after a real decode") {
    Seq(0L, 1L, 7L, 12L, 123L, 9999L).foreach { id =>
      val img = PngCodec.decode(PixelGen.png(id)).getOrElse(fail(s"id=$id"))
      assert(img.width == 4 + (id % 12) && img.height == 4 + ((id * 3) % 12))
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val i = (y * img.width + x) * 3
        assert((img.pixels(i) & 0xFF) == (x * 3 + y * 5 + id) % 256, s"r $id ($x,$y)")
        assert((img.pixels(i + 1) & 0xFF) == (x * 7 + y + 2 * id) % 256, s"g $id ($x,$y)")
        assert((img.pixels(i + 2) & 0xFF) == (x + y * 11 + 3 * id) % 256, s"b $id ($x,$y)")
      }
    }
  }

  test("ahash: uniform image hashes to 0; a lit quadrant sets exactly its cells") {
    val w = 8; val h = 8
    val flat = rgbOf(w, h)((_, _, _) => 100)
    assert(PngCodec.ahash(PngCodec.decode(PngCodec.encode(w, h, flat, _ % 5)).get) == 0)
    // light up the top-left quadrant: its four 4x4 cells (gx,gy in
    // 0..1 -> bits 0,1,4,5) exceed the mean, the rest sit below it
    val quad = rgbOf(w, h)((x, y, _) => if (x < 4 && y < 4) 200 else 10)
    val hq = PngCodec.ahash(PngCodec.decode(PngCodec.encode(w, h, quad, _ % 5)).get)
    assert(hq == ((1 << 0) | (1 << 1) | (1 << 4) | (1 << 5)))
    // the mean rule is strict: exactly-at-mean cells contribute 0
    // (cross-multiplied integers, no float threshold), and the hash
    // is stable under the filter mix (pixels, not encoding, decide)
    val hq0 = PngCodec.ahash(PngCodec.decode(PngCodec.encode(w, h, quad, _ => 0)).get)
    assert(hq0 == hq)
  }

  test("decode is total and rejects silent corruption") {
    val base = PixelGen.png(42L)
    // truncation ladder: never throws, returns None once IDAT/IEND gone
    var n = base.length
    while (n > 0) {
      assert(PngCodec.decode(base.take(n)).isEmpty || n == base.length)
      n = n * 3 / 4 - 1
    }
    // flip every byte once: either None (CRC catches it) or a decode
    // — never a throw. Flips in IDAT *data* must be caught by the
    // chunk CRC, not silently decoded to wrong pixels.
    base.indices.foreach { k =>
      val m = base.clone(); m(k) = (m(k) ^ 0x3C).toByte
      val r = PngCodec.decode(m)
      if (r.isDefined) {
        // only a flip that leaves all CRCs valid may still decode —
        // with CRC32 over type+data a single-byte flip inside a
        // covered region can't; flips here are outside covered bytes
        // (e.g. the length field compensated... none exists) — so a
        // successful decode must be the unflipped pixel content
        assert(java.util.Arrays.equals(r.get.pixels,
          PngCodec.decode(base).get.pixels), s"flip at $k decoded to different pixels")
      }
    }
    assert(PngCodec.decode(null).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decode("not a png at all, just text".getBytes).isEmpty)
    // unsupported forms degrade: 16-bit depth and interlace flags
    val deep = base.clone(); deep(24) = 16.toByte // IHDR bit depth
    assert(PngCodec.decode(deep).isEmpty) // (CRC breaks first — still None)
  }
}
