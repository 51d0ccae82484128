package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GifCodec, GifGen}

/** Pins the real GIF LZW codec behind `mm_decode_gif`: exact
  * round-trips through variable-width codes, the KwKwK case,
  * dictionary resets past 4096 entries, closed-form recovery of the
  * gate corpus, and PdfText-class totality. */
class GifCodecSpec extends AnyFunSuite {

  private def indicesOf(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val a = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) a(y * w + x) = (f(x, y) & 0xFF).toByte
    a
  }

  private def roundTrip(w: Int, h: Int, idx: Array[Byte],
      palette: Array[Byte] = GifGen.Palette): Unit = {
    val img = GifCodec.decode(GifCodec.encode(w, h, idx, palette))
      .getOrElse(fail(s"${w}x$h failed to decode"))
    assert(img.width == w && img.height == h)
    val ncol = palette.length / 3
    for (k <- idx.indices) {
      val c = idx(k) & 0xFF
      assert(c < ncol)
      assert((img.pixels(3 * k) & 0xFF) == (palette(3 * c) & 0xFF), s"r at $k")
      assert((img.pixels(3 * k + 1) & 0xFF) == (palette(3 * c + 1) & 0xFF), s"g at $k")
      assert((img.pixels(3 * k + 2) & 0xFF) == (palette(3 * c + 2) & 0xFF), s"b at $k")
    }
  }

  test("encode/decode round-trips: structured, constant, and adversarial rasters") {
    roundTrip(13, 11, indicesOf(13, 11)((x, y) => x * 31 + y * 17))
    // constant raster: long runs drive the dictionary deep fast
    roundTrip(40, 30, indicesOf(40, 30)((_, _) => 7))
    // the KwKwK pattern: cScSc... sequences force code==next
    roundTrip(16, 1, Array[Byte](1, 1, 1, 1, 1, 1, 1, 1, 2, 1, 1, 2, 1, 1, 2, 1))
    // a tiny palette exercises minCodeSize < 8 widths
    val p4 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    roundTrip(9, 7, indicesOf(9, 7)((x, y) => (x + y) % 4), p4.take(12))
  }

  test("dictionary reset: a raster large enough to exceed 4096 entries round-trips") {
    // 300x200 = 60k pixels of structured content assigns far more
    // than 4096-258 entries, forcing at least one mid-stream clear
    val w = 300; val h = 200
    roundTrip(w, h, indicesOf(w, h)((x, y) => x * 7 + y * 13))
  }

  test("GifGen pixels match the closed form after a real decode") {
    Seq(0L, 1L, 7L, 12L, 123L, 9999L).foreach { id =>
      val img = GifCodec.decode(GifGen.gif(id)).getOrElse(fail(s"id=$id"))
      assert(img.width == 4 + (id % 29) && img.height == 4 + ((id * 3) % 23))
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val c = ((x * 3 + y * 5 + id) % 256).toInt
        val i = (y * img.width + x) * 3
        assert((img.pixels(i) & 0xFF) == c, s"r $id ($x,$y)")
        assert((img.pixels(i + 1) & 0xFF) == (c * 3) % 256, s"g $id ($x,$y)")
        assert((img.pixels(i + 2) & 0xFF) == (c * 7) % 256, s"b $id ($x,$y)")
      }
    }
  }

  test("decode is total and degrades on malformed input") {
    val base = GifGen.gif(42L)
    // truncation ladder: never throws; any cut loses framing or EOI
    var n = base.length - 1
    while (n > 0) {
      GifCodec.decode(base.take(n)) // must not throw
      n = n * 3 / 4 - 1
    }
    assert(GifCodec.decode(null).isEmpty)
    assert(GifCodec.decode(Array.emptyByteArray).isEmpty)
    assert(GifCodec.decode("GIF89a but not really a gif".getBytes).isEmpty)
    // interlace flag rejects
    val inter = base.clone()
    // find the image descriptor (0x2C after the GCE terminator)
    var at = 13 + 256 * 3 // header + GCT
    while ((inter(at) & 0xFF) != 0x2C) at += 1
    inter(at + 9) = (inter(at + 9) | 0x40).toByte
    assert(GifCodec.decode(inter).isEmpty)
    // flip every byte once: never a throw (wrong pixels are caught by
    // the oracle gate, not here; many flips decode — LZW has no CRC)
    base.indices.foreach { k =>
      val m = base.clone(); m(k) = (m(k) ^ 0x5A).toByte
      GifCodec.decode(m)
    }
  }
}
