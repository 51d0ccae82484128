package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SampleGen, WavCodec}

/** Pins the real WAV PCM codec behind `mm_decode_samples`:
  * closed-form sample recovery through the chunk walk (pad byte
  * included), LE16 sign extension, de-interleaving, and
  * PdfText-class totality (lying sizes, truncation, unsupported
  * forms never throw). */
class WavCodecSpec extends AnyFunSuite {

  test("SampleGen samples match the closed form after a real decode") {
    Seq(0L, 1L, 2L, 7L, 63L, 127L, 9999L).foreach { id =>
      val pcm = WavCodec.decode(SampleGen.wav(id)).getOrElse(fail(s"id=$id"))
      val ch = 1 + (id % 2).toInt
      val nf = 64 + (id % 128).toInt
      assert(pcm.channels == ch)
      assert(pcm.rate == 8000 + (id % 5).toInt * 4000)
      assert(pcm.samples.length == nf * ch)
      for (t <- 0 until nf; c <- 0 until ch)
        assert(pcm.samples(t * ch + c).toInt == SampleGen.sample(id, t, c),
          s"id=$id t=$t c=$c")
    }
  }

  test("the pad byte on the odd-sized ancillary chunk is load-bearing") {
    // SampleGen frames data behind a LIST chunk with an odd payload;
    // strip the pad byte and the data magic lands off-by-one — a
    // decoder that word-aligns correctly reads samples, one that
    // doesn't must degrade to None on the mangled copy (not throw,
    // not misread)
    val good = SampleGen.wav(5L)
    assert(WavCodec.decode(good).isDefined)
    val listAt = {
      var i = 12; var at = -1
      while (at < 0 && i + 8 <= good.length) {
        if (good(i) == 'L' && good(i + 1) == 'I' && good(i + 2) == 'S' &&
          good(i + 3) == 'T') at = i
        else i += 1
      }
      at
    }
    assert(listAt > 0)
    // drop the pad byte following LIST's 5-byte payload
    val mangled = good.take(listAt + 8 + 5) ++ good.drop(listAt + 8 + 6)
    assert(WavCodec.decode(mangled).isEmpty)
  }

  test("decode is total and degrades on malformed or unsupported input") {
    val base = SampleGen.wav(42L)
    // truncation ladder: never throws; a cut anywhere inside data is
    // either a lying-size bailout or a partial-frame rejection
    var n = base.length - 1
    while (n > 0) {
      assert(WavCodec.decode(base.take(n)).isEmpty, s"truncated to $n decoded")
      n = n * 3 / 4 - 1
    }
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVEnot really".getBytes).isEmpty)
    // non-PCM format tag and non-16-bit depth degrade
    def patched16(off: Int, v: Int): Array[Byte] = {
      val m = base.clone()
      m(off) = (v & 0xFF).toByte; m(off + 1) = ((v >> 8) & 0xFF).toByte
      m
    }
    // fmt is the first chunk SampleGen writes: tag at 20, bits at 34
    assert(WavCodec.decode(patched16(20, 3)).isEmpty)  // IEEE float tag
    assert(WavCodec.decode(patched16(34, 8)).isEmpty)  // 8-bit depth
    assert(WavCodec.decode(patched16(22, 0)).isEmpty)  // zero channels
    // a lying data size (fits the file, overruns the remainder) bails
    val dataAt = {
      var i = 12; var at = -1
      while (at < 0 && i + 8 <= base.length) {
        if (base(i) == 'd' && base(i + 1) == 'a' && base(i + 2) == 't' &&
          base(i + 3) == 'a') at = i
        else i += 1
      }
      at
    }
    assert(dataAt > 0)
    val lying = base.clone()
    val lie = base.length - dataAt // > remaining after the header
    lying(dataAt + 4) = (lie & 0xFF).toByte
    lying(dataAt + 5) = ((lie >> 8) & 0xFF).toByte
    lying(dataAt + 6) = 0; lying(dataAt + 7) = 0
    assert(WavCodec.decode(lying).isEmpty)
    // flip every byte once: never a throw
    base.indices.foreach { k =>
      val m = base.clone(); m(k) = (m(k) ^ 0x5A).toByte
      WavCodec.decode(m) // must not throw; value checked via the gate
    }
  }
}
