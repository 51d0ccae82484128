package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MediaGen, MediaProbe}

/** Pins the real header parsers behind `mm_probe_format`: exact field
  * recovery per format, the marker/chunk WALKS (a fixed-offset peek
  * fails these), endianness, the documented closed-form container
  * sizes, and PdfText-class totality (truncation ladders, corrupt
  * magics, lying sizes never throw — they degrade to "unknown"). */
class MediaProbeSpec extends AnyFunSuite {

  test("png/jpeg/gif/wav probe to exact geometry; sizes match the closed forms") {
    val p = MediaProbe.probe(1L, MediaGen.png(640, 480))
    assert(p.format == "png" && p.width == 640 && p.height == 480)
    assert(p.n_bytes == MediaGen.PngBytes)
    val j = MediaProbe.probe(1L, MediaGen.jpeg(1024, 768))
    assert(j.format == "jpeg" && j.width == 1024 && j.height == 768)
    assert(j.n_bytes == MediaGen.JpegBytes)
    val g = MediaProbe.probe(1L, MediaGen.gif(320, 200))
    assert(g.format == "gif" && g.width == 320 && g.height == 200)
    assert(g.n_bytes == MediaGen.GifBytes)
    val w = MediaProbe.probe(1L, MediaGen.wav(channels = 2, rate = 16000, nsamples = 8000))
    assert(w.format == "wav" && w.channels == 2 && w.sample_rate == 16000)
    assert(w.duration_ms == 500) // 8000 samples at 16 kHz
    assert(w.n_bytes == MediaGen.WavHeaderBytes + 8000L * 2 * 2)
    // audio has no dims, stills no audio geometry (zeros, not garbage)
    assert(p.channels == 0 && p.sample_rate == 0 && p.duration_ms == 0)
    assert(w.width == 0 && w.height == 0)
  }

  test("jpeg probe WALKS markers (APP0 first) and rejects SOS/EOI before SOF") {
    // the generator puts APP0 before SOF0, so the passing case above
    // already requires a walk; here an EXTRA comment segment moves
    // SOF0 further still
    val base = MediaGen.jpeg(100, 50)
    val comment = Array(0xFF, 0xFE, 0x00, 0x06).map(_.toByte) ++ "hihi".getBytes
    val shifted = base.take(2) ++ comment ++ base.drop(2)
    val p = MediaProbe.probe(1L, shifted)
    assert(p.format == "jpeg" && p.width == 100 && p.height == 50)
    // EOI straight after SOI: no frame header to report
    assert(MediaProbe.probe(1L,
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte) ++ new Array[Byte](16))
      .format == "unknown")
  }

  test("wav chunk walk honours word alignment and lying sizes") {
    // an odd-sized junk chunk before fmt: the pad byte must be skipped
    // or fmt misaligns
    val wav = MediaGen.wav(1, 8000, 100)
    val junk = "JUNK".getBytes ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 0) // 3 data bytes + 1 pad
    val padded = wav.take(12) ++ junk ++ wav.drop(12)
    val p = MediaProbe.probe(1L, padded)
    assert(p.format == "wav" && p.sample_rate == 8000, p)
    // a chunk size exceeding the file is a lie -> unknown, no throw
    val lying = wav.clone()
    lying(16) = 0xFF.toByte; lying(17) = 0xFF.toByte
    lying(18) = 0xFF.toByte; lying(19) = 0x7F.toByte
    assert(MediaProbe.probe(1L, lying).format == "unknown")
  }

  test("mp4 probe WALKS boxes: geometry from tkhd, clock from mvhd") {
    val m = MediaProbe.probe(1L, MediaGen.mp4(1920, 1080, durationMs = 4321))
    assert(m.format == "mp4" && m.width == 1920 && m.height == 1080)
    assert(m.duration_ms == 4321)
    assert(m.n_bytes == MediaGen.Mp4Bytes)
    assert(m.channels == 0 && m.sample_rate == 0)
    // a free/skip box BEFORE moov forces a real top-level walk
    val base = MediaGen.mp4(64, 32, 100)
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++ new Array[Byte](4)
    val shifted = base.take(24) ++ free ++ base.drop(24)
    val p = MediaProbe.probe(1L, shifted)
    assert(p.format == "mp4" && p.width == 64 && p.height == 32 && p.duration_ms == 100, p)
    // a lying box size (overruns the file) degrades, never throws
    val lying = base.clone()
    lying(24) = 0x7F.toByte // moov size high byte
    assert(MediaProbe.probe(1L, lying).format == "unknown")
    // ftyp not first -> not probed as mp4
    assert(MediaProbe.probe(1L, free ++ base).format == "unknown")
  }

  test("mp3 probe: ID3v2 synchsafe skip, header tables, CBR duration") {
    // 128 kbps (idx 9) at 44100 (idx 0), stereo (mode 0), 4 frames:
    // frame length = 144000*128/44100 = 417 bytes
    val bare = MediaGen.mp3(brIdx = 9, srIdx = 0, mode = 0, nFrames = 4, tagLen = 0)
    assert(bare.length == 4 * 417)
    val p = MediaProbe.probe(1L, bare)
    assert(p.format == "mp3" && p.channels == 2 && p.sample_rate == 44100)
    assert(p.duration_ms == 4L * 417 * 8 / 128, p) // ~104 ms
    // mono (mode 3), 320 kbps (idx 14) at 32000 (idx 2), behind an
    // ID3v2 tag: the tag must be skipped via its SYNCHSAFE size and
    // excluded from the CBR payload
    val tagged = MediaGen.mp3(14, 2, 3, nFrames = 2, tagLen = 200)
    val q = MediaProbe.probe(1L, tagged)
    val flen = 144000 * 320 / 32000
    assert(q.format == "mp3" && q.channels == 1 && q.sample_rate == 32000)
    assert(q.n_bytes == 10 + 200 + 2 * flen)
    assert(q.duration_ms == 2L * flen * 8 / 320, q)
    // free bitrate (idx 0) and reserved sample-rate idx 3 degrade
    val bad = bare.clone(); bad(2) = 0x0C.toByte // brIdx 0, srIdx 3
    assert(MediaProbe.probe(1L, bad).format == "unknown")
    // MPEG2 / other layers are undocumented -> unknown, not a wrong
    // duration coefficient
    val v2 = bare.clone(); v2(1) = 0xF3.toByte // version 10 (MPEG2)
    assert(MediaProbe.probe(1L, v2).format == "unknown")
  }

  test("probe is total: truncation ladders and corrupt magics never throw") {
    val corpora = Seq(MediaGen.png(33, 44), MediaGen.jpeg(12, 34),
      MediaGen.gif(5, 6), MediaGen.wav(2, 44100, 123),
      MediaGen.mp4(77, 55, 999), MediaGen.mp3(5, 1, 2, 3, 40),
      "plain text bytes".getBytes)
    corpora.foreach { base =>
      var n = base.length
      while (n > 0) {
        val r = MediaProbe.probe(1L, base.take(n))
        assert(r != null && r.format != null)
        n = n * 2 / 3
      }
      // flip every byte position once (cheap deterministic mutants)
      base.indices.foreach { k =>
        val m = base.clone(); m(k) = (m(k) ^ 0x5A).toByte
        assert(MediaProbe.probe(1L, m) != null)
      }
    }
    assert(MediaProbe.probe(1L, null).format == "unknown")
    assert(MediaProbe.probe(1L, Array.emptyByteArray).format == "unknown")
  }

  test("the seven gate classes probe to their designed formats end-to-end") {
    (0L to 20L).foreach { id =>
      val r = MediaProbe.probe(id, MediaGen.payload(id, "some text"))
      val want = (id % 7) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"
        case 3 => "wav"; case 5 => "mp4"; case 6 => "mp3"
        case _ => "unknown"
      }
      assert(r.format == want, s"id=$id")
      if (want == "png" || want == "jpeg" || want == "gif" || want == "mp4") {
        assert(r.width == 16 + (id % 97) && r.height == 16 + ((id * 7) % 83))
      }
      if (want == "wav") {
        val rate = 8000 + (id % 5) * 4000
        assert(r.channels == 1 + (id % 2) && r.sample_rate == rate)
        assert(r.duration_ms == (100 + (id % 100)) * 1000 / rate)
      }
      if (want == "mp4") assert(r.duration_ms == 100 + (id % 1000))
      if (want == "mp3") {
        val kbps = MediaProbe.Mp3Kbps(1 + (id % 14).toInt)
        val rate = MediaProbe.Mp3Rates((id % 3).toInt)
        val flen = 144000 * kbps / rate
        val nf = 3 + (id % 6)
        assert(r.channels == (if (id % 4 == 3) 1 else 2))
        assert(r.sample_rate == rate)
        assert(r.duration_ms == nf * flen * 8 / kbps, s"id=$id")
      }
      if (want == "unknown") assert(r.n_bytes == "some text".length + 1)
    }
    // the unknown channel's NUL prefix makes it immune to text that
    // happens to START with a container magic (review r16): the
    // oracle pins class 4 to 'unknown' unconditionally, so the
    // generator must guarantee it
    val adversarial = MediaProbe.probe(4L, MediaGen.payload(4L, "GIF89a trap text"))
    assert(adversarial.format == "unknown")
    assert(MediaProbe.probe(4L,
      MediaGen.payload(4L, "RIFF1234WAVE trap")).format == "unknown")
  }
}
