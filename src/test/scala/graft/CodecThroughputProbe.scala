package graft

/** One-off pricing of the r17 real media codecs at REALISTIC asset
  * sizes (the gate corpora deliberately use tiny closed-form images;
  * this probe answers "what does a 100 TB mixed-media shard cost to
  * decode"): PNG 256×256 RGB through deflate + the five filters, GIF
  * 256×256 through variable-width LZW, baseline-JPEG 1024×1024
  * grayscale through Huffman + the float IDCT, and WAV 10-s stereo
  * PCM — per-codec MB/s of DECODED payload and of CONTAINER bytes,
  * single-threaded (the operators are embarrassingly parallel narrow
  * maps, so corpus cost = this ÷ cores). Run via
  * Test/runMain graft.CodecThroughputProbe. */
object CodecThroughputProbe {

  private def time[A](reps: Int)(body: => A): Double = {
    body // warmup
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) { body; i += 1 }
    (System.nanoTime() - t0) / 1e9 / reps
  }

  def main(args: Array[String]): Unit = {
    // PNG: 256x256 RGB, structured content, mixed filters
    val w = 256; val h = 256
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < rgb.length) { rgb(i) = ((i * 31 + i / 7) % 256).toByte; i += 1 }
    val png = graft.sources.PngCodec.encode(w, h, rgb, _ % 5)
    val pngSec = time(20)(graft.sources.PngCodec.decode(png).get)
    report("png_256rgb", png.length, w * h * 3, pngSec)

    // GIF: 256x256 palette, structured (stresses dict growth/reset)
    val idx = new Array[Byte](w * h)
    i = 0
    while (i < idx.length) { idx(i) = ((i * 7 + i / 11) % 256).toByte; i += 1 }
    val gif = graft.sources.GifCodec.encode(w, h, idx, graft.sources.GifGen.Palette)
    val gifSec = time(20)(graft.sources.GifCodec.decode(gif).get)
    report("gif_256pal", gif.length, w * h * 3, gifSec)

    // JPEG: 1024x1024 grayscale DC-only (the gate's coding shape at
    // photo geometry; the IDCT runs for every block either way, so
    // this prices the decoder's per-pixel floor)
    val jw = 1024; val jh = 1024
    val bigJpeg = graft.sources.JpegGen.jpegOfSize(3L, jw, jh)
    val jpegSec = time(20)(graft.sources.JpegCodec.decode(bigJpeg).get)
    report("jpeg_1024gray", bigJpeg.length, jw * jh, jpegSec)

    // color JPEG: 1024x1024 4:2:0 with restart markers (odd id) —
    // 1.5 blocks/pixel-area of IDCT plus upsample + BT.601 per pixel
    val bigColor = graft.sources.JpegGen.jpegColorOfSize(3L, jw, jh)
    val colorSec = time(10)(graft.sources.JpegCodec.decodeColor(bigColor).get)
    report("jpeg_1024ycbcr", bigColor.length, jw * jh * 3, colorSec)

    // progressive JPEG: the same geometry over three scans (DC first,
    // DC refinement, AC band EOB-runs) — prices the multi-scan
    // coefficient-accumulation overhead vs the baseline row
    val bigProg = graft.sources.JpegGen.jpegProgressiveOfSize(3L, jw, jh)
    val progSec = time(20)(graft.sources.JpegCodec.decode(bigProg).get)
    report("jpeg_1024prog", bigProg.length, jw * jh, progSec)

    // WAV: 10-s 44.1 kHz stereo (payload >> header; pure LE16 parse)
    val bigWav = {
      val ch = 2; val nf = 441000
      val data = new Array[Byte](nf * ch * 2)
      var k = 0
      while (k < data.length) { data(k) = (k * 13 % 256).toByte; k += 1 }
      // reuse SampleGen's framing for a big payload via raw assembly
      val bo = new java.io.ByteArrayOutputStream(data.length + 64)
      def le16(v: Int): Unit = { bo.write(v & 0xFF); bo.write((v >> 8) & 0xFF) }
      def le32(v: Long): Unit = { le16((v & 0xFFFF).toInt); le16(((v >> 16) & 0xFFFF).toInt) }
      def s(t: String): Unit = bo.write(t.getBytes("US-ASCII"))
      s("RIFF"); le32(36L + data.length); s("WAVE")
      s("fmt "); le32(16); le16(1); le16(ch); le32(44100); le32(44100L * ch * 2)
      le16(ch * 2); le16(16)
      s("data"); le32(data.length.toLong); bo.write(data)
      bo.toByteArray
    }
    val wavSec = time(20)(graft.sources.WavCodec.decode(bigWav).get)
    report("wav_10s_stereo", bigWav.length, 441000 * 2 * 2, wavSec)
  }

  private def report(label: String, container: Int, payload: Int, sec: Double): Unit =
    println(f"CODECTHRU $label%-15s container=${container / 1e6}%8.3f MB " +
      f"payload=${payload / 1e6}%8.3f MB sec=$sec%8.5f " +
      f"containerMBps=${container / 1e6 / sec}%8.1f payloadMBps=${payload / 1e6 / sec}%8.1f")
}
