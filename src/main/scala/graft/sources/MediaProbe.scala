package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed header metadata recovered from a real media container. Zero
  * means not-applicable for the format (audio has no width; stills
  * have no sample rate) — longs, not options, so the frame hashes
  * deterministically. */
case class ProbedMedia(
    doc_id: Long, format: String, n_bytes: Long,
    width: Long, height: Long,
    channels: Long, sample_rate: Long, duration_ms: Long)

/** Real media-format probing (r16) — the ffprobe-style first step of
  * every multimodal pipeline: sniff the container by magic and parse
  * its header for dimensions/audio geometry WITHOUT decoding any
  * samples. Reference context: the reference stores documents as
  * opaque BLOBs and inspects them in-engine
  * (/root/reference/scripts/01_pdf_to_vector.sql:49-59 `pdf_content
  * BLOB` + UTL_TO_TEXT); this is that boundary's media analogue —
  * typed metadata out of a binary column. Unlike the mandated-synthetic decode stub
  * (Multimodal.stubDecode — pixel/sample decoding needs codec libs
  * this container doesn't ship), header parsing is pure byte work, so
  * THIS layer is real: PNG IHDR (big-endian dims), JPEG marker walk
  * to the SOF frame header, GIF logical screen descriptor
  * (little-endian), WAV RIFF chunk walk (fmt geometry + data length →
  * duration), and — r17, VERDICT r16 item 4 — the two containers
  * crawls actually carry in volume: ISO-BMFF/MP4 (box walk to
  * moov/mvhd timescale+duration and trak/tkhd 16.16 geometry,
  * largesize and to-end boxes included) and MP3 (ID3v2 synchsafe tag
  * skip, frame-header sync, MPEG1 Layer III bitrate/sample-rate
  * tables, CBR duration estimate). Anything else is "unknown" with
  * byte-count metadata only.
  *
  * Total on any input: a truncated or corrupt header degrades to
  * "unknown", never throws (the PdfText/WarcText contract). Scale
  * shape: one narrow mapPartitions over the binary column — no
  * shuffle, bounded memory (headers are read positionally; the
  * payload is never copied).
  *
  * The gate corpus ([[MediaGen]]) builds REAL minimal containers —
  * correct magics, CRC'd PNG chunks, JFIF APP0 + SOF0 walks, RIFF
  * chunk layout — with geometry derived from doc_id, so the DuckDB
  * oracle predicts every probed field from doc_id alone and a parser
  * that misreads endianness, walks markers wrong, or misaligns a
  * chunk diverges the hash.
  */
object MediaProbe {

  import ByteIo.{ascii, be16, be32, le16, le32}
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def unknown(id: Long, n: Long) =
    ProbedMedia(id, "unknown", n, 0, 0, 0, 0, 0)

  /** Probe one payload. Total: any malformed/truncated header →
    * "unknown". */
  def probe(id: Long, b: Array[Byte]): ProbedMedia = {
    val n = if (b == null) 0L else b.length.toLong
    if (b == null || b.length < 12) return unknown(id, n)
    try {
      if ((b(0) & 0xFF) == 0x89 && ascii(b, 1, "PNG") &&
          ascii(b, 12, "IHDR") && b.length >= 24)
        // PNG: 8-byte signature, then the IHDR chunk (len+type at
        // 8..15, 4-byte BE width/height at 16/20)
        ProbedMedia(id, "png", n, be32(b, 16), be32(b, 20), 0, 0, 0)
      else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
        // JPEG: walk FF-markers; standalone markers have no length,
        // everything else carries a BE16 segment length; the SOF0-15
        // frame header (except DHT/JPG/DAC C4/C8/CC) holds the dims
        var i = 2
        while (i + 3 < b.length) {
          if ((b(i) & 0xFF) != 0xFF) return unknown(id, n)
          var m = b(i + 1) & 0xFF
          while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF }
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            if (i + 8 >= b.length) return unknown(id, n)
            return ProbedMedia(id, "jpeg", n,
              width = be16(b, i + 7), height = be16(b, i + 5), 0, 0, 0)
          } else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
            i += 2 // standalone marker
          } else if (m == 0xD9 || m == 0xDA) {
            return unknown(id, n) // EOI/SOS before any SOF: no dims
          } else {
            i += 2 + be16(b, i + 2)
          }
        }
        unknown(id, n)
      } else if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))
        // GIF logical screen descriptor: LE16 dims right after the
        // 6-byte version magic
        ProbedMedia(id, "gif", n, le16(b, 6), le16(b, 8), 0, 0, 0)
      else if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
        // WAV: walk RIFF chunks; fmt carries the audio geometry, the
        // data chunk's SIZE with the byte rate gives the duration
        var i = 12
        var channels = 0L; var rate = 0L; var byteRate = 0L; var dataLen = -1L
        while (i + 8 <= b.length && (channels == 0 || dataLen < 0)) {
          val size = le32(b, i + 4)
          // a size that cannot fit the bytes REMAINING after this
          // chunk's own header is a lie: bail BEFORE the advance (a
          // huge u32 would overflow the Int cursor, and a size that
          // fits the file but overruns the remainder would otherwise
          // fabricate a duration from the lie — ADVICE r16)
          if (size < 0 || i.toLong + 8 + size > b.length.toLong) return unknown(id, n)
          if (ascii(b, i, "fmt ") && i + 24 <= b.length) {
            channels = le16(b, i + 10).toLong
            rate = le32(b, i + 12)
            byteRate = le32(b, i + 16)
          } else if (ascii(b, i, "data")) dataLen = size
          // chunks are word-aligned: odd sizes carry a pad byte
          i += 8 + size.toInt + (size % 2).toInt
        }
        if (channels == 0 || rate <= 0 || byteRate <= 0 || dataLen < 0)
          unknown(id, n)
        else
          ProbedMedia(id, "wav", n, 0, 0, channels, rate,
            duration_ms = dataLen * 1000L / byteRate)
      } else if (ascii(b, 4, "ftyp")) {
        // ISO-BMFF (MP4 family, r17): boxes are [u32be size][4cc type]
        // (size 1 → u64 largesize follows; size 0 → to end-of-file),
        // ftyp REQUIRED first. Geometry lives in moov/trak/tkhd (16.16
        // fixed-point width/height), the clock in moov/mvhd (timescale
        // ticks/s + duration ticks; v0 = u32 fields, v1 = u64 times).
        var timescale = 0L; var durTicks = -1L; var w = 0L; var h = 0L
        def walk(from: Long, to: Long, depth: Int): Unit = {
          var i = from
          while (depth < 8 && i + 8 <= to) {
            var size: Long = be32(b, i.toInt)
            var hdr = 8
            if (size == 1 && i + 16 <= to) { size = be64(b, i.toInt + 8); hdr = 16 }
            else if (size == 0) size = to - i
            // a size that cannot fit its own header or the enclosing
            // box is a lie: stop walking this level, keep what we have
            if (size < hdr || i + size > to) return
            val t = i.toInt + 4
            val p = i.toInt + hdr // payload start
            if (ascii(b, t, "moov") || ascii(b, t, "trak"))
              walk(i + hdr, i + size, depth + 1)
            else if (ascii(b, t, "mvhd") && p < to) {
              val v = b(p) & 0xFF
              if (v == 0 && p + 20 <= to) {
                timescale = be32(b, p + 12); durTicks = be32(b, p + 16)
              } else if (v == 1 && p + 32 <= to) {
                timescale = be32(b, p + 20); durTicks = be64(b, p + 24)
              }
            } else if (ascii(b, t, "tkhd") && p < to) {
              val v = b(p) & 0xFF
              val (wo, ho) = if (v == 1) (88, 92) else (76, 80)
              if (p + ho + 4 <= to) {
                w = be32(b, p + wo) >> 16; h = be32(b, p + ho) >> 16
              }
            }
            i += size
          }
        }
        walk(0L, b.length.toLong, 0)
        if (timescale <= 0 || durTicks < 0) unknown(id, n)
        else ProbedMedia(id, "mp4", n, w, h, 0, 0,
          duration_ms = durTicks * 1000L / timescale)
      } else {
        // MP3 (r17): an optional ID3v2 tag ('ID3' + 2 version bytes +
        // flags + u32 SYNCHSAFE size), then the first frame header —
        // 11 sync bits, version/layer bits, bitrate + sample-rate
        // indexes, channel mode. Only MPEG1 Layer III is documented
        // (the crawl-dominant profile); anything else degrades to
        // unknown rather than guessing a wrong duration coefficient.
        val off =
          if (ascii(b, 0, "ID3") && b.length >= 10)
            10 + (((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
              ((b(8) & 0x7F) << 7) | (b(9) & 0x7F))
          else 0
        if (off + 4 <= b.length && (b(off) & 0xFF) == 0xFF &&
            (b(off + 1) & 0xE0) == 0xE0) {
          val b1 = b(off + 1) & 0xFF
          val version = (b1 >> 3) & 3 // 3 = MPEG1
          val layer = (b1 >> 1) & 3   // 1 = Layer III
          val b2 = b(off + 2) & 0xFF
          val brIdx = b2 >> 4
          val srIdx = (b2 >> 2) & 3
          if (version != 3 || layer != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3)
            unknown(id, n)
          else {
            val kbps = Mp3Kbps(brIdx)
            val rate = Mp3Rates(srIdx)
            val mode = (b(off + 3) & 0xFF) >> 6
            val channels = if (mode == 3) 1L else 2L
            // CBR estimate over the audio payload (everything after
            // the tag): ms = bytes*8 / kbps — the ffprobe shortcut
            ProbedMedia(id, "mp3", n, 0, 0, channels, rate,
              duration_ms = (n - off) * 8L / kbps)
          }
        } else unknown(id, n)
      }
    } catch { case scala.util.control.NonFatal(_) => unknown(id, n) }
  }

  /** MPEG1 Layer III bitrate table (kbps, index 1-14; 0/15 invalid)
    * and MPEG1 sample-rate table (index 3 reserved) — ISO 11172-3. */
  private[graft] val Mp3Kbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private[graft] val Mp3Rates: Array[Int] = Array(44100, 48000, 32000)

  /** Per-format aggregate over the gate corpus — a narrow probe map,
    * then one partial-agg groupBy on the 7-value format key. */
  def probeFormat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MediaGen.mediaTable(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => probe(id, bytes) })
      .toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        sum("width").as("sum_width"),
        sum("height").as("sum_height"),
        sum("channels").as("sum_channels"),
        sum("sample_rate").as("sum_rate"),
        sum("duration_ms").as("sum_duration_ms"))
      .orderBy("format")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_probe_format" -> (probeFormat _))

  /** The oracle predicts every probed field from doc_id via the
    * generator formulas — byte counts included (container sizes are
    * closed-form: fixed framing plus the WAV data length, the MP3
    * tag+frame arithmetic, the fixed ISO-BMFF box layout). */
  val oracleSql: Map[String, String] = Map(
    "mm_probe_format" ->
      s"""WITH m AS (
         |  SELECT doc_id, doc_id % 7 AS cls,
         |    16 + (doc_id % 97) AS w, 16 + ((doc_id * 7) % 83) AS h,
         |    1 + (doc_id % 2) AS ch, 8000 + (doc_id % 5) * 4000 AS rate,
         |    100 + (doc_id % 100) AS nsamp,
         |    100 + (doc_id % 1000) AS mp4dur,
         |    -- MPEG1 Layer III tables, indexed by the generator params
         |    CASE 1 + (doc_id % 14)
         |      WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
         |      WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
         |      WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
         |      WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS kbps,
         |    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
         |      ELSE 32000 END AS mrate,
         |    CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 2 END AS mch,
         |    3 + (doc_id % 6) AS nframes,
         |    CASE WHEN doc_id % 2 = 1 THEN 10 + (doc_id % 30) + 1
         |      ELSE 0 END AS taglen,
         |    -- BYTES, not codepoints (DuckDB length() counts the
         |    -- latter); +1 for the generator's NUL prefix
         |    1 + octet_length(encode(coalesce(text, ''))) AS tlen
         |  FROM documents),
         |m2 AS (SELECT *, (144000 * kbps) // mrate AS flen FROM m),
         |p AS (
         |  SELECT doc_id,
         |    CASE cls WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
         |      WHEN 3 THEN 'wav' WHEN 5 THEN 'mp4' WHEN 6 THEN 'mp3'
         |      ELSE 'unknown' END AS format,
         |    CASE cls
         |      WHEN 0 THEN ${MediaGen.PngBytes}
         |      WHEN 1 THEN ${MediaGen.JpegBytes}
         |      WHEN 2 THEN ${MediaGen.GifBytes}
         |      WHEN 3 THEN ${MediaGen.WavHeaderBytes} + nsamp * ch * 2
         |      WHEN 5 THEN ${MediaGen.Mp4Bytes}
         |      WHEN 6 THEN taglen + nframes * flen
         |      ELSE tlen END AS n_bytes,
         |    CASE WHEN cls IN (0, 1, 2, 5) THEN w ELSE 0 END AS width,
         |    CASE WHEN cls IN (0, 1, 2, 5) THEN h ELSE 0 END AS height,
         |    CASE WHEN cls = 3 THEN ch WHEN cls = 6 THEN mch
         |      ELSE 0 END AS channels,
         |    CASE WHEN cls = 3 THEN rate WHEN cls = 6 THEN mrate
         |      ELSE 0 END AS sample_rate,
         |    -- wav: dataLen*1000 // byteRate = nsamp*1000 // rate;
         |    -- mp4: mvhd ticks at timescale 1000 = ms verbatim;
         |    -- mp3: CBR payload bytes*8 // kbps
         |    CASE WHEN cls = 3 THEN (nsamp * 1000) // rate
         |      WHEN cls = 5 THEN mp4dur
         |      WHEN cls = 6 THEN (nframes * flen * 8) // kbps
         |      ELSE 0 END AS duration_ms
         |  FROM m2)
         |SELECT format, count(*) AS n_media, sum(n_bytes)::BIGINT AS total_bytes,
         |  sum(width)::BIGINT AS sum_width, sum(height)::BIGINT AS sum_height,
         |  sum(channels)::BIGINT AS sum_channels, sum(sample_rate)::BIGINT AS sum_rate,
         |  sum(duration_ms)::BIGINT AS sum_duration_ms
         |FROM p GROUP BY format ORDER BY format""".stripMargin)
}

/** Deterministic REAL-container generator for the `mm_probe_format`
  * gate: correct magics, CRC'd PNG chunks, a JFIF APP0 segment before
  * the SOF0 (so the prober must WALK markers, not peek a fixed
  * offset), RIFF chunk alignment — geometry closed-form in doc_id so
  * the oracle never parses anything. */
object MediaGen {

  /** Closed-form container sizes (framing bytes), mirrored into the
    * oracle so total_bytes is predicted, not measured. */
  val PngBytes = 8 + 25 + 12       // sig + IHDR(8+13+4) + IEND(8+0+4)
  val JpegBytes = 2 + 18 + 13 + 2  // SOI + APP0(2+16) + SOF0(2+11) + EOI
  val GifBytes = 6 + 7 + 1         // magic + screen descriptor + trailer
  val WavHeaderBytes = 12 + 24 + 8 // RIFF/WAVE + fmt(8+16) + data hdr
  val Mp4Bytes = 24 + 8 + 108 + 8 + 92 // ftyp + moov(mvhd + trak(tkhd))

  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def u16be(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def u32le(v: Long): Array[Byte] = u32be(v).reverse
  private def u16le(v: Int): Array[Byte] = u16be(v).reverse

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    crc.update(t); crc.update(data)
    u32be(data.length.toLong) ++ t ++ data ++ u32be(crc.getValue)
  }

  def png(w: Long, h: Long): Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      pngChunk("IHDR", u32be(w) ++ u32be(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      pngChunk("IEND", Array.emptyByteArray)

  def jpeg(w: Int, h: Int): Array[Byte] =
    Array(0xFF, 0xD8).map(_.toByte) ++                       // SOI
      (Array(0xFF, 0xE0).map(_.toByte) ++ u16be(16) ++       // APP0 JFIF
        "JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        Array[Byte](0, 1, 2, 0) ++ u16be(1) ++ u16be(1) ++ Array[Byte](0, 0)) ++
      (Array(0xFF, 0xC0).map(_.toByte) ++ u16be(11) ++       // SOF0
        Array[Byte](8) ++ u16be(h) ++ u16be(w) ++
        Array[Byte](1, 1, 0x11, 0)) ++
      Array(0xFF, 0xD9).map(_.toByte)                        // EOI

  def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      u16le(w) ++ u16le(h) ++ Array[Byte](0, 0, 0) ++ Array(0x3B.toByte)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    u32be(8L + payload.length) ++ ascii(typ) ++ payload

  // the identity transform matrix every real muxer writes (16.16 /
  // 2.30 fixed point): [0x10000 0 0; 0 0x10000 0; 0 0 0x40000000]
  private val Matrix36: Array[Byte] =
    u32be(0x00010000L) ++ u32be(0) ++ u32be(0) ++
      u32be(0) ++ u32be(0x00010000L) ++ u32be(0) ++
      u32be(0) ++ u32be(0) ++ u32be(0x40000000L)

  /** Minimal REAL ISO-BMFF: ftyp(isom) + moov(mvhd v0 + trak(tkhd v0)),
    * timescale 1000 so mvhd duration ticks ARE milliseconds, tkhd
    * width/height in 16.16 fixed point. Total = [[Mp4Bytes]]. */
  def mp4(w: Int, h: Int, durationMs: Long): Array[Byte] = {
    val ftyp = box("ftyp",
      ascii("isom") ++ u32be(0) ++ ascii("isom") ++ ascii("mp42"))
    val mvhd = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++            // version 0 + flags
        u32be(0) ++ u32be(0) ++              // creation, modification
        u32be(1000L) ++ u32be(durationMs) ++ // timescale, duration
        u32be(0x00010000L) ++                // rate 1.0
        Array[Byte](0x01, 0x00) ++           // volume 1.0
        new Array[Byte](10) ++               // reserved
        Matrix36 ++
        new Array[Byte](24) ++               // pre_defined
        u32be(2L))                           // next_track_id
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++             // version 0 + flags (enabled)
        u32be(0) ++ u32be(0) ++              // creation, modification
        u32be(1L) ++ u32be(0) ++             // track_id, reserved
        u32be(durationMs) ++                 // duration
        new Array[Byte](8) ++                // reserved
        new Array[Byte](8) ++                // layer/alt-group/volume/res
        Matrix36 ++
        u32be(w.toLong << 16) ++ u32be(h.toLong << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** Minimal REAL MPEG1 Layer III stream: an optional ID3v2.3 tag
    * (synchsafe size) then `nFrames` CBR frames — each a valid 4-byte
    * frame header (sync, version/layer, bitrate + sample-rate indexes,
    * channel mode) padded with zero audio data to the exact frame
    * length 144000·kbps/rate the header declares. */
  def mp3(brIdx: Int, srIdx: Int, mode: Int, nFrames: Int, tagLen: Int): Array[Byte] = {
    val kbps = MediaProbe.Mp3Kbps(brIdx)
    val rate = MediaProbe.Mp3Rates(srIdx)
    val flen = 144000 * kbps / rate
    val frame = new Array[Byte](flen)
    frame(0) = 0xFF.toByte
    frame(1) = 0xFB.toByte // MPEG1, Layer III, no CRC
    frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte
    frame(3) = (mode << 6).toByte
    val tag =
      if (tagLen <= 0) Array.emptyByteArray
      else ascii("ID3") ++ Array[Byte](3, 0, 0) ++
        Array(((tagLen >> 21) & 0x7F).toByte, ((tagLen >> 14) & 0x7F).toByte,
          ((tagLen >> 7) & 0x7F).toByte, (tagLen & 0x7F).toByte) ++
        new Array[Byte](tagLen)
    tag ++ Array.fill(nFrames)(frame).flatten
  }

  def wav(channels: Int, rate: Long, nsamples: Int): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val dataLen = nsamples.toLong * blockAlign
    val byteRate = rate * blockAlign
    "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      u32le(36 + dataLen) ++
      "WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      "fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      u32le(16) ++ u16le(1) ++ u16le(channels) ++ u32le(rate) ++
      u32le(byteRate) ++ u16le(blockAlign) ++ u16le(16) ++
      "data".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      u32le(dataLen) ++ new Array[Byte](dataLen.toInt)
  }

  /** One payload per documents row, format class = doc_id%7 (class 4
    * is raw text bytes — the unknown-format channel; 5/6 are the r17
    * crawl-realistic containers, ISO-BMFF and MP3). */
  def payload(id: Long, text: String): Array[Byte] = {
    val w = 16 + (id % 97); val h = 16 + ((id * 7) % 83)
    val ch = 1 + (id % 2).toInt
    val rate = 8000 + (id % 5) * 4000
    val nsamp = 100 + (id % 100).toInt
    (id % 7) match {
      case 0 => png(w, h)
      case 1 => jpeg(w.toInt, h.toInt)
      case 2 => gif(w.toInt, h.toInt)
      case 3 => wav(ch, rate, nsamp)
      case 5 => mp4(w.toInt, h.toInt, durationMs = 100 + (id % 1000))
      case 6 => mp3(brIdx = 1 + (id % 14).toInt, srIdx = (id % 3).toInt,
        mode = (id % 4).toInt, nFrames = 3 + (id % 6).toInt,
        tagLen = if (id % 2 == 1) (id % 30).toInt + 1 else 0)
      case _ =>
        // the unknown-format channel: text bytes behind a NUL prefix,
        // so a text value that happens to START with an ASCII magic
        // ("GIF89a…", "RIFF…WAVE", "ID3…") can never probe as a real
        // format — the oracle pins this class to 'unknown'
        // unconditionally (review r16; no container magic begins with
        // 0x00, and the offset-4 'ftyp' probe additionally requires a
        // valid moov/mvhd walk no text payload carries)
        Array(0.toByte) ++ Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** (doc_id, payload) frame — narrow map, no shuffle. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, payload(id, t)) })
      .toDF("doc_id", "payload")
  }
}
