package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL WAV PCM sample decoding (r17): the audio counterpart of
  * [[PngCodec]]'s stub-to-genuine conversion. A canonical WAV file is
  * RIFF framing around a `fmt ` chunk (PCM geometry) and a `data`
  * chunk of interleaved little-endian 16-bit samples — no entropy
  * coding at all, so unlike JPEG/MP3 the SAMPLES are reachable in
  * pure JVM with zero codec dependencies, and leaving them stubbed
  * ([[graft.operators.Multimodal]]'s audio windows run on length-only
  * metadata) was the gap, not a dependency bound. Reference context:
  * the reference inspects opaque BLOBs in-engine
  * (/root/reference/scripts/01_pdf_to_vector.sql:49-59);
  * samples-out-of-a-binary-column is that boundary's audio analogue.
  *
  * Decode walks the RIFF chunk list exactly like
  * [[MediaProbe.probe]]'s WAV arm — word-aligned advance (odd sizes
  * carry a pad byte), lying-size bailout on bytes REMAINING after the
  * cursor — then requires `fmt ` to declare integer PCM (format tag
  * 1) at 16 bits before touching `data`; ancillary chunks (LIST,
  * fact, cue) are skipped whole, so a decoder that forgets the pad
  * byte or mis-frames a chunk never finds the samples. Totality:
  * anything malformed — bad magic, lying chunk size, truncated data,
  * non-PCM format tag, non-16-bit depth, zero channels — returns
  * None, never throws (PdfText's contract; WavCodecSpec ladders).
  *
  * Scale shape (`mm_decode_samples`): one narrow mapPartitions over
  * the binary column (synthesize → decode → per-file sample moments),
  * then a partial-agg groupBy on an 8-value bucket key — no shuffle
  * of sample data, embarrassingly parallel; at 100 TB this is decode
  * CPU × cores, the PDF/PNG extraction shape.
  *
  * The gate corpus ([[SampleGen]]) writes REAL interleaved PCM whose
  * sample values are closed-form in (doc_id, frame, channel), framed
  * behind an odd-sized ancillary LIST chunk so the pad-byte rule is
  * load-bearing on every file; the DuckDB oracle predicts the per-
  * channel sums and the signed extremes from doc_id alone by
  * enumerating frames — a decoder that drops the pad byte, swaps
  * byte order, de-interleaves wrong, or sign-extends wrong diverges
  * the hash.
  */
object WavCodec {

  /** Interleaved 16-bit samples: `samples(frame * channels + ch)`. */
  final case class Pcm(channels: Int, rate: Int, samples: Array[Short])

  import ByteIo.{ascii, le16, le32}

  /** Decode a 16-bit integer-PCM WAV. None on anything malformed or
    * unsupported; never throws. */
  def decode(bytes: Array[Byte]): Option[Pcm] = {
    try {
      if (bytes == null || bytes.length < 44) return None
      if (!ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "WAVE")) return None
      var i = 12
      var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
      var dataAt = -1; var dataLen = -1L
      while (i + 8 <= bytes.length && (fmtTag < 0 || dataAt < 0)) {
        val size = le32(bytes, i + 4)
        // same lying-size rule as MediaProbe: the declared size must
        // fit the bytes remaining AFTER this chunk's own header
        if (size < 0 || i.toLong + 8 + size > bytes.length.toLong) return None
        if (ascii(bytes, i, "fmt ")) {
          if (size < 16) return None
          fmtTag = le16(bytes, i + 8)
          channels = le16(bytes, i + 10)
          rate = le32(bytes, i + 12).toInt
          bits = le16(bytes, i + 22)
        } else if (ascii(bytes, i, "data")) {
          dataAt = i + 8; dataLen = size
        }
        // RIFF chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size.toInt + (size % 2).toInt
      }
      if (fmtTag != 1 || bits != 16 || channels <= 0 || rate <= 0 ||
          dataAt < 0 || dataLen < 0) return None
      val blockAlign = channels * 2
      // a partial trailing frame is a truncation lie, not data
      if (dataLen % blockAlign != 0) return None
      val n = (dataLen / 2).toInt
      val out = new Array[Short](n)
      var k = 0
      while (k < n) {
        out(k) = le16(bytes, dataAt + 2 * k).toShort
        k += 1
      }
      Some(Pcm(channels, rate, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-bucket sample moments over the gate corpus: synthesize →
    * REAL decode → per-file per-channel sums + signed extremes in one
    * narrow map, then a partial-agg groupBy on the 8-value bucket. A
    * decode failure reports the sentinel row (total — and guaranteed
    * to diverge the closed-form oracle, so failures can't hide). */
  def decodeSamples(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select("doc_id")
      .as[Long]
      .mapPartitions(_.map { id =>
        decode(SampleGen.wav(id)) match {
          case Some(pcm) =>
            val ch = pcm.channels
            var s0 = 0L; var s1 = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
            var k = 0
            while (k < pcm.samples.length) {
              val v = pcm.samples(k).toLong
              if (k % ch == 0) s0 += v else s1 += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              k += 1
            }
            (id % 8, 1L, (pcm.samples.length / ch).toLong, s0, s1, mn, mx)
          case None => (id % 8, 1L, -1L, -1L, -1L, 0L, 0L)
        }
      })
      .toDF("bucket", "one", "frames", "s0", "s1", "mn", "mx")
      .groupBy("bucket")
      .agg(sum("one").as("n_files"), sum("frames").as("sum_frames"),
        sum("s0").as("sum_ch0"), sum("s1").as("sum_ch1"),
        min("mn").as("min_sample"), max("mx").as("max_sample"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_samples" -> (decodeSamples _))

  /** The oracle enumerates every (frame, channel) of every file
    * (≤191 frames × ≤2 channels per doc) and sums the generator's
    * closed-form sample values — the decoder must reproduce them
    * through the chunk walk, the pad byte, LE16, sign extension, and
    * de-interleaving. Channel 1 sums are 0 for mono files (the Spark
    * side accumulates nothing into s1 when ch == 1). */
  val oracleSql: Map[String, String] = Map(
    "mm_decode_samples" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + (doc_id % 2) AS ch, 64 + (doc_id % 128) AS nf
        |  FROM documents),
        |sm AS (
        |  SELECT doc_id, ch, nf,
        |    sum(CASE WHEN c.c = 0 THEN ((doc_id * 7 + t.t * 13 + c.c * 101) % 65536) - 32768 ELSE 0 END) AS s0,
        |    sum(CASE WHEN c.c = 1 THEN ((doc_id * 7 + t.t * 13 + c.c * 101) % 65536) - 32768 ELSE 0 END) AS s1,
        |    min(((doc_id * 7 + t.t * 13 + c.c * 101) % 65536) - 32768) AS mn,
        |    max(((doc_id * 7 + t.t * 13 + c.c * 101) % 65536) - 32768) AS mx
        |  FROM d,
        |    unnest(generate_series(0, nf - 1)) AS t(t),
        |    unnest(generate_series(0, ch - 1)) AS c(c)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id % 8 AS bucket, count(*) AS n_files,
        |  sum(nf)::BIGINT AS sum_frames,
        |  sum(s0)::BIGINT AS sum_ch0, sum(s1)::BIGINT AS sum_ch1,
        |  min(mn)::BIGINT AS min_sample, max(mx)::BIGINT AS max_sample
        |FROM sm GROUP BY 1 ORDER BY 1""".stripMargin)
}

/** Deterministic real-PCM WAV generator for the `mm_decode_samples`
  * gate: 1-2 channels, 64-191 frames, sample(t, c) closed-form in
  * (doc_id, t, c) — mirrored verbatim in the oracle — interleaved
  * LE16 behind an ODD-sized ancillary LIST chunk, so the word-align
  * pad rule is load-bearing on every file (skip it and the `data`
  * magic lands off-by-one). */
object SampleGen {

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** sample(id, t, c) ∈ [-32768, 32767], all operands non-negative so
    * the Scala/DuckDB % agree. */
  def sample(id: Long, t: Int, c: Int): Int =
    (((id * 7 + t * 13 + c * 101) % 65536) - 32768).toInt

  def wav(id: Long): Array[Byte] = {
    val ch = 1 + (id % 2).toInt
    val nf = 64 + (id % 128).toInt
    val rate = 8000 + (id % 5).toInt * 4000
    val blockAlign = ch * 2
    val dataLen = nf * blockAlign
    val data = new Array[Byte](dataLen)
    var t = 0
    while (t < nf) {
      var c = 0
      while (c < ch) {
        val v = sample(id, t, c)
        val at = (t * ch + c) * 2
        data(at) = (v & 0xFF).toByte
        data(at + 1) = ((v >> 8) & 0xFF).toByte
        c += 1
      }
      t += 1
    }
    // odd-sized ancillary chunk: 5 payload bytes → 1 pad byte
    val list = ascii("LIST") ++ u32le(5) ++ ascii("INFOx") ++ Array[Byte](0)
    val fmt = ascii("fmt ") ++ u32le(16) ++ u16le(1) ++ u16le(ch) ++
      u32le(rate) ++ u32le(rate.toLong * blockAlign) ++
      u16le(blockAlign) ++ u16le(16)
    val body = ascii("WAVE") ++ fmt ++ list ++
      ascii("data") ++ u32le(dataLen.toLong) ++ data
    ascii("RIFF") ++ u32le(body.length.toLong) ++ body
  }
}
