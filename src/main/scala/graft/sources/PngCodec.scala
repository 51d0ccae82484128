package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL PNG pixel decoding (r17, VERDICT r16 item 3) — pure JVM, zero
  * new dependencies: a PNG is chunks (length/type/data/CRC32), the
  * image is IHDR geometry + the zlib-inflated concatenation of IDAT
  * payloads, and each scanline is one filter byte + filtered samples
  * under five per-row predictors (None/Sub/Up/Average/Paeth —
  * RFC 2083 §6). `java.util.zip.Inflater` IS zlib, so the only real
  * work is chunk framing and the filter inversions; this converts the
  * PNG slice of the multimodal surface from the documented
  * deterministic stub ([[graft.operators.Multimodal]]) into genuine
  * pixel access, the same move `mm_probe_format` made for headers in
  * r16 — and the move [[WavCodec]] (PCM samples), [[GifCodec]] (LZW
  * pixels) and [[JpegCodec]] (baseline grayscale + 4:2:0 color +
  * progressive grayscale incl. AC refinement) repeated later in r17,
  * leaving only progressive color and lossy audio behind the stub. Reference context: the reference inspects
  * opaque BLOBs in-engine (/root/reference/scripts/01_pdf_to_vector
  * .sql:49-59); pixels-out-of-a-binary-column is that boundary's
  * image analogue.
  *
  * Totality: [[PngCodec.decode]] returns None on anything malformed —
  * bad signature, chunk CRC mismatch, unsupported geometry (only
  * 8-bit depth, color types 0/2/6, non-interlaced — the forms
  * graft's own encoder and the overwhelming share of real PNGs use),
  * truncated or over-long inflate, unknown filter id — and never
  * throws (PdfText's contract).
  *
  * Scale shape (`mm_decode_pixels`): one narrow mapPartitions over
  * the binary column — synthesize → decode → per-image channel sums —
  * then a partial-agg groupBy on an 8-value bucket key. No shuffle of
  * pixel data, embarrassingly parallel across images; at 100 TB this
  * is decode CPU times cores, exactly like the PDF extraction leg.
  *
  * The gate corpus ([[PixelGen]]) encodes REAL PNGs whose pixel
  * values are closed-form in (doc_id, x, y) and whose row filters
  * cycle through ALL FIVE types (y%5) — so the DuckDB oracle predicts
  * the per-channel sums from doc_id alone by enumerating the pixels,
  * and a decoder that misinverts any filter, misorders rows, swaps
  * channels, or mis-frames a chunk diverges the hash.
  */
object PngCodec {

  final case class Image(width: Int, height: Int, channels: Int,
    pixels: Array[Byte])

  private val Sig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  import ByteIo.be32

  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    u32be(data.length.toLong) ++ t ++ data ++ u32be(crc.getValue)
  }

  /** Paeth predictor (RFC 2083 §6.6): the neighbor closest to
    * left+up-upleft, ties left > up > upleft. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit RGB image as a real PNG, filtering row y with
    * `filterFor(y)` (0-4) — the encoder computes the FILTERED bytes,
    * so decode∘encode is an identity only when both directions
    * implement the predictors exactly. */
  def encode(w: Int, h: Int, rgb: Array[Byte], filterFor: Int => Int): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb must be w*h*3 bytes")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val f = filterFor(y) & 7
      raw(y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = rgb(y * stride + i) & 0xFF
        val left = if (i >= bpp) rgb(y * stride + i - bpp) & 0xFF else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xFF else 0
        val ul = if (y > 0 && i >= bpp) rgb((y - 1) * stride + i - bpp) & 0xFF else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + i) = (filtered & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](64 * 1024)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    Sig ++
      chunk("IHDR", u32be(w.toLong) ++ u32be(h.toLong) ++
        Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode a PNG to raw 8-bit samples (row-major, `channels` per
    * pixel). None on anything malformed or unsupported; never throws. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    try {
      if (bytes == null || bytes.length < Sig.length + 12) return None
      var i = 0
      while (i < Sig.length) { if (bytes(i) != Sig(i)) return None; i += 1 }
      var w = 0; var h = 0; var depth = 0; var colorType = -1
      var interlace = 0
      val idat = new java.io.ByteArrayOutputStream(bytes.length)
      var at = Sig.length
      var done = false
      while (!done && at + 12 <= bytes.length) {
        val len = be32(bytes, at)
        if (len > bytes.length.toLong - at - 12) return None // lying length
        val dataStart = at + 8
        val dataEnd = dataStart + len.toInt
        // CRC over type+data must verify: a real decoder rejects
        // silently corrupted chunks rather than decoding garbage
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, at + 4, 4 + len.toInt)
        if (crc.getValue != be32(bytes, dataEnd)) return None
        val typ = new String(bytes, at + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = be32(bytes, dataStart).toInt
            h = be32(bytes, dataStart + 4).toInt
            depth = bytes(dataStart + 8) & 0xFF
            colorType = bytes(dataStart + 9) & 0xFF
            interlace = bytes(dataStart + 12) & 0xFF
          case "IDAT" => idat.write(bytes, dataStart, len.toInt)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped whole
        }
        at = dataEnd + 4
      }
      val bpp = colorType match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      if (depth != 8 || interlace != 0 || w <= 0 || h <= 0 ||
          w.toLong * h * bpp > (64 << 20)) return None
      val stride = w * bpp
      val rawLen = h * (1 + stride)
      val raw = new Array[Byte](rawLen)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, got, rawLen - got)
        if (n == 0 && inf.needsInput()) { inf.end(); return None } // truncated
        got += n
      }
      inf.end()
      if (got < rawLen) return None
      val px = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val f = raw(y * (1 + stride)) & 0xFF
        if (f > 4) return None
        var i2 = 0
        while (i2 < stride) {
          val filtered = raw(y * (1 + stride) + 1 + i2) & 0xFF
          val left = if (i2 >= bpp) px(y * stride + i2 - bpp) & 0xFF else 0
          val up = if (y > 0) px((y - 1) * stride + i2) & 0xFF else 0
          val ul = if (y > 0 && i2 >= bpp) px((y - 1) * stride + i2 - bpp) & 0xFF else 0
          val recon = f match {
            case 0 => filtered
            case 1 => filtered + left
            case 2 => filtered + up
            case 3 => filtered + ((left + up) >> 1)
            case _ => filtered + paeth(left, up, ul)
          }
          px(y * stride + i2) = (recon & 0xFF).toByte
          i2 += 1
        }
        y += 1
      }
      Some(Image(w, h, bpp, px))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-bucket channel sums over the gate corpus — the shared
    * [[DecodeGate.rgbSums]] harness over the real PNG decode. */
  def decodePixels(s: SparkSession, dir: String): DataFrame =
    DecodeGate.rgbSums(s, dir)(id => decode(PixelGen.png(id)))

  /** Average-hash fingerprint of one decoded image (r17, VERDICT r16
    * item 3's suggested follow-on — a REAL pixel fingerprint in place
    * of the stub integer-mixing ones): luminance proxy lum = r+g+b
    * per pixel (monotone in the mean, no /3 rounding to disagree on),
    * a 4×4 average-pool via the floor-bucket map gx = x*4/w,
    * gy = y*4/h (every cell nonempty at the gate's ≥4-px dims), and
    * bit (gy*4+gx) set iff the cell mean EXCEEDS the image mean —
    * compared cross-multiplied in integers (cellSum * imgPix >
    * imgSum * cellPix), so Spark and the oracle agree EXACTLY with no
    * float threshold to drift. 16 bits; near-dup images (same pooled
    * light/dark shape) collide, which is the point. */
  private[graft] def ahash(img: Image): Int = {
    val cs = new Array[Long](16); val cn = new Array[Long](16)
    var ts = 0L
    var y = 0
    while (y < img.height) {
      val gy = y * 4 / img.height
      var x = 0
      while (x < img.width) {
        val i = (y * img.width + x) * img.channels
        // grayscale (channels < 3, a form decode() legitimately
        // returns for colorType 0) scales its single sample by 3 so
        // the luminance proxy lives on the same 0..765 scale as RGB —
        // reading fixed +1/+2 offsets would overrun the pixel array
        val lum =
          if (img.channels >= 3)
            (img.pixels(i) & 0xFF) + (img.pixels(i + 1) & 0xFF) +
              (img.pixels(i + 2) & 0xFF)
          else 3 * (img.pixels(i) & 0xFF)
        val cell = gy * 4 + x * 4 / img.width
        cs(cell) += lum; cn(cell) += 1; ts += lum
        x += 1
      }
      y += 1
    }
    val tn = img.width.toLong * img.height
    var hash = 0; var c = 0
    while (c < 16) {
      if (cs(c) * tn > ts * cn(c)) hash |= 1 << c
      c += 1
    }
    hash
  }

  /** Fingerprint census over the gate corpus: synthesize → REAL
    * decode → 4×4 average-hash per image (one narrow map), then a
    * partial-agg groupBy on the hash — the grouping IS the near-dup
    * semantics (images pooling to the same light/dark shape collide),
    * and the 2^16 hash space keeps the result bounded at any corpus
    * size. A decode failure lands on the -1 sentinel hash, which the
    * closed-form oracle never predicts, so failures can't hide. */
  def pixelFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select("doc_id")
      .as[Long]
      .mapPartitions(_.map { id =>
        decode(PixelGen.png(id)) match {
          case Some(img) => (ahash(img), 1L, id)
          case None => (-1, 1L, id)
        }
      })
      .toDF("ahash", "one", "doc_id")
      .groupBy("ahash")
      .agg(sum("one").as("n_imgs"), min("doc_id").as("first_doc"))
      .orderBy("ahash")
  }

  /** Near-duplicate image census by fingerprint hamming distance ≤ 1
    * (r17): the fingerprint made into an actual dedup operator, with
    * the scale shape that matters — NOTHING pairwise ever touches the
    * corpus. Stage 1 collapses the images to the hash census (one
    * partial-agg groupBy; ≤ 2^16 rows NO MATTER the corpus size).
    * Stage 2 works entirely on the census: exact-dup pairs are
    * C(cnt,2) per hash, and hamming-1 pairs come from a flip-key
    * self-join — each hash emits its 16 one-bit neighbors keyed
    * (min, max) so every unordered pair is counted once, joined back
    * to the census on the neighbor (broadcast: the census is tiny).
    * At 100 TB: one shuffle of (hash) keys, then arithmetic on
    * ≤65k×16 rows — the `dedup_minhash_lsh` band-bucket idea with
    * the bucket space small enough to enumerate. */
  def dedupPixels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val census = graft.Tables.documents(s, dir)
      .select("doc_id")
      .as[Long]
      .mapPartitions(_.map { id =>
        decode(PixelGen.png(id)) match {
          case Some(img) => (ahash(img), 1L)
          case None => (-1, 1L)
        }
      })
      .toDF("ahash", "one")
      .groupBy("ahash")
      .agg(sum("one").as("cnt"))
      .cache()
    val exact = census.select(
      sum(col("cnt")).as("n_images"),
      count(lit(1)).as("n_hashes"),
      sum(col("cnt") * (col("cnt") - 1) / 2).cast("long").as("exact_pairs"))
    // one row per (hash, one-bit neighbor) with the pair ordered so
    // each unordered hamming-1 pair appears exactly once
    val flips = census.as[(Int, Long)]
      .flatMap { case (h, c) =>
        (0 until 16).iterator.map(b => h ^ (1 << b)).filter(_ > h)
          .map(n => (h, n, c))
      }
      .toDF("h", "n", "cnt")
    val near = flips
      .join(broadcast(census.withColumnRenamed("ahash", "n")
        .withColumnRenamed("cnt", "ncnt")), "n")
      .select(sum(col("cnt") * col("ncnt")).cast("long").as("near_pairs"))
    exact.crossJoin(near)
      .select(col("n_images"), col("n_hashes"),
        col("exact_pairs"),
        coalesce(col("near_pairs"), lit(0L)).as("near_pairs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_pixels" -> (decodePixels _),
    "mm_pixel_fingerprint" -> (pixelFingerprint _),
    "mm_dedup_pixels" -> (dedupPixels _))

  /** The oracle enumerates every pixel of every image lateral-style
    * (dims are ≤15×15, so ≤225 rows per doc) and sums the generator's
    * closed-form channel values — the decoder must reproduce them
    * through deflate and all five filter inversions. */
  val oracleSql: Map[String, String] = Map(
    "mm_decode_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + (doc_id % 12) AS w, 4 + ((doc_id * 3) % 12) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    sum((xs.x * 3 + ys.y * 5 + doc_id) % 256) AS sr,
        |    sum((xs.x * 7 + ys.y + 2 * doc_id) % 256) AS sg,
        |    sum((xs.x + ys.y * 11 + 3 * doc_id) % 256) AS sb
        |  FROM d,
        |    unnest(generate_series(0, w - 1)) AS xs(x),
        |    unnest(generate_series(0, h - 1)) AS ys(y)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id % 8 AS bucket, count(*) AS n_imgs,
        |  sum(w)::BIGINT AS sum_w, sum(h)::BIGINT AS sum_h,
        |  sum(sr)::BIGINT AS sum_r, sum(sg)::BIGINT AS sum_g,
        |  sum(sb)::BIGINT AS sum_b
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // re-derives every image's 4x4 average-hash from the closed-form
    // pixels: per-cell luminance sums via the same floor-bucket map,
    // the strict cross-multiplied mean comparison, and the bit pack —
    // then the same census. The decoder AND the pooling must both be
    // exact for the per-hash counts to line up.
    "mm_pixel_fingerprint" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + (doc_id % 12) AS w, 4 + ((doc_id * 3) % 12) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    (ys.y * 4) // h * 4 + (xs.x * 4) // w AS cell,
        |    ((xs.x * 3 + ys.y * 5 + doc_id) % 256)
        |      + ((xs.x * 7 + ys.y + 2 * doc_id) % 256)
        |      + ((xs.x + ys.y * 11 + 3 * doc_id) % 256) AS lum
        |  FROM d,
        |    unnest(generate_series(0, w - 1)) AS xs(x),
        |    unnest(generate_series(0, h - 1)) AS ys(y)),
        |cells AS (
        |  SELECT doc_id, cell, sum(lum) AS cs, count(*) AS cn,
        |    sum(sum(lum)) OVER (PARTITION BY doc_id) AS ts,
        |    sum(count(*)) OVER (PARTITION BY doc_id) AS tn
        |  FROM px GROUP BY 1, 2),
        |hashes AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN cs * tn > ts * cn
        |        THEN (1::BIGINT << cell) ELSE 0 END)::INTEGER AS ahash
        |  FROM cells GROUP BY 1)
        |SELECT ahash, count(*) AS n_imgs, min(doc_id) AS first_doc
        |FROM hashes GROUP BY 1 ORDER BY 1""".stripMargin,
    // the dedup census: same hash derivation, then exact pairs as
    // C(cnt,2) per hash and hamming-1 pairs as a census self-join on
    // bit_count(xor)=1 — tractable in SQL because the census, not the
    // corpus, is what gets paired (exactly the Spark plan's shape).
    "mm_dedup_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + (doc_id % 12) AS w, 4 + ((doc_id * 3) % 12) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    (ys.y * 4) // h * 4 + (xs.x * 4) // w AS cell,
        |    ((xs.x * 3 + ys.y * 5 + doc_id) % 256)
        |      + ((xs.x * 7 + ys.y + 2 * doc_id) % 256)
        |      + ((xs.x + ys.y * 11 + 3 * doc_id) % 256) AS lum
        |  FROM d,
        |    unnest(generate_series(0, w - 1)) AS xs(x),
        |    unnest(generate_series(0, h - 1)) AS ys(y)),
        |cells AS (
        |  SELECT doc_id, cell, sum(lum) AS cs, count(*) AS cn,
        |    sum(sum(lum)) OVER (PARTITION BY doc_id) AS ts,
        |    sum(count(*)) OVER (PARTITION BY doc_id) AS tn
        |  FROM px GROUP BY 1, 2),
        |hashes AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN cs * tn > ts * cn
        |        THEN (1::BIGINT << cell) ELSE 0 END)::INTEGER AS ahash
        |  FROM cells GROUP BY 1),
        |census AS (SELECT ahash, count(*) AS cnt FROM hashes GROUP BY 1),
        |ex AS (
        |  SELECT sum(cnt)::BIGINT AS n_images, count(*)::BIGINT AS n_hashes,
        |    sum(cnt * (cnt - 1) // 2)::BIGINT AS exact_pairs
        |  FROM census),
        |nr AS (
        |  SELECT coalesce(sum(c1.cnt * c2.cnt), 0)::BIGINT AS near_pairs
        |  FROM census c1 JOIN census c2
        |    ON c1.ahash < c2.ahash
        |   AND bit_count(xor(c1.ahash::BIGINT, c2.ahash::BIGINT)) = 1)
        |SELECT n_images, n_hashes, exact_pairs, near_pairs FROM ex, nr""".stripMargin)
}

/** Deterministic real-PNG generator for the `mm_decode_pixels` gate:
  * dims 4-15 per side, channel values closed-form in (doc_id, x, y)
  * — mirrored verbatim in the oracle — and the row filter CYCLING
  * through all five predictors (y%5), so every filter inversion is
  * load-bearing on every image taller than four rows. */
object PixelGen {

  def png(id: Long): Array[Byte] = {
    val w = (4 + id % 12).toInt
    val h = (4 + (id * 3) % 12).toInt
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        rgb(i) = ((x * 3 + y * 5 + id) % 256).toByte
        rgb(i + 1) = ((x * 7 + y + 2 * id) % 256).toByte
        rgb(i + 2) = ((x + y * 11 + 3 * id) % 256).toByte
        x += 1
      }
      y += 1
    }
    PngCodec.encode(w, h, rgb, filterFor = _ % 5)
  }
}
