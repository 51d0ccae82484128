package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL GIF pixel decoding (r17): the third stub-to-genuine
  * conversion on the multimodal surface, and the first with a real
  * ENTROPY coder — GIF's variable-width LZW (GIF89a spec appendix F):
  * codes start at minCodeSize+1 bits and grow to 12, a CLEAR code
  * resets the dictionary mid-stream, the first code after any clear
  * must be a literal, and the KwKwK case (a code referencing the
  * entry being defined) must synthesize prev+prev[0]. The compressed
  * stream rides 255-byte sub-blocks, bits packed LSB-first across
  * block boundaries; decoded indices map through the color table.
  * [[GifCodec.encode]] is the matching real encoder (greedy
  * longest-match over a (prefixCode, byte) dictionary, clear-on-full
  * at 4096) so the gate's containers carry genuinely LZW-compressed
  * data — decode∘encode is an identity only when BOTH directions
  * implement the width growth, the reset, and the packing exactly.
  * Reference context as for [[PngCodec]]: the reference inspects
  * opaque BLOBs in-engine (/root/reference/scripts/01_pdf_to_vector
  * .sql:49-59).
  *
  * Totality: None on anything malformed — bad magic, truncated
  * sub-blocks, an out-of-range code, a non-literal first code after
  * clear, an index past the color table, a trailer or unknown block
  * before any image, interlaced images (unsupported) — never a throw
  * (PdfText's contract; GifCodecSpec ladders). A
  * Graphic Control Extension sits before the gate's image descriptor
  * so extension skipping is load-bearing on every file.
  *
  * Scale shape (`mm_decode_gif`): one narrow mapPartitions over the
  * binary column (synthesize → decode → per-image channel sums), then
  * a partial-agg groupBy on an 8-value bucket key — no shuffle of
  * pixel data; at 100 TB decode CPU × cores, the PNG/PDF shape.
  *
  * The gate corpus ([[GifGen]]) LZW-encodes REAL images whose palette
  * indices are closed-form in (doc_id, x, y) through a global color
  * table whose channels are closed-form in the index — so the DuckDB
  * oracle predicts the per-channel sums from doc_id alone, and a
  * decoder that mispacks bits, misses a width change, mishandles
  * KwKwK, or mismaps the palette diverges the hash.
  */
object GifCodec {

  /** RGB triples, row-major. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  import ByteIo.{ascii, le16}

  /** GIF-variant LZW decode of `data` (sub-blocks already
    * concatenated) with `minCodeSize`, expecting exactly `expect`
    * indices. None on any malformed stream. */
  private[graft] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expect: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as (prefix link, appended byte); entries < clear are
    // roots. Max 4096 entries per the spec.
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val out = new Array[Byte](expect)
    var outAt = 0
    var next = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var acc = 0L; var accBits = 0; var at = 0
    // expand one dict entry (walk links backward, then reverse)
    val stack = new Array[Byte](4096)
    def emit(code: Int): Boolean = {
      var n = 0; var c = code
      while (c >= clear) { // walk to the root
        if (n >= stack.length) return false
        stack(n) = append(c); n += 1; c = prefix(c)
      }
      if (outAt + n + 1 > expect) return false
      out(outAt) = c.toByte; outAt += 1
      var k = n - 1
      while (k >= 0) { out(outAt) = stack(k); outAt += 1; k -= 1 }
      true
    }
    def firstByte(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    while (true) {
      while (accBits < codeSize) {
        if (at >= data.length) return None // ran out before EOI
        acc |= (data(at) & 0xFFL) << accBits
        accBits += 8; at += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; accBits -= codeSize
      if (code == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return if (outAt == expect) Some(out) else None
      } else if (prev < 0) {
        // first code after a clear must be a literal root
        if (code >= clear) return None
        if (outAt >= expect) return None
        out(outAt) = code.toByte; outAt += 1
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) return None
        val defined = code < next
        if (!defined) {
          // KwKwK: the code being defined — prev + prev's first byte
          if (next >= 4096) return None
          prefix(next) = prev; append(next) = firstByte(prev).toByte
          next += 1
          if (!emit(code)) return None
          prev = code
        } else {
          if (!emit(code)) return None
          if (next < 4096) {
            prefix(next) = prev; append(next) = firstByte(code).toByte
            next += 1
          }
          prev = code
        }
        // width grows when the NEXT code to assign no longer fits
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    None // unreachable
  }

  /** Decode a GIF87a/89a with a global or local color table,
    * non-interlaced, taking the FIRST image in the stream. None on
    * anything malformed or unsupported; never throws. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    try {
      if (bytes == null || bytes.length < 14) return None
      if (!ascii(bytes, 0, "GIF87a") && !ascii(bytes, 0, "GIF89a")) return None
      val packed = bytes(10) & 0xFF
      var at = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7) // table entries
        if (at + n * 3 > bytes.length) return None
        gct = java.util.Arrays.copyOfRange(bytes, at, at + n * 3)
        at += n * 3
      }
      // walk blocks to the first image descriptor
      while (at < bytes.length) {
        (bytes(at) & 0xFF) match {
          case 0x21 => // extension: label + sub-blocks until 0
            at += 2
            var sz = if (at < bytes.length) bytes(at) & 0xFF else -1
            while (sz > 0) {
              at += 1 + sz
              sz = if (at < bytes.length) bytes(at) & 0xFF else -1
            }
            if (sz < 0) return None
            at += 1
          case 0x2C => // image descriptor
            if (at + 10 > bytes.length) return None
            val w = le16(bytes, at + 5); val h = le16(bytes, at + 7)
            val ip = bytes(at + 9) & 0xFF
            if ((ip & 0x40) != 0) return None // interlaced unsupported
            at += 10
            var table = gct
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (at + n * 3 > bytes.length) return None
              table = java.util.Arrays.copyOfRange(bytes, at, at + n * 3)
              at += n * 3
            }
            if (table == null || w <= 0 || h <= 0 ||
                w.toLong * h > (64 << 20)) return None
            if (at >= bytes.length) return None
            val mcs = bytes(at) & 0xFF; at += 1
            // concatenate the data sub-blocks
            val buf = new java.io.ByteArrayOutputStream(bytes.length - at)
            var sz = if (at < bytes.length) bytes(at) & 0xFF else -1
            while (sz > 0) {
              if (at + 1 + sz > bytes.length) return None
              buf.write(bytes, at + 1, sz)
              at += 1 + sz
              sz = if (at < bytes.length) bytes(at) & 0xFF else -1
            }
            if (sz < 0) return None
            val idx = lzwDecode(buf.toByteArray, mcs, w * h) match {
              case Some(a) => a
              case None => return None
            }
            val ncol = table.length / 3
            val px = new Array[Byte](w * h * 3)
            var k = 0
            while (k < idx.length) {
              val c = idx(k) & 0xFF
              if (c >= ncol) return None
              px(3 * k) = table(3 * c)
              px(3 * k + 1) = table(3 * c + 1)
              px(3 * k + 2) = table(3 * c + 2)
              k += 1
            }
            return Some(Image(w, h, px))
          case 0x3B => return None // trailer before any image
          case _ => return None
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** GIF-variant LZW encode: greedy longest match over a
    * (prefixCode, byte) dictionary, clear emitted first and on full
    * (4096), EOI last, codes packed LSB-first. The decoder's exact
    * inverse — round-trip pinned across dict resets in GifCodecSpec. */
  private[graft] def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    var acc = 0L; var accBits = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += codeSize
      while (accBits >= 8) { out.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8 }
    }
    // dict: (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    put(clear)
    var cur = -1
    var i = 0
    while (i < indices.length) {
      val b = indices(i) & 0xFF
      if (cur < 0) cur = b
      else {
        val key = Integer.valueOf((cur << 8) | b)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur)
          if (next == 4096) {
            put(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1; codeSize = minCodeSize + 1
          } else {
            dict.put(key, Integer.valueOf(next))
            next += 1
            // the encoder widens when it ASSIGNS code 2^codeSize
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          }
          cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) put(cur)
    put(eoi)
    if (accBits > 0) out.write((acc & 0xFF).toInt)
    out.toByteArray
  }

  /** Encode an index raster as a real GIF89a: global color table
    * `palette` (n*3 bytes, n a power of two), a Graphic Control
    * Extension (so decoders must skip extensions), one non-interlaced
    * image, LZW-compressed, sub-block framed. */
  def encode(w: Int, h: Int, indices: Array[Byte], palette: Array[Byte]): Array[Byte] = {
    require(indices.length == w * h, "indices must be w*h bytes")
    require(palette.length % 3 == 0 && Integer.bitCount(palette.length / 3) == 1
      && palette.length / 3 >= 2,
      "palette entries must be a power of two, at least 2 (a 1-entry " +
        "table has no GCT size-field encoding — (0-1)&7 would declare " +
        "256 entries)")
    val ncol = palette.length / 3
    val sizeBits = 31 - Integer.numberOfLeadingZeros(ncol) // log2
    val mcs = math.max(2, sizeBits)
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + palette.length + 64)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    out.write(0x80 | ((sizeBits - 1) & 7)) // GCT present, size bits
    out.write(0); out.write(0)             // bg index, aspect
    out.write(palette, 0, palette.length)
    // Graphic Control Extension: 4-byte payload, no transparency
    out.write(0x21); out.write(0xF9); out.write(4)
    out.write(0); u16(0); out.write(0); out.write(0)
    out.write(0x2C)                        // image descriptor
    u16(0); u16(0); u16(w); u16(h); out.write(0)
    out.write(mcs)
    val lzw = lzwEncode(indices, mcs)
    var at = 0
    while (at < lzw.length) {
      val n = math.min(255, lzw.length - at)
      out.write(n); out.write(lzw, at, n)
      at += n
    }
    out.write(0)                           // block terminator
    out.write(0x3B)                        // trailer
    out.toByteArray
  }

  /** Per-bucket channel sums over the gate corpus — the shared
    * [[DecodeGate.rgbSums]] harness over the real LZW decode. */
  def decodeGif(s: SparkSession, dir: String): DataFrame =
    DecodeGate.rgbSums(s, dir)(id => decode(GifGen.gif(id))
      .map(g => PngCodec.Image(g.width, g.height, 3, g.pixels)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_gif" -> (decodeGif _))

  /** The oracle enumerates every pixel, maps the closed-form palette
    * index through the closed-form palette channels, and sums — the
    * decoder must reproduce them through sub-block framing, LSB-first
    * unpacking, width growth, dictionary resets, and the palette. */
  val oracleSql: Map[String, String] = Map(
    "mm_decode_gif" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + (doc_id % 29) AS w, 4 + ((doc_id * 3) % 23) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    sum((xs.x * 3 + ys.y * 5 + doc_id) % 256) AS sr,
        |    sum(((xs.x * 3 + ys.y * 5 + doc_id) % 256 * 3) % 256) AS sg,
        |    sum(((xs.x * 3 + ys.y * 5 + doc_id) % 256 * 7) % 256) AS sb
        |  FROM d,
        |    unnest(generate_series(0, w - 1)) AS xs(x),
        |    unnest(generate_series(0, h - 1)) AS ys(y)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id % 8 AS bucket, count(*) AS n_imgs,
        |  sum(w)::BIGINT AS sum_w, sum(h)::BIGINT AS sum_h,
        |  sum(sr)::BIGINT AS sum_r, sum(sg)::BIGINT AS sum_g,
        |  sum(sb)::BIGINT AS sum_b
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin)
}

/** Deterministic real-GIF generator for the `mm_decode_gif` gate:
  * dims 4-32 × 4-26, palette index closed-form in (doc_id, x, y),
  * 256-entry global color table with channels closed-form in the
  * index — both mirrored verbatim in the oracle — LZW-compressed by
  * the real encoder behind a Graphic Control Extension. */
object GifGen {

  /** palette(i) = (i, (i*3)%256, (i*7)%256). */
  val Palette: Array[Byte] = {
    val p = new Array[Byte](256 * 3)
    var i = 0
    while (i < 256) {
      p(3 * i) = i.toByte
      p(3 * i + 1) = ((i * 3) % 256).toByte
      p(3 * i + 2) = ((i * 7) % 256).toByte
      i += 1
    }
    p
  }

  def gif(id: Long): Array[Byte] = {
    val w = (4 + id % 29).toInt
    val h = (4 + (id * 3) % 23).toInt
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        idx(y * w + x) = ((x * 3 + y * 5 + id) % 256).toByte
        x += 1
      }
      y += 1
    }
    GifCodec.encode(w, h, idx, Palette)
  }
}
