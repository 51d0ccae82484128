package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL baseline-JPEG decoding, grayscale subset (r17): the deepest
  * stub-to-genuine conversion on the multimodal surface — a working
  * ITU-T T.81 baseline decoder for single-component (grayscale)
  * images: marker walk, DQT (8-bit tables, zigzag order), DHT
  * (canonical Huffman per F.2.2.3 — mincode/maxcode/valptr decode),
  * SOF0, SOS, then the entropy-coded scan MSB-first with 0xFF00 byte
  * UN-STUFFING, per-block DC category decode + EXTEND sign recovery +
  * DC prediction, the general AC run-length path (EOB, ZRL, (r,s)
  * codes), dequantization, de-zigzag, a real separable 2-D IDCT in
  * double precision, and the +128 level shift with clamping — plus
  * the COLOR half ([[decodeColor]], `mm_decode_jpeg_color`): YCbCr
  * 4:2:0 frames with interleaved MCUs (four Y blocks then Cb then Cr,
  * three separate DC predictor chains), chroma upsampling by
  * replication, and the BT.601 conversion with rounding and clamping.
  * Restart intervals are supported (DRI parsed; each boundary
  * demands the cycling RSTn, re-aligns to the byte edge, resets the
  * predictors), and so is a PROGRESSIVE (SOF2) grayscale subset
  * (`mm_decode_jpeg_prog`): multi-scan coefficient accumulation with
  * DC successive approximation (point-transformed first scan, then
  * raw refinement bits ORed in at Al — two's-complement OR
  * reconstructs negatives exactly), AC band scans with real EOB-run
  * decoding, and AC REFINEMENT scans (T.81 G.1.2.3 — correction bits
  * on already-nonzero coefficients interleaved with ±1 placements and
  * EOB-runs whose covered blocks still consume corrections; pinned by
  * JpegAcRefineSpec's hand-derived bitstreams against baseline
  * twins), finalized (dequantize + IDCT) only at EOI. What stays out
  * of the subset — and stubbed at the documented boundary — is
  * progressive color, which returns None as unsupported rather than
  * decoding wrong.
  *
  * The gate corpus is DC-ONLY by construction (every block's AC
  * coefficients are zero, terminated by a real Huffman-coded EOB), a
  * deliberate choice with a mathematical point: the IDCT of a
  * DC-only block is EXACTLY flat at S00/8, so with Q[0] = 16 the
  * reconstruction is the integer 128 + 2·dc — the one corner of JPEG
  * where a float IDCT is bit-predictable cross-engine, letting the
  * DuckDB oracle predict every pixel closed-form while the decoder
  * still runs the full general machinery (Huffman tables, stuffing,
  * prediction, IDCT) to get there. An encoder that skipped the real
  * scan structure, or a decoder that shortcut the IDCT, mis-extended
  * a sign, or dropped a stuffed byte, diverges the per-block sums.
  *
  * Totality: None on anything malformed — bad/dangling markers,
  * over-long Huffman codes, a scan that ends early, a lying segment
  * length — never a throw (PdfText's contract; JpegCodecSpec
  * ladders). Reference context as for [[PngCodec]]: the reference
  * inspects opaque BLOBs in-engine
  * (/root/reference/scripts/01_pdf_to_vector.sql:49-59).
  *
  * Scale shape (`mm_decode_jpeg`): the `mm_decode_pixels` shape
  * verbatim — one narrow mapPartitions (synthesize → decode →
  * per-image gray moments), partial-agg groupBy on an 8-value
  * bucket, no pixel shuffle; at 100 TB decode CPU × cores.
  */
object JpegCodec {

  /** Grayscale samples, row-major. */
  final case class Gray(width: Int, height: Int, pixels: Array[Byte])

  /** Zigzag index → (row, col) linear index, T.81 Figure A.6. */
  private[graft] val Zigzag: Array[Int] = {
    val zz = new Array[Int](64)
    var i = 0; var x = 0; var y = 0; var up = true
    while (i < 64) {
      zz(i) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      i += 1
    }
    zz
  }

  /** Canonical Huffman decode tables per T.81 F.2.2.3. */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(at: Int): Int = vals(at) & 0xFF
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * un-stuffing; hitting a marker or the end raises the private
    * Exhausted signal which decode() maps to None. */
  private object Exhausted extends Exception { override def fillInStackTrace(): Throwable = this }
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) throw Exhausted
        var b = data(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          if (pos >= data.length) throw Exhausted
          val m = data(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed
          else throw Exhausted    // a real marker ends the scan
          b = 0xFF
        }
        acc = b; cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def huffDecode(h: Huff): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.value(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      throw Exhausted // over-long code: corrupt stream
    }
    /** Consume an expected RSTn at an MCU boundary: discard the pad
      * bits to the byte edge, then the marker itself — a missing or
      * out-of-sequence restart is corruption (T.81 E.1.4). */
    def restart(seq: Int): Unit = {
      cnt = 0
      if (pos + 2 > data.length) throw Exhausted
      if ((data(pos) & 0xFF) != 0xFF ||
          (data(pos + 1) & 0xFF) != (0xD0 + seq)) throw Exhausted
      pos += 2
    }
  }

  /** EXTEND (T.81 F.2.2.1): recover a signed value from its
    * category-t magnitude bits. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  import ByteIo.be16

  /** IDCT basis, precomputed once: Basis(u*8+x) = C(u)/2 ·
    * cos((2x+1)uπ/16) — what every production decoder does instead
    * of per-sample cos() calls (measured 25× on the probe). The
    * arithmetic is the same separable sum, so DC-only exactness is
    * unchanged (a single nonzero term accumulates no reordering
    * error). */
  private val Basis: Array[Double] = {
    val b = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 0.70710678118654752440 else 1.0
      var x = 0
      while (x < 8) {
        b(u * 8 + x) = cu / 2 * math.cos((2 * x + 1) * u * math.Pi / 16)
        x += 1
      }
      u += 1
    }
    b
  }

  /** Separable 2-D IDCT (T.81 A.3.3) in double precision with final
    * round + level shift + clamp, over the precomputed [[Basis]];
    * all-zero coefficient rows (the common case in sparse blocks)
    * are skipped in the first pass. */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows of the coefficient block: 1-D over u
      val base = v * 8
      var nz = false
      var u = 0
      while (u < 8 && !nz) { nz = coef(base + u) != 0; u += 1 }
      if (nz) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          u = 0
          while (u < 8) {
            val c = coef(base + u)
            if (c != 0) s += c * Basis(u * 8 + x)
            u += 1
          }
          tmp(base + x) = s
          x += 1
        }
      }
      v += 1
    }
    var x = 0
    while (x < 8) { // 1-D over v down each column
      var y = 0
      while (y < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          s += Basis(vv * 8 + y) * tmp(vv * 8 + x)
          vv += 1
        }
        val px = math.round(s + 128).toInt
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        y += 1
      }
      x += 1
    }
  }

  /** One entropy-coded 8×8 block: DC category + EXTEND + prediction,
    * the AC run-length path (EOB/ZRL/(r,s)), dequantize, de-zigzag,
    * IDCT into `block`. Returns the new DC predictor; corruption
    * surfaces as [[Exhausted]] (mapped to None by the callers). */
  private def decodeBlock(reader: BitReader, dcT: Huff, acT: Huff,
      q: Array[Int], pred0: Int, coef: Array[Int], block: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0)
    val t = reader.huffDecode(dcT)
    if (t > 11) throw Exhausted
    val pred = pred0 + extend(reader.bits(t), t)
    coef(0) = pred * q(0)
    var k = 1
    var eob = false
    while (k < 64 && !eob) {
      val rs = reader.huffDecode(acT)
      val r = rs >> 4; val s = rs & 0xF
      if (s == 0) {
        if (r == 15) k += 16 // ZRL: sixteen zeros
        else eob = true
      } else {
        k += r
        if (k > 63) throw Exhausted
        coef(Zigzag(k)) = extend(reader.bits(s), s) * q(k)
        k += 1
      }
    }
    idctBlock(coef, block)
    pred
  }

  /** Shared header walk + entropy decode. channels = 1 (grayscale,
    * 1×1) or 3 (YCbCr 4:2:0, interleaved MCUs, chroma upsampled by
    * replication, ITU-R BT.601 conversion). */
  private def decodeAny(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
      var at = 2
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var w = -1; var h = -1; var ncomp = 0
      val compQ = new Array[Int](3)    // per-component quant selector
      val compDc = new Array[Int](3)   // per-component DC table (SOS)
      val compAc = new Array[Int](3)   // per-component AC table (SOS)
      val compId = new Array[Int](3)
      var restartInterval = 0
      var scanAt = -1
      // progressive (SOF2) state: raw coefficients accumulate in
      // ZIGZAG order across scans and only dequantize+IDCT at EOI
      var progressive = false
      var progCoef: Array[Array[Int]] = null
      var progPred = 0
      var progEobrun = 0
      var progResumeAt = -1
      var sawScan = false
      while (scanAt == -1) {
        if (at + 2 > bytes.length) return None
        if ((bytes(at) & 0xFF) != 0xFF) return None
        val m = bytes(at + 1) & 0xFF
        if (m == 0xD9 && progressive) {
          // EOI closes the progressive stream: finalize below
          scanAt = -2
        }
        else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) { at += 2 }
        else if (at + 4 > bytes.length) return None
        else {
          val len = be16(bytes, at + 2)
          if (len < 2 || at + 2 + len > bytes.length) return None
          val seg = at + 4; val segEnd = at + 2 + len
          m match {
            case 0xDB => // DQT: one or more (PqTq + 64) tables
              var p = seg
              while (p < segEnd) {
                val pq = (bytes(p) >> 4) & 0xF; val tq = bytes(p) & 0xF
                if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
                val q = new Array[Int](64)
                var k = 0
                while (k < 64) { q(k) = bytes(p + 1 + k) & 0xFF; k += 1 }
                quant(tq) = q
                p += 65
              }
            case 0xC4 => // DHT: one or more (TcTh + 16 counts + vals)
              var p = seg
              while (p < segEnd) {
                if (p + 17 > segEnd) return None
                val tc = (bytes(p) >> 4) & 0xF; val th = bytes(p) & 0xF
                if (tc > 1 || th > 3) return None
                val counts = new Array[Int](17)
                var total = 0
                var l = 1
                while (l <= 16) { counts(l) = bytes(p + l) & 0xFF; total += counts(l); l += 1 }
                if (total > 256 || p + 17 + total > segEnd) return None
                val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
                val tab = new Huff(counts, vals)
                if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
                p += 17 + total
              }
            case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
              if (len < 8) return None
              progressive = m == 0xC2
              val precision = bytes(seg) & 0xFF
              h = be16(bytes, seg + 1); w = be16(bytes, seg + 3)
              ncomp = bytes(seg + 5) & 0xFF
              // the supported subset: 8-bit grayscale (1×1) or
              // three-component YCbCr 4:2:0 (2×2, 1×1, 1×1);
              // progressive only as grayscale
              if (precision != 8 || (ncomp != 1 && ncomp != 3)) return None
              if (progressive && ncomp != 1) return None
              if (len != 8 + 3 * ncomp) return None
              var c = 0
              while (c < ncomp) {
                compId(c) = bytes(seg + 6 + 3 * c) & 0xFF
                val samp = bytes(seg + 7 + 3 * c) & 0xFF
                val want = if (ncomp == 1 || c > 0) 0x11 else 0x22
                if (samp != want) return None
                compQ(c) = bytes(seg + 8 + 3 * c) & 0xF
                c += 1
              }
              if (progressive) {
                if (w <= 0 || h <= 0 || w.toLong * h > (64 << 20)) return None
                progCoef = Array.fill(((w + 7) / 8) * ((h + 7) / 8))(new Array[Int](64))
              }
            case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
                 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
              return None // extended/lossless/arith: unsupported
            case 0xDD => // DRI: restart interval in MCUs
              if (len != 4) return None
              restartInterval = be16(bytes, seg)
            case 0xDA => // SOS
              val ns = bytes(seg) & 0xFF
              if (ns != ncomp || ns == 0 || len != 6 + 2 * ns) return None
              var c = 0
              while (c < ns) {
                val cs = bytes(seg + 1 + 2 * c) & 0xFF
                // scan components must arrive in frame order
                if (cs != compId(c)) return None
                compDc(c) = (bytes(seg + 2 + 2 * c) >> 4) & 0xF
                compAc(c) = bytes(seg + 2 + 2 * c) & 0xF
                c += 1
              }
              val ss = bytes(seg + 1 + 2 * ns) & 0xFF
              val se = bytes(seg + 2 + 2 * ns) & 0xFF
              val ahal = bytes(seg + 3 + 2 * ns) & 0xFF
              if (!progressive) {
                if (ss != 0 || se != 63 || ahal != 0) return None
                scanAt = segEnd
              } else {
                // one progressive scan, decoded in place; the walk
                // resumes at the next marker (DHT redefinitions and
                // further scans follow)
                if (restartInterval != 0) return None // DRI+SOF2: out of subset
                val ah = (ahal >> 4) & 0xF; val al = ahal & 0xF
                val reader = new BitReader(bytes, segEnd)
                val nBlocks = progCoef.length
                if (ss == 0) {
                  if (se != 0) return None // DC scan is exactly band 0
                  val dcT = dcTabs(compDc(0))
                  if (ah == 0) {
                    // DC first: category-coded shifted diffs
                    if (dcT == null) return None
                    progPred = 0
                    var b = 0
                    while (b < nBlocks) {
                      val t = reader.huffDecode(dcT)
                      if (t > 11) return None
                      progPred += extend(reader.bits(t), t)
                      progCoef(b)(0) = progPred << al
                      b += 1
                    }
                  } else {
                    // DC refinement: one raw bit per block ORs in the
                    // next lower magnitude bit (two's-complement OR
                    // reconstructs negatives exactly)
                    if (ah != al + 1) return None
                    var b = 0
                    while (b < nBlocks) {
                      if (reader.nextBit() == 1) progCoef(b)(0) |= 1 << al
                      b += 1
                    }
                  }
                } else if (ah == 0) {
                  // AC band scan, first pass: EOB-run coding over the
                  // band
                  if (se < ss || se > 63) return None
                  val acT = acTabs(compAc(0))
                  if (acT == null) return None
                  progEobrun = 0
                  var b = 0
                  while (b < nBlocks) {
                    if (progEobrun > 0) { progEobrun -= 1 }
                    else {
                      var k = ss
                      var done = false
                      while (k <= se && !done) {
                        val rs = reader.huffDecode(acT)
                        val r = rs >> 4; val s2 = rs & 0xF
                        if (s2 == 0) {
                          if (r == 15) k += 16 // ZRL
                          else {
                            // EOBRUN: this block plus (run-1) more
                            progEobrun = (1 << r) - 1 + reader.bits(r)
                            done = true
                          }
                        } else {
                          k += r
                          if (k > se) return None
                          progCoef(b)(k) = extend(reader.bits(s2), s2) << al
                          k += 1
                        }
                      }
                    }
                    b += 1
                  }
                } else {
                  // AC REFINEMENT scan (T.81 G.1.2.3): every already-
                  // nonzero coefficient in the band receives a
                  // correction bit as the traversal passes it (ORing
                  // the next lower magnitude bit in, toward the sign),
                  // (r, s=1) symbols place NEW ±2^Al coefficients
                  // after skipping r ZERO-history positions, ZRL skips
                  // 16 zeros, and an EOB-run covers whole blocks whose
                  // nonzeros still consume correction bits — the
                  // libjpeg decode_mcu_AC_refine traversal.
                  if (ah != al + 1) return None
                  if (se < ss || se > 63) return None
                  val acT = acTabs(compAc(0))
                  if (acT == null) return None
                  val p1 = 1 << al
                  def refineOne(coef: Array[Int], k: Int): Unit =
                    if (reader.nextBit() == 1 && (coef(k) & p1) == 0)
                      coef(k) += (if (coef(k) >= 0) p1 else -p1)
                  progEobrun = 0
                  var b = 0
                  while (b < nBlocks) {
                    val coef = progCoef(b)
                    var k = ss
                    if (progEobrun == 0) {
                      var toEob = false
                      while (k <= se && !toEob) {
                        val rs = reader.huffDecode(acT)
                        var r = rs >> 4; val s2 = rs & 0xF
                        var newVal = 0
                        if (s2 == 0) {
                          if (r != 15) {
                            progEobrun = (1 << r) + (if (r > 0) reader.bits(r) else 0)
                            toEob = true // sweep the band tail below
                          }
                          // r == 15 (ZRL): newVal 0, skip 16 zeros
                        } else {
                          if (s2 != 1) return None // refinement is ±1 only
                          newVal = if (reader.nextBit() == 1) p1 else -p1
                        }
                        if (!toEob) {
                          // advance past r zero-history positions,
                          // correcting nonzeros en route; place newVal
                          // (if any) on the stopping zero
                          var placed = false
                          while (k <= se && !placed) {
                            if (coef(k) != 0) { refineOne(coef, k); k += 1 }
                            else if (r == 0) {
                              if (s2 != 0) coef(k) = newVal
                              k += 1; placed = true
                            } else { r -= 1; k += 1 }
                          }
                          if (!placed && s2 != 0) return None // run overran band
                        }
                      }
                    }
                    if (progEobrun > 0) {
                      // block inside an EOB-run: remaining nonzeros in
                      // the band still receive correction bits
                      while (k <= se) {
                        if (coef(k) != 0) refineOne(coef, k)
                        k += 1
                      }
                      progEobrun -= 1
                    }
                    b += 1
                  }
                }
                sawScan = true
                // resume the marker walk after the entropy data: the
                // next FF followed by a non-stuffing byte is a marker
                var p = reader.pos
                while (p + 1 < bytes.length &&
                    !((bytes(p) & 0xFF) == 0xFF && (bytes(p + 1) & 0xFF) != 0x00))
                  p += 1
                if (p + 1 >= bytes.length) return None
                progResumeAt = p
              }
            case 0xD9 => return None // EOI before any scan
            case _ => () // APPn/COM/unknown: skipped by length
          }
          at = if (progResumeAt >= 0) progResumeAt else segEnd
          progResumeAt = -1
        }
      }
      if (w <= 0 || h <= 0 || w.toLong * h > (64 << 20)) return None
      if (scanAt == -2) {
        // progressive finalize at EOI: dequantize the accumulated
        // zigzag coefficients and IDCT every block
        if (!sawScan || quant(compQ(0)) == null) return None
        val q = quant(compQ(0))
        val bw = (w + 7) / 8; val bh = (h + 7) / 8
        val px = new Array[Byte](w * h)
        val nat = new Array[Int](64)
        val blk = new Array[Int](64)
        var b = 0
        while (b < progCoef.length) {
          var k = 0
          while (k < 64) { nat(Zigzag(k)) = progCoef(b)(k) * q(k); k += 1 }
          idctBlock(nat, blk)
          val bx = b % bw; val by = b / bw
          var yy = 0
          while (yy < 8) {
            val iy = by * 8 + yy
            if (iy < h) {
              var xx = 0
              while (xx < 8) {
                val ix = bx * 8 + xx
                if (ix < w) px(iy * w + ix) = blk(yy * 8 + xx).toByte
                xx += 1
              }
            }
            yy += 1
          }
          b += 1
        }
        return Some((w, h, 1, px))
      }
      var c = 0
      while (c < ncomp) {
        if (quant(compQ(c)) == null || dcTabs(compDc(c)) == null ||
            acTabs(compAc(c)) == null) return None
        c += 1
      }
      val reader = new BitReader(bytes, scanAt)
      val coef = new Array[Int](64)
      val block = new Array[Int](64)
      // restart bookkeeping, shared by both fronts: after every
      // `restartInterval` MCUs (except the last), an RSTn with a
      // cycling sequence number re-aligns the stream and resets every
      // DC predictor
      var mcuCount = 0
      var rstSeq = 0
      def maybeRestart(totalMcus: Int): Boolean = {
        mcuCount += 1
        if (restartInterval > 0 && mcuCount % restartInterval == 0 &&
            mcuCount < totalMcus) {
          reader.restart(rstSeq)
          rstSeq = (rstSeq + 1) % 8
          true
        } else false
      }
      if (ncomp == 1) {
        val q = quant(compQ(0))
        val dcT = dcTabs(compDc(0)); val acT = acTabs(compAc(0))
        val bw = (w + 7) / 8; val bh = (h + 7) / 8
        val px = new Array[Byte](w * h)
        var pred = 0
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            pred = decodeBlock(reader, dcT, acT, q, pred, coef, block)
            if (maybeRestart(bw * bh)) pred = 0
            var yy = 0
            while (yy < 8) {
              val iy = by * 8 + yy
              if (iy < h) {
                var xx = 0
                while (xx < 8) {
                  val ix = bx * 8 + xx
                  if (ix < w) px(iy * w + ix) = block(yy * 8 + xx).toByte
                  xx += 1
                }
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        Some((w, h, 1, px))
      } else {
        // 4:2:0 interleaved MCUs: per MCU four Y blocks (row-major),
        // one Cb, one Cr — each component with its own DC predictor
        val mw = (w + 15) / 16; val mh = (h + 15) / 16
        val yPlane = new Array[Byte](mw * 16 * mh * 16)
        val cbPlane = new Array[Byte](mw * 8 * mh * 8)
        val crPlane = new Array[Byte](mw * 8 * mh * 8)
        val yStride = mw * 16; val cStride = mw * 8
        var predY = 0; var predCb = 0; var predCr = 0
        var my = 0
        while (my < mh) {
          var mx = 0
          while (mx < mw) {
            var j = 0
            while (j < 4) { // Y blocks, left-to-right, top-to-bottom
              predY = decodeBlock(reader, dcTabs(compDc(0)), acTabs(compAc(0)),
                quant(compQ(0)), predY, coef, block)
              val ox = mx * 16 + (j % 2) * 8; val oy = my * 16 + (j / 2) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  yPlane((oy + yy) * yStride + ox + xx) = block(yy * 8 + xx).toByte
                  xx += 1
                }
                yy += 1
              }
              j += 1
            }
            predCb = decodeBlock(reader, dcTabs(compDc(1)), acTabs(compAc(1)),
              quant(compQ(1)), predCb, coef, block)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                cbPlane((my * 8 + yy) * cStride + mx * 8 + xx) = block(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            predCr = decodeBlock(reader, dcTabs(compDc(2)), acTabs(compAc(2)),
              quant(compQ(2)), predCr, coef, block)
            yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                crPlane((my * 8 + yy) * cStride + mx * 8 + xx) = block(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            if (maybeRestart(mw * mh)) { predY = 0; predCb = 0; predCr = 0 }
            mx += 1
          }
          my += 1
        }
        // upsample chroma by replication + BT.601 conversion, the
        // multiply order mirrored VERBATIM in the oracle SQL so the
        // double arithmetic is bit-identical cross-engine
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yv = (yPlane(y * yStride + x) & 0xFF).toDouble
            val cb = (cbPlane((y / 2) * cStride + x / 2) & 0xFF) - 128
            val cr = (crPlane((y / 2) * cStride + x / 2) & 0xFF) - 128
            val r = math.round(yv + 1.402 * cr).toInt
            val g = math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt
            val b = math.round(yv + 1.772 * cb).toInt
            val i = (y * w + x) * 3
            px(i) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
            px(i + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
            px(i + 2) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
            x += 1
          }
          y += 1
        }
        Some((w, h, 3, px))
      }
    } catch {
      case Exhausted => None
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Decode a baseline grayscale JPEG. None on anything malformed,
    * color, progressive, or restart-marked; never throws. */
  def decode(bytes: Array[Byte]): Option[Gray] =
    decodeAny(bytes) match {
      case Some((w, h, 1, px)) => Some(Gray(w, h, px))
      case _ => None
    }

  /** RGB triples, row-major — the color twin of [[Gray]]. */
  final case class Color(width: Int, height: Int, pixels: Array[Byte])

  /** Decode a baseline YCbCr 4:2:0 JPEG to RGB. None on anything
    * malformed, grayscale, progressive, or restart-marked; never
    * throws. */
  def decodeColor(bytes: Array[Byte]): Option[Color] =
    decodeAny(bytes) match {
      case Some((w, h, 3, px)) => Some(Color(w, h, px))
      case _ => None
    }

  /** Per-bucket gray moments over the gate corpus — the shared
    * [[DecodeGate.graySums]] harness over the real baseline decode. */
  def decodeJpeg(s: SparkSession, dir: String): DataFrame =
    DecodeGate.graySums(s, dir)(id => decode(JpegGen.jpeg(id)))

  /** Per-bucket RGB channel sums over the COLOR gate corpus
    * (interleaved MCUs, per-component DC predictors, chroma upsample,
    * BT.601) — the shared [[DecodeGate.rgbSums]] harness. */
  def decodeJpegColor(s: SparkSession, dir: String): DataFrame =
    DecodeGate.rgbSums(s, dir)(id => decodeColor(JpegGen.jpegColor(id))
      .map(c => PngCodec.Image(c.width, c.height, 3, c.pixels)))

  /** The progressive gate: the SAME image and oracle as
    * `mm_decode_jpeg`, delivered as a three-scan SOF2 stream (DC
    * first at Al=1 -> DC refinement -> AC band as EOB-runs) — the
    * multi-scan accumulation, the successive-approximation shift/OR,
    * and EOBRUN decode all sit between the bytes and the unchanged
    * closed form. */
  def decodeJpegProg(s: SparkSession, dir: String): DataFrame =
    DecodeGate.graySums(s, dir)(id => decode(JpegGen.jpegProgressive(id)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_jpeg" -> (decodeJpeg _),
    "mm_decode_jpeg_color" -> (decodeJpegColor _),
    "mm_decode_jpeg_prog" -> (decodeJpegProg _))

  /** The gray-moments oracle, shared by `mm_decode_jpeg` AND
    * `mm_decode_jpeg_prog` (the progressive stream reconstructs the
    * IDENTICAL image, so everything progressive — multi-scan
    * accumulation, the Al shift/OR, EOBRUN — must cancel out
    * exactly): enumerates every 8×8 block — the DC-only IDCT is flat
    * at 128 + 2·dc (Q[0]=16), so each block contributes 64 identical
    * pixels — and the decoder must reproduce the sums through real
    * Huffman decoding, DC prediction, dequantization, and the float
    * IDCT landing exactly on the integers. */
  private val GrayMomentsOracle: String =
      """WITH d AS (
        |  SELECT doc_id, 8 * (1 + doc_id % 4) AS w, 8 * (1 + (doc_id * 3) % 4) AS h
        |  FROM documents),
        |blk AS (
        |  SELECT doc_id, w, h,
        |    128 + 2 * (((doc_id + bxs.bx * 3 + bys.by * 5) % 120) - 60) AS lvl
        |  FROM d,
        |    unnest(generate_series(0, w // 8 - 1)) AS bxs(bx),
        |    unnest(generate_series(0, h // 8 - 1)) AS bys(by)),
        |img AS (
        |  SELECT doc_id, w, h, sum(64 * lvl) AS sgray,
        |    min(lvl) AS mn, max(lvl) AS mx
        |  FROM blk GROUP BY 1, 2, 3)
        |SELECT doc_id % 8 AS bucket, count(*) AS n_imgs,
        |  sum(w)::BIGINT AS sum_w, sum(h)::BIGINT AS sum_h,
        |  sum(sgray)::BIGINT AS sum_gray,
        |  min(mn)::BIGINT AS min_gray, max(mx)::BIGINT AS max_gray
        |FROM img GROUP BY 1 ORDER BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "mm_decode_jpeg" -> GrayMomentsOracle,
    "mm_decode_jpeg_prog" -> GrayMomentsOracle,
    // the color gate: DC-only everywhere keeps every plane flat per
    // block, so the pixel is closed-form — Y from the block's dc, Cb/
    // Cr from the MCU's chroma dcs — and the BT.601 conversion is
    // replayed with the SAME double constants (::DOUBLE — DuckDB
    // would otherwise parse the literals as DECIMAL and round
    // differently) in the SAME operation order as the Scala code, so
    // the doubles are bit-identical and round() agrees (tie values
    // cannot occur: the chroma deltas are even integers whose scaled
    // fractions never land on .5).
    "mm_decode_jpeg_color" ->
      """WITH d AS (
        |  SELECT doc_id, 16 * (1 + doc_id % 2) AS w, 16 * (1 + (doc_id * 3) % 2) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    (128 + 2 * (((doc_id + (xs.x // 16) * 7 + (ys.y // 16) * 11
        |        + (((ys.y % 16) // 8) * 2 + (xs.x % 16) // 8) * 3) % 100) - 50))::DOUBLE AS yv,
        |    (2 * (((doc_id + (xs.x // 16) * 3 + (ys.y // 16) * 5) % 21) - 10))::DOUBLE AS cbv,
        |    (2 * (((doc_id * 2 + (xs.x // 16) * 5 + (ys.y // 16) * 3) % 21) - 10))::DOUBLE AS crv
        |  FROM d,
        |    unnest(generate_series(0, w - 1)) AS xs(x),
        |    unnest(generate_series(0, h - 1)) AS ys(y)),
        |rgb AS (
        |  SELECT doc_id, w, h,
        |    LEAST(255, GREATEST(0, round(yv + 1.402::DOUBLE * crv)::INT)) AS r,
        |    LEAST(255, GREATEST(0, round(yv - 0.344136::DOUBLE * cbv
        |        - 0.714136::DOUBLE * crv)::INT)) AS g,
        |    LEAST(255, GREATEST(0, round(yv + 1.772::DOUBLE * cbv)::INT)) AS b
        |  FROM px),
        |img AS (
        |  SELECT doc_id, w, h, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb
        |  FROM rgb GROUP BY 1, 2, 3)
        |SELECT doc_id % 8 AS bucket, count(*) AS n_imgs,
        |  sum(w)::BIGINT AS sum_w, sum(h)::BIGINT AS sum_h,
        |  sum(sr)::BIGINT AS sum_r, sum(sg)::BIGINT AS sum_g,
        |  sum(sb)::BIGINT AS sum_b
        |FROM img GROUP BY 1 ORDER BY 1""".stripMargin)
}

/** Deterministic real-JPEG generator for the `mm_decode_jpeg` gate:
  * baseline grayscale, dims 8-32 (whole blocks), quant table Q=16
  * everywhere, custom canonical Huffman tables (twelve 4-bit DC
  * category codes; a 2-bit AC EOB), per-block dc closed-form in
  * (doc_id, bx, by) ∈ [-60, 59] so 128 + 2·dc never clamps, DC
  * differences category-coded with real EXTEND-inverse magnitude
  * bits, EOB after every DC, 0xFF bytes stuffed. */
object JpegGen {

  /** dc(id, bx, by) — mirrored in the oracle. */
  def dc(id: Long, bx: Int, by: Int): Int =
    (((id + bx * 3 + by * 5) % 120) - 60).toInt

  // DC table: twelve categories 0..11, all 4-bit canonical codes
  // (0000..1011); AC table: the single EOB symbol on a 2-bit code.
  private val DcBits: Array[Int] = { val a = new Array[Int](17); a(4) = 12; a }
  private val DcVals: Array[Byte] = Array.tabulate(12)(_.toByte)
  private val AcBits: Array[Int] = { val a = new Array[Int](17); a(2) = 1; a }
  private val AcVals: Array[Byte] = Array[Byte](0)

  /** Canonical code for the i-th symbol of a one-length table starts
    * at 0: DC category t ↦ code t (4 bits); AC EOB ↦ code 0 (2 bits). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); cnt += 1
        if (cnt == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // stuff
          acc = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = {
      if (cnt > 0) {
        val pad = (acc << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
        out.write(pad & 0xFF)
        if ((pad & 0xFF) == 0xFF) out.write(0x00)
        acc = 0; cnt = 0
      }
    }
  }

  private def category(v: Int): Int = {
    var t = 0; var m = math.abs(v)
    while (m != 0) { t += 1; m >>= 1 }
    t
  }

  def jpeg(id: Long): Array[Byte] =
    jpegOfSize(id, (8 * (1 + id % 4)).toInt, (8 * (1 + (id * 3) % 4)).toInt)

  /** The gate encoder at arbitrary whole-block dims (probe use). */
  private[graft] def jpegOfSize(id: Long, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)                      // SOI
    marker(0xDB); u16(2 + 65)         // DQT
    out.write(0x00)                   // Pq=0 Tq=0
    var k = 0
    while (k < 64) { out.write(16); k += 1 }
    marker(0xC4); u16(2 + 17 + 12)    // DHT DC
    out.write(0x00)                   // Tc=0 Th=0
    var l = 1
    while (l <= 16) { out.write(DcBits(l)); l += 1 }
    DcVals.foreach(v => out.write(v & 0xFF))
    marker(0xC4); u16(2 + 17 + 1)     // DHT AC
    out.write(0x10)                   // Tc=1 Th=0
    l = 1
    while (l <= 16) { out.write(AcBits(l)); l += 1 }
    out.write(0)
    marker(0xC0); u16(2 + 9)          // SOF0
    out.write(8); u16(h); u16(w)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    marker(0xDA); u16(2 + 6)          // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val bits = new BitWriter(out)
    var pred = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        val v = dc(id, bx, by)
        val diff = v - pred; pred = v
        val t = category(diff)
        bits.put(t, 4)                // DC category code == t
        if (t > 0) {
          // magnitude bits: EXTEND's inverse (ones'-complement for
          // negatives)
          val mag = if (diff < 0) diff + (1 << t) - 1 else diff
          bits.put(mag, t)
        }
        bits.put(0, 2)                // AC EOB (code 0, 2 bits)
        bx += 1
      }
      by += 1
    }
    bits.flushOnes()
    marker(0xD9)                      // EOI
    out.toByteArray
  }

  /** The progressive gate encoder (SOF2): the SAME image as
    * [[jpeg]] — identical dims and per-block dc closed form, so the
    * `mm_decode_jpeg_prog` oracle IS the `mm_decode_jpeg` oracle —
    * delivered the progressive way, in three scans:
    *
    *  1. DC first (Ss=Se=0, Ah=0, Al=1): category-coded diffs of the
    *     POINT-TRANSFORMED values dc>>1;
    *  2. DC refinement (Ah=1, Al=0): one raw bit per block (dc&1) —
    *     the successive-approximation path, reconstructing negatives
    *     via two's-complement OR;
    *  3. AC band (Ss=1, Se=63, Ah=0): all coefficients zero, coded as
    *     real EOB-RUNs over an AC table carrying EOB0..EOB4 symbols
    *     (3-bit canonical codes), so multi-block runs with extra-bit
    *     counts are load-bearing, not just repeated EOBs.
    *
    * A decoder that skips the refinement bit, shifts the wrong way,
    * misses a run, or finalizes before EOI diverges the oracle. */
  def jpegProgressive(id: Long): Array[Byte] =
    jpegProgressiveOfSize(id, (8 * (1 + id % 4)).toInt, (8 * (1 + (id * 3) % 4)).toInt)

  /** The progressive gate encoder at arbitrary whole-block dims
    * (probe use). */
  private[graft] def jpegProgressiveOfSize(id: Long, w: Int, h: Int): Array[Byte] = {
    val bw = w / 8; val bh = h / 8
    val out = new java.io.ByteArrayOutputStream(512)
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)                      // SOI
    marker(0xDB); u16(2 + 65)         // DQT
    out.write(0x00)
    var k = 0
    while (k < 64) { out.write(16); k += 1 }
    marker(0xC4); u16(2 + 17 + 12)    // DHT DC (the shared table)
    out.write(0x00)
    var l = 1
    while (l <= 16) { out.write(DcBits(l)); l += 1 }
    DcVals.foreach(v => out.write(v & 0xFF))
    marker(0xC4); u16(2 + 17 + 5)     // DHT AC: EOB0..EOB4, 3-bit codes
    out.write(0x10)
    l = 1
    while (l <= 16) { out.write(if (l == 3) 5 else 0); l += 1 }
    Seq(0x00, 0x10, 0x20, 0x30, 0x40).foreach(out.write)
    marker(0xC2); u16(2 + 9)          // SOF2 progressive
    out.write(8); u16(h); u16(w)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    def sos(ss: Int, se: Int, ahal: Int): Unit = {
      marker(0xDA); u16(2 + 6)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write(ahal)
    }
    // scan 1: DC first at Al=1
    sos(0, 0, 0x01)
    locally {
      val bits = new BitWriter(out)
      var pred = 0
      var b = 0
      while (b < bw * bh) {
        val v = dc(id, b % bw, b / bw) >> 1
        val diff = v - pred; pred = v
        val t = category(diff)
        bits.put(t, 4)
        if (t > 0) {
          val mag = if (diff < 0) diff + (1 << t) - 1 else diff
          bits.put(mag, t)
        }
        b += 1
      }
      bits.flushOnes()
    }
    // scan 2: DC refinement, the dropped low bit
    sos(0, 0, 0x10)
    locally {
      val bits = new BitWriter(out)
      var b = 0
      while (b < bw * bh) {
        bits.put(dc(id, b % bw, b / bw) & 1, 1)
        b += 1
      }
      bits.flushOnes()
    }
    // scan 3: the AC band, all zero, as EOB-runs
    sos(1, 63, 0x00)
    locally {
      val bits = new BitWriter(out)
      var n = bw * bh
      while (n > 0) {
        val e = math.min(n, 31)
        var r = 0
        while ((1 << (r + 1)) <= e) r += 1
        bits.put(r, 3)                // EOBr symbol (code == r, 3 bits)
        if (r > 0) bits.put(e - (1 << r), r)
        n -= e
      }
      bits.flushOnes()
    }
    marker(0xD9)                      // EOI
    out.toByteArray
  }

  /** Y dc per (MCU, block-in-MCU j = by*2+bx) and the MCU-flat
    * chroma dcs — mirrored in the `mm_decode_jpeg_color` oracle. The
    * chroma deltas (2·dc ∈ even [-20, 20]) are chosen so no BT.601
    * product can land on a .5 rounding tie in either engine. */
  def dcY(id: Long, mx: Int, my: Int, j: Int): Int =
    (((id + mx * 7 + my * 11 + j * 3) % 100) - 50).toInt
  def dcCb(id: Long, mx: Int, my: Int): Int =
    (((id + mx * 3 + my * 5) % 21) - 10).toInt
  def dcCr(id: Long, mx: Int, my: Int): Int =
    (((id * 2 + mx * 5 + my * 3) % 21) - 10).toInt

  /** The color gate encoder: baseline YCbCr 4:2:0 — three components
    * in the frame (Y 2×2, Cb/Cr 1×1, all on the same quant and
    * Huffman tables, which is legal), interleaved MCU scan with four
    * Y blocks then Cb then Cr per MCU, three separate DC predictor
    * chains, every block DC-only + EOB. Dims are whole MCUs (16/32).
    * Odd doc_ids additionally ship a DRI of 1 MCU with real RSTn
    * markers (cycling sequence numbers RST0-RST2 across their 4-MCU
    * images, predictors reset, ones-padded byte alignment) — restart
    * handling is load-bearing on half the gate corpus while the pixel
    * oracle is UNCHANGED, because the closed-form dc values are
    * absolute and only the transmitted diffs change. */
  def jpegColor(id: Long): Array[Byte] =
    jpegColorOfSize(id, (16 * (1 + id % 2)).toInt, (16 * (1 + (id * 3) % 2)).toInt)

  /** The color gate encoder at arbitrary whole-MCU dims (probe use). */
  private[graft] def jpegColorOfSize(id: Long, w: Int, h: Int): Array[Byte] = {
    val restartEvery = if (id % 2 == 1) 1 else 0
    val out = new java.io.ByteArrayOutputStream(512)
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)                      // SOI
    marker(0xDB); u16(2 + 65)         // DQT (shared, Q=16)
    out.write(0x00)
    var k = 0
    while (k < 64) { out.write(16); k += 1 }
    marker(0xC4); u16(2 + 17 + 12)    // DHT DC (shared)
    out.write(0x00)
    var l = 1
    while (l <= 16) { out.write(DcBits(l)); l += 1 }
    DcVals.foreach(v => out.write(v & 0xFF))
    marker(0xC4); u16(2 + 17 + 1)     // DHT AC (shared)
    out.write(0x10)
    l = 1
    while (l <= 16) { out.write(AcBits(l)); l += 1 }
    out.write(0)
    marker(0xC0); u16(8 + 9)          // SOF0, 3 components
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write(0x22); out.write(0) // Y: 2x2
    out.write(2); out.write(0x11); out.write(0) // Cb
    out.write(3); out.write(0x11); out.write(0) // Cr
    if (restartEvery > 0) { marker(0xDD); u16(4); u16(restartEvery) } // DRI
    marker(0xDA); u16(6 + 6)          // SOS, 3 components
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x00)
    out.write(3); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val bits = new BitWriter(out)
    def putDc(diff: Int): Unit = {
      val t = category(diff)
      bits.put(t, 4)
      if (t > 0) {
        val mag = if (diff < 0) diff + (1 << t) - 1 else diff
        bits.put(mag, t)
      }
      bits.put(0, 2)                  // AC EOB
    }
    var predY = 0; var predCb = 0; var predCr = 0
    var mcus = 0; var rst = 0
    val totalMcus = (w / 16) * (h / 16)
    var my = 0
    while (my < h / 16) {
      var mx = 0
      while (mx < w / 16) {
        var j = 0
        while (j < 4) {
          val v = dcY(id, mx, my, j)
          putDc(v - predY); predY = v
          j += 1
        }
        val cb = dcCb(id, mx, my)
        putDc(cb - predCb); predCb = cb
        val cr = dcCr(id, mx, my)
        putDc(cr - predCr); predCr = cr
        mcus += 1
        if (restartEvery > 0 && mcus % restartEvery == 0 && mcus < totalMcus) {
          bits.flushOnes()
          marker(0xD0 + rst)
          rst = (rst + 1) % 8
          predY = 0; predCb = 0; predCr = 0
        }
        mx += 1
      }
      my += 1
    }
    bits.flushOnes()
    marker(0xD9)                      // EOI
    out.toByteArray
  }
}
