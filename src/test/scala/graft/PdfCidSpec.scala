package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PdfText

/** Identity-H Type0 text recovery via the embedded TrueType cmap
  * (r14): the forward side -- a minimal but structurally-valid sfnt
  * with a real format-4 / format-12 cmap subtable -- is built HERE,
  * independently of the decoder, so the round trip crosses two
  * implementations of the public font format. */
class PdfCidSpec extends AnyFunSuite {

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A one-table sfnt whose cmap has a single (3,1) format-4 subtable
    * mapping 'A'..'Z' to gids 1..26 (idDelta arithmetic) plus a
    * second segment exercising the idRangeOffset indirection:
    * 'a'..'c' -> gids 40,41,42 via the glyphIdArray. */
  private def ttfFormat4(): Array[Byte] = {
    val segs = 3 // [A-Z] delta seg, [a-c] range-offset seg, 0xFFFF terminal
    val segX2 = segs * 2
    // subtable layout after the 14-byte header: end[3] pad start[3]
    // delta[3] rangeOffset[3] glyphIdArray[3]
    val glyphIds = Seq(40, 41, 42)
    val subLen = 16 + segX2 * 4 + glyphIds.length * 2
    val sub = new java.io.ByteArrayOutputStream()
    sub.write(u16(4)); sub.write(u16(subLen)); sub.write(u16(0)) // format, length, language
    sub.write(u16(segX2)); sub.write(u16(0)); sub.write(u16(0)); sub.write(u16(0)) // counts the parser ignores
    Seq('Z'.toInt, 'c'.toInt, 0xFFFF).foreach(v => sub.write(u16(v))) // endCode
    sub.write(u16(0)) // reservedPad
    Seq('A'.toInt, 'a'.toInt, 0xFFFF).foreach(v => sub.write(u16(v))) // startCode
    // idDelta: gid = (c + delta) & 0xFFFF -> A..Z => 1..26 needs -0x40
    Seq(0x10000 - 0x40, 0, 1).foreach(v => sub.write(u16(v & 0xFFFF)))
    // idRangeOffset: seg 1 indirects into glyphIdArray. Offset is
    // relative to the entry's own position: entry i=1 sits 2 bytes
    // before the last entry, glyphIdArray starts right after the
    // rangeOffset array -> offset = 2*(segs - i) = 4.
    Seq(0, 4, 0).foreach(v => sub.write(u16(v)))
    glyphIds.foreach(g => sub.write(u16(g)))
    assemble(sub.toByteArray)
  }

  /** Same shape with a (3,10) format-12 subtable: 'H'..'O' -> gids
    * 100..107 in one group, plus a non-BMP group (U+1F600 -> gid 7). */
  private def ttfFormat12(): Array[Byte] = {
    val groups = Seq((0x48, 0x4F, 100), (0x1F600, 0x1F600, 7))
    val subLen = 16 + groups.length * 12
    val sub = new java.io.ByteArrayOutputStream()
    sub.write(u16(12)); sub.write(u16(0)) // format 12.0
    sub.write(u32(subLen)); sub.write(u32(0)) // length, language
    sub.write(u32(groups.length))
    groups.foreach { case (sc, ec, sg) =>
      sub.write(u32(sc)); sub.write(u32(ec)); sub.write(u32(sg))
    }
    assemble(sub.toByteArray, pidEid = (3, 10))
  }

  /** sfnt wrapper: header + one table-directory entry + the cmap. */
  private def assemble(subtable: Array[Byte], pidEid: (Int, Int) = (3, 1)): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(u32(0x00010000)); out.write(u16(1)) // scaler, numTables=1
    out.write(u16(16)); out.write(u16(0)); out.write(u16(0)) // search fields (unused)
    val cmapOff = 12 + 16
    val cmapLen = 4 + 8 + subtable.length
    out.write("cmap".getBytes(latin1)); out.write(u32(0)) // tag, checksum
    out.write(u32(cmapOff)); out.write(u32(cmapLen))
    out.write(u16(0)); out.write(u16(1)) // cmap version, 1 subtable
    out.write(u16(pidEid._1)); out.write(u16(pidEid._2)); out.write(u32(12)) // record
    out.write(subtable)
    out.toByteArray
  }

  test("invertTrueTypeCmap: format 4 delta and range-offset segments invert") {
    val m = PdfText.invertTrueTypeCmap(ttfFormat4())
    assert(m(1) == "A" && m(26) == "Z")
    assert(m(40) == "a" && m(41) == "b" && m(42) == "c")
    assert(!m.contains(0))
  }

  test("invertTrueTypeCmap: format 12 groups invert, non-BMP included") {
    val m = PdfText.invertTrueTypeCmap(ttfFormat12())
    assert(m(100) == "H" && m(107) == "O")
    assert(m(7) == new String(Character.toChars(0x1F600)))
  }

  test("invertTrueTypeCmap: junk and truncated fonts yield empty, never throw") {
    assert(PdfText.invertTrueTypeCmap(Array.emptyByteArray).isEmpty)
    assert(PdfText.invertTrueTypeCmap("not an sfnt at all".getBytes(latin1)).isEmpty)
    assert(PdfText.invertTrueTypeCmap(ttfFormat4().take(30)).isEmpty)
  }

  test("invertTrueTypeCmap: a hostile format-12 table terminates under the budget") {
    // 0x10000-group table where every group spans 64k chars over the
    // same glyph range: a well-formed font never does this; a corrupt
    // one must neither spin for 2^32 iterations nor throw. Only the
    // group COUNT is hostile here (the record bytes run off the end,
    // which the bounds checks skip) -- the point is wall-clock, and
    // the earlier groups that do parse still invert.
    val groups = Seq.fill(64)((0, 0xFFFF, 1)) // 64 overlapping 64k spans
    val sub = new java.io.ByteArrayOutputStream()
    sub.write(u16(12)); sub.write(u16(0))
    sub.write(u32(16 + groups.length * 12)); sub.write(u32(0))
    sub.write(u32(0x10000)) // LIES: claims 65536 groups
    groups.foreach { case (sc, ec, sg) =>
      sub.write(u32(sc)); sub.write(u32(ec)); sub.write(u32(sg))
    }
    val t0 = System.nanoTime()
    val m = PdfText.invertTrueTypeCmap(assemble(sub.toByteArray, pidEid = (3, 10)))
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "budget must bound the walk")
    assert(m.nonEmpty) // the first group inverted before the budget ran out
    // format-4 twin whose lookups all MISS (idRangeOffset far past
    // EOF): the budget must charge per char VISITED, not per
    // successful put, or this walks 32767 x 65535 iterations
    // (review r14)
    val seg4 = 0x7FFF // 32767 segments (the u16 segCountX2 maximum)
    val f4 = new java.io.ByteArrayOutputStream()
    f4.write(u16(4)); f4.write(u16(0)); f4.write(u16(0))
    f4.write(u16(seg4 * 2)); f4.write(u16(0)); f4.write(u16(0)); f4.write(u16(0))
    (0 until seg4).foreach(_ => f4.write(u16(0xFFFE))) // endCode: giant spans
    f4.write(u16(0))
    (0 until seg4).foreach(_ => f4.write(u16(0))) // startCode 0
    (0 until seg4).foreach(_ => f4.write(u16(0))) // idDelta
    (0 until seg4).foreach(_ => f4.write(u16(0x7000))) // idRangeOffset: past EOF
    val t1 = System.nanoTime()
    PdfText.invertTrueTypeCmap(assemble(f4.toByteArray))
    assert((System.nanoTime() - t1) / 1e9 < 5.0, "format-4 miss path must be budgeted")
    // and a NEGATIVE start char cannot poison the map via toChars
    val neg = new java.io.ByteArrayOutputStream()
    neg.write(u16(12)); neg.write(u16(0)); neg.write(u32(28)); neg.write(u32(0))
    neg.write(u32(1)); neg.write(u32(0x80000000.toInt)); neg.write(u32(0x80000001.toInt)); neg.write(u32(5))
    assert(!PdfText.invertTrueTypeCmap(assemble(neg.toByteArray, pidEid = (3, 10))).contains(0))
  }

  // ------------------------------------------------------------------
  // End-to-end: Identity-H PDF without ToUnicode, FontFile2 embedded.
  // ------------------------------------------------------------------

  private def obj(num: Int, body: Array[Byte]): Array[Byte] =
    s"$num 0 obj\n".getBytes(latin1) ++ body ++ "\nendobj\n".getBytes(latin1)

  private def cidPdf(font: Array[Byte], gids: Seq[Int],
      cidToGid: String = "", fontKey: String = "FontFile2",
      mapStream: Option[Array[Byte]] = None): Array[Byte] = {
    val hexStr = gids.map(g => f"$g%04X").mkString
    val content = s"BT /F1 10 Tf <$hexStr> Tj ET".getBytes(latin1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.6\n".getBytes(latin1))
    out.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1)))
    out.write(obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(latin1)))
    out.write(obj(3, ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R" +
      " /Resources << /Font << /F1 5 0 R >> >> >>").getBytes(latin1)))
    out.write(obj(4, (s"<< /Length ${content.length} >>\nstream\n".getBytes(latin1)
      ++ content ++ "\nendstream".getBytes(latin1))))
    out.write(obj(5, ("<< /Type /Font /Subtype /Type0 /BaseFont /Fake" +
      " /Encoding /Identity-H /DescendantFonts [6 0 R] >>").getBytes(latin1)))
    out.write(obj(6, ("<< /Type /Font /Subtype " +
      (if (fontKey == "FontFile2") "/CIDFontType2" else "/CIDFontType0") +
      " /BaseFont /Fake" + cidToGid + " /FontDescriptor 7 0 R >>").getBytes(latin1)))
    out.write(obj(7, ("<< /Type /FontDescriptor /FontName /Fake" +
      s" /$fontKey 8 0 R >>").getBytes(latin1)))
    out.write(obj(8, (s"<< /Length ${font.length} >>\nstream\n".getBytes(latin1)
      ++ font ++ "\nendstream".getBytes(latin1))))
    mapStream.foreach(m =>
      out.write(obj(9, (s"<< /Length ${m.length} >>\nstream\n".getBytes(latin1)
        ++ m ++ "\nendstream".getBytes(latin1)))))
    out.write("trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n".getBytes(latin1))
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Forward CFF builders (r15): independent of PdfText's parser, so
  // the round trip crosses two implementations of the public CFF
  // format (INDEX / Top DICT / charset structures).
  // ------------------------------------------------------------------

  /** A minimal structurally-valid CFF. `names` = glyph names for gids
    * 1..k via custom SIDs in the String INDEX (name-keyed), OR
    * `cids` = charset CIDs for gids 1..k with a /ROS (CID-keyed).
    * Charset is format 0; all Top DICT offsets are absolute 5-byte
    * (op 29) encodings so the layout is computable in one pass. */
  private def cff(names: Seq[String] = Nil, cids: Seq[Int] = Nil): Array[Byte] = {
    val cid = cids.nonEmpty
    val k = if (cid) cids.length else names.length
    val n = k + 1 // + .notdef
    val header = Array[Byte](1, 0, 4, 4)
    // Name INDEX: one entry "T"
    val nameIdx = u16(1) ++ Array[Byte](1, 1, 2) ++ "T".getBytes(latin1)
    val topDictLen = (if (cid) 17 else 0) + 12 // [ROS] + charset + CharStrings
    val topIdx0 = u16(1) ++ Array[Byte](1, 1, (1 + topDictLen).toByte)
    val topEnd = 4 + nameIdx.length + topIdx0.length + topDictLen
    val strIdx =
      if (cid) u16(0)
      else {
        val offs = names.scanLeft(1)(_ + _.length)
        u16(names.length) ++ Array[Byte](2) ++
          offs.flatMap(o => u16(o)).toArray ++
          names.mkString.getBytes(latin1)
      }
    val charsetOff = topEnd + strIdx.length
    val charset = Array[Byte](0) ++ // format 0
      (1 until n).flatMap(g => u16(if (cid) cids(g - 1) else 391 + (g - 1))).toArray
    val charStringsOff = charsetOff + charset.length
    // CharStrings INDEX: n entries of one dummy byte each
    val charStrings = u16(n) ++ Array[Byte](1) ++
      (1 to n + 1).map(_.toByte).toArray ++ Array.fill[Byte](n)(0x0e) // endchar
    def op29(v: Int, op: Int) = Array[Byte](29) ++ u32(v) ++ Array[Byte](op.toByte)
    val topDict =
      (if (cid) // ROS: registry SID, ordering SID, supplement, op 12 30
        Array[Byte](29) ++ u32(0) ++ Array[Byte](29) ++ u32(0) ++
        Array[Byte](29) ++ u32(0) ++ Array[Byte](12, 30)
      else Array.emptyByteArray) ++
      op29(charsetOff, 15) ++ op29(charStringsOff, 17)
    assert(topDict.length == topDictLen, s"${topDict.length} != $topDictLen")
    header ++ nameIdx ++ topIdx0 ++ topDict ++ strIdx ++ charset ++ charStrings
  }

  /** An OpenType wrapper: sfnt with a `cmap` (the format-4 subtable
    * ripped from [[ttfFormat4]]) and a `CFF ` table side by side. */
  private def openTypeCff(cffBytes: Array[Byte]): Array[Byte] = {
    val sub4 = ttfFormat4().drop(12 + 16 + 4 + 8) // raw format-4 subtable
    val cmap = u16(0) ++ u16(1) ++ u16(3) ++ u16(1) ++ u32(12) ++ sub4
    val out = new java.io.ByteArrayOutputStream()
    out.write(u32(0x4F54544F)); out.write(u16(2)) // OTTO, 2 tables
    out.write(u16(16)); out.write(u16(0)); out.write(u16(0))
    val dirEnd = 12 + 2 * 16
    out.write("CFF ".getBytes(latin1)); out.write(u32(0))
    out.write(u32(dirEnd)); out.write(u32(cffBytes.length))
    out.write("cmap".getBytes(latin1)); out.write(u32(0))
    out.write(u32(dirEnd + cffBytes.length)); out.write(u32(cmap.length))
    out.write(cffBytes); out.write(cmap)
    out.toByteArray
  }

  test("Identity-H without ToUnicode: text recovered through the embedded cmap") {
    // gids for "CAB" under the format-4 font: C=3, A=1, B=2; and the
    // range-offset segment: a=40
    val pdf = cidPdf(ttfFormat4(), Seq(3, 1, 2, 40))
    val e = PdfText.extract(pdf)
    assert(e.status == "clear")
    assert(e.text == "CABa", s"got [${e.text}]")
  }

  test("Identity-H: an unmapped gid stays a visible U+FFFD, not mojibake") {
    val pdf = cidPdf(ttfFormat4(), Seq(3, 999))
    assert(PdfText.extractText(pdf) == "C\uFFFD")
  }

  test("Identity-H with an UNRESOLVABLE CIDToGIDMap keeps the U+FFFD fallback") {
    // the map ref points at a missing object: assuming identity would
    // emit confidently-wrong text, so the decoder must not (r15: a
    // RESOLVABLE stream now composes instead \u2014 next test)
    val pdf = cidPdf(ttfFormat4(), Seq(3, 1), cidToGid = " /CIDToGIDMap 9 0 R")
    assert(PdfText.extractText(pdf) == "\uFFFD\uFFFD")
    // while an explicit /Identity name still recovers
    val pdf2 = cidPdf(ttfFormat4(), Seq(3, 1), cidToGid = " /CIDToGIDMap /Identity")
    assert(PdfText.extractText(pdf2) == "CA")
    // and a non-Identity NAME (not a spec value) also falls back
    val pdf3 = cidPdf(ttfFormat4(), Seq(3, 1), cidToGid = " /CIDToGIDMap /Custom")
    assert(PdfText.extractText(pdf3) == "\uFFFD\uFFFD")
  }

  test("Identity-H with a stream CIDToGIDMap composes cid -> gid -> unicode") {
    // map: cid 0 -> gid 0 (.notdef), cid 1 -> gid 3 ('C'),
    // cid 2 -> gid 1 ('A'), cid 3 -> gid 0 \u2014 so codes <000100020003>
    // read "CA" + a visible fallback for the .notdef cid, and a cid
    // beyond the map's extent also falls back
    val map = Array[Byte](0, 0, 0, 3, 0, 1, 0, 0)
    val pdf = cidPdf(ttfFormat4(), Seq(1, 2, 3, 9),
      cidToGid = " /CIDToGIDMap 9 0 R", mapStream = Some(map))
    val got = PdfText.extractText(pdf)
    assert(got == "CA\uFFFD\uFFFD", s"got [$got]")
    // an odd-length (truncated) map composes what it covers
    val oddPdf = cidPdf(ttfFormat4(), Seq(1, 2),
      cidToGid = " /CIDToGIDMap 9 0 R", mapStream = Some(map.take(5)))
    val got2 = PdfText.extractText(oddPdf)
    assert(got2 == "C\uFFFD", s"got [$got2]")
  }

  test("PdfGen cidPdf: all four flavors round-trip the full printable alphabet byte-exact") {
    // the doc_extract_cid gate's unit twin (r15): the forward builder
    // lives in main scope (PdfGen), the inverter in PdfText; the
    // alphabet string exercises every one of the 95 gids in the
    // permuted format-4 glyphIdArray, the format-12 group, the bare
    // name-keyed CFF (standard-string SIDs incl. quotesingle/grave),
    // and the CIDToGIDMap-stream composition.
    val alphabet = (0x20 to 0x7E).map(_.toChar).mkString
    for (docId <- 0L to 3L) { // flavor = doc_id % 4
      val e = PdfText.extract(graft.sources.PdfGen.cidPdf(docId, alphabet))
      assert(e.status == "clear", s"docId=$docId status=${e.status}")
      assert(e.text == alphabet.trim, s"docId=$docId got [${e.text}]")
    }
    // the x37-mod-95 gid assignment is a bijection (inversion can
    // never merge two chars into one gid)
    val gids = (0x20 to 0x7E).map(c => graft.sources.PdfGen.gid4(c.toChar))
    assert(gids.distinct.size == 95 && gids.forall(g => g >= 1 && g <= 95))
    // and it is NOT the identity layout: a decoder that ignored the
    // glyphIdArray indirection would produce visibly wrong text
    assert(gids != (1 to 95).toSeq)
    // flavor 3's cid permutation is also a bijection and non-identity
    val cids = (0x20 to 0x7E).map(c => graft.sources.PdfGen.cidMapped(c.toChar))
    assert(cids.distinct.size == 95 && cids != (1 to 95).toSeq)
  }

  test("bare name-keyed CFF (/FontFile3) recovers text byte-identically to the TrueType twin") {
    // gids 1..4 get glyph names via custom String INDEX SIDs; the
    // name -> unicode route is the same AGL resolution /Differences
    // uses. The recovered text must equal the TrueType twin's, so the
    // two embedded-font classes are interchangeable to a reader.
    val font = cff(names = Seq("C", "A", "B", "a"))
    val e = PdfText.extract(cidPdf(font, Seq(1, 2, 3, 4), fontKey = "FontFile3"))
    assert(e.status == "clear")
    assert(e.text == "CABa", s"got [${e.text}]")
    val twin = PdfText.extract(cidPdf(ttfFormat4(), Seq(3, 1, 2, 40)))
    assert(e.text == twin.text)
  }

  test("bare name-keyed CFF resolves standard-string SIDs too") {
    // charset cites standard SIDs directly (34 = 'A', 1 = 'space',
    // 104 = 'quotesingle'): no String INDEX entry needed
    val font = cff(cids = Seq(34, 1, 104)) // reuse the SID writer...
    // ...but cids= sets /ROS; build the name-keyed variant by hand:
    // a format-0 charset with std SIDs and an empty String INDEX
    val patched = cff(names = Seq("x", "y", "z"))
    // overwrite the three charset SIDs (391, 392, 393) with 34, 1, 104
    val needle = Array[Byte](0, 0x01.toByte, 0x87.toByte) // fmt0 + u16(391)
    val at = patched.indexOfSlice(needle)
    assert(at > 0, "charset not found")
    val bytes = patched.clone()
    def put16(i: Int, v: Int): Unit = {
      bytes(i) = ((v >> 8) & 0xff).toByte; bytes(i + 1) = (v & 0xff).toByte
    }
    put16(at + 1, 34); put16(at + 3, 1); put16(at + 5, 104)
    val e = PdfText.extract(cidPdf(bytes, Seq(1, 2, 3), fontKey = "FontFile3"))
    assert(e.text == "A '", s"got [${e.text}]")
    assert(font.nonEmpty) // (the cids variant is exercised below)
  }

  test("OpenType-wrapped CID-keyed CFF composes the charset with the cmap inversion") {
    // inner CFF: CID-keyed, charset maps gid g -> cid g+50 for gids
    // 1..45 (covers the cmap's A..Z = 1..26 and a..c = 40..42); the
    // content stream shows CIDs, so a decoder that skipped the
    // charset composition (treating cids as gids) would miss: gid 51
    // is unmapped in the cmap.
    val inner = cff(cids = (1 to 45).map(_ + 50))
    val pdf = cidPdf(openTypeCff(inner), Seq(51, 52, 90), fontKey = "FontFile3")
    val got = PdfText.extractText(pdf)
    assert(got == "ABa", s"got [$got]")
  }

  test("bare CID-keyed CFF keeps the U+FFFD fallback, never invented text") {
    // a CID-keyed CFF without a cmap carries no unicode information;
    // the honest answer is the visible per-CID fallback
    val font = cff(cids = Seq(1, 2, 3, 4))
    val got = PdfText.extractText(cidPdf(font, Seq(1, 2), fontKey = "FontFile3"))
    assert(got == "\uFFFD\uFFFD", s"got [$got]")
  }

  test("hostile CFF: lying glyph counts and truncated charsets stay fast and total") {
    // 64k-glyph claim with a format-2 charset range covering it all:
    // the name route must walk it in bounded time (sids above the
    // standard range resolve to None)
    val hostile = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](1, 0, 4, 4)) // header
      out.write(u16(1)); out.write(Array[Byte](1, 1, 2)); out.write('T'.toInt) // Name INDEX
      out.write(u16(1)); out.write(Array[Byte](1, 1, 13)) // Top DICT INDEX, len 12
      val charsetOff = 4 + 6 + 5 + 12 + 2
      out.write(Array[Byte](29)); out.write(u32(charsetOff)); out.write(15)
      out.write(Array[Byte](29)); out.write(u32(charsetOff + 5)); out.write(17)
      out.write(u16(0)) // empty String INDEX
      out.write(2); out.write(u16(0)); out.write(u16(0xFFFF)) // charset fmt 2
      out.write(u16(0xFFFF)) // CharStrings count: 65535 glyphs
      out.toByteArray
    }
    val t0 = System.nanoTime()
    val m = PdfText.invertEmbeddedFont(hostile)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "hostile CFF must be bounded")
    assert(m.nonEmpty) // the standard-SID prefix still resolved
    // truncation ladder: every prefix parses to empty or partial,
    // never throws
    Seq(3, 10, 20, 28, 33, hostile.length - 1).foreach { cut =>
      PdfText.invertEmbeddedFont(hostile.take(cut))
    }
    assert(PdfText.invertEmbeddedFont("not a font".getBytes(latin1)).isEmpty)
  }

  test("RC4-encrypted Identity-H PDF decrypts, then inverts the embedded cmap") {
    // cipher x font interaction (r15): encryption covers ALL streams,
    // so the FontFile2 program arrives as ciphertext too — the
    // decoder must decrypt object 8 BEFORE inverting its cmap, and
    // the status channel must still say decrypted_rc4
    val setup = PdfThroughputProbe.encSetup(aes = false)
    val hexStr = Seq(3, 1, 2, 40).map(g => f"$g%04X").mkString // CABa
    val content = PdfThroughputProbe.encryptPayload(setup, 4,
      s"BT /F1 10 Tf <$hexStr> Tj ET".getBytes(latin1))
    val font = PdfThroughputProbe.encryptPayload(setup, 8, ttfFormat4())
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.6\n".getBytes(latin1))
    out.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1)))
    out.write(obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(latin1)))
    out.write(obj(3, ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R" +
      " /Resources << /Font << /F1 5 0 R >> >> >>").getBytes(latin1)))
    out.write(obj(4, (s"<< /Length ${content.length} >>\nstream\n".getBytes(latin1)
      ++ content ++ "\nendstream".getBytes(latin1))))
    out.write(obj(5, ("<< /Type /Font /Subtype /Type0 /BaseFont /Fake" +
      " /Encoding /Identity-H /DescendantFonts [6 0 R] >>").getBytes(latin1)))
    out.write(obj(6, ("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake" +
      " /FontDescriptor 7 0 R >>").getBytes(latin1)))
    out.write(obj(7, ("<< /Type /FontDescriptor /FontName /Fake" +
      " /FontFile2 8 0 R >>").getBytes(latin1)))
    out.write(obj(8, (s"<< /Length ${font.length} >>\nstream\n".getBytes(latin1)
      ++ font ++ "\nendstream".getBytes(latin1))))
    out.write(obj(9, setup.dict.getBytes(latin1)))
    out.write(("trailer\n<< /Size 10 /Root 1 0 R /Encrypt 9 0 R" +
      s" /ID [<${setup.id0Hex}> <${setup.id0Hex}>] >>\n%%EOF\n").getBytes(latin1))
    val e = PdfText.extract(out.toByteArray)
    assert(e.status == "decrypted_rc4", e.status)
    assert(e.text == "CABa", s"got [${e.text}]")
  }

  test("a corrupt inner CFF table degrades to the cmap-only inversion, not U+FFFD") {
    // review r15: parseCff throws on out-of-bounds by design; that
    // throw must not discard an already-valid cmap inversion in the
    // OpenType-wrapped case
    val wrapped = openTypeCff(cff(names = Seq("A", "B")).take(12)) // truncated CFF
    val m = PdfText.invertEmbeddedFont(wrapped)
    assert(m(1) == "A" && m(40) == "a", s"cmap recovery lost: $m")
  }

  test("a stream CIDToGIDMap on a CFF descendant is ignored, never composed") {
    // review r15: /CIDToGIDMap is spec-scoped to CIDFontType2; a CFF
    // base map is keyed by CID already, so composing it with gids
    // would emit confidently-wrong text. The map entry (even with a
    // resolvable garbage stream as object 9) must be ignored.
    val font = cff(names = Seq("C", "A"))
    val garbageMap = Array[Byte](0, 9, 0, 9, 0, 9, 0, 9)
    val pdf = cidPdf(font, Seq(1, 2), cidToGid = " /CIDToGIDMap 9 0 R",
      fontKey = "FontFile3", mapStream = Some(garbageMap))
    val got = PdfText.extractText(pdf)
    assert(got == "CA", s"got [$got]")
  }

  test("invertEmbeddedFont dispatches plain TrueType unchanged") {
    assert(PdfText.invertEmbeddedFont(ttfFormat4()) ==
      PdfText.invertTrueTypeCmap(ttfFormat4()))
    assert(PdfText.invertEmbeddedFont(ttfFormat12()) ==
      PdfText.invertTrueTypeCmap(ttfFormat12()))
  }

  test("the process-wide font cache returns identical inversions across documents") {
    // r15: crawl corpora repeat subset fonts across documents; the
    // cache must be invisible to correctness — two documents sharing
    // font BYTES (different object numbers, different docs) decode
    // identically, and a different font never serves a stale entry
    val a = PdfText.extractText(cidPdf(ttfFormat4(), Seq(3, 1, 2, 40)))
    val b = PdfText.extractText(cidPdf(ttfFormat4(), Seq(40, 3)))
    assert(a == "CABa" && b == "aC", s"got [$a] [$b]")
    val c = PdfText.extractText(cidPdf(ttfFormat12(), Seq(100, 107)))
    assert(c == "HO", s"got [$c]")
  }

  test("invertTrueTypeCmap: a format-6 decoy subtable falls back to the format-4 twin") {
    // ADVICE r14: the best-SCORING subtable -- (3,10) outranks (3,1)
    // -- points at a format-6 table the inverter does not support.
    // Selection must skip it and invert the supported (3,1) format-4
    // sibling instead of returning empty.
    val f4 = ttfFormat4()
    // rip the raw format-4 subtable back out of the one-table sfnt
    // (it starts right after the 12+16 header + 4+8 cmap preamble)
    val sub4 = f4.drop(12 + 16 + 4 + 8)
    val decoy = new java.io.ByteArrayOutputStream()
    decoy.write(u16(6)); decoy.write(u16(20)); decoy.write(u16(0)) // format 6
    decoy.write(u16(0x41)); decoy.write(u16(2)) // firstCode, entryCount
    decoy.write(u16(1)); decoy.write(u16(2)) // glyphIdArray
    val d = decoy.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(u32(0x00010000)); out.write(u16(1))
    out.write(u16(16)); out.write(u16(0)); out.write(u16(0))
    val cmapOff = 12 + 16
    val preamble = 4 + 2 * 8 // version/count + TWO records
    out.write("cmap".getBytes(latin1)); out.write(u32(0))
    out.write(u32(cmapOff)); out.write(u32(preamble + d.length + sub4.length))
    out.write(u16(0)); out.write(u16(2)) // 2 subtables
    out.write(u16(3)); out.write(u16(10)); out.write(u32(preamble)) // decoy first
    out.write(u16(3)); out.write(u16(1)); out.write(u32(preamble + d.length))
    out.write(d); out.write(sub4)
    val m = PdfText.invertTrueTypeCmap(out.toByteArray)
    assert(m(1) == "A" && m(40) == "a", s"format-4 fallback lost: $m")
  }

  test("shared object number between ToUnicode and FontFile2 keeps both map kinds") {
    // ADVICE r14: streamMemo shared one object-number keyspace, so a
    // document whose simple font's /ToUnicode and whose Type0 font's
    // /FontFile2 cite the SAME object returned the wrong cached
    // UniMap type for one of them. Object 8 is a 1-byte CMap mapping
    // 'X' -> 'Q': font F1 must decode through it, while font F2's
    // FontFile2 inversion of the same bytes fails (not an sfnt) and
    // must fall to U+FFFD-per-CID -- never to the cached 1-byte CMap.
    val cmap = ("1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
      "1 beginbfchar\n<58> <0051>\nendbfchar\n").getBytes(latin1)
    val content = "BT /F1 10 Tf (X) Tj ET BT /F2 10 Tf <00030001> Tj ET"
      .getBytes(latin1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.6\n".getBytes(latin1))
    out.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1)))
    out.write(obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(latin1)))
    out.write(obj(3, ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R" +
      " /Resources << /Font << /F1 9 0 R /F2 5 0 R >> >> >>").getBytes(latin1)))
    out.write(obj(4, (s"<< /Length ${content.length} >>\nstream\n".getBytes(latin1)
      ++ content ++ "\nendstream".getBytes(latin1))))
    out.write(obj(5, ("<< /Type /Font /Subtype /Type0 /BaseFont /Fake" +
      " /Encoding /Identity-H /DescendantFonts [6 0 R] >>").getBytes(latin1)))
    out.write(obj(6, ("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake" +
      " /FontDescriptor 7 0 R >>").getBytes(latin1)))
    out.write(obj(7, ("<< /Type /FontDescriptor /FontName /Fake" +
      " /FontFile2 8 0 R >>").getBytes(latin1)))
    out.write(obj(8, (s"<< /Length ${cmap.length} >>\nstream\n".getBytes(latin1)
      ++ cmap ++ "\nendstream".getBytes(latin1))))
    out.write(obj(9, ("<< /Type /Font /Subtype /Type1 /BaseFont /Helv" +
      " /ToUnicode 8 0 R >>").getBytes(latin1)))
    out.write("trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n".getBytes(latin1))
    val text = PdfText.extractText(out.toByteArray)
    assert(text == "Q\uFFFD\uFFFD", s"got [$text]")
  }
}
