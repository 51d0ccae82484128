package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PdfGen, PdfText}

/** The r14 extraction-status channel and the r13 ADVICE fixes.
  *
  * Status coverage round-trips [[PdfGen]] (the main-scope forward
  * encryptor, written independently of PdfSpec's fixture side)
  * against [[PdfText.extract]]: every class of the doc_extract_report
  * corpus must land on its designed status with the designed
  * recovered-char count. ADVICE-fix fixtures are hand-assembled here
  * (ASCII-only source; non-ASCII expectations use \\u escapes). */
class PdfStatusSpec extends AnyFunSuite {

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private val sample =
    "The quick (brown) fox \\ jumps; over 12 lazy dogs, repeatedly."

  test("PdfGen round trip: each status class decodes to its designed status + chars") {
    // two doc ids per class: both parities of doc_id/6 (class 2 and 3
    // alternate AES-128/AES-256 and RC4-locked/R6-locked on it)
    val expect = Map(0 -> "clear", 1 -> "decrypted_rc4", 2 -> "decrypted_aes",
      3 -> "locked", 4 -> "unsupported", 5 -> "malformed")
    (0 until 12).foreach { id =>
      val k = id % 6
      val e = PdfText.extract(PdfGen.payloadFor(id.toLong, sample))
      assert(e.status == expect(k), s"doc $id class $k: got ${e.status}")
      val wantChars = if (k <= 2) sample.trim.length else 0
      assert(e.chars == wantChars, s"doc $id class $k: got ${e.chars} chars")
      if (k <= 2) assert(e.text == sample.trim, s"doc $id class $k text")
    }
  }

  test("PdfGen sanitize mirrors the oracle's printable-ASCII projection") {
    assert(PdfGen.sanitize("ab\u00E9c\nd\te") == "ab?c?d?e")
    assert(PdfGen.sanitize(" edge ") == " edge ")
    // per CODE POINT: an astral char is ONE '?', matching DuckDB's
    // codepoint-based regexp_replace + length (review r14)
    assert(PdfGen.sanitize("a" + new String(Character.toChars(0x1F600)) + "b") == "a?b")
    // trimmed length of the sanitized text is what the report counts
    val t = "\nleading and trailing\n"
    val e = PdfText.extract(PdfGen.payloadFor(0L, PdfGen.sanitize(t)))
    // sanitize turns the edge newlines into '?', so nothing trims
    assert(e.chars == t.length)
  }

  test("extract: empty-but-valid PDF is clear with zero chars, junk is malformed") {
    val blank = PdfGen.clearPdf("")
    val e = PdfText.extract(blank)
    assert(e.status == "clear" && e.text == "")
    assert(PdfText.extract(Array[Byte](1, 2, 3)).status == "malformed")
    assert(PdfText.extract("just some text, zero pdf objects".getBytes(latin1))
      .status == "malformed")
  }

  test("rawEncryptSignature: the fail-closed shape check behind an unexpected probe throw") {
    // ADVICE r15: a NonFatal in crypt detection used to map straight
    // to NoCrypt — ciphertext scanned as clear. The raw re-check keeps
    // handler-shaped documents blocked.
    assert(PdfText.rawEncryptSignature(
      "trailer <</Encrypt 5 0 R>> 5 0 obj <</Filter /Standard /V 2>>"))
    assert(PdfText.rawEncryptSignature(
      "<</Encrypt 5 0 R>> <</O (abc) /U (def) /R 3>>"))
    // /Encrypt alone, or O/U that are not string values, is noise
    assert(!PdfText.rawEncryptSignature("/Encrypt 5 0 R but nothing handler-shaped"))
    assert(!PdfText.rawEncryptSignature("/Outlines /Universe <</Filter /FlateDecode>>"))
    assert(!PdfText.rawEncryptSignature("<</O (x) /U (y)>> no encrypt key at all"))
    // a real encrypted gate payload carries the signature; a clear one doesn't
    assert(PdfText.rawEncryptSignature(
      new String(PdfGen.rc4Pdf(3L, sample), latin1)))
    assert(!PdfText.rawEncryptSignature(
      new String(PdfGen.clearPdf(sample), latin1)))
  }

  test("extract: RC4 file with a non-matching /U is locked, not mojibake (Algorithm 6)") {
    val locked = PdfGen.rc4Pdf(7L, sample, lock = true)
    val e = PdfText.extract(locked)
    assert(e.status == "locked" && e.text == "")
    // and the same document with the true /U decrypts
    val open = PdfGen.rc4Pdf(7L, sample)
    assert(PdfText.extract(open).status == "decrypted_rc4")
    assert(PdfText.extractText(open) == sample)
  }

  // ------------------------------------------------------------------
  // Minimal hand assembler for the ADVICE-fix fixtures.
  // ------------------------------------------------------------------

  private def obj(num: Int, body: Array[Byte]): Array[Byte] =
    s"$num 0 obj\n".getBytes(latin1) ++ body ++ "\nendobj\n".getBytes(latin1)

  private def stream(dict: String, payload: Array[Byte]): Array[Byte] =
    s"$dict\nstream\n".getBytes(latin1) ++ payload ++ "\nendstream".getBytes(latin1)

  private def pageDoc(contentObj: Array[Byte], fontExtra: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.6\n".getBytes(latin1))
    out.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1)))
    out.write(obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(latin1)))
    out.write(obj(3, ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R" +
      fontExtra + " >>").getBytes(latin1)))
    out.write(obj(4, contentObj))
    out.write(obj(5, ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /MacRomanEncoding >>").getBytes(latin1)))
    out.write("trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n".getBytes(latin1))
    out.toByteArray
  }

  test("MacRomanEncoding: the classic-Mac upper half decodes (smart punctuation twin)") {
    // 0xD2"0xD3 quotes, 0xD0/0xD1 dashes, 0xC9 ellipsis, 0xDB currency
    // (Annex D froze the pre-euro table), 0x8E e-acute, 0xA5 bullet --
    // the bytes a Mac writer emits where a Windows writer emits the
    // WinAnsi 0x80-0x9F block
    val raw = Array[Byte](0xD2.toByte, 'o', 'k', 0xD3.toByte, ' ',
      0xD0.toByte, ' ', 0xD1.toByte, ' ', 0xC9.toByte, ' ', 0xDB.toByte,
      ' ', 0x8E.toByte, ' ', 0xA5.toByte)
    val content = "BT /F1 10 Tf (".getBytes(latin1) ++ raw ++ ") Tj ET".getBytes(latin1)
    val pdf = pageDoc(stream("<< /Length " + content.length + " >>", content),
      " /Resources << /Font << /F1 5 0 R >> >>")
    val e = PdfText.extract(pdf)
    assert(e.status == "clear")
    assert(e.text ==
      "\u201Cok\u201D \u2013 \u2014 \u2026 \u00A4 \u00E9 \u2022",
      s"got [${e.text}]")
    // and the Annex-D space override: 0xCA is a REAL space (trimmable,
    // tokenizable), not the charset's NBSP
    val raw2 = Array[Byte]('a', 0xCA.toByte, 'b')
    val content2 = "BT /F1 10 Tf (".getBytes(latin1) ++ raw2 ++ ") Tj ET".getBytes(latin1)
    val pdf2 = pageDoc(stream("<< /Length " + content2.length + " >>", content2),
      " /Resources << /Font << /F1 5 0 R >> >>")
    assert(PdfText.extractText(pdf2) == "a b")
  }

  test("literal string: octal escapes above \\377 wrap mod 256 (spec rule)") {
    // \542 = 354 decimal -> 354 & 0xff = 98 = 'b'; \101 = 'A'
    val content = "BT (\\542\\101) Tj ET".getBytes(latin1)
    val pdf = pageDoc(stream("<< /Length " + content.length + " >>", content))
    assert(PdfText.extractText(pdf) == "bA")
  }

  test("inline /Length: a lookalike inside a dict string no longer masks the real key") {
    // the payload spells `endstream` inside its text, so the fallback
    // scan TRUNCATES mid-string; only the real /Length (which the
    // old first-match scan masked behind /Title's "/Length 7") keeps
    // the full extent
    val content = "BT (pre endstream post) Tj ET".getBytes(latin1)
    val dict = "<< /Title (per /Length 7 rule) /Length " + content.length + " >>"
    val pdf = pageDoc(stream(dict, content))
    assert(PdfText.extractText(pdf) == "pre endstream post")
  }

  test("/ID: a spoofed token early in a stream payload cannot shadow the trailer /ID") {
    // prepend (before the real objects) a stream whose payload spells
    // a well-formed /ID array -- the old forward scan took it as the
    // file /ID and derived a wrong RC4 key for the whole document
    val spoof = "/ID [<00112233445566778899AABBCCDDEEFF> <00>] pad".getBytes(latin1)
    val spoofObj = obj(9, stream("<< /Length " + spoof.length + " >>", spoof))
    val enc = PdfGen.rc4Pdf(3L, sample)
    assert(enc.startsWith("%PDF-1.6\n".getBytes(latin1)))
    val hostile = "%PDF-1.6\n".getBytes(latin1) ++ spoofObj ++ enc.drop(9)
    val e = PdfText.extract(hostile)
    assert(e.status == "decrypted_rc4" && e.text == sample, s"got [${e.text}]")
  }

  test("/EncryptMetadata false with a line break between key and value is honoured") {
    // forward side: R4/V4 RC4 (/CFM /V2) key derived WITH the
    // EncryptMetadata bytes; the dict spells the key and `false` on
    // separate lines -- the old exact-substring match missed it and
    // derived the no-meta key
    val docId = 11L
    val o = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"graft-pdf-o:$docId".getBytes(latin1))
    val id0 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"graft-pdf-id:$docId".getBytes(latin1)).take(16)
    def md5(bs: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      bs.foreach(d.update); d.digest()
    }
    val pwPad: Array[Byte] = Array(
      0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
      0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
      0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)
    val pLe = Array[Byte](-44, -1, -1, -1)
    val meta = Array[Byte](-1, -1, -1, -1) // EncryptMetadata false marker
    var h = md5(pwPad, o, pLe, id0, meta)
    for (_ <- 0 until 50) h = md5(h.take(16))
    val fileKey = h.take(16)
    var u = PdfText.rc4(fileKey, md5(pwPad, id0))
    for (i <- 1 to 19) u = PdfText.rc4(fileKey.map(b => (b ^ i).toByte), u)
    val objKey = md5(fileKey, Array[Byte](4, 0, 0, 0, 0)).take(16)
    val escaped = sample.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val content = s"BT ($escaped) Tj ET".getBytes(latin1)
    val encPayload = PdfText.rc4(objKey, content)
    def hex(bs: Array[Byte]) = bs.map(b => f"${b & 0xff}%02X").mkString
    val encDict = "<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44\n" +
      s"/O <${hex(o)}> /U <${hex(u ++ Array.fill[Byte](16)(0x5a))}>\n" +
      "/CF << /StdCF << /CFM /V2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF\n" +
      "/EncryptMetadata\nfalse >>"
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.6\n".getBytes(latin1))
    out.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1)))
    out.write(obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(latin1)))
    out.write(obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(latin1)))
    out.write(obj(4, stream("<< /Length " + encPayload.length + " >>", encPayload)))
    out.write(obj(5, encDict.getBytes(latin1)))
    out.write(("trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R" +
      s" /ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF\n").getBytes(latin1))
    val e = PdfText.extract(out.toByteArray)
    assert(e.status == "decrypted_rc4" && e.text == sample, s"got [${e.text}] ${e.status}")
  }

  test("a spoofed or dangling /Encrypt ref cannot blank a clear document") {
    // '/Encrypt 99 0 R' inside an uncompressed content stream (a doc
    // QUOTING a PDF trailer) or dangling to no object: noise, not a
    // reason to report the whole clear file unsupported (review r14)
    val content = "BT (see the /Encrypt 99 0 R entry in your trailer) Tj ET".getBytes(latin1)
    val pdf = pageDoc(stream("<< /Length " + content.length + " >>", content))
    val e = PdfText.extract(pdf)
    assert(e.status == "clear", s"got ${e.status}")
    assert(e.text == "see the /Encrypt 99 0 R entry in your trailer")
    // a ref RESOLVING to a real object that is not handler-shaped
    // (here the content stream's own dict) is equally noise
    val content2 = "BT (per /Encrypt 4 0 R above) Tj ET".getBytes(latin1)
    val pdf2 = pageDoc(stream("<< /Length " + content2.length + " >>", content2))
    assert(PdfText.extract(pdf2).status == "clear")
  }

  test("V4 /StmF: explicit Identity is clear; a named filter with no /CF is unsupported") {
    def pdfWithDict(encDict: String): Array[Byte] = {
      val content = "BT (streams in question) Tj ET".getBytes(latin1)
      val out = new java.io.ByteArrayOutputStream()
      out.write("%PDF-1.6\n".getBytes(latin1))
      out.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1)))
      out.write(obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(latin1)))
      out.write(obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(latin1)))
      out.write(obj(4, stream("<< /Length " + content.length + " >>", content)))
      out.write(obj(5, encDict.getBytes(latin1)))
      out.write(("trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R" +
        " /ID [<000102030405060708090A0B0C0D0E0F> <00>] >>\n%%EOF\n").getBytes(latin1))
      out.toByteArray
    }
    val o32 = "4F" * 32
    // /StmF /Identity explicitly: streams in the clear, readable
    val idDict = s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44" +
      s" /O <$o32> /U <${"55" * 32}> /StmF /Identity /CF << >> >>"
    val eId = PdfText.extract(pdfWithDict(idDict))
    assert(eId.status == "clear" && eId.text == "streams in question")
    // /StmF names /StdCF but the /CF table is missing: the streams ARE
    // encrypted with an unresolvable filter - unsupported, not clear
    val noCf = s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44" +
      s" /O <$o32> /U <${"55" * 32}> /StmF /StdCF >>"
    val eNoCf = PdfText.extract(pdfWithDict(noCf))
    assert(eNoCf.status == "unsupported" && eNoCf.text == "")
  }

  test("lone /DecodeParms dict pairs with the chain's compressed filter, not index 0") {
    // [/ASCII85Decode /FlateDecode] + a single predictor dict: the
    // parms belong to the Flate position; pairing them with A85 left
    // the PNG predictor un-undone and garbled the stream
    val cols = 16
    val body = {
      val raw = "BT (predictor chain survives) Tj ET".getBytes(latin1)
      val pad = (cols - raw.length % cols) % cols
      raw ++ Array.fill[Byte](pad)(' ')
    }
    // PNG predictor forward side: filter byte 0 (None) per row
    val withFilterBytes = body.grouped(cols)
      .flatMap(row => Array[Byte](0) ++ row).toArray
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(withFilterBytes); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val a85 = {
      // forward ASCII85: 4 bytes -> 5 chars, partial group k -> k+1
      val out = new StringBuilder
      var i = 0
      while (i < deflated.length) {
        val k = math.min(4, deflated.length - i)
        var v = 0L
        (0 until 4).foreach(j =>
          v = (v << 8) | (if (j < k) deflated(i + j) & 0xffL else 0L))
        val cs = new Array[Char](5)
        var idx = 4
        while (idx >= 0) { cs(idx) = ('!' + (v % 85).toInt).toChar; v /= 85; idx -= 1 }
        out.appendAll(cs, 0, k + 1)
        i += 4
      }
      out.append("~>").result().getBytes(latin1)
    }
    val dict = "<< /Filter [/ASCII85Decode /FlateDecode]" +
      s" /DecodeParms << /Predictor 12 /Columns $cols >> /Length ${a85.length} >>"
    val pdf = pageDoc(stream(dict, a85))
    assert(PdfText.extractText(pdf) == "predictor chain survives")
  }
}
