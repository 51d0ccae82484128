package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real binary→text decode for PDF documents — the optional
  * UTL_TO_TEXT-equivalent behind doc_pipeline's stub boundary
  * (reference: DBMS_VECTOR_CHAIN.UTL_TO_TEXT,
  * /root/reference/scripts/01_pdf_to_vector.sql:205 — the one step of
  * the reference's ingestion DAG that parsed actual PDF BLOBs while
  * graft's gate corpus is already text).
  *
  * Pure-JVM by necessity (no Tika/PDFBox in the container, and the
  * build may add no dependencies): a minimal extractor for the
  * mainstream encoding class —
  *
  *  - content streams stored raw or /FlateDecode-compressed
  *    (java.util.zip.Inflater — Flate is THE PDF stream codec);
  *  - text shown inside BT…ET blocks via the `Tj`, `'`, `"` and `TJ`
  *    operators, with literal `(…)` strings (nested parens, all
  *    escape forms incl. octal and line continuations) and `<…>` hex
  *    strings;
  *  - byte→char via Latin-1, i.e. the standard simple-font encodings
  *    where code == char. Subset-embedded fonts with custom CMaps
  *    (what a Tika dependency would add) are out of scope and decode
  *    to their raw codes.
  *
  * Scale shape: decode is a NARROW per-row map over the binary
  * column — no shuffle, column-prunable upstream, exactly the
  * Multimodal.stubDecode topology with the stub swapped for a real
  * parser. Everything downstream (chunking, embedding, the whole
  * doc_pipeline DAG) is unchanged: [[utlToText]] emits the same
  * (doc_id, text) shape Tables.documents serves, so the pipeline is
  * agnostic to whether its text came from parquet or from PDF bytes.
  */
object PdfText {

  /** Extract the shown text of a PDF byte stream. Returns the
    * concatenation of all BT…ET text runs in content-stream order,
    * with `Td`/`TD`/`T*` line moves rendered as newlines and TJ
    * kerning adjustments ignored (they are layout, not content). */
  def extractText(bytes: Array[Byte]): String = {
    val out = new StringBuilder
    streams(bytes).foreach { case (dict, data) =>
      val content =
        if (dict.contains("/FlateDecode")) inflate(data) else data
      extractFromContent(content, out)
    }
    out.result().trim
  }

  /** All (object dictionary, stream payload) pairs in the file. The
    * payload begins after `stream` + EOL and ends at the matching
    * `endstream`; the dictionary is the text between the enclosing
    * `obj` keyword and `stream` (enough to read the /Filter). */
  private def streams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    // Latin-1 maps bytes 1:1 to chars, so offsets in this string are
    // byte offsets — binary payload bytes survive round-tripping
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val found = Seq.newBuilder[(String, Array[Byte])]
    var i = s.indexOf("stream")
    while (i >= 0) {
      // skip `endstream` hits and require the keyword boundary
      val isEnd = i >= 3 && s.regionMatches(i - 3, "endstream", 0, 9)
      if (!isEnd) {
        var dataStart = i + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val end = s.indexOf("endstream", dataStart)
        if (end > dataStart) {
          val objAt = s.lastIndexOf(" obj", i)
          val dict = if (objAt >= 0) s.substring(objAt, i) else ""
          // the EOL before `endstream` belongs to the marker, not the data
          var dataEnd = end
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          found += ((dict,
            s.substring(dataStart, dataEnd)
              .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
          i = s.indexOf("stream", end + 9)
        } else i = -1
      } else i = s.indexOf("stream", i + 6)
    }
    found.result()
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return out.toByteArray // corrupt: keep what we have
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => Array.emptyByteArray
    } finally inf.end()
  }

  /** Scan one decoded content stream for text-showing operators. */
  private def extractFromContent(content: Array[Byte], out: StringBuilder): Unit = {
    val s = new String(content, java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = 0
    var inText = false // inside BT…ET
    var pending = new StringBuilder // strings seen since the last operator
    def flushShown(): Unit = { out.append(pending); pending = new StringBuilder }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') { // comment to EOL
        while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '(') {
        val (str, next) = literalString(s, i)
        if (inText) pending.append(str)
        i = next
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) != '<') {
        val (str, next) = hexString(s, i)
        if (inText) pending.append(str)
        i = next
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        val start = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
          !"()<>[]{}/%".contains(s.charAt(i))) i += 1
        s.substring(start, i) match {
          case "BT" => inText = true; pending = new StringBuilder
          case "ET" => inText = false; pending = new StringBuilder
          case "Tj" | "TJ" => if (inText) flushShown()
          case "'" => if (inText) { out.append('\n'); flushShown() }
          case "\"" => if (inText) { out.append('\n'); flushShown() }
          case "Td" | "TD" | "T*" =>
            if (inText) {
              pending = new StringBuilder // positioning args are not text
              if (out.nonEmpty && out.last != '\n') out.append('\n')
            }
          case _ => if (inText) pending = new StringBuilder
        }
      } else i += 1
    }
  }

  /** Parse a `(…)` literal string starting at `start`; returns (text,
    * index past the closing paren). Handles nested parens, the eight
    * escapes, octal codes, and escaped-newline continuations. */
  private def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\r' => i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
          case '\n' => i += 2 // line continuation: no character
          case d if d >= '0' && d <= '7' =>
            var j = i + 1; var v = 0
            while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb.append(v.toChar); i = j
          case other => sb.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.result(), i)
  }

  /** Parse a `<…>` hex string starting at `start`. */
  private def hexString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    val digits = new StringBuilder
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) digits.append(c)
      i += 1
    }
    if (digits.length % 2 == 1) digits.append('0') // spec: odd count pads 0
    var j = 0
    while (j < digits.length) {
      sb.append(Integer.parseInt(digits.substring(j, j + 2), 16).toChar)
      j += 2
    }
    (sb.result(), i + 1)
  }

  /** The decode boundary as a frame: (doc_id, payload binary) →
    * (doc_id, text) — the same shape Tables.documents serves, so the
    * unchanged doc_pipeline DAG runs downstream of REAL PDF bytes.
    * Narrow per-partition map, no shuffle (Multimodal.decoded's
    * topology with a real parser). */
  def utlToText(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => (id, extractText(b)) })
      .toDF("doc_id", "text")
  }
}
