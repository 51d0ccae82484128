package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTML → text ingestion (r15, VERDICT r14 item 3): the front door a
  * crawl-scale pipeline actually walks through — Common-Crawl pages,
  * not PDFs. Reference behavior being re-expressed: the UTL_TO_TEXT
  * document-conversion boundary of scripts/01_pdf_to_vector.sql (the
  * reference feeds Oracle's converter any document type; graft
  * implements the converters — PdfText for /FontFile-class binaries,
  * this for markup).
  *
  * [[htmlToText]] is a deterministic chain every engine can reason
  * about: strip comments, drop script/style WITH their content,
  * replace remaining tags with spaces, decode entities in ONE pass
  * (named core + decimal/hex numerics — single-pass means a
  * double-encoded `&amp;lt;` decodes to the literal `&lt;`, never
  * re-decoded), collapse whitespace. `&nbsp;` decodes to a plain
  * space deliberately: this is pipeline normalization (tokenizers,
  * dedup shingles), not display fidelity, and U+00A0 would survive
  * `\s+` collapse on the Java side while DuckDB's would not.
  *
  * Scale shape: [[utlHtmlToText]] is the same narrow per-partition
  * map as PdfText.utlToText — linear per-byte CPU, no shuffle, the
  * (doc_id, text) frame the unchanged doc_pipeline DAG consumes.
  * Unclosed script/style blocks lose their match and fall through to
  * tag-stripping (content then appears as text) — tolerated, never
  * thrown; real crawls gate such pages on the quality score.
  */
object HtmlText {

  private val Entity = java.util.regex.Pattern.compile(
    "&(#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|[a-zA-Z][a-zA-Z0-9]{1,30});")
  // the explicit Java \s class, mirrored verbatim in the DuckDB
  // oracle: RE2's \s lacks \x0B, so a bare \s+ on both sides would
  // diverge on a vertical tab (review r15)
  private val Ws = java.util.regex.Pattern.compile("[ \\t\\n\\x0B\\f\\r]+")

  /** Named entities decoded: the HTML core four + nbsp + the Latin-1
    * and typographic names crawl text actually carries. Unknown names
    * stay literal (never guessed). */
  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ",
    "aacute" -> "á", "eacute" -> "é", "iacute" -> "í",
    "oacute" -> "ó", "uacute" -> "ú", "agrave" -> "à",
    "egrave" -> "è", "ccedil" -> "ç", "ntilde" -> "ñ",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü",
    "szlig" -> "ß", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "middot" -> "·", "laquo" -> "«",
    "raquo" -> "»", "deg" -> "°", "euro" -> "€",
    "trade" -> "™", "bull" -> "•")

  /** Decode entities in one left-to-right pass: named via [[Named]],
    * `&#NNN;` / `&#xHH;` to their code point when it is a valid
    * non-surrogate scalar, everything else left literal. */
  private[graft] def decodeEntities(s: String): String = {
    val m = Entity.matcher(s)
    if (!m.find()) return s
    // java.lang.StringBuilder explicitly: the Scala one auto-tuples a
    // 3-arg append into append(Any)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      val body = m.group(1)
      val out: Option[String] =
        if (body.charAt(0) == '#') {
          val cp =
            try {
              if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                Integer.parseInt(body.substring(2), 16)
              else Integer.parseInt(body.substring(1), 10)
            } catch { case _: NumberFormatException => -1 }
          // tab/LF/CR are legitimate whitespace references in crawl
          // HTML (they decode, then collapse); other controls and
          // surrogates stay literal
          if ((cp == 0x09 || cp == 0x0A || cp == 0x0D ||
              (cp >= 0x20 && cp <= 0x10FFFF)) &&
            !(cp >= 0xD800 && cp <= 0xDFFF))
            Some(new String(Character.toChars(cp)))
          else None
        } else Named.get(body)
      sb.append(out.getOrElse(m.group(0)))
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  /** One linear left-to-right pass replacing comments, script/style
    * blocks (content included), and tags with spaces. A lazy-dotall
    * regex chain here is O(openers × length) on hostile pages
    * (thousands of unclosed `<script>` tokens each scan to EOF before
    * failing — review r15); this scanner is O(n): each closer search
    * that fails sets an exhausted flag, so the expensive miss happens
    * at most once per needle per document.
    *
    * Semantics preserved from the regex chain: a construct missing
    * its terminator is NOT a construct — an unterminated comment
    * keeps its literal text, an unclosed script/style opener strips
    * as a plain tag (content kept), a `<` not followed by a tag shape
    * stays literal. Case-insensitive via an ASCII-only lowercase
    * shadow (length-safe, unlike String.toLowerCase). */
  private def stripMarkup(html: String): String = {
    val n = html.length
    val lower = {
      val a = html.toCharArray
      var k = 0
      while (k < n) { val c = a(k); if (c >= 'A' && c <= 'Z') a(k) = (c + 32).toChar; k += 1 }
      new String(a)
    }
    val sb = new java.lang.StringBuilder(n)
    // exhausted-needle flags: a failed indexOf from position p fails
    // for every later p too. The multi-char needles are only ever
    // searched from monotonically increasing positions, so a boolean
    // suffices; '>' is searched from BOTH an opener and a later
    // closer, so it gets a fail-position watermark instead (a miss
    // from p only dooms searches starting at or after p).
    var noComment, noScriptClose, noStyleClose = false
    var gtFailFrom = Int.MaxValue
    def find(needle: String, from: Int, exhausted: Boolean): Int =
      if (exhausted) -1 else lower.indexOf(needle, from)
    def findGt(from: Int): Int =
      if (from >= gtFailFrom) -1
      else {
        val r = lower.indexOf('>', from)
        if (r < 0) gtFailFrom = math.min(gtFailFrom, from)
        r
      }
    def isBoundary(k: Int): Boolean =
      k >= n || { val c = lower.charAt(k); !(c.isLetterOrDigit || c == '_') }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = lower.charAt(i + 1)
        var consumed = false
        if (c1 == '!' && lower.startsWith("!--", i + 1)) {
          val end = find("-->", i + 4, noComment)
          if (end >= 0) { sb.append(' '); i = end + 3; consumed = true }
          else noComment = true // literal '<' below
        } else if (c1 == 's' &&
          (lower.startsWith("script", i + 1) && isBoundary(i + 7) ||
            lower.startsWith("style", i + 1) && isBoundary(i + 6))) {
          val script = lower.charAt(i + 2) == 'c'
          val close = if (script) find("</script", i, noScriptClose)
            else find("</style", i, noStyleClose)
          if (close >= 0) {
            val gt = findGt(close)
            if (gt >= 0) { sb.append(' '); i = gt + 1; consumed = true }
          } else if (script) noScriptClose = true
          else noStyleClose = true
          // no closer (or a closer with no '>'): fall through to the
          // plain-tag strip below — opener out, content kept
        }
        if (!consumed && (c1 == '!' || c1 == '/' ||
          (c1 >= 'a' && c1 <= 'z')) &&
          (c1 != '!' || (i + 2 < n && { val c2 = lower.charAt(i + 2)
            c2 >= 'a' && c2 <= 'z' }))) {
          // a real tag needs a letter after < or </ (or <!LETTER for
          // doctype); otherwise the '<' is literal text
          val tagOk = c1 != '/' || (i + 2 < n && { val c2 = lower.charAt(i + 2)
            c2 >= 'a' && c2 <= 'z' })
          if (tagOk) {
            val gt = findGt(i + 1)
            if (gt >= 0) { sb.append(' '); i = gt + 1; consumed = true }
          }
        }
        if (!consumed) { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The extraction chain: comments out, script/style blocks out
    * (content included), tags to spaces, entities decoded once,
    * whitespace collapsed, trimmed. Total on any input, linear in
    * its length. */
  def htmlToText(html: String): String = {
    if (html == null) return ""
    val decoded = decodeEntities(stripMarkup(html))
    Ws.matcher(decoded).replaceAll(" ").trim
  }

  /** The decode boundary as a frame — (doc_id, html string) →
    * (doc_id, text), PdfText.utlToText's topology for markup: narrow
    * per-partition map, no shuffle, the shape doc_pipeline consumes. */
  def utlHtmlToText(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select("doc_id", "html")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, h) => (id, htmlToText(h)) })
      .toDF("doc_id", "text")
  }
}

/** Deterministic dirty-HTML generator for the `src_html_extract`
  * gate: wraps each documents row's text (entity-ESCAPED, so the
  * decode inverts it exactly) in a page whose title/h1, style and
  * script blocks, comment, and an entity-decoration sentence are all
  * pure functions of doc_id — the DuckDB oracle predicts the clean
  * extraction from the text column alone, without running any
  * extractor. PdfGen's role, for markup. */
object HtmlGen {

  /** Forward escape: the three characters well-formed HTML must
    * escape in text content ('&' first, or it would re-escape). */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The decoration sentence the oracle expects verbatim after the
    * body text: named, decimal, hex, nbsp and quote entities all
    * exercised on every row. */
  val DecorDecoded: String = "café & résumé \"ok\""

  /** One page per documents row. The script/style payloads carry the
    * sentinel tokens the leak spec greps chunks for. */
  def page(docId: Long, text: String): String = {
    val sb = new StringBuilder(text.length + 512)
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n")
    sb.append(s"<title>Doc $docId</title>\n")
    sb.append("<style type=\"text/css\">\n  body { color: #1a2b3c; }\n")
    sb.append(s"  .m$docId { margin: ${docId % 7}px; }\n</style>\n")
    sb.append(s"<script>\n  var t = $docId;\n")
    sb.append("  function track() { return \"trackpixel-\" + t; }\n</script>\n")
    sb.append("</head>\n<body>\n")
    sb.append(s"<h1 class=\"m$docId\">Doc $docId</h1>\n")
    sb.append(s"<!-- build $docId commentleak -->\n")
    sb.append("<div class=\"main\">\n<p>\n")
    sb.append(escape(text))
    sb.append("\n</p>\n</div>\n")
    sb.append("<p>caf&eacute; &amp; r&#233;sum&#xE9;&nbsp;&quot;ok&quot;</p>\n")
    sb.append(s"""<script>analyticsleak("$docId");</script>\n""")
    sb.append("</body>\n</html>\n")
    sb.result()
  }

  /** (doc_id, html) frame over documents — narrow map, two-column
    * prune, no shuffle. */
  def htmlTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, page(id, Option(t).getOrElse(""))) })
      .toDF("doc_id", "html")
  }
}
