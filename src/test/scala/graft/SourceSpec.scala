package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DocumentSource

class SourceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("binaryFile document ingestion reads a raw directory") {
    val dir = Files.createTempDirectory("graft_docs")
    Files.writeString(dir.resolve("a.txt"), "hello spark vector world")
    Files.writeString(dir.resolve("b.txt"), "second document body")
    Files.writeString(dir.resolve("skip.bin"), "not a txt")

    val docs = DocumentSource.toText(
      DocumentSource.readDocumentsDir(spark, dir.toString, "*.txt"))
      .select("file_name", "text", "n_bytes")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(docs.length == 2, "glob filter must exclude skip.bin")
    assert(docs(0) == ("a.txt", "hello spark vector world", 24L))
    assert(docs(1)._2 == "second document body")

    val stats = DocumentSource.ingestStats(spark, dir.toString, "*.txt").collect()(0)
    assert(stats.getLong(0) == 2 && stats.getLong(1) == 44L)
  }

  // ---- HTML -> text (r15) ------------------------------------------

  test("htmlToText: strip, decode, collapse — the documented chain") {
    import graft.sources.HtmlText.htmlToText
    assert(htmlToText("<p>a</p><p>b</p>") == "a b")
    assert(htmlToText("<SCRIPT src='x'>var a = '<p>hi</p>';</script>k") == "k")
    assert(htmlToText("<style>p { color: red }</style>text") == "text")
    assert(htmlToText("a <!-- secret --> b") == "a b")
    assert(htmlToText("x &amp; y &lt;z&gt; &quot;q&quot; &#65;&#x42;") ==
      "x & y <z> \"q\" AB")
    // one-pass decode: double-encoded stays singly decoded
    assert(htmlToText("&amp;lt;") == "&lt;")
    // unknown named / invalid numeric entities stay literal
    assert(htmlToText("&notanentity; &#xD800; &#1114112;") ==
      "&notanentity; &#xD800; &#1114112;")
    // numeric whitespace references decode, then collapse (review r15)
    assert(htmlToText("a&#9;b&#10;c&#13;d&#x0A;e") == "a b c d e")
    // other control references stay literal (never invent C0 bytes)
    assert(htmlToText("x&#7;y") == "x&#7;y")
    // nbsp normalizes to a plain space and collapses with neighbors
    assert(htmlToText("a&nbsp; \t\n b") == "a b")
    // a bare '<' in text is not a tag; unclosed script degrades to
    // tag-stripping, never throws
    assert(htmlToText("1 < 2 and > 0") == "1 < 2 and > 0")
    assert(htmlToText("<script>never closed") == "never closed")
    assert(htmlToText(null) == "" && htmlToText("") == "")
  }

  test("htmlToText is linear on hostile pages full of unclosed openers") {
    // review r15: the lazy-dotall regex chain was O(openers x length)
    // — thousands of unclosed <script>/<!--/bare-< tokens each
    // scanned to EOF before failing. The scanner's exhausted-needle
    // flags make the expensive miss happen once per needle.
    import graft.sources.HtmlText.htmlToText
    val hostile = ("<script>" * 50000) + "tail"
    val t0 = System.nanoTime()
    val out = htmlToText(hostile + "<!--" * 10000 + "<div attr" * 10000)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "hostile page must stay linear")
    assert(out.contains("tail"))
    // and the unclosed-opener semantics survive the rewrite: the LAST
    // opener has no closer left, so it strips as a plain tag
    assert(htmlToText("<script>a</script><script>b") == "b")
    // a closer whose '>' is missing degrades to tag-strip (opener
    // out, content kept)
    assert(htmlToText("<script>hi</script") == "hi</script")
  }

  test("HtmlGen escape/decode round-trips any text through the page") {
    import graft.sources.{HtmlGen, HtmlText}
    val nasty = "a&b <tag> &amp; x\n\ty   z"
    val got = HtmlText.htmlToText(HtmlGen.page(7L, nasty))
    assert(got == s"Doc 7 Doc 7 a&b <tag> &amp; x y z ${HtmlGen.DecorDecoded}",
      s"got [$got]")
  }

  test("doc_pipeline over HTML-extracted frames equals the plain-text pipeline") {
    // the PdfSpec composition pin, for markup: a minimal page whose
    // only content is the (escaped) body text must flow through the
    // UNCHANGED doc_pipeline DAG with identical output — the chunker
    // tokenizes on whitespace, so extraction's collapse is invisible
    import spark.implicits._
    import graft.sources.{HtmlGen, HtmlText}
    import graft.operators.DocPipeline
    val texts = Seq(
      (0L, "tungsten codegen pipeline pushdown broadcast exchange shuffle"),
      (1L, "a&b < c and   multi\n\nline   spacing here"))
    val pages = texts.map { case (id, t) =>
      (id, s"<html><body><p>${HtmlGen.escape(t)}</p></body></html>")
    }.toDF("doc_id", "html")
    val viaHtml = DocPipeline.docPipelineOf(HtmlText.utlHtmlToText(spark, pages))
      .collect().map(_.toSeq).toSeq
    val viaText = DocPipeline.docPipelineOf(texts.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSeq
    assert(viaHtml == viaText, "HTML-extracted corpus must flow through the DAG unchanged")
    assert(viaHtml.nonEmpty && viaHtml.map(_.head).distinct.size == 2)
  }

  test("WARC records: framing beats scanning, non-response types are skipped") {
    import spark.implicits._
    import graft.sources.{WarcGen, WarcText}
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    // a body CONTAINING a "WARC/1.0" lookalike must not split the
    // record: Content-Length framing, not scanning, delimits it
    val trap = "HTTP/1.1 200 OK\r\n\r\nbefore WARC/1.0 after"
    def rec(typ: String, uri: String, body: String): String =
      s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"
    val file = (rec("warcinfo", "urn:x", "software: x\r\n") +
      rec("request", "http://e/1", "GET / HTTP/1.1\r\n\r\n") +
      rec("response", "http://e/1", trap) +
      rec("response", "http://e/2", "HTTP/1.1 200 OK\r\n\r\nsecond")).getBytes(latin1)
    def flat(bs: Array[Byte]): Seq[(String, String)] =
      WarcText.records(bs).map(r => (r.uri, new String(r.body, latin1)))
    val got = flat(file)
    assert(got == Seq(("http://e/1", "before WARC/1.0 after"),
      ("http://e/2", "second")), got)
    // header field names are case-insensitive (ISO 28500): a writer
    // emitting lowercase names must frame, not drop, the record
    val lc = ("WARC/1.0\r\nwarc-type: response\r\n" +
      "warc-target-uri: http://e/7\r\ncontent-length: 24\r\n\r\n" +
      "HTTP/1.1 200 OK\r\n\r\nseven\r\n\r\n").getBytes(latin1)
    assert(flat(lc) == Seq(("http://e/7", "seven")))
    // a multi-GB declared length must fail the frame check in Long
    // arithmetic (never wrap Int into a bogus in-bounds offset) and
    // lose only its own record
    val huge = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://e/8\r\nContent-Length: 4294967300\r\n\r\nx")
      .getBytes(latin1) ++ file
    assert(flat(huge).map(_._1) == Seq("http://e/1", "http://e/2"))
    // an unframeable record (garbled length) loses only itself
    val broken = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://e/9\r\nContent-Length: NOPE\r\n\r\nx\r\n\r\n")
      .getBytes(latin1) ++ file
    assert(flat(broken).map(_._1) == Seq("http://e/1", "http://e/2"))
    // truncation ladders stay total
    var n = file.length
    while (n > 0) { WarcText.records(file.take(n)); n = n / 2 }
    assert(WarcText.records("not a warc".getBytes(latin1)).isEmpty)
    // and the generator round-trips through the gate entry point, in
    // BOTH container shapes (plain and per-record-gzip-member .warc.gz)
    for (gz <- Seq(false, true)) {
      val bytes = WarcGen.warcFile(Seq((6L, "hello warc world")), gz)
      assert(WarcText.isGzip(bytes) == gz)
      val table = Seq(("f.warc", bytes)).toDF("path", "content")
      val out = WarcText.utlWarcToText(spark, table)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(out == Seq((6L, "Doc 6 Doc 6 hello warc world " +
        graft.sources.HtmlGen.DecorDecoded)), (gz, out))
    }
  }

  test("WARC charset resolution: HTTP-declared, meta-declared, undeclared UTF-8, Latin-1 fallback") {
    import graft.sources.{WarcGen, WarcText}
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // per-class decode through the whole container chain: each class's
    // decoration must survive byte-exact (a wrong-charset decode, a
    // skipped BOM, or a misordered unchunk/gunzip mojibakes the
    // multibyte characters)
    for (id <- 1L to 5L; gz <- Seq(false, true)) {
      val bytes = WarcGen.warcFile(Seq((id, "body")), gz)
      val rs = WarcText.records(bytes)
      assert(rs.size == 1)
      val text = WarcText.responseText(rs.head)
      val want = s"Doc $id Doc $id body " +
        graft.sources.HtmlGen.DecorDecoded + " " + WarcGen.Decor((id % 6).toInt)
      assert(text == want, s"id=$id gz=$gz: $text")
    }
    // decodeBody unit contract: declared wins; undeclared valid UTF-8
    // decodes as UTF-8; malformed-UTF-8 bytes fall back to Latin-1
    // (total — never a thrown decode); an unknown declared name falls
    // through the same chain
    val omega = "Ω".getBytes(utf8)
    assert(WarcText.decodeBody(omega, None) == "Ω")
    assert(WarcText.decodeBody(omega, Some("utf-8")) == "Ω")
    val eucKr = "한".getBytes(java.nio.charset.Charset.forName("EUC-KR"))
    assert(WarcText.decodeBody(eucKr, Some("EUC-KR")) == "한")
    // 0xE9 alone is malformed UTF-8 -> Latin-1 view
    assert(WarcText.decodeBody(Array(0xE9.toByte), None) == "é")
    assert(WarcText.decodeBody(Array(0xE9.toByte), Some("no-such-charset")) == "é")
    // a BOM wins outright (above even a declared charset) and is
    // stripped; a lying BOM falls through the chain over full bytes
    val bomUtf8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ "Ω".getBytes(utf8)
    assert(WarcText.decodeBody(bomUtf8, Some("ISO-8859-1")) == "Ω")
    val bomLe = Array(0xFF, 0xFE).map(_.toByte) ++
      "hi Ω".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    assert(WarcText.decodeBody(bomLe, None) == "hi Ω")
    val bomBe = Array(0xFE, 0xFF).map(_.toByte) ++
      "hi Ω".getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    assert(WarcText.decodeBody(bomBe, None) == "hi Ω")
    // chunked transfer framing: exact round trip, extensions ignored,
    // malformed framing falls back to the raw body (None)
    assert(WarcText.dechunk("3\r\nabc\r\n0\r\n\r\n").contains("abc"))
    assert(WarcText.dechunk("3;ext=1\r\nabc\r\n2\r\nde\r\n0\r\n\r\n").contains("abcde"))
    assert(WarcText.dechunk("ZZ\r\nabc\r\n0\r\n\r\n").isEmpty)
    assert(WarcText.dechunk("5\r\nabc\r\n0\r\n\r\n").isEmpty) // size lies long
    assert(WarcText.dechunk("").isEmpty)
    // a capture truncated right after the last chunk's data (final
    // CRLF / 0-chunk cut) keeps the decoded prefix — only a cut
    // INSIDE chunk data is unrecoverable
    assert(WarcText.dechunk("3\r\nabc").contains("abc"))
    assert(WarcText.dechunk("3\r\nabc\r").contains("abc"))
    assert(WarcText.dechunk("3\r\nabc\r\n3\r\nde").isEmpty)
    // a present-but-WRONG byte after the data is corruption, not
    // truncation: keep the raw body (review r16)
    assert(WarcText.dechunk("3\r\nabcX").isEmpty)
    // meta-scan path: charset comes from the body head when the HTTP
    // header is silent (both meta forms)
    val metaBody = "<html><head><meta charset=\"euc-kr\"></head></html>".getBytes(utf8)
    assert(WarcText.declaredCharset(
      WarcText.Response("u", None, metaBody)).contains("euc-kr"))
    val httpEquiv = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-2\"></head></html>").getBytes(utf8)
    assert(WarcText.declaredCharset(
      WarcText.Response("u", None, httpEquiv)).contains("ISO-8859-2"))
    assert(WarcText.declaredCharset(
      WarcText.Response("u", Some("text/html; charset=utf-8"), metaBody))
      .contains("utf-8"), "HTTP Content-Type wins over meta")
    // truncated trailing gzip member: the decoded prefix's records
    // survive, the tail loses only itself (doc 2's response is the
    // final member; cutting into it must not cost doc 1's)
    val two = WarcGen.warcFile(Seq((1L, "a"), (2L, "b")), gzipped = true)
    val cut = two.take(two.length - 7)
    val survivors = WarcText.records(cut).map(_.uri) // total, never throws
    assert(survivors.contains("http://crawl.example/doc/1"), survivors)
    assert(WarcText.records(two).map(_.uri) ==
      Seq("http://crawl.example/doc/1", "http://crawl.example/doc/2"))
  }

  test("a header block past the 1 MiB cap loses only itself; later records survive (r17 review)") {
    // record 2 is a version line followed by >HeaderCap of
    // terminator-free bytes — the unframeable-header path (hEnd < 0).
    // Record 3 sits beyond the cap and must still parse (the pre-fix
    // early-stop dropped it with only nMalformed=1 and
    // truncated=false on the books)
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    def rec(i: Int): Array[Byte] = {
      val body = s"HTTP/1.1 200 OK\r\n\r\npayload-$i".getBytes(latin1)
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://e/$i\r\nContent-Length: ${body.length}\r\n\r\n")
        .getBytes(latin1) ++ body ++ "\r\n\r\n".getBytes(latin1)
    }
    val junk = new Array[Byte](graft.sources.WarcText.HeaderCap + (64 << 10))
    java.util.Arrays.fill(junk, 'A'.toByte)
    val file = rec(1) ++ "WARC/1.0\r\n".getBytes(latin1) ++ junk ++ rec(3)
    val it = graft.sources.WarcText.recordIterator(file)
    val uris = it.toSeq.map(_.uri)
    assert(uris == Seq("http://e/1", "http://e/3"), uris)
    assert(it.nMalformed == 1, it.nMalformed)
    assert(!it.truncated)
  }

  test("mid-shard gzip member corruption is flagged, not a silent clean EOF (r17 review)") {
    // three per-record members; corrupt member 2's magic. JDK
    // GZIPInputStream reported a CLEAN end-of-stream here (readTrailer
    // swallows the next header's parse failure), so records 2-3
    // vanished with truncated=false; the hand-rolled member walk must
    // keep record 1 AND raise the truncation flag
    import graft.sources.WarcGen
    val one = WarcGen.warcFile(Seq((1L, "a")), gzipped = true)
    val two = WarcGen.warcFile(Seq((2L, "b")), gzipped = true)
    val three = WarcGen.warcFile(Seq((3L, "c")), gzipped = true)
    val shard = one ++ two ++ three
    // sanity: intact shard yields all three with no flags
    val intactIt = graft.sources.WarcText.recordIterator(shard)
    assert(intactIt.toSeq.map(_.uri) == (1 to 3).map(i => s"http://crawl.example/doc/$i"))
    assert(!intactIt.truncated)
    val mangled = shard.clone()
    mangled(one.length) = 0x00.toByte // member 2's 0x1F magic byte
    val it = graft.sources.WarcText.recordIterator(mangled)
    val uris = it.toSeq.map(_.uri) // total: never throws
    assert(uris == Seq("http://crawl.example/doc/1"), uris)
    assert(it.truncated, "mid-shard member corruption must flag truncation")
  }

  test("streaming .warc.gz: a shard inflating past the old 2 GiB cap yields ALL records (r17)") {
    // VERDICT r16 item 1 done-criterion: the pre-r17 whole-shard
    // inflate capped at Int.MaxValue-64 bytes and SILENTLY kept only
    // the decoded prefix — this shard (260 members x ~8 MiB bodies ≈
    // 2.18 GiB inflated, ~2 MB compressed) crosses that cap, and the
    // member-at-a-time iterator must yield every record with one
    // record in memory at a time (the old path would also have needed
    // a >4 GiB Latin-1 char view, far past this JVM's comfort).
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val nRecords = 260
    val fillerLen = 8 << 20
    val filler = new Array[Byte](fillerLen)
    java.util.Arrays.fill(filler, 'a'.toByte)
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n".getBytes(latin1)
    def marker(i: Int) = s"rec-$i|".getBytes(latin1)
    val out = new java.io.ByteArrayOutputStream(4 << 20)
    var inflated = 0L
    (0 until nRecords).foreach { i =>
      val m = marker(i)
      val contentLen = http.length + m.length + fillerLen
      val head = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://e/$i\r\nContent-Length: $contentLen\r\n\r\n")
        .getBytes(latin1)
      // one gzip member per record, concatenated — the CC shard shape
      val gz = new java.util.zip.GZIPOutputStream(out, 64 * 1024) {
        `def`.setLevel(java.util.zip.Deflater.BEST_SPEED)
      }
      gz.write(head); gz.write(http); gz.write(m); gz.write(filler)
      gz.write("\r\n\r\n".getBytes(latin1))
      gz.finish()
      inflated += head.length + contentLen + 4
    }
    val shard = out.toByteArray
    assert(inflated > Int.MaxValue.toLong,
      s"shard must inflate past the old cap (got $inflated)")
    val it = graft.sources.WarcText.recordIterator(shard)
    var n = 0
    while (it.hasNext) {
      val r = it.next()
      assert(r.uri == s"http://e/$n")
      val m = marker(n)
      assert(r.body.length == m.length + fillerLen, s"record $n body length")
      assert(java.util.Arrays.equals(r.body.take(m.length), m), s"record $n payload head")
      n += 1
    }
    assert(n == nRecords, s"records past the old 2 GiB cap were lost: $n/$nRecords")
    assert(!it.truncated && it.nMalformed == 0 && it.nOther == 0,
      (it.truncated, it.nMalformed, it.nOther))
  }

  test("script/style/comment content never leaks into chunks") {
    // the src_html_extract sentinel payloads (trackpixel, analyticsleak,
    // commentleak, the css color) must be absent from every chunk the
    // downstream pipeline would train on — the leak gate VERDICT r14
    // item 3 asked for
    import org.apache.spark.sql.functions.col
    val extracted = graft.sources.HtmlText.utlHtmlToText(spark,
      graft.sources.HtmlGen.htmlTable(spark, "/root/testdata/sf0.001"))
    val chunks = graft.operators.DocPipeline.chunksOf(extracted)
    val leaks = chunks.filter(
      col("chunk_text").contains("trackpixel") ||
      col("chunk_text").contains("analyticsleak") ||
      col("chunk_text").contains("commentleak") ||
      col("chunk_text").contains("1a2b3c") ||
      col("chunk_text").contains("<") ||
      col("chunk_text").contains("&amp"))
    assert(leaks.count() == 0, "script/style/comment content leaked into chunks")
    assert(chunks.count() > 0)
  }
}
