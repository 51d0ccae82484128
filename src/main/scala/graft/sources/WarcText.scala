package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

/** WARC container ingestion (r15): Common-Crawl ships HTML inside
  * WARC files (ISO 28500 — version line, named headers, a blank
  * line, then a Content-Length-framed body per record), so the crawl
  * front door in practice is container → records → HTTP body →
  * [[HtmlText.htmlToText]]. This parser handles the read side:
  *
  *  - records are located by their `WARC/1.0` version line and
  *    framed by `Content-Length` (the body may contain ANYTHING,
  *    including `WARC/1.0` lookalikes — framing, not scanning,
  *    delimits records; a record with a missing/garbled length falls
  *    back to scanning for the next version line, losing only
  *    itself);
  *  - only `WARC-Type: response` records carry page payloads;
  *    warcinfo/request/metadata records are skipped whole;
  *  - the HTTP response inside a response record is split at its
  *    header/body blank line, and the body goes through the same
  *    HTML chain the bare-page path uses.
  *
  * Scale shape: one WARC file parses in one linear pass inside a
  * narrow map — real use reads `.warc` files via the binaryFile
  * source and flatMaps [[records]] per file, embarrassingly parallel
  * across files (CC shards are ~1 GB each: one task apiece, no
  * shuffle). The gate corpus synthesizes multi-record files from the
  * documents table ([[warcFiles]]) so record framing, type skipping,
  * and HTTP header stripping are all on the hash-checked path.
  */
object WarcText {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Parse one WARC file to (targetUri, httpBody) for its response
    * records. Total on any input: malformed records are skipped. */
  private[graft] def records(file: Array[Byte]): Seq[(String, String)] = {
    val s = new String(file, Latin1)
    val out = Seq.newBuilder[(String, String)]
    var at = s.indexOf("WARC/")
    while (at >= 0) {
      var next = -1
      // headers end at the first blank line
      val hEnd = s.indexOf("\r\n\r\n", at)
      if (hEnd < 0) { at = -1 }
      else {
        val headers = s.substring(at, hEnd)
        def header(name: String): Option[String] = {
          val k = "\r\n" + name + ":"
          val i = headers.indexOf(k)
          if (i < 0) None
          else {
            val vStart = i + k.length
            val vEnd = headers.indexOf("\r\n", vStart)
            Some(headers.substring(vStart,
              if (vEnd < 0) headers.length else vEnd).trim)
          }
        }
        val bodyStart = hEnd + 4
        val len = header("Content-Length").flatMap(v =>
          try Some(v.toInt) catch { case _: NumberFormatException => None })
          .filter(l => l >= 0 && bodyStart + l <= s.length)
        len match {
          case Some(l) =>
            if (header("WARC-Type").contains("response")) {
              val body = s.substring(bodyStart, bodyStart + l)
              // strip the HTTP response head (status line + headers)
              val split = body.indexOf("\r\n\r\n")
              val payload = if (split < 0) body else body.substring(split + 4)
              header("WARC-Target-URI").foreach(uri => out += ((uri, payload)))
            }
            next = s.indexOf("WARC/", bodyStart + l)
          case None =>
            // unframeable record: skip it by scanning for the next
            // version line (loses only this record)
            next = s.indexOf("WARC/", hEnd + 4)
        }
        at = next
      }
    }
    out.result()
  }

  /** (doc_id, text) from a (path, content binary) frame of WARC
    * files — the real-use entry point: narrow flatMap per file, the
    * doc key recovered from the target URI's trailing integer. */
  def utlWarcToText(s: SparkSession, files: DataFrame): DataFrame = {
    import s.implicits._
    files.select("content")
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(bytes => records(bytes).flatMap {
        case (uri, html) =>
          val tail = uri.reverse.takeWhile(_.isDigit).reverse
          (try Some(tail.toLong) catch { case _: NumberFormatException => None })
            .map(id => (id, HtmlText.htmlToText(html)))
      }))
      .toDF("doc_id", "text")
  }
}

/** Deterministic WARC generator for the `src_warc_extract` gate:
  * packs [[HtmlGen.page]] payloads into multi-record WARC files —
  * each file opens with a warcinfo record and carries a
  * request+response pair per document, so record framing, non-
  * response skipping, and HTTP header stripping are all exercised on
  * every file. The grouping key (doc_id / [[DocsPerFile]]) only
  * shapes the files; the output is per-document, so the oracle is
  * grouping-independent. */
object WarcGen {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  val DocsPerFile = 8

  private def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    (headers :+ ("Content-Length" -> body.length.toString)).foreach {
      case (k, v) => sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("\r\n")
    sb.result().getBytes(Latin1) ++ body ++ "\r\n\r\n".getBytes(Latin1)
  }

  /** One WARC file for a group of (doc_id, text) rows. */
  def warcFile(docs: Seq[(Long, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(record(
      Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> "<urn:graft:info>"),
      "software: graft-testgen\r\n".getBytes(Latin1)))
    docs.foreach { case (id, text) =>
      val uri = s"http://crawl.example/doc/$id"
      out.write(record(
        Seq("WARC-Type" -> "request", "WARC-Target-URI" -> uri),
        s"GET /doc/$id HTTP/1.1\r\nHost: crawl.example\r\n\r\n".getBytes(Latin1)))
      val html = HtmlGen.page(id, Option(text).getOrElse(""))
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        .getBytes(Latin1)
      out.write(record(
        Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
          "WARC-Record-ID" -> s"<urn:graft:$id>"),
        http))
    }
    out.toByteArray
  }

  /** (path, content) frame of synthetic WARC files over documents.
    * The one shuffle here (groupBy the file key) exists only to BUILD
    * the synthetic container corpus — real use reads .warc files from
    * storage with no shuffle at all. */
  def warcTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .groupByKey(_._1 / DocsPerFile)
      .mapGroups((k: Long, it: Iterator[(Long, String)]) =>
        (s"graft-$k.warc", warcFile(it.toSeq.sortBy(_._1))))
      .toDF("path", "content")
  }
}
