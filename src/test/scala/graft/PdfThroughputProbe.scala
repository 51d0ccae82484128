package graft

import org.apache.spark.sql.functions._

/** One-off corpus-scale measurement of the PDF decode path (VERDICT
  * r11 punch 4): PdfSpec proves correctness on fixture PDFs; this
  * probe prices decode THROUGHPUT — ~10k synthetic Flate-compressed
  * PDFs through PdfText.utlToText, then the downstream doc_pipeline
  * stages, reporting s/GB so SURVEY §6 can say where decode sits vs
  * chunk/embed cost. Run via Test/runMain graft.PdfThroughputProbe
  * [nDocs] [paragraphsPerDoc].
  *
  * The corpus is built deterministically in the executors (one valid
  * multi-object PDF per row — page tree, Flate content streams, a
  * ToUnicode-free simple font, xref, trailer), so the measurement
  * needs no disk staging and the decode input really exercises the
  * object parser + inflate + content scan per document. */
object PdfThroughputProbe {

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private val words = Vector("spark", "catalyst", "tungsten", "shuffle",
    "partition", "broadcast", "codegen", "parquet", "columnar", "vector",
    "embedding", "centroid", "shortlist", "residual", "pipeline", "stream",
    "watermark", "aggregate", "pruning", "bucket", "salting", "executor")

  /** Deterministic paragraph text for (doc, para) — enough entropy to
    * defeat trivial dedup, fixed per seed so runs are comparable. */
  private[graft] def para(doc: Long, p: Int): String = {
    val sb = new StringBuilder
    var x = doc * 2654435761L + p * 40503L + 12345L
    var i = 0
    while (i < 60) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(words(((x >>> 33) % words.length).toInt)).append(' ')
      i += 1
    }
    sb.result().trim
  }

  private def deflate(content: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(content); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Fixed-key encryption setup for the throughput corpora: every doc
    * shares one /O, /P, /ID (and therefore one file key) — the cost
    * being priced is the per-stream cipher pass, not key derivation
    * (which runs once per document either way and is two MD5 chains). */
  private[graft] final case class EncSetup(fileKey: Array[Byte], aes: Boolean,
      dict: String, id0Hex: String, v5: Boolean = false)

  private def md5(bs: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    bs.foreach(d.update); d.digest()
  }

  private val pwPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private[graft] def encSetup(aes: Boolean): EncSetup = {
    import graft.sources.PdfText.rc4
    val id0 = Array.tabulate[Byte](16)(i => (i * 11 + 5).toByte)
    val hexId = id0.map(b => f"${b & 0xff}%02X").mkString
    var h = md5(("owner-thru".getBytes(latin1) ++ pwPad).take(32))
    for (_ <- 0 until 50) h = md5(h)
    var o = rc4(h.take(16), pwPad)
    for (i <- 1 to 19) o = rc4(h.take(16).map(b => (b ^ i).toByte), o)
    val p = -44
    val pLe = Array[Byte]((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    var fk = md5(pwPad, o, pLe, id0)
    for (_ <- 0 until 50) fk = md5(fk.take(16))
    val fileKey = fk.take(16)
    var u = rc4(fileKey, md5(pwPad, id0))
    for (i <- 1 to 19) u = rc4(fileKey.map(b => (b ^ i).toByte), u)
    val hex = (bs: Array[Byte]) => bs.map(b => f"${b & 0xff}%02X").mkString
    val dict =
      if (aes) s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p" +
        s" /O <${hex(o)}> /U <${hex(u ++ Array.fill[Byte](16)(0x5a))}>" +
        " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF >>"
      else s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $p" +
        s" /O <${hex(o)}> /U <${hex(u ++ Array.fill[Byte](16)(0x5a))}> >>"
    EncSetup(fileKey, aes, dict, hexId)
  }

  /** R6/AESV3 setup with FIXED salts: the cipher is corpus-shared, but
    * the decode side still runs the Algorithm-2.B KDF (hash2B) per
    * FILE — exactly what a real AES-256 corpus costs — so this leg
    * prices the per-document KDF + CBC at realistic document sizes
    * (the doc_extract_report gate docs are ~0.5 KB; here ~2.7 KB). */
  private[graft] def encSetup256(): EncSetup = {
    import graft.sources.PdfText.hash2B
    val id0 = Array.tabulate[Byte](16)(i => (i * 13 + 7).toByte)
    val hexId = id0.map(b => f"${b & 0xff}%02X").mkString
    val fileKey = Array.tabulate[Byte](32)(i => (i * 29 + 11).toByte)
    val vs = Array.tabulate[Byte](8)(i => (0x17 * (i + 1)).toByte)
    val ks = Array.tabulate[Byte](8)(i => (0x0b * (i + 2)).toByte)
    val u = hash2B(6, Array.emptyByteArray, vs, Array.emptyByteArray) ++ vs ++ ks
    val ik = hash2B(6, Array.emptyByteArray, ks, Array.emptyByteArray)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ik, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    val ue = c.doFinal(fileKey)
    val hex = (bs: Array[Byte]) => bs.map(b => f"${b & 0xff}%02X").mkString
    val dict = s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -4" +
      s" /O <${hex(Array.fill[Byte](48)(0x4f))}> /OE <${hex(Array.fill[Byte](32)(0x45))}>" +
      s" /U <${hex(u)}> /UE <${hex(ue)}>" +
      " /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>"
    EncSetup(fileKey, aes = true, dict, hexId, v5 = true)
  }

  private[graft] def encryptPayload(e: EncSetup, objNum: Int, payload: Array[Byte]): Array[Byte] = {
    val salt = if (e.aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
    val key =
      if (e.v5) e.fileKey // V5: the file key IS the stream key
      else md5(e.fileKey, Array[Byte]((objNum & 0xff).toByte,
        ((objNum >> 8) & 0xff).toByte, ((objNum >> 16) & 0xff).toByte, 0, 0), salt).take(16)
    if (!e.aes) graft.sources.PdfText.rc4(key, payload)
    else {
      // deterministic per-object IV: throughput, not confidentiality
      val iv = md5(Array[Byte](objNum.toByte), e.fileKey).take(16)
      val pad = 16 - payload.length % 16
      val padded = payload ++ Array.fill[Byte](pad)(pad.toByte)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(padded)
    }
  }

  /** Minimal sfnt whose (3,1) format-4 cmap maps space → gid 40 and
    * 'a'..'z' → gids 1..26 (the paragraph alphabet) — the Identity-H
    * corpus twin: content shows 2-byte gids, text is recovered by
    * inverting THIS table (r14 path), memoized once per document. */
  private[graft] def cidFont(): Array[Byte] = {
    def u16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val sub = new java.io.ByteArrayOutputStream()
    sub.write(u16(4)); sub.write(u16(0)); sub.write(u16(0))
    sub.write(u16(6)); sub.write(u16(0)); sub.write(u16(0)); sub.write(u16(0))
    Seq(0x20, 'z'.toInt, 0xFFFF).foreach(v => sub.write(u16(v))) // endCode
    sub.write(u16(0))
    Seq(0x20, 'a'.toInt, 0xFFFF).foreach(v => sub.write(u16(v))) // startCode
    Seq(40 - 0x20, 0x10000 - 0x60, 1).foreach(v => sub.write(u16(v & 0xFFFF)))
    Seq(0, 0, 0).foreach(v => sub.write(u16(v)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(u32(0x00010000)); out.write(u16(1))
    out.write(u16(16)); out.write(u16(0)); out.write(u16(0))
    out.write("cmap".getBytes(latin1)); out.write(u32(0))
    out.write(u32(28)); out.write(u32(4 + 8 + sub.size()))
    out.write(u16(0)); out.write(u16(1))
    out.write(u16(3)); out.write(u16(1)); out.write(u32(12))
    out.write(sub.toByteArray)
    out.toByteArray
  }

  private def gidOf(c: Char): Int = if (c == ' ') 40 else c - 0x60

  /** The r15 /FontFile3 leg reuses the gate's own name-keyed CFF
    * (PdfGen.cidFontCff, standard-string SIDs over the full printable
    * alphabet): the probe prices decode throughput; the independent
    * forward-side cross-check lives in PdfCidSpec (review r15 - a
    * third hand-rolled copy of the CFF layout was maintenance debt).
    */
  private def gidOfCff(c: Char): Int = graft.sources.PdfGen.gidCff(c)

  /** Identity-H variant of [[buildPdf]]: same paragraphs shown as
    * 2-byte gid hex strings under a ToUnicode-less Type0 font whose
    * embedded program is `font` (a TrueType under /FontFile2 or a
    * bare CFF under /FontFile3). */
  private[graft] def buildCidPdf(doc: Long, pages: Int, parasPerPage: Int,
      font: Array[Byte], gid: Char => Int, fontKey: String): Array[Byte] = {
    val contentObjs = (0 until pages).map { pg =>
      val body = new StringBuilder("BT\n/F1 10 Tf\n72 720 Td\n")
      (0 until parasPerPage).foreach { p =>
        body.append('<')
        para(doc, pg * parasPerPage + p).foreach(c => body.append(f"${gid(c)}%04X"))
        body.append("> Tj\n0 -12 Td\n")
      }
      body.append("ET")
      deflate(body.result().getBytes(latin1))
    }
    val n = pages
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    val objs = Vector.newBuilder[Array[Byte]]
    objs += "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1)
    objs += s"<< /Type /Pages /Kids [$kids] /Count $n >>".getBytes(latin1)
    (0 until n).foreach { i =>
      objs += (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 ${3 + 2 * n} 0 R >> >> " +
        s"/Contents ${3 + n + i} 0 R >>").getBytes(latin1)
    }
    contentObjs.foreach { payload =>
      objs += (s"<< /Length ${payload.length} /Filter /FlateDecode >>\nstream\n"
        .getBytes(latin1) ++ payload ++ "\nendstream".getBytes(latin1))
    }
    objs += (s"<< /Type /Font /Subtype /Type0 /BaseFont /Fake /Encoding /Identity-H" +
      s" /DescendantFonts [${4 + 2 * n} 0 R] >>").getBytes(latin1)
    objs += (s"<< /Type /Font /Subtype " +
      (if (fontKey == "FontFile2") "/CIDFontType2" else "/CIDFontType0") +
      s" /BaseFont /Fake /FontDescriptor ${5 + 2 * n} 0 R >>").getBytes(latin1)
    objs += (s"<< /Type /FontDescriptor /FontName /Fake /$fontKey ${6 + 2 * n} 0 R >>")
      .getBytes(latin1)
    objs += (s"<< /Length ${font.length} >>\nstream\n".getBytes(latin1)
      ++ font ++ "\nendstream".getBytes(latin1))
    val bodies = objs.result()
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.6\n".getBytes(latin1))
    bodies.zipWithIndex.foreach { case (b, i) =>
      out.write(s"${i + 1} 0 obj\n".getBytes(latin1)); out.write(b)
      out.write("\nendobj\n".getBytes(latin1))
    }
    out.write(("trailer\n<< /Size " + (bodies.size + 1) + " /Root 1 0 R >>\n%%EOF\n")
      .getBytes(latin1))
    out.toByteArray
  }

  /** One valid PDF: `pages` pages, each its own Flate content stream
    * of `parasPerPage` paragraphs shown line-by-line. */
  private[graft] def buildPdf(doc: Long, pages: Int, parasPerPage: Int,
      enc: Option[EncSetup] = None): Array[Byte] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val contentObjs = (0 until pages).map { pg =>
      val body = new StringBuilder("BT\n/F1 10 Tf\n72 720 Td\n")
      (0 until parasPerPage).foreach { p =>
        body.append('(').append(esc(para(doc, pg * parasPerPage + p)))
          .append(") Tj\n0 -12 Td\n")
      }
      body.append("ET")
      deflate(body.result().getBytes(latin1))
    }
    val nPages = pages
    // objects: 1 catalog, 2 pages-root, 3..2+n page objects,
    // 3+n..2+2n content streams, 3+2n font
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    val objs = Vector.newBuilder[Array[Byte]]
    objs += "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1)
    objs += s"<< /Type /Pages /Kids [$kids] /Count $nPages >>".getBytes(latin1)
    (0 until nPages).foreach { i =>
      objs += (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 ${3 + 2 * nPages} 0 R >> >> " +
        s"/Contents ${3 + nPages + i} 0 R >>").getBytes(latin1)
    }
    contentObjs.zipWithIndex.foreach { case (clear, i) =>
      val objNum = 3 + nPages + i
      val payload = enc.fold(clear)(e => encryptPayload(e, objNum, clear))
      objs += (s"<< /Length ${payload.length} /Filter /FlateDecode >>\nstream\n"
        .getBytes(latin1) ++ payload ++ "\nendstream".getBytes(latin1))
    }
    objs += ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>").getBytes(latin1)
    enc.foreach(e => objs += e.dict.getBytes(latin1))
    val bodies = objs.result()
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(latin1))
    val offsets = bodies.zipWithIndex.map { case (b, i) =>
      val off = out.size()
      out.write(s"${i + 1} 0 obj\n".getBytes(latin1)); out.write(b)
      out.write("\nendobj\n".getBytes(latin1)); off
    }
    val xrefAt = out.size()
    out.write(s"xref\n0 ${bodies.size + 1}\n0000000000 65535 f \n".getBytes(latin1))
    offsets.foreach(o => out.write(f"$o%010d 00000 n \n".getBytes(latin1)))
    val trailerExtra = enc.fold("")(e =>
      s" /Encrypt ${bodies.size} 0 R /ID [<${e.id0Hex}> <${e.id0Hex}>]")
    out.write((s"trailer\n<< /Size ${bodies.size + 1} /Root 1 0 R$trailerExtra >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n").getBytes(latin1))
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(10000)
    val parasPerPage = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val pages = 3
    val spark = SparkTestSession.spark
    import spark.implicits._
    // corpus: built per-partition in the executors, persisted in memory
    // so decode timing excludes generation
    val pdfs = spark.range(0, nDocs, 1, 32)
      .as[Long].map(id => (id, buildPdf(id, pages, parasPerPage)))
      .toDF("doc_id", "payload").persist()
    val totalBytes = pdfs.agg(sum(length(col("payload")))).head().getLong(0)
    val gb = totalBytes / 1e9
    println(f"PDFTHRU docs=$nDocs pages=$pages bytes=$totalBytes (${gb}%.3f GB)")
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PDFTHRU $label%-14s sec=$sec%7.1f sPerGB=${sec / gb}%7.1f")
      r
    }
    // warm one pass (JIT for the parser hot loops)
    graft.sources.PdfText.utlToText(spark, pdfs.limit(200)).count()
    // decode alone: bytes -> text (the UTL_TO_TEXT stage)
    val decoded = timed("decode") {
      val d = graft.sources.PdfText.utlToText(spark, pdfs).persist()
      d.count(); d
    }
    // the r14 status channel on the same corpus: the report frame is
    // the same extraction pass plus two tiny columns, so this draw
    // must price indistinguishably from `decode` (VERDICT r13 item 5)
    timed("decode-report") {
      graft.sources.PdfText.utlToTextReport(spark, pdfs).count()
    }
    // and the aggregated doc_extract_report shape over the decoded
    // frame's statuses (a 6-group partial agg -- noise on top)
    timed("extract-agg") {
      graft.sources.PdfText.utlToTextReport(spark, pdfs)
        .groupBy("extract_status").count().collect()
    }
    // the same corpus under the standard security handler: what the
    // cipher pass adds on top of parse+inflate+scan (RC4 = V2/R3,
    // AES-128-CBC = V4/AESV2). Correctness guard: identical text bytes.
    Seq[(String, () => EncSetup)](
      ("rc4", () => encSetup(aes = false)),
      ("aes128", () => encSetup(aes = true)),
      ("aes256", () => encSetup256())).foreach { case (label, mk) =>
      val setup = mk()
      val encPdfs = spark.range(0, nDocs, 1, 32)
        .as[Long].map(id => (id, buildPdf(id, pages, parasPerPage, Some(setup))))
        .toDF("doc_id", "payload").persist()
      encPdfs.count()
      graft.sources.PdfText.utlToText(spark, encPdfs.limit(200)).count() // warm cipher path
      val decEnc = timed(s"decode-$label") {
        val d = graft.sources.PdfText.utlToText(spark, encPdfs).persist()
        d.count(); d
      }
      val encTextBytes = decEnc.agg(sum(length(col("text")))).head().getLong(0)
      val plainTextBytes = decoded.agg(sum(length(col("text")))).head().getLong(0)
      require(encTextBytes == plainTextBytes,
        s"$label decode must recover identical text ($encTextBytes vs $plainTextBytes)")
      decEnc.unpersist(); encPdfs.unpersist()
    }
    val textBytes = decoded.agg(sum(length(col("text")))).head().getLong(0)
    println(f"PDFTHRU textBytes=$textBytes (${textBytes * 100.0 / totalBytes}%.1f%% of pdf bytes)")
    // the ToUnicode-less Identity-H corpus (r14): the same paragraphs
    // shown as 2-byte gid hex strings, text recovered by inverting the
    // embedded TrueType cmap (memoized once per document). Guard:
    // byte-identical text volume to the simple-font corpus.
    // two embedded-font legs: TrueType cmap inversion (r14) and the
    // bare name-keyed CFF charset/AGL route (r15) — same paragraphs,
    // so both must recover byte-identical text volume
    Seq[(String, Long => Array[Byte])](
      ("cid", id => buildCidPdf(id, pages, parasPerPage, cidFont(), gidOf, "FontFile2")),
      ("cff", id => buildCidPdf(id, pages, parasPerPage,
        graft.sources.PdfGen.cidFontCff, gidOfCff, "FontFile3"))
    ).foreach { case (label, build) =>
      val cidPdfs = spark.range(0, nDocs, 1, 32)
        .as[Long].map(id => (id, build(id)))
        .toDF("doc_id", "payload").persist()
      cidPdfs.count()
      graft.sources.PdfText.utlToText(spark, cidPdfs.limit(200)).count() // warm
      val decCid = timed(s"decode-$label") {
        val d = graft.sources.PdfText.utlToText(spark, cidPdfs).persist()
        d.count(); d
      }
      val cidTextBytes = decCid.agg(sum(length(col("text")))).head().getLong(0)
      require(cidTextBytes == textBytes,
        s"$label decode must recover identical text volume ($cidTextBytes vs $textBytes)")
      decCid.unpersist(); cidPdfs.unpersist()
    }
    // downstream stages on the SAME decoded frame — where decode sits
    // relative to the chunk/embed cost the pipeline already pays
    timed("chunk") { graft.operators.DocPipeline.chunksOf(decoded).count() }
    timed("doc_pipeline") { graft.operators.DocPipeline.docPipelineOf(decoded).count() }
    decoded.unpersist(); pdfs.unpersist()
    spark.stop()
  }
}
