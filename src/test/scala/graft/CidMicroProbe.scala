package graft

/** Single-threaded per-flavor extract microbench (no Spark): where
  * does the flavor cost live — generation, inversion, or content
  * scan? Run: Test/runMain graft.CidMicroProbe. */
object CidMicroProbe {
  def main(args: Array[String]): Unit = {
    val paras = 250
    def textOf(id: Long): String =
      (0 until paras).map(p => PdfThroughputProbe.para(id, p)).mkString(" ")
    for (flavor <- 0 to 3) {
      val id = 40L + flavor
      val text = graft.sources.PdfGen.sanitize(textOf(id))
      val pdf = graft.sources.PdfGen.cidPdf(id, text)
      // warm
      (0 until 3).foreach(_ => graft.sources.PdfText.extract(pdf))
      val t0 = System.nanoTime()
      var n = 0
      (0 until 20).foreach { _ =>
        n += graft.sources.PdfText.extract(pdf).text.length
      }
      val ms = (System.nanoTime() - t0) / 1e6 / 20
      println(f"CIDMICRO flavor=$flavor pdfBytes=${pdf.length} msPerDoc=$ms%7.2f chars=${n / 20}")
    }
    // cross: same ORDERED 1..95 codes under the TrueType format-4
    // font vs the CFF font -- isolates font- from content-dependence
    locally {
      import graft.sources.PdfGen
      val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
      val text = PdfGen.sanitize(textOf(99L))
      def pdfWith(font: Array[Byte], key: String, code: Char => Int): Array[Byte] = {
        val hex = new StringBuilder(text.length * 4)
        text.foreach(c => hex.append(f"${code(c)}%04X"))
        val content = s"BT /F1 10 Tf <$hex> Tj ET".getBytes(latin1)
        val out = new java.io.ByteArrayOutputStream()
        out.write("%PDF-1.6\n".getBytes(latin1))
        def obj(num: Int, body: Array[Byte]): Unit = {
          out.write(s"$num 0 obj\n".getBytes(latin1)); out.write(body)
          out.write("\nendobj\n".getBytes(latin1))
        }
        obj(1, "<< /Type /Catalog /Pages 2 0 R >>".getBytes(latin1))
        obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(latin1))
        obj(3, ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R" +
          " /Resources << /Font << /F1 5 0 R >> >> >>").getBytes(latin1))
        obj(4, (s"<< /Length ${content.length} >>\nstream\n".getBytes(latin1)
          ++ content ++ "\nendstream".getBytes(latin1)))
        obj(5, ("<< /Type /Font /Subtype /Type0 /BaseFont /X" +
          " /Encoding /Identity-H /DescendantFonts [6 0 R] >>").getBytes(latin1))
        obj(6, ("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X" +
          " /FontDescriptor 7 0 R >>").getBytes(latin1))
        obj(7, (s"<< /Type /FontDescriptor /FontName /X /$key 8 0 R >>").getBytes(latin1))
        obj(8, (s"<< /Length ${font.length} >>\nstream\n".getBytes(latin1)
          ++ font ++ "\nendstream".getBytes(latin1)))
        out.write("trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n".getBytes(latin1))
        out.toByteArray
      }
      for ((label, font, key, code) <- Seq(
        ("tt4+permuted", PdfGen.cidFont4, "FontFile2", PdfGen.gid4 _),
        ("tt4-as-cff-codes", PdfGen.cidFont4, "FontFile2", PdfGen.gidCff _),
        ("cff+ordered", PdfGen.cidFontCff, "FontFile3", PdfGen.gidCff _),
        ("tt12+ordered", PdfGen.cidFont12, "FontFile2", PdfGen.gid12 _))) {
        val pdf = pdfWith(font, key, code)
        (0 until 3).foreach(_ => graft.sources.PdfText.extract(pdf))
        val t0 = System.nanoTime()
        (0 until 20).foreach(_ => graft.sources.PdfText.extract(pdf))
        val ms = (System.nanoTime() - t0) / 1e6 / 20
        println(f"CIDMICRO cross=$label%-17s msPerDoc=$ms%7.2f")
      }
    }
  }
}
