package graft

import org.apache.spark.sql.functions._

/** Per-flavor decode pricing for the doc_extract_cid gate corpus:
  * which of the four embedded-font classes costs what, at the
  * PdfMixProbe document size. Run: Test/runMain graft.CidFlavorProbe
  * [docsPerFlavor] [parasPerDoc]. */
object CidFlavorProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(500)
    val paras = args.drop(1).headOption.map(_.toInt).getOrElse(250)
    val spark = SparkTestSession.spark
    import spark.implicits._
    def textOf(id: Long): String =
      (0 until paras).map(p => PdfThroughputProbe.para(id, p)).mkString(" ")
    for (flavor <- 0 to 3) {
      val pdfs = spark.range(0, nDocs, 1, 32).as[Long]
        .map { k => val id = k * 4 + flavor
          (id, graft.sources.PdfGen.cidPdf(id, graft.sources.PdfGen.sanitize(textOf(id)))) }
        .toDF("doc_id", "payload").persist()
      val bytes = pdfs.agg(sum(length(col("payload")))).head().getLong(0)
      graft.sources.PdfText.utlToText(spark, pdfs.limit(50)).count() // warm
      val t0 = System.nanoTime()
      graft.sources.PdfText.utlToTextReport(spark, pdfs)
        .groupBy("extract_status").count().collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CIDFLAVOR flavor=$flavor bytes=$bytes sec=$sec%6.1f sPerGB=${sec / (bytes / 1e9)}%6.1f")
      pdfs.unpersist()
    }
    spark.stop()
  }
}
