package graft

import org.apache.spark.sql.functions._

/** One-off witness for the REALISTIC extraction cost (VERDICT r14
  * item 5): the doc_extract gate corpus maximizes per-byte KDF cost
  * by construction (0.5 KB docs, AES-256's Algorithm 2.B runs per
  * file), so its ~306 s/GB is an upper bound, not a forecast. This
  * probe prices the same six-class status mix — 1/6 of docs pay the
  * AES-256 KDF — at ~100 KB documents (the size real PDF corpora
  * center on), plus the Identity-H/TrueType twin at the same size,
  * turning the "~3 s/GB amortized" claim into a measured number.
  * Run: sbt "Test/runMain graft.PdfMixProbe [nDocs] [parasPerDoc]". */
object PdfMixProbe {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000)
    // ~250 paragraphs x ~400 B = ~100 KB of text per document
    val paras = args.drop(1).headOption.map(_.toInt).getOrElse(250)
    val spark = SparkTestSession.spark
    import spark.implicits._
    def textOf(id: Long): String =
      (0 until paras).map(p => PdfThroughputProbe.para(id, p)).mkString(" ")
    def timed(label: String, gb: Double)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PDFMIX $label%-12s sec=$sec%7.1f sPerGB=${sec / gb}%7.1f")
    }
    // the six-class gate mix at realistic size (PdfGen.payloadFor:
    // clear / rc4 / aes(128|256) / locked / unsupported / malformed)
    val mix = spark.range(0, nDocs, 1, 32).as[Long]
      .map(id => (id, graft.sources.PdfGen.payloadFor(id,
        graft.sources.PdfGen.sanitize(textOf(id)))))
      .toDF("doc_id", "payload").persist()
    val mixBytes = mix.agg(sum(length(col("payload")))).head().getLong(0)
    println(f"PDFMIX docs=$nDocs paras=$paras mixBytes=$mixBytes (${mixBytes / 1e9}%.3f GB)")
    graft.sources.PdfText.utlToTextReport(spark, mix.limit(100)).count() // warm
    timed("mix-report", mixBytes / 1e9) {
      graft.sources.PdfText.utlToTextReport(spark, mix)
        .groupBy("extract_status").count().collect()
    }
    mix.unpersist()
    // the Identity-H twin at the same document size (gate flavor mix:
    // format-4 permuted / format-12 by parity)
    val cid = spark.range(0, nDocs, 1, 32).as[Long]
      .map(id => (id, graft.sources.PdfGen.cidPdf(id,
        graft.sources.PdfGen.sanitize(textOf(id)))))
      .toDF("doc_id", "payload").persist()
    val cidBytes = cid.agg(sum(length(col("payload")))).head().getLong(0)
    println(f"PDFMIX cidBytes=$cidBytes (${cidBytes / 1e9}%.3f GB)")
    graft.sources.PdfText.utlToTextReport(spark, cid.limit(100)).count() // warm
    timed("cid-report", cidBytes / 1e9) {
      graft.sources.PdfText.utlToTextReport(spark, cid)
        .groupBy("extract_status").count().collect()
    }
    cid.unpersist()
    spark.stop()
  }
}
