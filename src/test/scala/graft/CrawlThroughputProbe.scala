package graft

import org.apache.spark.sql.functions._

/** One-off corpus-scale pricing of the crawl front door (VERDICT r15
  * item 4): WarcFuzzSpec/SourceSpec prove correctness on fixtures;
  * this probe prices the END-TO-END decode surface at the sf1
  * documents leg — warc(.gz) container → gzip member inflation →
  * framing → charset resolution → html→text → chunks → dedup
  * shingles — reporting s/GB per stage so SURVEY §6 can say where
  * container decode sits vs the downstream CPU (the
  * PdfThroughputProbe pattern for the crawl path). Run via
  * Test/runMain graft.CrawlThroughputProbe [sfDir].
  *
  * Three container mixes are priced: the gate's mixed corpus (odd
  * file keys gzipped), all-plain, and all-gzip — the plain/gz delta
  * isolates the inflate cost real `.warc.gz` shards pay. Generation
  * is persisted and counted BEFORE timing, so the draws price decode
  * only. */
object CrawlThroughputProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkTestSession.spark
    import spark.implicits._

    // the GATE's own builder (warcTable), with the gz selector forced
    // per mix — the probe can never drift from the gate corpus shape
    def corpus(gzAll: Option[Boolean]) =
      graft.sources.WarcGen.warcTable(spark, dir,
        gzAll.map(v => (_: Long) => v).getOrElse(_ % 2 == 1))

    def timed[A](label: String, gb: Double)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CRAWLTHRU $label%-16s sec=$sec%7.1f sPerGB=${sec / gb}%7.1f")
      r
    }

    // container mixes: decode-only timing (corpus persisted first)
    val mixes = Seq(("mixed", None), ("plain", Some(false)), ("gz", Some(true)))
    var decodedMixed: org.apache.spark.sql.DataFrame = null
    var filesMixed: org.apache.spark.sql.DataFrame = null
    var gbMixed = 0.0
    mixes.foreach { case (label, gzAll) =>
      val files = corpus(gzAll).persist()
      val bytes = files.agg(sum(length(col("content")))).head().getLong(0)
      val gb = bytes / 1e9
      println(f"CRAWLTHRU corpus-$label%-9s bytes=$bytes (${gb}%.3f GB)")
      // warm: JIT for the framing scanner + charset decoders
      graft.sources.WarcText.utlWarcToText(spark, files.limit(8)).count()
      val t = timed(s"warc-text-$label", gb) {
        val d = graft.sources.WarcText.utlWarcToText(spark, files)
        if (label == "mixed") { val p = d.persist(); p.count(); p }
        else { d.count(); d }
      }
      if (label == "mixed") { decodedMixed = t; filesMixed = files; gbMixed = gb }
      else files.unpersist()
    }

    // downstream stages over the mixed-corpus decoded text (the frame
    // doc_pipeline consumes) — priced against the CONTAINER bytes so
    // the stages compose into one front-door s/GB figure
    val nDocs = decodedMixed.count()
    println(s"CRAWLTHRU decoded docs=$nDocs")
    timed("chunks", gbMixed) {
      graft.operators.DocPipeline.chunksOf(decodedMixed).count()
    }
    timed("shingles", gbMixed) {
      graft.operators.Dedup.shingleSetOf(decodedMixed).count()
    }
    timed("url-dedup-keys", gbMixed) {
      // the dedup_url front-door step over the decoded frame's URLs:
      // canonicalize + distinct-key count (keeper election is priced
      // in the bench's dedup_url row; this is the canonicalization
      // pass itself at corpus scale, over the PERSISTED container
      // corpus so only decode+canonicalize is timed)
      graft.sources.WarcText.warcToText(spark, filesMixed)
        .select(graft.functions.UrlCanon.urlCanonicalize(col("url")).as("u"))
        .distinct().count()
    }

    // ---- flat-memory witness for the streaming iterator (r17) ----
    // Iterate a shard that inflates past the old 2 GiB whole-shard cap
    // and sample used heap between records: the member-at-a-time
    // iterator must hold ONE record, so peak usage stays record-sized
    // (vs 2 GiB byte[] + 4 GiB char[] for the pre-r17 whole-shard
    // inflate — which additionally LOST every record past the cap).
    locally {
      val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
      val nRecords = 300
      val fillerLen = 8 << 20
      val filler = new Array[Byte](fillerLen)
      java.util.Arrays.fill(filler, 'a'.toByte)
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n".getBytes(latin1)
      val out = new java.io.ByteArrayOutputStream(4 << 20)
      var inflated = 0L
      (0 until nRecords).foreach { i =>
        val head = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://e/$i\r\n" +
          s"Content-Length: ${http.length + fillerLen}\r\n\r\n").getBytes(latin1)
        val gz = new java.util.zip.GZIPOutputStream(out, 64 * 1024) {
          `def`.setLevel(java.util.zip.Deflater.BEST_SPEED)
        }
        gz.write(head); gz.write(http); gz.write(filler)
        gz.write("\r\n\r\n".getBytes(latin1))
        gz.finish()
        inflated += head.length + http.length + fillerLen + 4
      }
      val shard = out.toByteArray
      val rt = Runtime.getRuntime
      def usedMb: Long = (rt.totalMemory() - rt.freeMemory()) >> 20
      System.gc()
      val baseMb = usedMb
      var peakMb = 0L
      var n = 0
      val t0 = System.nanoTime()
      val it = graft.sources.WarcText.recordIterator(shard)
      while (it.hasNext) {
        val r = it.next()
        n += r.body.length // consume so the record is live briefly
        peakMb = math.max(peakMb, usedMb - baseMb)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CRAWLTHRU stream-shard inflated=${inflated / 1e9}%.2fGB records=$nRecords " +
        f"sec=$sec%.1f sPerGB=${sec / (inflated / 1e9)}%.1f peakHeapDeltaMB=$peakMb " +
        f"(old cap: ${Int.MaxValue / (1 << 30)}GiB whole-shard — records past it were LOST)")
    }
  }
}
