package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared synthesize → decode → per-image moments → bucket-agg
  * harness behind every pixel/sample decode gate (`mm_decode_pixels`,
  * `mm_decode_gif`, `mm_decode_jpeg*`): one narrow mapPartitions over
  * doc_ids, a partial-agg groupBy on the 8-value bucket, ORDER BY
  * bucket — extracted in the r17 review pass, which found six
  * near-identical copies of this scaffold that had to be edited in
  * lockstep. Decode failures report the -1 sentinel row (total, and
  * guaranteed to diverge every closed-form oracle, so failures can't
  * hide). */
private[sources] object DecodeGate {

  /** RGB channel sums per bucket: `decode` yields a 3-channel
    * [[PngCodec.Image]] (grayscale callers replicate first). */
  def rgbSums(s: SparkSession, dir: String)
      (decode: Long => Option[PngCodec.Image]): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select("doc_id")
      .as[Long]
      .mapPartitions(_.map { id =>
        decode(id) match {
          case Some(img) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < img.pixels.length) {
              sr += img.pixels(i) & 0xFF
              sg += img.pixels(i + 1) & 0xFF
              sb += img.pixels(i + 2) & 0xFF
              i += img.channels
            }
            (id % 8, 1L, img.width.toLong, img.height.toLong, sr, sg, sb)
          case None => (id % 8, 1L, -1L, -1L, -1L, -1L, -1L)
        }
      })
      .toDF("bucket", "one", "w", "h", "sr", "sg", "sb")
      .groupBy("bucket")
      .agg(sum("one").as("n_imgs"),
        sum("w").as("sum_w"), sum("h").as("sum_h"),
        sum("sr").as("sum_r"), sum("sg").as("sum_g"), sum("sb").as("sum_b"))
      .orderBy("bucket")
  }

  /** Gray moments (sum + signed extremes) per bucket over a
    * single-channel decode. */
  def graySums(s: SparkSession, dir: String)
      (decode: Long => Option[JpegCodec.Gray]): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select("doc_id")
      .as[Long]
      .mapPartitions(_.map { id =>
        decode(id) match {
          case Some(g) =>
            var sum = 0L; var mn = 256L; var mx = -1L
            var i = 0
            while (i < g.pixels.length) {
              val v = (g.pixels(i) & 0xFF).toLong
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            (id % 8, 1L, g.width.toLong, g.height.toLong, sum, mn, mx)
          case None => (id % 8, 1L, -1L, -1L, -1L, -1L, -1L)
        }
      })
      .toDF("bucket", "one", "w", "h", "sgray", "mn", "mx")
      .groupBy("bucket")
      .agg(sum("one").as("n_imgs"),
        sum("w").as("sum_w"), sum("h").as("sum_h"),
        sum("sgray").as("sum_gray"),
        min("mn").as("min_gray"), max("mx").as("max_gray"))
      .orderBy("bucket")
  }
}
