package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Multimodal}
import graft.functions.FloatVecDistance

/** Throwaway decomposition probe for mm_pair_mining_ivf stage costs
  * (the r10 kernel-sweep pass at the 30× corpus). */
object MiningProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf3")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      GraftSession.dirBytes(dir), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val (index, centroids) = t("build+assign") { val b = IvfIndex.build(spark, dir); b._1.count(); b }
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val anchors = Tables.embeddings(spark, dir)
      .join(src, col("vec_id") === col("doc_id"))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("source").as("q_source"))
    val np = IvfIndex.defaultNprobe(centroids.length)
    println(s"[probe] nlist=${centroids.length} nprobe=$np")
    t("probePairs only") { IvfIndex.probePairs(spark, anchors, centroids, np).count() }
    val pp = IvfIndex.probePairs(spark, anchors, centroids, np)
      .join(anchors.select(col("qid"), col("qv"), col("q_source")), "qid")
    t("pp join") { pp.count() }
    val masked = index
      .join(src.select(col("doc_id"), col("source").as("neg_source")),
        col("vec_id") === col("doc_id")).drop("doc_id")
      .join(pp, "centroid_id")
      .filter(col("vec_id") =!= col("qid") && col("neg_source") =!= col("q_source"))
    val nCand = t("candidates+mask (count only)") { masked.count() }
    println(s"[probe] candidate rows: $nCand")
    val kernel = masked.select(
      FloatVecDistance.cosine(col("embedding"), col("qv")).as("raw"))
      .agg(sum(col("raw")))
    t("+kernel (raw, agg sum)") { kernel.collect() }
    val rounded = masked.select(graft.functions.SafeRound.round(
      FloatVecDistance.cosine(col("embedding"), col("qv")), 4).as("dist"))
      .agg(sum(col("dist")))
    t("+fast round (agg sum)") { rounded.collect() }
    val topk = masked.select(col("qid"), col("vec_id"),
        graft.functions.SafeRound.round(
          FloatVecDistance.cosine(col("embedding"), col("qv")), 4).as("dist"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topkByDist(col("dist"), col("vec_id"), 3).as("top"))
    t("+topk agg") { topk.count() }
    t("full op") { Multimodal.pairMiningIvfAt(spark, dir, index, centroids, 0).count() }
    t("full op again") { Multimodal.pairMiningIvfAt(spark, dir, index, centroids, 0).count() }
    spark.stop()
  }
}
