package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Multimodal}

/** One-off A/B witness for the r13 blocking-geometry default
  * (VERDICT r12 item 1): at the 200k bounded-family corpus, force the
  * FROZEN regime — nlist=45, the per-cell occupancy (~4.4k rows/cell)
  * a ~17M-vector corpus sees under the 4096 serving cap — and compare
  * candidate volume and wall against the uncapped blocking default
  * (nlist=√N=447). The closed form N·nprobe·(N/nlist) predicts both;
  * the witness shows the frozen regime multiplies candidates by the
  * closed-form ratio and the blocking default restores it.
  * Run via Test/runMain graft.CapWitnessProbe <dir> [frozenNlist]. */
object CapWitnessProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10b")
    val frozen = args.lift(1).map(_.toInt).getOrElse(45)
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      GraftSession.dirBytes(dir), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cw] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val n = Tables.embeddings(spark, dir).count()
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    println(s"[cw] corpus N=$n blockingNlist=${IvfIndex.blockingNlist(n)} " +
      s"servingDefault=${IvfIndex.defaultNlist(n)} frozen=$frozen")

    Seq("frozen" -> frozen, "blocking-default" -> IvfIndex.blockingNlist(n))
      .foreach { case (label, nlist) =>
        val np = IvfIndex.defaultNprobe(nlist)
        val closed = n.toDouble * np * (n.toDouble / nlist)
        println(f"[cw] === $label: nlist=$nlist nprobe=$np closed-form=${closed / 1e6}%.1f M ===")
        val (index, centroids) =
          t(s"$label build") { val b = IvfIndex.build(spark, dir, k = nlist); b._1.count(); b }
        val probes = Tables.embeddings(spark, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val pp = IvfIndex.probePairs(spark, probes, centroids, np).join(probes, "qid")
        val dedupCand = t(s"$label dedup candidates (count)") {
          index.join(pp, "centroid_id").filter(col("qid") =!= col("vec_id")).count()
        }
        println(f"[cw] $label dedup candidates: ${dedupCand / 1e6}%.1f M (${dedupCand / closed}%.2fx closed form)")
        val anchors = Tables.embeddings(spark, dir)
          .join(src, col("vec_id") === col("doc_id"))
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("source").as("q_source"))
        val mpp = IvfIndex.probePairs(spark, anchors, centroids, np)
          .join(anchors.select(col("qid"), col("qv"), col("q_source")), "qid")
        val mineCand = t(s"$label mining candidates post-mask (count)") {
          index
            .join(src.select(col("doc_id"), col("source").as("neg_source")),
              col("vec_id") === col("doc_id")).drop("doc_id")
            .join(mpp, "centroid_id")
            .filter(col("vec_id") =!= col("qid") && col("neg_source") =!= col("q_source"))
            .count()
        }
        println(f"[cw] $label mining candidates: ${mineCand / 1e6}%.1f M")
        val dRows = t(s"$label dedup_embedding_ivf full op") {
          IvfIndex.dedupPairsAt(spark, dir, index, centroids, 0).count()
        }
        println(s"[cw] $label dedup answer rows: $dRows")
        val mRows = t(s"$label mm_pair_mining_ivf full op") {
          Multimodal.pairMiningIvfAt(spark, dir, index, centroids, 0).count()
        }
        println(s"[cw] $label mining answer rows: $mRows")
      }
    spark.stop()
  }
}
