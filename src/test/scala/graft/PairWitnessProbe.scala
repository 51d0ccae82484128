package graft

import org.apache.spark.sql.SparkSession

/** One-off row-count witness for the bounded-family decade (r12):
  * answer sizes of the two IVF-blocked pair producers at a scaled
  * corpus, alongside the wall of a single warm draw. Run via
  * Test/runMain graft.PairWitnessProbe <dir>. */
object PairWitnessProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf3b")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      GraftSession.dirBytes(dir), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[pw] $name: rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    t("dedup_embedding_ivf") {
      graft.operators.IvfIndex.queries("dedup_embedding_ivf")(spark, dir).count()
    }
    t("mm_pair_mining_ivf") {
      graft.operators.Multimodal.queries("mm_pair_mining_ivf")(spark, dir).count()
    }
    spark.stop()
  }
}
