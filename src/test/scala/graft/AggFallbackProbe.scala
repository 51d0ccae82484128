package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: does ObjectHashAggregate's 128-key sort-based fallback
  * dominate the bounded top-k aggs (TopKAgg is a
  * TypedImperativeAggregate) at corpus-scale group counts? Same
  * session, alternating draws, only the threshold varies.
  *
  * ADJUDICATED r12 at the 100× bounded-family corpus: NO effect
  * distinguishable under the host's ±4× noise band (thr=128 drew
  * 192/439 s, thr=131072 drew 310/114 s on identical warm full-op
  * runs) — any fallback cost is bounded well below the candidate
  * scan on this path. Kept as the record of that negative and the
  * recipe to re-ask the question on other hardware. */
object AggFallbackProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10b")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      GraftSession.dirBytes(dir), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ab] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val (index, centroids) = graft.operators.IvfIndex.build(spark, dir)
    index.count()
    val queriesDf = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    println(s"[ab] nlist=${centroids.length}")
    def full() = graft.operators.Multimodal
      .pairMiningIvfAt(spark, dir, index, centroids, 0).count()
    def thr(v: String) =
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
    // one untimed warm pass populates caches/shuffle files, then
    // ALTERNATING draws so host-noise stretches hit both arms
    full()
    t("full thr=128 (1)") { full() }
    thr("131072"); t("full thr=128k (1)") { full() }
    thr("128"); t("full thr=128 (2)") { full() }
    thr("131072"); t("full thr=128k (2)") { full() }
    spark.stop()
  }
}
