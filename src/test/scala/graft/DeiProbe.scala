package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IvfIndex}
import graft.functions.FloatVecDistance

/** Throwaway decomposition probe for dedup_embedding_ivf stage costs. */
object DeiProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
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
    val probes = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val np = IvfIndex.defaultNprobe(centroids.length)
    t("probePairs only") { IvfIndex.probePairs(spark, probes, centroids, np).count() }
    val pp = IvfIndex.probePairs(spark, probes, centroids, np).join(probes, "qid")
    t("pp join") { pp.count() }
    val scored = index.join(pp, "centroid_id")
      .filter(col("qid") =!= col("vec_id"))
      .select(least(col("qid"), col("vec_id")).as("vec_a"),
        greatest(col("qid"), col("vec_id")).as("vec_b"),
        graft.functions.SafeRound.round(
          FloatVecDistance.cosine(col("embedding"), col("qv")), 4).as("dist"))
    val nCand = t("candidates+kernel (count only)") { scored.count() }
    println(s"[probe] candidate rows: $nCand")
    val surv = scored.filter(col("dist") <= Dedup.CosRadius)
    val nSurv = t("+radius filter") { surv.count() }
    println(s"[probe] surviving rows: $nSurv")
    surv.collect()
    val ep = surv.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    println("[probe] kernel stage codegen: " +
      ep.linesIterator.filter(l => l.contains("vec_cosine") || l.contains("Filter"))
        .take(4).mkString(" || "))
    t("+distinct") { surv.distinct().count() }
    // control: same 34M kernel evals but in a PROJECTION feeding an
    // agg (mining's shape) — no filter pushed into the join condition
    val proj = index.join(pp, "centroid_id")
      .filter(col("qid") =!= col("vec_id"))
      .select(graft.functions.SafeRound.round(
        FloatVecDistance.cosine(col("embedding"), col("qv")), 4).as("dist"))
      .agg(sum(col("dist")))
    t("kernel-in-projection (agg)") { proj.collect() }
    // control 2: explicit repartition of the pair table so AQE can't
    // coalesce the stream side of the explosion join to ~1 partition
    val shards = spark.conf.get("spark.sql.shuffle.partitions").toInt
    println(s"[probe] shuffle.partitions=$shards parallelism=${spark.sparkContext.defaultParallelism}")
    val pp32 = IvfIndex.probePairs(spark, probes, centroids, np)
      .repartition(shards, col("qid")).join(probes, "qid")
    val surv32 = index.join(pp32, "centroid_id")
      .filter(col("qid") =!= col("vec_id"))
      .select(least(col("qid"), col("vec_id")).as("vec_a"),
        greatest(col("qid"), col("vec_id")).as("vec_b"),
        graft.functions.SafeRound.round(
          FloatVecDistance.cosine(col("embedding"), col("qv")), 4).as("dist"))
      .filter(col("dist") <= Dedup.CosRadius)
    t("repartitioned radius filter") { surv32.count() }
    t("repartitioned radius filter again") { surv32.count() }
    // control 3: kernel WITHOUT round — is Spark's round the cost?
    val noRound = index.join(pp, "centroid_id")
      .filter(col("qid") =!= col("vec_id"))
      .filter(FloatVecDistance.cosine(col("embedding"), col("qv")) <= Dedup.CosRadius)
    t("kernel-only filter (no round)") { noRound.count() }
    // control 5: two-phase radius — unrounded prefilter first, exact
    // rounded filter second; pushdown merges both into the join
    // condition where && short-circuits, so round() runs only on
    // prefilter survivors
    val two = index.join(pp, "centroid_id")
      .filter(col("qid") =!= col("vec_id"))
      .filter(graft.functions.SafeRound.radiusPrefilter(
        FloatVecDistance.cosine(col("embedding"), col("qv")), Dedup.CosRadius))
      .select(least(col("qid"), col("vec_id")).as("vec_a"),
        greatest(col("qid"), col("vec_id")).as("vec_b"),
        graft.functions.SafeRound.round(
          FloatVecDistance.cosine(col("embedding"), col("qv")), 4).as("dist"))
      .filter(col("dist") <= Dedup.CosRadius)
    val nTwo = t("two-phase radius filter") { two.count() }
    println(s"[probe] two-phase rows: $nTwo (expect $nSurv)")
    // control 4: round of a cheap expression — round cost alone
    val roundOnly = index.join(pp, "centroid_id")
      .filter(col("qid") =!= col("vec_id"))
      .filter(graft.functions.SafeRound.round(
        col("vec_id").cast("double") / 1e9, 4) <= 0.55)
    t("round-only filter (no kernel)") { roundOnly.count() }
    t("+orderBy (full op)") { IvfIndex.dedupPairsAt(spark, dir, index, centroids, 0).count() }
    t("full op again") { IvfIndex.dedupPairsAt(spark, dir, index, centroids, 0).count() }
    spark.stop()
  }
}
