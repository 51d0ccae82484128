package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FloatVecDistance

/** Microbench for the FloatVecDistance kernel in the three contexts
  * that matter: parquet scan (ColumnarArray), post-shuffle
  * (UnsafeArrayData), and under SafeRound. Throwaway dev probe. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = "/tmp/graft_kernelbench"
    val gen = spark.range(n).select(col("id"),
      expr("transform(sequence(1,64), i -> cast(pmod(id*i, 97)/97.0 + 0.01 as float))").as("a"),
      expr("transform(sequence(1,64), i -> cast(pmod(id*i+13, 101)/101.0 + 0.01 as float))").as("b"))
    gen.write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    def t(name: String)(f: => Any): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"[kb] $name: $best%.2f s  (${best * 32 * 1e9 / n}%.0f core-ns/eval)")
    }
    t("baseline scan (no kernel)") { df.agg(sum(size(col("a")))).collect() }
    t("scan cosine") { df.agg(sum(FloatVecDistance.cosine(col("a"), col("b")))).collect() }
    t("scan round(cosine)") { df.agg(sum(graft.functions.SafeRound.round(
      FloatVecDistance.cosine(col("a"), col("b")), 4))).collect() }
    val sh = df.repartition(32, col("id"))
    t("shuffled cosine") { sh.agg(sum(FloatVecDistance.cosine(col("a"), col("b")))).collect() }
    t("shuffled round(cosine)") { sh.agg(sum(graft.functions.SafeRound.round(
      FloatVecDistance.cosine(col("a"), col("b")), 4))).collect() }
    spark.stop()
  }
}
