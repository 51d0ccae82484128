package graft

import org.apache.spark.sql.SparkSession

/** Throwaway recall probe: capped containment vs the exact ground
  * truth at a scaled corpus (where the df cap actually engages). */
object ContProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf3")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      GraftSession.dirBytes(dir), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val capped = graft.operators.Dedup.containmentCapped(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    println(s"[probe] capped pairs: ${capped.size}")
    val exact = graft.operators.Dedup.containment(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    println(s"[probe] exact pairs: ${exact.size}")
    val wrong = capped.count { case (k, v) => !exact.get(k).contains(v) }
    println(f"[probe] recall: ${capped.size.toDouble / exact.size}%.4f  score-mismatch-or-extra: $wrong")
    spark.stop()
  }
}
