package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement main: times the PQ codebook fit in isolation at
  * increasing corpus sizes (the IVF-fit CalibTimer twin). */
object PqTimer {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxBytes = args.map(GraftSession.dirBytes).max
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      maxBytes, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val n = Tables.embeddings(spark, dir).count()
      val t0 = System.nanoTime()
      val cbs = graft.operators.PqIndex.fitCodebooks(spark, dir)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir","n":$n,"subspaces":${cbs.length},"fit_sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
