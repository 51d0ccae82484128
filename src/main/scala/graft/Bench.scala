package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions derived from input size (floored at cpus —
    // at local SFs that resolves to exactly `cpus`, at 100 TB it
    // resolves to bytes/128MiB; see GraftSession).
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      GraftSession.dirBytes(sfDir), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet footer caches, so the
    // first timed query doesn't absorb JVM startup.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // min of two timed runs per query: the host is a shared box and a
    // single run can absorb an order-of-magnitude noise spike.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failed = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => failed = true }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query reports its elapsed-to-failure time NEGATED so a
      // broken query can't masquerade as a fast one
      (name, if (failed) -times.min else times.min, failed)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, _, true) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, false) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedNames,"sf":"$sfDir"}""")
    spark.stop()
  }
}
