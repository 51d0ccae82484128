package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Measurement aid (guide §1): run selected queries once with
  * per-phase wall timers and, for streaming queries, dump every
  * StreamingQueryProgress durationMs map — the breakdown of where a
  * micro-batch spends its time (addBatch / walCommit / stateStore
  * commit / getBatch / latestOffset). Plain stdout tool; not part of
  * the driver contract.
  * Usage: runMain graft.tools.StreamProbe [sfDir] [query ...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("stream_dedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      graft.GraftSession.dirBytes(sfDir), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // progress listener: print each finished batch's duration breakdown
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[probe] batch=${e.progress.batchId} durationMs=${e.progress.durationMs} rows=${e.progress.numInputRows}")
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    // warmup like Bench
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      val t1 = System.nanoTime()
      println(f"[probe] $n total=${(t1 - t0) / 1e9}%.3f s rows=$cnt")
    }
    spark.stop()
  }
}
