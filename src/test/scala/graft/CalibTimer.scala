package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, IvfIndex}

/** Dev measurement main (test scope, not library code): times
  * TARGET-ACCURACY calibration in ISOLATION at increasing corpus
  * sizes, to witness that the absolutely-capped sample keeps the
  * ground-truth pass linear in the corpus (SURVEY §6 — the r7
  * fractional sample made it N²/50). The index build is timed
  * separately so k-means cost doesn't pollute the calibration number.
  *
  * Usage: sbt "Test/runMain graft.CalibTimer <sfDir> [<sfDir> ...]"
  * Dirs need only embeddings.parquet (radius-mode calibration reads
  * nothing else).
  */
object CalibTimer {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // size the session for the LARGEST dir in the run: partitions
    // tuned to args.head alone would distort the later, bigger dirs —
    // the exact scaling witness this tool exists to produce
    val maxBytes = args.map(GraftSession.dirBytes).max
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true"),
      maxBytes, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val n = Tables.embeddings(spark, dir).count()
      val t0 = System.nanoTime()
      val (index, centroids) = IvfIndex.build(spark, dir)
      index.count() // materialize the fit + assignment before timing calibration
      val buildSec = (System.nanoTime() - t0) / 1e9
      val sample = IvfIndex.calibrationSample(spark, dir).count()
      val t1 = System.nanoTime()
      val np = IvfIndex.calibrateNprobe(spark, index, centroids, dir,
        targetAccuracy = 0.9, radius = Some(Dedup.CosRadius))
      val calibSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"dir":"$dir","n":$n,"nlist":${centroids.length},""" +
        f""""sample":$sample,"build_sec":$buildSec%.1f,""" +
        f""""calib_sec":$calibSec%.1f,"nprobe":$np}""")
    }
    spark.stop()
  }
}
