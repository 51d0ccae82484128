package graft

import org.apache.spark.sql.functions.col

/** One-off measurement probe for the IVF-PQ TARGET-ACCURACY spec
  * floor and the SURVEY §6 depth/recall table: composed-path recall@5
  * vs exact AND vs the full-probe composed result (pruning-only
  * recall — what the depth knob actually governs), per probe depth.
  * Run via Test/runMain graft.PqAccProbe <dir>. */
object PqAccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkTestSession.spark
    val (index, centroids) = graft.operators.IvfIndex.build(spark, dir)
    val npDef = graft.operators.IvfIndex.resolveNprobe(centroids.length, 0)
    val np90 = graft.operators.IvfIndex.calibrateNprobe(spark, index, centroids, dir, 0.9, k = 5)
    val np95 = graft.operators.IvfIndex.calibrateNprobe(spark, index, centroids, dir, 0.95, k = 5)
    val np100 = graft.operators.IvfIndex.calibrateNprobe(spark, index, centroids, dir, 1.0, k = 5)
    val queriesDf = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = graft.operators.IvfIndex.searchBatch(spark, index, centroids, queriesDf,
      k = 5, nprobe = centroids.length).collect().groupBy(_.getLong(0))
    def composedAt(np: Int): (Map[Long, Set[Long]], Double) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.IvfPq.knnIvfPqBatch(spark, dir, k = 5, nprobe = np)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      ((rows, (System.nanoTime() - t0) / 1e9))
    }
    def mean(rs: Iterable[Double]): Double = rs.sum / rs.size
    println(s"PQACC dir=$dir nlist=${centroids.length} npDef=$npDef np90=$np90 np95=$np95 np100=$np100")
    val (full, fullSec) = composedAt(centroids.length)
    val fullRecall = mean(full.map { case (q, ids) =>
      (ids & exact(q).map(_.getLong(1)).toSet).size / 5.0 })
    println(f"PQACC np=${centroids.length}%3d (full) recallExact=$fullRecall%.4f sec=$fullSec%.1f")
    Seq(npDef, np90, np95, np100).distinct.sorted.foreach { np =>
      val (rows, sec) = composedAt(np)
      val rEx = mean(rows.map { case (q, ids) => (ids & exact(q).map(_.getLong(1)).toSet).size / 5.0 })
      val rPrune = mean(rows.map { case (q, ids) => (ids & full(q)).size / 5.0 })
      println(f"PQACC np=$np%3d recallExact=$rEx%.4f pruneRecall=$rPrune%.4f sec=$sec%.1f")
    }
    // r11 co-selected (depth, shortlist): end-to-end recall must TRACK
    // the declared target — the calibration lower-bounds recall on the
    // capped sample, which at these corpus sizes IS the %50 serving
    // query set, so recallExact ≥ target up to re-rank tie rounding
    Seq(0.8, 0.9, 0.95).foreach { t =>
      val t0 = System.nanoTime()
      val rows = graft.operators.IvfPq.knnIvfPqBatch(spark, dir, k = 5,
        targetAcc = Some(t))
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      val rEx = mean(rows.map { case (q, ids) =>
        (ids & exact(q).map(_.getLong(1)).toSet).size / 5.0 })
      println(f"PQACC target=$t%.2f recallExact=$rEx%.4f sec=$sec%.1f")
    }
    // geometry column (r12): shortlist-at-target vs code size. m=16
    // (64-bit codes, dsub 4) has fewer ADC ties than the 32-bit
    // default, so the co-selected shortlist — the exact-re-rank cost
    // per query — should SHRINK at the same declared target.
    Seq(8, 16).foreach { m =>
      val (codes, cbs, offs) = graft.operators.PqIndex
        .buildResidual(spark, dir, index, centroids, None, m)
      Seq(0.9, 0.95).foreach { t =>
        val (np, sl) = graft.operators.IvfPq.calibrateComposed(
          spark, dir, index, centroids, codes, cbs, offs, t, 5, 50, None)
        val t0 = System.nanoTime()
        val rows = graft.operators.IvfPq.knnIvfPqBatch(spark, dir, k = 5,
          targetAcc = Some(t), m = m)
          .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val sec = (System.nanoTime() - t0) / 1e9
        val rEx = mean(rows.map { case (q, ids) =>
          (ids & exact(q).map(_.getLong(1)).toSet).size / 5.0 })
        println(f"PQACC m=$m%2d target=$t%.2f nprobe=$np shortlist=$sl recallExact=$rEx%.4f sec=$sec%.1f")
      }
    }
    spark.stop()
  }
}
