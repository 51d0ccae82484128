package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each entry in `queries` is one operator from the inventory; each
  * entry in `oracleSql` is the DuckDB-runnable equivalent over the
  * same parquet tables (identical column names, rounding, and total
  * ordering, so the driver's hash compare is deterministic).
  */
object SparkEntry {

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Analytics.queries, Analytics.oracleSql),
      (Analytics2.queries, Analytics2.oracleSql),
      (Analytics3.queries, Analytics3.oracleSql),
      (VectorSearch.queries, VectorSearch.oracleSql),
      (BinaryVector.queries, BinaryVector.oracleSql),
      (DocPipeline.queries, DocPipeline.oracleSql),
      (BpeTokenizer.queries, BpeTokenizer.oracleSql),
      (Dedup.queries, Dedup.oracleSql),
      (UrlDedup.queries, UrlDedup.oracleSql),
      (TextAnalysis.queries, TextAnalysis.oracleSql),
      (Multimodal.queries, Multimodal.oracleSql),
      (graft.streaming.Streaming.queries, graft.streaming.Streaming.oracleSql),
      (graft.streaming.IvfStream.queries, graft.streaming.IvfStream.oracleSql),
      (graft.streaming.DedupStream.queries, graft.streaming.DedupStream.oracleSql),
      (IvfIndex.queries, IvfIndex.oracleSql),
      (PqIndex.queries, PqIndex.oracleSql),
      (IvfPq.queries, IvfPq.oracleSql),
      (HybridSearch.queries, HybridSearch.oracleSql),
      (Pipeline.queries, Pipeline.oracleSql),
      (CrawlPipeline.queries, CrawlPipeline.oracleSql),
      (MediaPipeline.queries, MediaPipeline.oracleSql),
      (TrainingPipeline.queries, TrainingPipeline.oracleSql),
      (EmbeddingLsh.queries, EmbeddingLsh.oracleSql),
      (ModelRegistry.queries, ModelRegistry.oracleSql),
      (graft.sources.Interchange.queries, graft.sources.Interchange.oracleSql),
      (graft.sources.MediaProbe.queries, graft.sources.MediaProbe.oracleSql),
      (graft.sources.PngCodec.queries, graft.sources.PngCodec.oracleSql),
      (graft.sources.WavCodec.queries, graft.sources.WavCodec.oracleSql),
      (graft.sources.GifCodec.queries, graft.sources.GifCodec.oracleSql),
      (graft.sources.JpegCodec.queries, graft.sources.JpegCodec.oracleSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's headline flow end-to-end: documents →
    * chunks → embeddings → top-k chunk retrieval. */
  def entry(spark: SparkSession): DataFrame =
    DocPipeline.chunkKnn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.map(_._1).reduce(_ ++ _)

  /** Default SF for `oracleSql` when no explicit dir is given (the
    * driver's correctness gate runs Verify at sf0.01). Verify itself
    * emits `oracleSqlFor(itsActualSfDir)` so the SQL always targets
    * the same data the Spark side read. */
  val OracleSfDir = "/root/testdata/sf0.01"

  /** Prepend CTEs binding each referenced table name to its parquet
    * path under `sfDir`, leaving the query body untouched (CTEs shadow
    * any views the harness may or may not have registered — TESTDATA.md
    * lists only the TPC-H tables; documents/embeddings registration is
    * unspecified). */
  private def pathify(sfDir: String, sql: String): String = {
    val used = Tables.names.filter(n => ("\\b" + n + "\\b").r.findFirstIn(sql).isDefined)
    if (used.isEmpty) sql
    else {
      val defs = used.map(n =>
        s"$n AS (SELECT * FROM read_parquet('$sfDir/$n.parquet'))").mkString(",\n")
      val body = sql.trim
      // RECURSIVE is a modifier of the whole WITH list and must stay
      // first; non-recursive CTEs (the table bindings) are legal in a
      // RECURSIVE list.
      if (body.take(15).equalsIgnoreCase("WITH RECURSIVE "))
        s"WITH RECURSIVE $defs,\n${body.drop(15)}"
      else if (body.take(5).equalsIgnoreCase("WITH ")) s"WITH $defs,\n${body.drop(5)}"
      else s"WITH $defs\n$body"
    }
  }

  /** Oracle SQL with table paths bound to `sfDir`; __PQDIR__,
    * __PQRDIR__ and __IVFDIR__ bind to the index-artifact dumps for
    * the same sfDir (the flat/residual codes+codebooks and the
    * assignment/centroid parquet that PqIndex.build /
    * PqIndex.buildResidual / IvfIndex.build persist before the oracle
    * runs). */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    groups.iterator.map(_._2).reduce(_ ++ _).map { case (k, v) =>
      k -> pathify(sfDir, v
        .replace("__PQRDIR__", operators.PqIndex.resDumpDir(sfDir))
        .replace("__PQDIR__", operators.PqIndex.dumpDir(sfDir))
        .replace("__IVFDIR__", operators.IvfIndex.dumpDir(sfDir))
        .replace("__IVFSDIR__", s"${streaming.IvfStream.scratchRoot(sfDir)}/dump")
        .replace("__BPEDIR__", operators.BpeTokenizer.dumpDir(sfDir)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleSqlFor(OracleSfDir)
}
