package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SafeRound.round

/** Raw-document directory ingestion — the reference's storage entry
  * point (/root/reference/scripts/setup/01_init.sql:33 `CREATE
  * DIRECTORY PDF_DOCS` + 01_pdf_to_vector.sql:111-115
  * `TO_BLOB(BFILENAME('PDF_DOCS', ...))`).
  *
  * Spark-first answer: no custom format needed — the built-in
  * `binaryFile` DataSourceV2 already reads a directory of opaque files
  * as (path, modificationTime, length, content) with partition-
  * parallel listing and a pushable pathGlobFilter. We wrap it into the
  * pdf_documents-shaped table and hand content to the (stubbed) decode
  * step, exactly the UTL_TO_TEXT boundary.
  *
  * At 100 TB this is the right ingestion topology: file listing is
  * distributed, each file is one task (or a stream of tasks with
  * maxFilesPerTrigger under readStream), and nothing is collected.
  */
object DocumentSource {

  /** Directory of raw files → pdf_documents-shaped frame:
    * (file_name, payload, n_bytes, mod_time_epoch). */
  def readDocumentsDir(s: SparkSession, dir: String, glob: String = "*"): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("content").as("payload"),
        col("length").as("n_bytes"),
        (col("modificationTime").cast("long")).as("mod_time_epoch"))

  /** UTL_TO_TEXT stub boundary: payload → text (UTF-8 decode here;
    * a real PDF/Doc extractor slots into this select). */
  def toText(df: DataFrame): DataFrame =
    df.withColumn("text", decode(col("payload"), "UTF-8"))

  /** End-to-end ingest demo: directory → binary table → text → stats.
    * Spec-covered (no parquet-table oracle exists for ad-hoc files). */
  def ingestStats(s: SparkSession, dir: String, glob: String = "*"): DataFrame =
    toText(readDocumentsDir(s, dir, glob))
      .agg(count(lit(1)).as("n_files"),
        sum("n_bytes").as("total_bytes"),
        round(avg(length(col("text"))), 2).as("avg_chars"))
}
