package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SafeRound.round

import graft.Tables
import graft.functions.PortableHash

/** Embedding-model management — the Spark stand-in for the reference's
  * ONNX model registry (/root/reference/models/load_models.py:
  * DBMS_VECTOR.LOAD_ONNX_MODEL / DROP_ONNX_MODEL / USER_MINING_MODELS,
  * and models/models.json).
  *
  * Models here are deterministic hashing-trick embedders (the
  * container ships no ONNX runtime — by mandate the model itself is a
  * stand-in, the management surface and the embedding dataflow are
  * real). A loaded model is (name, dim, seeds); `embed` produces the
  * per-doc sparse weight table exactly like DocPipeline's embedder,
  * parameterized by the model.
  */
object ModelRegistry {

  final case class EmbedModel(name: String, dim: Int, seed: Int)

  /** Default catalog — mirrors models/models.json (one all-MiniLM
    * entry, 384-dim); a second smaller model exercises multi-model
    * management. */
  val catalog: Seq[EmbedModel] = Seq(
    EmbedModel("ALL_MINILM_L12_V2", 384, 101),
    EmbedModel("MINI_HASH_64", 64, 303))

  private val loaded = TrieMap.empty[String, EmbedModel]

  /** DBMS_VECTOR.LOAD_ONNX_MODEL equivalent. */
  def load(m: EmbedModel, force: Boolean = false): Boolean =
    if (force) { loaded.put(m.name, m); true }
    else loaded.putIfAbsent(m.name, m).isEmpty

  /** DBMS_VECTOR.DROP_ONNX_MODEL equivalent. */
  def drop(name: String): Boolean = loaded.remove(name).isDefined

  /** USER_MINING_MODELS equivalent. */
  def list(): Seq[String] = loaded.keys.toSeq.sorted

  def get(name: String): Option[EmbedModel] = loaded.get(name)

  /** Sparse embedding weights of each document under model `m`:
    * (doc_id, bucket, w). */
  def embed(s: SparkSession, dir: String, m: EmbedModel): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"),
        pmod(PortableHash.phashWord(col("token"), m.seed, 0), lit(m.dim)).as("bucket"))
      .agg(sum(PortableHash.phashWord(col("token"), m.seed, 1) % 2 * 2 - 1).as("w"))
      .filter(col("w") =!= 0)

  /** model_registry query: load the catalog, embed the corpus under
    * every loaded model, report per-model stats. */
  def registryReport(s: SparkSession, dir: String): DataFrame = {
    catalog.foreach(m => load(m, force = true))
    val frames = list().flatMap(get).map { m =>
      embed(s, dir, m)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nnz"),
          sqrt(sum(col("w") * col("w")).cast("double")).as("nrm"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg("nnz"), 4).as("avg_nnz"),
          round(avg("nrm"), 4).as("avg_norm"))
        .select(lit(m.name).as("model"), lit(m.dim.toLong).as("dim"),
          col("n_docs"), col("avg_nnz"), col("avg_norm"))
    }
    frames.reduce(_ unionAll _).orderBy("model")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "model_registry" -> (registryReport _))

  private def modelSql(m: EmbedModel): String =
    s"""SELECT '${m.name}' AS model, CAST(${m.dim} AS BIGINT) AS dim,
       |  count(*) AS n_docs, round(1e-9 + avg(nnz), 4) AS avg_nnz,
       |  round(1e-9 + avg(nrm), 4) AS avg_norm
       |FROM (
       |  SELECT doc_id, count(*) AS nnz, sqrt(sum(w * w)::DOUBLE) AS nrm
       |  FROM (
       |    SELECT doc_id,
       |      CAST(${PortableHash.duckSqlWord("token", m.seed, 0)} % ${m.dim} AS BIGINT) AS bucket,
       |      sum(CAST(${PortableHash.duckSqlWord("token", m.seed, 1)} % 2 AS BIGINT) * 2 - 1) AS w
       |    FROM (
       |      SELECT doc_id, unnest(list_filter(
       |        regexp_split_to_array(lower(trim(text)), '\\s+'),
       |        tok -> length(tok) > 0)) AS token
       |      FROM documents)
       |    GROUP BY 1, 2)
       |  WHERE w <> 0 GROUP BY doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "model_registry" ->
      catalog.sortBy(_.name).map(modelSql)
        .mkString("", "\nUNION ALL\n", "\nORDER BY model"))
}
