package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SafeRound.round

import graft.Tables
import graft.functions.FloatVecDistance

/** IVF (inverted-file) approximate nearest neighbor — the Spark
  * re-expression of the reference's vector index
  * (/root/reference/scripts/01_pdf_to_vector.sql:93-97:
  * `ORGANIZATION NEIGHBOR PARTITIONS DISTANCE COSINE WITH TARGET
  * ACCURACY 95`). Oracle's "neighbor partitions" IS ivf: k-means
  * cluster centroids partition the vector space; a query probes only
  * the nearest partitions; target-accuracy tunes how many.
  *
  * On Spark the index is *data layout*, not a file structure:
  *  - build: k-means|| (MLlib) fits centroids — a few passes over the
  *    data, all distributed; assignment is one narrow map with the
  *    broadcast centroid set; the result is repartitioned by
  *    centroid id (at rest: a centroid-partitioned parquet table).
  *  - probe: rank centroids against the query driver-side (k floats,
  *    tiny), take nprobe, push `centroid IN (...)` down — on the
  *    partitioned layout that is partition pruning: only
  *    nprobe/k of the data is scanned, then the exact codegen kernel
  *    scores survivors and TakeOrderedAndProject yields top-k.
  */
object IvfIndex {
  val NumCentroids = 16
  val NumProbe = 4
  val Seed = 42L

  /** Fit centroids on `emb` (k-means||, cosine). The model is the
    * reusable "index definition": batch builds and streaming upserts
    * both assign with it. */
  def fitModel(emb: DataFrame, k: Int = NumCentroids): org.apache.spark.ml.clustering.KMeansModel =
    new KMeans()
      .setK(k).setSeed(Seed).setMaxIter(20)
      .setDistanceMeasure("cosine")
      .setFeaturesCol("features").setPredictionCol("centroid_id")
      .fit(emb.withColumn("features", array_to_vector(col("embedding"))))

  /** Assign every vector of `emb` to its nearest centroid — one narrow
    * map with the broadcast centroid set; works identically on a batch
    * frame and a micro-batch inside foreachBatch. */
  def assign(model: org.apache.spark.ml.clustering.KMeansModel, emb: DataFrame): DataFrame =
    model.transform(emb.withColumn("features", array_to_vector(col("embedding"))))
      .select(col("vec_id"), col("embedding"), col("centroid_id"))

  /** Assign every vector to its (cosine) nearest centroid; the
    * returned frame is the index: repartitioned on centroid_id. */
  def build(s: SparkSession, dir: String,
      k: Int = NumCentroids): (DataFrame, Array[Array[Double]]) = {
    val emb = Tables.embeddings(s, dir)
    val model = fitModel(emb, k)
    val indexed = assign(model, emb).repartition(col("centroid_id"))
    (indexed, model.clusterCenters.map(_.toArray))
  }

  private def cosineDist(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Probe: top-k by cosine among the nprobe nearest centroids'
    * partitions only. */
  def search(s: SparkSession, index: DataFrame, centroids: Array[Array[Double]],
      query: Array[Float], k: Int, nprobe: Int = NumProbe): DataFrame = {
    val q = query.map(_.toDouble)
    val probes = centroids.zipWithIndex
      .map { case (c, i) => (i, cosineDist(c, q)) }
      .sortBy { case (i, d) => (d, i) }
      .take(nprobe).map(_._1)
    // centroid IN (...) on the partitioning column = partition pruning.
    val qlit = array(query.map(f => lit(f)).toIndexedSeq: _*).cast("array<float>")
    index.filter(col("centroid_id").isin(probes.toIndexedSeq: _*))
      .select(col("vec_id"),
        round(FloatVecDistance.cosine(col("embedding"), qlit), 4).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Persist the index in its at-rest form: parquet partitioned by
    * centroid_id. A probe against this layout is partition pruning —
    * `.explain` shows the centroid filter in PartitionFilters and only
    * nprobe/k of the files are listed, which is the 100 TB story. */
  def writeIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  def readIndex(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** vs_knn_ivf: approximate top-10 for the vec_id=0 query vector.
    * Rows-only check (k-means assignment isn't SQL-reproducible);
    * recall vs the exact vs_knn_cosine is asserted in IvfSpec. */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val (index, centroids) = build(s, dir)
    val query = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    search(s, index.filter(col("vec_id") =!= 0), centroids, query, k = 10)
  }

  /** Batch serving against the IVF layout: a TABLE of query vectors,
    * each probing only its nprobe nearest centroids' partitions.
    * Centroid ranking happens driver-side (queries × k centroids of
    * floats — tiny); the data side is one equi-join of the (query,
    * probed-centroid) pairs against the centroid-partitioned index —
    * partition pruning expressed as a join key — then the exact kernel
    * and a bounded top-k agg per query. Rows-only (k-means); AnnSpec
    * asserts the full-probe form equals brute force per query. */
  def searchBatch(s: SparkSession, index: DataFrame,
      centroids: Array[Array[Double]],
      queriesDf: DataFrame, k: Int, nprobe: Int = NumProbe): DataFrame = {
    import s.implicits._
    val qs = queriesDf.select(col("qid"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probePairs = qs.flatMap { case (qid, qv) =>
      val q = qv.map(_.toDouble)
      centroids.zipWithIndex
        .map { case (c, i) => (i, cosineDist(c, q)) }
        .sortBy { case (i, d) => (d, i) }
        .take(nprobe).map { case (cid, _) => (qid, cid) }
    }.toSeq.toDF("qid", "centroid_id")
    val qvs = qs.toSeq.toDF("qid", "qv")
    index
      .join(broadcast(probePairs), "centroid_id")
      .join(broadcast(qvs), "qid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.SafeRound.round(
          FloatVecDistance.cosine(col("embedding"), col("qv")), 4).as("dist"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topkByDist(col("dist"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.dist").as("dist"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  /** vs_knn_ivf_batch: every 50th vector served against the IVF
    * layout with nprobe pruning. */
  def knnIvfBatch(s: SparkSession, dir: String): DataFrame = {
    val (index, centroids) = build(s, dir)
    val queriesDf = Tables.embeddings(s, dir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    searchBatch(s, index, centroids, queriesDf, k = 5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vs_knn_ivf" -> (knnIvf _),
    "vs_knn_ivf_batch" -> (knnIvfBatch _))
  val oracleSql: Map[String, String] = Map.empty
}
