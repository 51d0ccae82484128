package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.FloatVecDistance

/** Product quantization (PQ) — the memory-compression scale path for
  * ANN serving (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the same trade the reference's vector
  * index family exposes through Oracle's quantized index options,
  * beside the INT8 storage already covered by `vs_knn_int8`).
  *
  * The 64-dim float vector (256 B) is compressed to ONE 32-bit code:
  * 8 subspaces × 8 dims, 16 codewords per subspace → 4 bits per
  * subspace, packed `code = Σ code_m << 4m`. That is 64× smaller than
  * the raw vector — at 100 TB of embeddings the codes table is ~1.6 TB
  * and fits executor memory fleet-wide, which is exactly why IVF-PQ is
  * the standard billion-vector serving layout.
  *
  * Spark shape:
  *  - build: one k-means|| fit per subspace over the corpus slice
  *    (distributed; 8 small fits, memoized like the IVF model);
  *    codebooks are 8×16×8 doubles — trivially broadcast.
  *  - encode: one narrow typed map per vector (argmin over 16
  *    codewords per subspace), emitting (vec_id, packed int).
  *  - search (ADC, asymmetric distance computation): the query builds
  *    a 8×16 lookup table of subspace distances DRIVER-side (128
  *    doubles, a literal), then each vector's approximate distance is
  *    `Σ_m table[m][(code >> 4m) & 15]` — a pure codegen expression
  *    over the packed int (shiftright/bitwise-and/element_at), no
  *    shuffle before the bounded top-k.
  *  - vectors are L2-NORMALIZED before encoding, so subspace-L2 ADC
  *    ranks by `‖q−x‖² = 2−2cos` — i.e. cosine order, matching the
  *    exact operators' metric.
  *
  * Rows-only (k-means is not SQL-reproducible); AnnSpec asserts
  * shortlist recall vs the exact top-k and that the re-ranked result
  * is deterministic.
  */
object PqIndex {
  val NumSubspaces = 8
  val NumCodewords = 16
  val Seed = 7L

  /** codebooks(m)(k) = the k-th codeword of subspace m (dsub doubles). */
  type Codebooks = Array[Array[Array[Double]]]

  private val built = scala.collection.concurrent.TrieMap
    .empty[(Int, String), (DataFrame, Codebooks)]

  private def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"),
        x => x.cast("double") / sqrt(aggregate(col("embedding"), lit(0.0d),
          (a, v) => a + v.cast("double") * v.cast("double")))).as("nvec"))

  /** Fit per-subspace codebooks and encode the corpus. Returns the
    * codes table (vec_id, code int) and the codebooks. Memoized per
    * (session, dir): the PQ index is a persistent artifact. */
  def build(s: SparkSession, dir: String): (DataFrame, Codebooks) =
    built.getOrElseUpdate((System.identityHashCode(s), dir), {
      val m = NumSubspaces
      val norm = normalized(Tables.embeddings(s, dir)).cache()
      val dim = norm.select(size(col("nvec"))).head().getInt(0)
      val dsub = dim / m
      val codebooks: Codebooks = (0 until m).toArray.map { mi =>
        val sliced = norm.select(
          array_to_vector(slice(col("nvec"), mi * dsub + 1, dsub)).as("features"))
        new KMeans().setK(NumCodewords).setSeed(Seed + mi).setMaxIter(20)
          .setFeaturesCol("features").setPredictionCol("cw")
          .fit(sliced).clusterCenters.map(_.toArray)
      }
      import s.implicits._
      val bc = s.sparkContext.broadcast(codebooks)
      val codes = norm.as[(Long, Seq[Double])].map { case (id, v) =>
        val cbs = bc.value
        var packed = 0
        var mi = 0
        while (mi < cbs.length) {
          val cb = cbs(mi)
          val off = mi * (v.length / cbs.length)
          var best = 0; var bestD = Double.MaxValue
          var k = 0
          while (k < cb.length) {
            var d = 0.0; var j = 0
            while (j < cb(k).length) {
              val diff = v(off + j) - cb(k)(j); d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = k }
            k += 1
          }
          packed |= best << (4 * mi)
          mi += 1
        }
        (id, packed)
      }.toDF("vec_id", "code")
      norm.unpersist()
      (codes, codebooks)
    })

  /** ADC scan: approximate distance of every code to `query` via the
    * driver-built 8×16 lookup table, as a single codegen expression
    * over the packed int. Returns (vec_id, adist). */
  def adcScores(codes: DataFrame, codebooks: Codebooks,
      query: Array[Double]): DataFrame = {
    val dsub = query.length / codebooks.length
    val table: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, mi) =>
      cb.toSeq.map { cw =>
        var d = 0.0; var j = 0
        while (j < dsub) { val diff = query(mi * dsub + j) - cw(j); d += diff * diff; j += 1 }
        d
      }
    }.toSeq
    // statically unrolled: 8 element_at lookups summed — a flat
    // codegen expression, no array materialization per row
    val score = table.zipWithIndex.map { case (sub, mi) =>
      element_at(typedLit(sub),
        (shiftright(col("code"), mi * 4).bitwiseAND(15) + 1).cast("int"))
    }.reduce(_ + _)
    codes.select(col("vec_id"), score.as("adist"))
  }

  private def queryVec(s: SparkSession, dir: String): Array[Double] = {
    val raw = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toArray
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  /** vs_knn_pq: ADC top-50 shortlist over the 4-byte codes, exact
    * cosine re-rank of the shortlist, top-10 — the standard
    * compressed-domain serving topology (scan codes, touch full
    * vectors only for the shortlist). */
  def knnPq(s: SparkSession, dir: String, k: Int = 10, shortlist: Int = 50): DataFrame = {
    val (codes, codebooks) = build(s, dir)
    val q = queryVec(s, dir)
    val cand = adcScores(codes.filter(col("vec_id") =!= 0), codebooks, q)
      .orderBy(col("adist"), col("vec_id"))
      .limit(shortlist)
    val qlit = array(q.map(d => lit(d.toFloat)).toIndexedSeq: _*).cast("array<float>")
    cand.join(Tables.embeddings(s, dir), "vec_id")
      .select(col("vec_id"),
        graft.functions.SafeRound.round(
          FloatVecDistance.cosine(col("embedding"), qlit), 4).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vs_knn_pq" -> ((s, dir) => knnPq(s, dir)))
  val oracleSql: Map[String, String] = Map.empty
}
