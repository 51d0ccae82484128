package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * The k-means FIT stays spec-only (not SQL-reproducible), but the
  * serving path IS oracle-checked: `build` persists the codes and
  * codebooks as parquet artifacts (the real at-rest index layout),
  * and the DuckDB oracle reads them back and independently reproduces
  * the whole ADC topology — normalized query, 8×16 subspace distance
  * table, packed-code unpack via shift/mask, top-50 shortlist, exact
  * cosine re-rank. AnnSpec additionally asserts shortlist recall vs
  * the exact top-k and build determinism.
  */
object PqIndex {
  val NumSubspaces = 8
  val NumCodewords = 16
  val Seed = 7L

  /** At-rest location of the persisted index artifacts (codes +
    * codebooks) for a given corpus dir; the oracle SQL is bound to the
    * same path via the __PQDIR__ placeholder in SparkEntry. */
  def dumpDir(dir: String): String = graft.functions.Scratch.pathOf("pq", dir)

  /** codebooks(m)(k) = the k-th codeword of subspace m (dsub doubles). */
  type Codebooks = Array[Array[Array[Double]]]

  /** Memoized per (session, dir); entries of stopped sessions are
    * evicted on every build call (same hygiene as IvfIndex.built —
    * a long-lived JVM cycling sessions must not pin dead frames). */
  private val built = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, Codebooks)]

  private[graft] def cacheSize: Int = built.size
  private[graft] def clearCache(): Unit = built.clear()

  private def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"),
        x => x.cast("double") / sqrt(aggregate(col("embedding"), lit(0.0d),
          (a, v) => a + v.cast("double") * v.cast("double")))).as("nvec"))

  /** Fit the per-subspace codebooks on an already-normalized frame.
    * NOT memoized — AnnSpec fits twice to assert that a fixed seed on
    * fixed data yields bit-identical codebooks, the reproducibility
    * property an incremental 100 TB index rebuild relies on. */
  private[graft] def fitOn(norm: DataFrame, dim: Int): Codebooks = {
    val m = NumSubspaces
    val dsub = dim / m
    (0 until m).toArray.map { mi =>
      val sliced = norm.select(
        array_to_vector(slice(col("nvec"), mi * dsub + 1, dsub)).as("features"))
      new KMeans().setK(NumCodewords).setSeed(Seed + mi).setMaxIter(20)
        .setFeaturesCol("features").setPredictionCol("cw")
        .fit(sliced).clusterCenters.map(_.toArray)
    }
  }

  /** Convenience: normalize + fit, from scratch every call. */
  def fitCodebooks(s: SparkSession, dir: String): Codebooks = {
    val norm = normalized(Tables.embeddings(s, dir)).cache()
    val dim = norm.select(size(col("nvec"))).head().getInt(0)
    val out = fitOn(norm, dim)
    norm.unpersist()
    out
  }

  /** Fit per-subspace codebooks and encode the corpus. Returns the
    * codes table (vec_id, code int) and the codebooks. Memoized per
    * (session, dir): the PQ index is a persistent artifact. */
  def build(s: SparkSession, dir: String): (DataFrame, Codebooks) = {
    built.keys.filter(_._1.sparkContext.isStopped).foreach(built.remove)
    built.getOrElseUpdate((s, dir), {
      val norm = normalized(Tables.embeddings(s, dir)).cache()
      val dim = norm.select(size(col("nvec"))).head().getInt(0)
      val codebooks: Codebooks = fitOn(norm, dim)
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
      // persist the index artifacts: the codes table is the 4-byte
      // at-rest layout (what a 100 TB deployment keeps resident), the
      // codebooks are its 8×16×8-double dictionary. The returned codes
      // frame reads the artifact back, so every consumer — and the
      // DuckDB oracle — scans the same persisted bytes.
      val dump = dumpDir(dir)
      // the codes table is O(corpus): write it sharded across an
      // EXPLICIT partition count (an expression-only repartition lets
      // AQE coalesce a small shuffle back to one task — the exact
      // failure mode this guards against). The shuffle moves 12-byte
      // rows — noise next to the encode.
      val shards = s.conf.get("spark.sql.shuffle.partitions").toInt
      codes.repartition(shards, col("vec_id"))
        .write.mode("overwrite").parquet(s"$dump/codes.parquet")
      val cbRows = for {
        (cb, mi) <- codebooks.zipWithIndex.toSeq
        (cw, k) <- cb.zipWithIndex
      } yield (mi, k, cw.toSeq)
      cbRows.toDF("mi", "k", "cw")
        .coalesce(1).write.mode("overwrite").parquet(s"$dump/codebooks.parquet")
      norm.unpersist()
      (s.read.parquet(s"$dump/codes.parquet"), codebooks)
    })
  }

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

  /** Batch-ADC support: the per-query lookup table as DATA instead of
    * a driver-built literal. Returns (qid, adc) with adc the flat
    * `NumSubspaces × NumCodewords`-double array
    * `adc(mi*NumCodewords + k) = ‖nq_sub(mi) − cw(mi)(k)‖²` over the
    * L2-NORMALIZED query. Built once per QUERY row — the frame is
    * answer-sized (|queries| rows, broadcastable at any corpus size),
    * so the interpreted higher-order functions here are fine; the
    * corpus-sized per-candidate work stays the codegen expression in
    * [[adcScoreOver]]. Left-to-right double accumulation over j, the
    * same order as the driver-side table in [[adcScores]].
    *
    * PERSIST the result before joining it against a corpus-sized
    * side: the returned frame is lazy, and a broadcast join's
    * build-side projection is evaluated per MATCH — without a
    * materialization boundary these interpreted lambdas run once per
    * joined candidate row, not once per query (measured 7.3 → 0.7 s
    * on the sf1 candidate stream; [[IvfPq.knnIvfPqBatch]] routes this
    * through DfCache). */
  def adcTable(queriesDf: DataFrame, codebooks: Codebooks): DataFrame = {
    val dsub = codebooks(0)(0).length
    val cbLit = typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val nq = transform(col("qv"),
      x => x.cast("double") / sqrt(aggregate(col("qv"), lit(0.0d),
        (a, v) => a + v.cast("double") * v.cast("double"))))
    queriesDf
      .select(col("qid"), nq.as("nq"))
      .select(col("qid"),
        flatten(transform(cbLit, (cbm, mi) =>
          transform(cbm, cw =>
            aggregate(
              zip_with(slice(col("nq"), mi * lit(dsub) + 1, lit(dsub)), cw,
                (a, b) => (a - b) * (a - b)),
              lit(0.0d), (acc, x) => acc + x)))).as("adc"))
  }

  /** Approximate distance of a packed `code` against a per-row `adc`
    * lookup-table COLUMN — the batch twin of the static-literal unroll
    * in [[adcScores]]: `Σ_m adc[m*NumCodewords + ((code >> 4m) & 15)]`,
    * a flat codegen expression (8 element_at lookups on the joined
    * array, no per-row array construction), summed in the same mi
    * order as the single-query form. */
  def adcScoreOver(adc: Column, code: Column): Column =
    (0 until NumSubspaces).map { mi =>
      element_at(adc,
        (shiftright(code, mi * 4).bitwiseAND(15) + lit(mi * NumCodewords) + 1).cast("int"))
    }.reduce(_ + _)

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
    // exact re-rank against the RAW query row — the identical
    // formulation (and therefore identical rounded doubles) as
    // vs_knn_cosine, which the oracle's dCosine fragment mirrors.
    val qdf = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    cand.join(Tables.embeddings(s, dir), "vec_id")
      .crossJoin(broadcast(qdf))
      .select(col("vec_id"),
        graft.functions.SafeRound.round(
          FloatVecDistance.cosine(col("embedding"), col("qv")), 4).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vs_knn_pq" -> ((s, dir) => knnPq(s, dir)))

  /** DuckDB oracle over the persisted index artifacts: reproduces the
    * ADC serving path end-to-end from the SAME codes/codebooks parquet
    * Spark scans (__PQDIR__ is bound to dumpDir(sfDir) by SparkEntry).
    * The 1-ulp-scale arithmetic differences between the two engines'
    * distance sums sit far below the ADC distance gaps, so shortlist
    * membership and the rounded re-rank agree exactly. */
  val oracleSql: Map[String, String] = Map(
    "vs_knn_pq" ->
      s"""WITH qn AS (
         |  SELECT [x::DOUBLE / sqrt(list_sum([y::DOUBLE * y::DOUBLE for y in embedding]))
         |          for x in embedding] AS nq
         |  FROM embeddings WHERE vec_id = 0),
         |cb AS (SELECT mi, k, cw FROM read_parquet('__PQDIR__/codebooks.parquet/*.parquet')),
         |tab AS (
         |  SELECT mi, k,
         |    list_sum([(nq[mi * (len(nq) // ${NumSubspaces}) + j] - cw[j])
         |              * (nq[mi * (len(nq) // ${NumSubspaces}) + j] - cw[j])
         |              for j in generate_series(1, len(cw))]) AS d
         |  FROM cb, qn),
         |codes AS (
         |  SELECT vec_id, code
         |  FROM read_parquet('__PQDIR__/codes.parquet/*.parquet') WHERE vec_id <> 0),
         |adist AS (
         |  SELECT c.vec_id, sum(t.d) AS adist
         |  FROM codes c JOIN tab t ON ((c.code >> (4 * t.mi)) & 15) = t.k
         |  GROUP BY 1),
         |short AS (SELECT vec_id FROM adist ORDER BY adist, vec_id LIMIT 50),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(1e-9 + ${VectorSearch.dCosine("e.embedding", "qv")}, 4) AS dist
         |FROM embeddings e JOIN short USING (vec_id), q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin)
}
