package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SafeRound.round

import graft.Tables
import graft.functions.FloatVecDistance

/** Random-hyperplane (SimHash-for-vectors) LSH over embeddings — the
  * blocked scale path for embedding near-dup detection. `Dedup
  * .embedding` is the exact-threshold baseline; this variant bounds
  * the pair space by banding a 24-bit hyperplane sketch so the
  * self-join is an equi-join on (band, key): at N vectors the
  * candidate set is ~N·collisions, not N².
  *
  * Hyperplanes are deterministic Rademacher (±1) vectors derived from
  * md5 — no RNG state, so every run (and every executor) agrees.
  * Sketching is a typed mapPartitions over primitive arrays (this is
  * genuinely per-element imperative work; a 24×dim matrix multiply per
  * row has no better Catalyst shape).
  */
object EmbeddingLsh {
  val NumBits = 24
  val BandBits = 4
  val NumBands: Int = NumBits / BandBits
  val Radius: Double = Dedup.CosRadius

  /** Deterministic ±1 from md5("bit:i"). */
  private[operators] def rademacher(bit: Int, i: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$bit:$i".getBytes(StandardCharsets.UTF_8))
    if ((d(0) & 1) == 0) 1.0 else -1.0
  }

  private def planes(dim: Int): Array[Array[Double]] =
    Array.tabulate(NumBits, dim)((b, i) => rademacher(b, i))

  private[operators] def sketch(v: Array[Float], pl: Array[Array[Double]]): Int = {
    var sk = 0
    var b = 0
    while (b < NumBits) {
      var acc = 0.0; var i = 0
      val p = pl(b)
      while (i < v.length && i < p.length) { acc += v(i) * p(i); i += 1 }
      if (acc > 0) sk |= (1 << b)
      b += 1
    }
    sk
  }

  /** Near-dup pairs via banded sketch candidates + exact verification.
    * Same output shape as dedup_embedding; recall asserted in spec. */
  def pairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val pl = planes(dim)
    val sketches = emb.as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, sketch(v, pl)) })
      .toDF("vec_id", "sk")
    val bands = sketches.select(col("vec_id"), col("sk"),
      explode(sequence(lit(0), lit(NumBands - 1))).as("band"))
      .withColumn("bkey", expr(s"shiftrightunsigned(sk, band * $BandBits)") % (1 << BandBits))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    // verify candidates with the exact kernel
    cands
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(FloatVecDistance.cosine(col("ea"), col("eb")), 4).as("dist"))
      .filter(col("dist") <= Radius)
      .orderBy("vec_a", "vec_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_embedding_lsh" -> (pairs _))
  val oracleSql: Map[String, String] = Map.empty
}
