package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** md5-derived hashes reproducible bit-for-bit in any SQL engine.
  *
  * Spark's native `hash()`/`xxhash64()` are murmur3/xxhash with Spark's
  * seeding — fast, but not portable to the DuckDB correctness oracle.
  * Anywhere a hash value is *part of the result* (dedup keys, minhash
  * signatures, simhash bits, LSH bands) we derive it from md5 hex,
  * which every engine computes identically. Spark-internal sharding /
  * salting can still use `hash()`.
  *
  * The value is the first 8 hex chars of md5 as an unsigned 32-bit int
  * (range [0, 2^32), always non-negative in a Long) — uniform enough
  * for min-hashing and banding, cheap to reproduce in SQL:
  * DuckDB `('0x' || substr(md5(x), 1, 8))::UBIGINT`.
  */
object PortableHash {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  /** All four digest words of md5(str(c)) — the shared primitive
    * ([[Md5Words]]: raw-digest codegen, no hex/`conv` string work).
    * Values are bit-identical to the historical
    * conv(substring(md5(..), 8w+1, 8), 16, 10) chain. */
  private def words(strCol: Column): Column =
    toColumn(Md5Words(toExpr(strCol)))

  /** Unsigned-32-bit hash of a string column, as LongType. */
  def phash(c: Column): Column =
    element_at(words(c.cast("string")), 1)

  /** Seeded variant: independent hash family member `seed`. */
  def phash(c: Column, seed: Column): Column =
    phash(concat(seed.cast("string"), lit(":"), c.cast("string")))

  def phash(c: Column, seed: Int): Column = phash(c, lit(seed))

  /** DuckDB SQL fragment computing the same value. `expr` must be a
    * SQL expression of type VARCHAR.
    */
  def duckSql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 8)) AS UBIGINT)"

  def duckSql(expr: String, seed: Int): String =
    duckSql(s"'$seed' || ':' || ($expr)")

  /** Seed taken from a SQL expression (e.g. an unnested seed column). */
  def duckSqlDynSeed(expr: String, seedExpr: String): String =
    duckSql(s"($seedExpr)::VARCHAR || ':' || ($expr)")

  /** One md5 yields four independent 32-bit words (hex chars 1-8,
    * 9-16, 17-24, 25-32). Hash-hungry operators (minhash banding, the
    * hashing embedder) read multiple words per digest instead of
    * paying one md5 per hash — 4× fewer digests for the same number of
    * hash values. */
  def phashWord(c: Column, seed: Int, word: Int): Column = {
    require(word >= 0 && word < 4)
    // the 8 distinct Md5Words subtrees of a 32-expression minhash
    // array are deduplicated by codegen subexpression elimination —
    // one digest per (seed, row), exactly like the md5() calls the
    // previous conv/substring form relied on CSE for.
    element_at(words(concat(lit(seed.toString), lit(":"), c.cast("string"))),
      word + 1)
  }

  /** Driver-side (plain String) form of the same convention — for
    * query-literal hashing where no Column exists. */
  def phashWordLocal(s: String, seed: Int, word: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$s".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(word * 8, word * 8 + 8), 16)
  }

  def duckSqlWord(expr: String, seed: Int, word: Int): String =
    s"CAST(('0x' || substr(md5('$seed' || ':' || ($expr)), ${word * 8 + 1}, 8)) AS UBIGINT)"

  /** 64-bit portable hash for JOIN/DISTINCT keys that never appear in
    * results: digest words 0 and 1 packed as word0·2³² + word1. Spark
    * wraps mod 2⁶⁴ into a signed long while DuckDB keeps the unsigned
    * value — a bijection, so equality (and therefore every collision)
    * agrees across engines even though the representations differ.
    * 32-bit `phash` collides at ~2¹⁶ keys (birthday); shuffling
    * billions of shingles needs the 64-bit form. */
  def phash64(c: Column, seed: Int): Column = {
    val w = words(concat(lit(seed.toString), lit(":"), c.cast("string")))
    shiftleft(element_at(w, 1), 32).bitwiseOR(element_at(w, 2))
  }

  def duckSql64(expr: String, seed: Int): String =
    s"(${duckSqlWord(expr, seed, 0)} * 4294967296 + ${duckSqlWord(expr, seed, 1)})"
}
