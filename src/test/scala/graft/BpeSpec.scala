package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTokenizer

/** Pins the BPE semantics `doc_chunk_bpe`'s oracle replay depends on:
  * leftmost non-overlapping merge application, the equivalence of the
  * single-pass scan (Spark side) with one-occurrence-at-a-time
  * leftmost splicing (the DuckDB recursive CTE), codepoint symbol
  * splitting, and determinism + persistence of the learned table. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def am(syms: Seq[String], a: String, b: String): Seq[String] =
    BpeTokenizer.applyMerge(syms.toArray, a, b).toSeq

  test("applyMerge: leftmost non-overlapping, self-pair runs") {
    assert(am(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(am(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("aa", "aa", "a"))
    assert(am(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(am(Seq("b", "a", "b"), "a", "b") == Seq("b", "ab"))
    assert(am(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(am(Seq("x"), "a", "b") == Seq("x"))
    assert(am(Nil, "a", "b") == Nil)
  }

  test("single-pass scan == one-at-a-time leftmost splice (the replay's step)") {
    // the oracle merges ONE leftmost occurrence per recursion step
    // until the pattern is gone; prove it converges to the same
    // segmentation as the Spark side's single pass
    def oneAtATime(syms0: Seq[String], a: String, b: String): Seq[String] = {
      var syms = syms0
      var i = syms.indexOfSlice(Seq(a, b))
      while (i >= 0) {
        syms = syms.take(i) ++ Seq(a + b) ++ syms.drop(i + 2)
        i = syms.indexOfSlice(Seq(a, b))
      }
      syms
    }
    val words = Seq("aaaa", "aaaaa", "abab", "aabba", "banana", "xaaay",
      "mississippi", "tttttttt", "abcabcabc")
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("s", "s"),
      ("t", "t"), ("n", "a"))
    for (w <- words; (a, b) <- pairs) {
      val syms = BpeTokenizer.symbols(w).toSeq
      assert(am(syms, a, b) == oneAtATime(syms, a, b), s"($w, $a+$b)")
    }
  }

  test("symbols split by codepoint (astral-safe)") {
    assert(BpeTokenizer.symbols("héllo").toSeq == Seq("h", "é", "l", "l", "o"))
    assert(BpeTokenizer.symbols("a🙂b").toSeq == Seq("a", "🙂", "b"))
    assert(BpeTokenizer.symbols("").isEmpty)
  }

  test("learning is deterministic, persists the ranked table, and compresses") {
    val merges = BpeTokenizer.learnMerges(spark, sf)
    assert(merges.nonEmpty && merges.length <= BpeTokenizer.NumMerges)
    // the dump the oracle replays exists and matches what learning returned
    val dumped = spark.read
      .parquet(BpeTokenizer.dumpDir(sf) + "/merges.parquet")
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(dumped == merges)
    // every merge output is the concatenation of its inputs, and later
    // merges may only reference symbols derivable from earlier ones
    val known = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (a, b) =>
      def derivable(s: String) = s.length == 1 ||
        s.codePointCount(0, s.length) == 1 || known.contains(s)
      assert(derivable(a) && derivable(b), s"merge ($a,$b) uses underived symbol")
      known += a + b
    }
    // tokenizing with the learned merges strictly compresses the
    // corpus's most frequent words vs character count
    val freqWord = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .groupBy("w").count().orderBy(org.apache.spark.sql.functions.desc("count"))
      .head().getString(0)
    val toks = BpeTokenizer.tokenize(freqWord, merges)
    assert(toks.mkString == freqWord, "tokens must concatenate back to the word")
    assert(toks.length < BpeTokenizer.symbols(freqWord).length,
      s"the most frequent word '$freqWord' must compress")
  }
}
