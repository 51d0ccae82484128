package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / shingling / normalization primitives shared by the
  * chunker, dedup suite, and text-analysis operators.
  *
  * Everything is built from codegen'd `functions._` combinators (no
  * UDFs) and is reproducible in the DuckDB oracle with
  * `regexp_split_to_array` + list comprehensions.
  */
object TextFunctions {

  /** Normalized text: lowercase, trimmed (the reference's
    * UTL_TO_CHUNKS `normalize:"all"` analogue for the synthetic
    * corpus). */
  def normText(c: Column): Column = lower(trim(c))

  /** Whitespace tokens of the normalized text; empty-string-safe. */
  def tokens(c: Column): Column =
    filter(split(normText(c), "\\s+"), t => length(t) > lit(0))

  /** Word n-gram shingles joined by single spaces. Returns an empty
    * array when the doc has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Count of regexp matches in a string (DuckDB-reproducible via
    * length(regexp_replace(...,'','g')) arithmetic is fragile; instead
    * both engines use length-difference on a strip). */
  def strippedLen(c: Column, keepPattern: String): Column =
    length(regexp_replace(c, keepPattern, ""))
}
