package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / utility functions over `array<float>` columns.
  *
  * Re-expresses Oracle AI Vector Search's scalar surface
  * (`VECTOR_DISTANCE` with COSINE | EUCLIDEAN | DOT | MANHATTAN,
  * `VECTOR_NORM`, `VECTOR_DIMENSION_COUNT`, `TO_VECTOR`/`FROM_VECTOR`
  * — reference: /root/reference/scripts/01_pdf_to_vector.sql:87-97,144)
  * as Catalyst column expressions built from codegen'd higher-order
  * functions (`zip_with` + `aggregate`), so they distribute and stay
  * inside whole-stage codegen. All accumulation is in Double,
  * left-to-right, matching the DuckDB oracle's list comprehension +
  * list_sum evaluation order.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def vecDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm ‖a‖. Oracle VECTOR_NORM. */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Dimension count. Oracle VECTOR_DIMENSION_COUNT. */
  def vecDims(a: Column): Column = size(a)

  /** Cosine distance = 1 − cos(a,b). Oracle DISTANCE COSINE. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  def cosineSimilarity(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Euclidean (L2) distance. Oracle DISTANCE EUCLIDEAN. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Negative inner product (a distance: smaller = more similar).
    * Oracle DISTANCE DOT is defined as −⟨a,b⟩. */
  def negDotDistance(a: Column, b: Column): Column = -vecDot(a, b)

  /** Manhattan (L1) distance. Oracle DISTANCE MANHATTAN. */
  def manhattanDistance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => abs(x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Unit-normalize to array<double>. */
  def vecNormalize(a: Column): Column = {
    // Catalyst common-subexpression-eliminates the repeated norm.
    transform(a, x => x.cast("double") / vecNorm(a))
  }

  /** Oracle TO_VECTOR: parse "[0.1, 0.2, ...]" into array<float>. */
  def toVector(s: Column): Column =
    transform(
      split(regexp_replace(s, "[\\[\\]\\s]+", ""), ","),
      x => x.cast("float"))

  /** Oracle FROM_VECTOR: serialize array<float> to "[x1,x2,...]". */
  def fromVector(a: Column): Column =
    concat(lit("["), array_join(transform(a, _.cast("string")), ","), lit("]"))
}
