package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Cross-engine-stable rounding.
  *
  * Spark's `round` converts the double to its *shortest decimal
  * string* (BigDecimal.valueOf) before HALF_UP; DuckDB rounds the
  * binary value. For results whose shortest representation lands
  * exactly on a half boundary (systematic for averages of
  * cent-quantized sums: 1236.27/24 = 51.51125) the two disagree by one
  * ulp of the target scale. Adding 1e-9 before rounding — in BOTH
  * engines — pushes every such boundary value decisively to one side
  * while never moving a non-boundary value (result grids here are
  * ≥1e-7 apart). Operator files import this `round` after
  * `functions._` so the shadowing applies uniformly; the DuckDB oracle
  * strings carry the same `1e-9 +` shift.
  */
object SafeRound {
  def round(c: Column, scale: Int): Column =
    org.apache.spark.sql.functions.round(c + lit(1e-9), scale)
}
