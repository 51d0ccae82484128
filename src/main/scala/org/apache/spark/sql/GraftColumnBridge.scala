package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters.
  *
  * Spark 4 moved `Column` to the api module (ColumnNode-backed); the
  * supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. Extension libraries conventionally expose it via a
  * same-package shim (cf. public Spark-extension projects that place
  * factories in `org.apache.spark.sql`).
  */
object GraftColumnBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
