package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst distance kernel for `array<float>` columns.
  *
  * The `zip_with` + `aggregate` formulation is semantically right but
  * allocates an intermediate array per row pair — at batch-knn scale
  * (N·M pairs) that dominates runtime. This expression generates a
  * primitive float loop inside whole-stage codegen: no boxing, no
  * intermediate ArrayData, one pass per pair.
  *
  * Accumulation is double, left-to-right — bit-identical to the
  * `zip_with`/`aggregate` path and to the DuckDB oracle's list_sum,
  * so swapping it into a query cannot change results.
  *
  * Metrics mirror Oracle VECTOR_DISTANCE's (reference
  * /root/reference/scripts/01_pdf_to_vector.sql:87-91):
  * cosine | l2 | dot (negated inner product) | manhattan.
  */
case class FloatVecDistance(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  require(FloatVecDistance.metrics.contains(metric),
    s"unknown metric $metric (one of ${FloatVecDistance.metrics.mkString(",")})")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"vec_${metric}_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dist(metric,
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val body = metric match {
        case "cosine" =>
          s"""double dot = 0.0, na = 0.0, nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double x = (double) $av[$i]; double y = (double) $bv[$i];
             |  dot += x * y; na += x * x; nb += y * y;
             |}
             |${ev.value} = 1.0 - dot / (Math.sqrt(na) * Math.sqrt(nb));""".stripMargin
        case "l2" =>
          s"""double acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double d = (double) $av[$i] - (double) $bv[$i]; acc += d * d;
             |}
             |${ev.value} = Math.sqrt(acc);""".stripMargin
        case "dot" =>
          s"""double acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  acc += (double) $av[$i] * (double) $bv[$i];
             |}
             |${ev.value} = -acc;""".stripMargin
        case "manhattan" =>
          s"""double acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  acc += Math.abs((double) $av[$i] - (double) $bv[$i]);
             |}
             |${ev.value} = acc;""".stripMargin
      }
      s"""float[] $av = $a.toFloatArray();
         |float[] $bv = $b.toFloatArray();
         |int $n = Math.min($av.length, $bv.length);
         |$body""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVecDistance {
  val metrics: Set[String] = VecMath.metrics

  def cosine(a: Column, b: Column): Column =
    toColumn(FloatVecDistance(toExpr(a), toExpr(b), "cosine"))
  def l2(a: Column, b: Column): Column =
    toColumn(FloatVecDistance(toExpr(a), toExpr(b), "l2"))
  def dot(a: Column, b: Column): Column =
    toColumn(FloatVecDistance(toExpr(a), toExpr(b), "dot"))
  def manhattan(a: Column, b: Column): Column =
    toColumn(FloatVecDistance(toExpr(a), toExpr(b), "manhattan"))
}
