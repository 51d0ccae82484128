package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.FloatVecDistance

/** Session integration: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` injects the KnnJoin planner strategy and the
  * vector SQL functions; `GraftExtensions.register(spark)` does the
  * same on an already-built session.
  *
  * After registration plain SQL works:
  * {{{
  *   SELECT vec_id, vec_cosine_distance(embedding, qv) AS dist ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.KnnJoinStrategy)
    GraftExtensions.builders.foreach { case (name, b) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[FloatVecDistance].getName, name),
        b))
    }
  }
}

object GraftExtensions {
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    FloatVecDistance.metrics.toSeq.sorted.map { m =>
      s"vec_${m}_distance" ->
        ((args: Seq[Expression]) => FloatVecDistance(args(0), args(1), m))
    } :+ ("url_canonicalize" ->
      ((args: Seq[Expression]) => graft.functions.UrlCanonicalize(args(0))))

  /** Idempotent programmatic registration on a live session. */
  def register(spark: SparkSession): Unit = {
    graft.plans.KnnJoin.ensureStrategy(spark)
    builders.foreach { case (name, b) =>
      GraftColumnBridge.registerFunction(spark, name, b)
    }
  }
}
