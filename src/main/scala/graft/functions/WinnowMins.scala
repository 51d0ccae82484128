package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused winnowing kernel: tokens → n-gram shingles → seeded
  * [[PortableHash]] per shingle → sliding-window minimum, as ONE
  * compiled pass per document.
  *
  * The `functions._` formulation stacks three higher-order functions
  * (`transform(shingles(...), phash)` builds every shingle string,
  * `transform(sequence(...), i => array_min(slice(...)))` allocates a
  * slice per window), each evaluated per element in interpreted mode —
  * the probe-ranking lesson again (SURVEY §6): an HOF chain over a
  * corpus-sized map is an interpreter in the middle of a codegen plan.
  * This expression streams the token array once: the md5 input is fed
  * token-by-token (seed prefix, space-joined — byte-identical to
  * hashing the materialized shingle string), the window minimum is a
  * running scan, and no intermediate shingle strings, hash arrays, or
  * window slices are materialized. Values are BIT-IDENTICAL to the HOF
  * chain (spec-pinned), so the DuckDB oracle is untouched.
  *
  * Returns the windowed-min array (`array<long>`, one element per
  * shingle; empty when the doc has fewer than `n` tokens — the same
  * contract as `shingles()`), leaving distinct/min/max reporting to
  * ordinary collection functions on the answer-sized result.
  */
case class WinnowMins(child: Expression, n: Int, window: Int, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_mins"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(toks: Any): Any =
    WinnowMins.compute(toks.asInstanceOf[ArrayData], n, window, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowMins.compute($c, $n, $window, $seed);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMins {

  def of(toks: Column, n: Int, window: Int, seed: Int): Column =
    toColumn(WinnowMins(toExpr(toks), n, window, seed))

  // one digest instance per thread — getInstance per row is the next
  // bottleneck once the HOF overhead is gone
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Space = ' '.toByte
  private val Empty = new GenericArrayData(Array.empty[Long])

  /** The compiled kernel; public static so generated code can call it. */
  def compute(toks: ArrayData, n: Int, window: Int, seed: Int): ArrayData = {
    val count = toks.numElements()
    val m = count - n + 1
    if (m <= 0) return Empty
    val md = digest.get()
    val prefix = (seed.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      md.update(prefix)
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        // UTF8String exposes the same UTF-8 bytes Spark's md5() hashes
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      // first 8 hex chars of the digest = first 4 bytes, unsigned —
      // exactly PortableHash.phash's conv(substring(md5, 1, 8), 16, 10)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val wm = new Array[Long](m)
    var k = 0
    while (k < m) {
      var mn = hs(k)
      val end = math.min(k + window, m)
      var j = k + 1
      while (j < end) { if (hs(j) < mn) mn = hs(j); j += 1 }
      wm(k) = mn
      k += 1
    }
    new GenericArrayData(wm)
  }
}
