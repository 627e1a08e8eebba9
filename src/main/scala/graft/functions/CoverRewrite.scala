package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused covered-window rewrite for exact-substring dedup (SURVEY.md
  * §7.3 "custom Catalyst Expression, perf-only"): given a document's
  * token array and the START positions of its duplicate k-token
  * windows, merge the covered intervals and emit
  * (n_removed, clean_text) in one pass.
  *
  * The Column formulation ([[graft.dedup.Dedup.exactSubstringDedup]]'s
  * original tail) expanded every window into its k positions
  * (sequence + flatten + array_distinct — k× the shuffle payload) and
  * rebuilt the text with `filter(ws, (w, i) -> !array_contains(cov, i))`
  * — an O(tokens × covered) interpreted scan per document through the
  * CodegenFallback lambda path, ~10⁸ comparisons for one
  * boilerplate-heavy 10k-token document. This expression takes the
  * window starts (c ints instead of c·k), sorts them, and walks the
  * token array once against the merged intervals: O(n + c log c).
  *
  * BIT-IDENTICAL to the Column form (spec + d10 oracle pin):
  * n_removed = |distinct covered positions| (overhang past the last
  * token cannot occur — a window start s satisfies s + k ≤ n by
  * construction); clean_text = surviving tokens joined by single
  * spaces. */
case class CoverRewrite(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"window size k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cover_rewrite requires (array<string>, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_removed", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def prettyName: String = "cover_rewrite"

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def nullSafeEval(tokens: Any, starts: Any): Any =
    CoverRewrite.rewriteOf(tokens.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      s"${ev.value} = graft.functions.CoverRewrite.rewriteOf($t, $s, $k);"
    })
}

object CoverRewrite {

  /** Sort the window starts, walk the tokens once: a position i is
    * covered iff some start s has s ≤ i ≤ s + k − 1. */
  def rewriteOf(tokens: ArrayData, starts: ArrayData, k: Int): InternalRow = {
    val n = tokens.numElements()
    val c = starts.numElements()
    val st = new Array[Int](c)
    var i = 0
    while (i < c) { st(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(st)
    val sb = new java.lang.StringBuilder
    var removed = 0L
    var si = 0
    var until = -1 // last covered position so far
    var first = true
    i = 0
    while (i < n) {
      while (si < c && st(si) <= i) {
        val end = st(si) + k - 1
        if (end > until) until = end
        si += 1
      }
      if (i <= until) removed += 1L
      else {
        if (!first) sb.append(' ')
        sb.append(tokens.getUTF8String(i).toString)
        first = false
      }
      i += 1
    }
    InternalRow(removed, UTF8String.fromString(sb.toString))
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(tokens: Column, starts: Column, k: Int): Column =
    GraftBridge.column(CoverRewrite(GraftBridge.expression(tokens),
      GraftBridge.expression(starts), k))
}
