package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row distinct character k-grams (r13 optimization — the
  * [[WordShingles]] upgrade at character grain): one flat pass over
  * the string, first-occurrence distinct, replacing the
  * `array_distinct(transform(sequence(1, len−k+1), i →
  * substr(t, i, k)))` chain in
  * [[graft.text.TextAnalysis.trigramFamiliarity]] — a CodegenFallback
  * higher-order closure call and a fresh substring per CHARACTER of
  * every document.
  *
  * BIT-IDENTICAL to the Column formulation (CharShinglesSpec pins it):
  * gram i = UTF8String.substringSQL(i, k) — the same code-point
  * slicing `substr` lowers to — and strings shorter than k characters
  * yield an empty array. */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingles requires a string input, got $other")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    CharShingles.shinglesOf(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.CharShingles.shinglesOf($c, $k);
       """.stripMargin
    })
}

object CharShingles {

  /** One flat pass: code-point k-gram slices + first-occurrence
    * distinct (substringSQL is 1-based, end-exclusive by length). */
  def shinglesOf(s: UTF8String, k: Int): GenericArrayData = {
    val n = s.numChars()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 1
    while (i <= n - k + 1) {
      seen.add(s.substringSQL(i, k))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(CharShingles(GraftBridge.expression(c), k))
}
