package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row distinct word k-grams (r13 optimization, the
  * [[LshBands]] upgrade applied to the shingle EXPLODE path): words
  * array → space-joined k-grams, first-occurrence distinct, one flat
  * JVM loop.
  *
  * The Column formulation in [[graft.dedup.Dedup.wordShingles]] chained
  * higher-order functions — `transform(sequence(...), i =>
  * array_join(slice(ws, i+1, n), " "))` then `array_distinct` +
  * `filter` — and higher-order functions do not participate in
  * whole-stage codegen (CodegenFallback, a closure call per element,
  * with `slice` allocating a fresh array per gram). Every shingling
  * consumer (the d2/d4/d8/d12/d15/d21/t41 machinery and the l1–l3/l8
  * pipelines) pays that per-gram interpretation on the corpus scan.
  *
  * BIT-IDENTICAL to the Column formulation (WordShinglesSpec pins it):
  * gram i = words[i..i+k-1] joined by a single space; distinct keeps
  * the FIRST occurrence (array_distinct order); empty grams are
  * dropped (the old `filter(length > 0)` guard — only reachable when
  * every joined word is empty); fewer than k words → empty array (the
  * caller's explode drops the row). */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string> words, got $other")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WordShingles.shinglesOf(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WordShingles.shinglesOf($c, $k);
       """.stripMargin
    })
}

object WordShingles {

  /** One flat pass: k-gram join + first-occurrence distinct. */
  def shinglesOf(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + j).toString)
        j += 1
      }
      if (sb.length > 0) seen.add(UTF8String.fromString(sb.toString))
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
    GraftBridge.column(WordShingles(GraftBridge.expression(c), k))
}
