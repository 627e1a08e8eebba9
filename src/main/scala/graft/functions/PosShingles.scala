package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row POSITIONED word k-grams (r13 — the [[WordShingles]]
  * pattern with positions, NON-distinct): words array →
  * array<struct<pos:int, g:string>> with pos the 0-based window start,
  * one flat JVM loop. Replaces the higher-order
  * `transform(sequence(0, n−k), i → struct(i, array_join(slice(ws,
  * i+1, k), " ")))` chain in
  * [[graft.dedup.Dedup.exactSubstringDedup]] — CodegenFallback, a
  * closure and a fresh slice array per window on the corpus scan.
  * Fewer than k words → empty array (the old `otherwise` arm).
  * PosShinglesSpec pins it bit-identical to the Column reference. */
case class PosShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pos_shingles requires array<string> words, got $other")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("g", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "pos_shingles"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PosShingles.shinglesOf(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PosShingles.shinglesOf($c, $k);
       """.stripMargin
    })
}

object PosShingles {

  def shinglesOf(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
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
      out(i) = InternalRow(i, UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(PosShingles(GraftBridge.expression(c), k))
}
