package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The canonical Viterbi segmentation of ONE WORD as an array of
  * pieces ([[UnigramEncode.pathPieces]] — minimal combined key, ties
  * to the shortest piece) — the hard-EM E-step's usage emitter,
  * applied at the DISTINCT-WORD grain (one row per vocabulary word,
  * never per occurrence; occurrences weight the usage counts through
  * the word-frequency column). */
case class UnigramPath(child: Expression, model: UnigramEncode.Model)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_path requires a string input, got ${child.dataType}")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_path"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UnigramPath.pathOf(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramEncode.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.UnigramPath.pathOf($ref, $c);
       """.stripMargin)
  }
}

object UnigramPath {

  def pathOf(m: UnigramEncode.Model, s: UTF8String): GenericArrayData = {
    val pieces = UnigramEncode.pathPieces(m, s.toString)
    new GenericArrayData(
      pieces.map(p => UTF8String.fromString(p)).toArray[Any])
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column, model: UnigramEncode.Model): Column =
    GraftBridge.column(UnigramPath(GraftBridge.expression(c), model))
}
