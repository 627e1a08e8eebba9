package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential-order double dot product of two numeric array columns as
  * ONE native loop (SURVEY.md §7.3 "custom Catalyst Expression,
  * perf-only"): the hot kernel of every embedding operator — cosine
  * verification of LSH candidates (d6/s6), brute-force and IVF top-k
  * (s1/s3/s5), hyperplane projections, centroid assignment.
  *
  * Bit-identical to the HOF reference `aggregate(zip_with(a, b,
  * (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _)` (kept in
  * [[graft.sim.Similarity.dotReference]] for the equivalence spec):
  * elements are widened float→double exactly, multiplied, and
  * accumulated LEFT TO RIGHT, so every IEEE rounding step matches the
  * interpreted walk the oracles replay. The HOF form allocates a
  * zipped array and evaluates two lambdas per element through the
  * interpreted expression path (~µs per 64-dim pair — tens of seconds
  * over the millions of candidate pairs LSH emits at sf1); this loop
  * is the same arithmetic at memory speed.
  *
  * Null semantics match zip_with+aggregate: a null element anywhere,
  * or a length mismatch (zip_with pads with nulls), nulls the result.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> inputs, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotr")
      s"""
         |java.lang.Double $r = graft.functions.DotProduct.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

object DotProduct {

  /** Left-to-right double accumulation; null on length mismatch or any
    * null element (the zip_with+aggregate contract). Boxed so codegen
    * can see the null. */
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
