package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused character-class census (SURVEY.md §7.3 "custom Catalyst
  * Expression, perf-only"; SURVEY §2.4 A4-A6): ONE pass over the string
  * returning [alpha, digit, punct, space, misc] counts.
  *
  * Replaces five `length(regexp_replace(...))` column combos in the
  * profiler's hot aggregation path — the regex formulation allocates a
  * rewritten string per class per cell. This expression participates in
  * whole-stage codegen via `doGenCode` (a tight Java loop over the
  * UTF-8 bytes, no allocation beyond the 5-long result), which is the
  * preferred extension order: builtin > native Expression > UDF.
  *
  * Class semantics match the Java-regex classes the profiler used:
  * alpha = [A-Za-z], digit = [0-9], punct = ASCII \p{Punct},
  * space = ASCII \s, everything else (all non-ASCII code points) =
  * misc, counted once per CODE POINT — `length()` on UTF8String counts
  * code points, so the census sums exactly to `length(value)`
  * (spec-checked against the regex formulation on unicode inputs).
  */
case class CharClassCensus(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_class_census requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_class_census"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = CharClassCensus.censusOf(bytes)
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      s"""
         |long[] $counts = graft.functions.CharClassCensus.censusOf($c.getBytes());
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })
}

object CharClassCensus {

  /** Census over UTF-8 bytes: [alpha, digit, punct, space, misc].
    * Non-ASCII code points count as misc; 4-byte sequences
    * (supplementary planes) count 2 to match Java String.length()
    * (surrogate-pair) semantics of the regex formulation. */
  def censusOf(bytes: Array[Byte]): Array[Long] = {
    var alpha = 0L; var digit = 0L; var punct = 0L; var space = 0L; var misc = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
        else if (b >= '0' && b <= '9') digit += 1
        else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r')
          space += 1
        else if ((b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
                 (b >= '[' && b <= '`') || (b >= '{' && b <= '~')) punct += 1
        else misc += 1
        i += 1
      } else if (b < 0xe0) { misc += 1; i += 2 }   // 2-byte sequence
      else if (b < 0xf0) { misc += 1; i += 3 }     // 3-byte sequence
      else { misc += 1; i += 4 }                   // 4-byte: one CODE POINT
                                                   // (UTF8String.numChars — and
                                                   // therefore length() — counts
                                                   // code points, not UTF-16 units)
    }
    Array(alpha, digit, punct, space, misc)
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column): Column =
    GraftBridge.column(CharClassCensus(GraftBridge.expression(c)))
}
