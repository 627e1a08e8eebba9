package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused pattern generalization (SURVEY.md §2.4 A15; reference:
  * profiling/profiler.py:134-165): digits→`9`, ASCII letters→`A`,
  * ASCII whitespace→space, everything else (punctuation, non-ASCII)
  * kept verbatim — ONE byte pass replacing the profiler's chain of
  * three `regexp_replace` rewrites (each of which allocates a full
  * rewritten string per cell).
  *
  * Java-regex parity (spec-checked against the regexp_replace
  * formulation): the replaced classes `[0-9]`, `[A-Za-z]`, `\s` are
  * ASCII-only in Java regex (`\s` = `[ \t\n\x0B\f\r]` without
  * UNICODE_CHARACTER_CLASS), and every replacement maps one ASCII byte
  * to one ASCII byte, so multi-byte UTF-8 sequences copy through
  * untouched and the output is valid UTF-8 of identical byte length.
  */
case class PatternGeneralize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pattern_generalize requires a string input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "pattern_generalize"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PatternGeneralize.generalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PatternGeneralize.generalize($c);")
}

object PatternGeneralize {

  def generalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var out: Array[Byte] = null // allocate only if something changes
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      val repl: Int =
        if (b >= '0' && b <= '9') '9'
        else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) 'A'
        else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r') ' '
        else -1
      if (repl >= 0 && repl != b) {
        if (out == null) out = bytes.clone()
        out(i) = repl.toByte
      }
      i += 1
    }
    if (out == null) s else UTF8String.fromBytes(out)
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column): Column =
    GraftBridge.column(PatternGeneralize(GraftBridge.expression(c)))
}
