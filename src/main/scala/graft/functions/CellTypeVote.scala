package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataType => _, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused cell-type vote (SURVEY.md §2.4 A16): ONE byte loop evaluating
  * the profiler's six anchored type regexes
  *
  *   bit 0  ^[+-]?\d+$                                   (integer)
  *   bit 1  ^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$   (float)
  *   bit 2  ^(?i)(true|false|yes|no|t|f|y|n)$            (boolean)
  *   bit 3  ^\d{4}-\d{2}-\d{2}([ T].*)?$                 (date)
  *   bit 4  ^[+-]?\d+(\.\d+)?$                           (numeric cell)
  *   bit 5  ^[A-Za-z ]+$                                 (alpha cell)
  *
  * and returning them as a long bitmask. Replaces six regex `rlike`
  * evaluations per cell in the pass-A hot path; participates in
  * whole-stage codegen via `doGenCode`.
  *
  * Java-regex parity details (spec-checked against the rlike
  * formulation): `$` without MULTILINE also matches before ONE final
  * line terminator (\n, \r\n, \r, ,  ,  ), so the
  * matcher ignores exactly one trailing terminator; `.` matches any
  * code point EXCEPT those terminators, so the date tail accepts
  * non-ASCII but rejects embedded terminators; all other pattern
  * atoms are ASCII-only, so any embedded terminator or stray byte
  * fails the vote.
  */
case class CellTypeVote(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cell_type_vote requires a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "cell_type_vote"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    CellTypeVote.voteOf(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CellTypeVote.voteOf($c.getBytes());")
}

object CellTypeVote {

  val IntBit = 1L
  val FloatBit = 2L
  val BoolBit = 4L
  val DateBit = 8L
  val NumCellBit = 16L
  val AlphaCellBit = 32L

  private def isDigit(b: Int): Boolean = b >= '0' && b <= '9'

  /** Effective end: input length minus ONE trailing line terminator
    * (Java `$` semantics). Terminators: \n, \r\n, \r,  (C2 85),
    *   (E2 80 A8),   (E2 80 A9). */
  private def effectiveEnd(bytes: Array[Byte]): Int = {
    val n = bytes.length
    if (n == 0) return 0
    val last = bytes(n - 1) & 0xff
    if (last == '\n') {
      if (n >= 2 && bytes(n - 2) == '\r') n - 2 else n - 1
    } else if (last == '\r') n - 1
    else if (n >= 2 && (bytes(n - 2) & 0xff) == 0xc2 && last == 0x85) n - 2
    else if (n >= 3 && (bytes(n - 3) & 0xff) == 0xe2 && (bytes(n - 2) & 0xff) == 0x80 &&
             (last == 0xa8 || last == 0xa9)) n - 3
    else n
  }

  /** True when bytes[i, end) contains a line terminator (the code
    * points `.` refuses to match). */
  private def hasTerminator(bytes: Array[Byte], from: Int, end: Int): Boolean = {
    var i = from
    while (i < end) {
      val b = bytes(i) & 0xff
      if (b == '\n' || b == '\r') return true
      if (b == 0xc2 && i + 1 < end && (bytes(i + 1) & 0xff) == 0x85) return true
      if (b == 0xe2 && i + 2 < end && (bytes(i + 1) & 0xff) == 0x80 &&
          ((bytes(i + 2) & 0xff) == 0xa8 || (bytes(i + 2) & 0xff) == 0xa9)) return true
      i += 1
    }
    false
  }

  def voteOf(bytes: Array[Byte]): Long = {
    val end = effectiveEnd(bytes)
    var vote = 0L
    if (matchInt(bytes, end)) vote |= IntBit
    if (matchFloat(bytes, end)) vote |= FloatBit
    if (matchBool(bytes, end)) vote |= BoolBit
    if (matchDate(bytes, end)) vote |= DateBit
    if (matchNumCell(bytes, end)) vote |= NumCellBit
    if (matchAlphaCell(bytes, end)) vote |= AlphaCellBit
    vote
  }

  private def matchInt(b: Array[Byte], end: Int): Boolean = {
    var i = 0
    if (i < end && (b(i) == '+' || b(i) == '-')) i += 1
    val start = i
    while (i < end && isDigit(b(i) & 0xff)) i += 1
    i > start && i == end
  }

  private def matchFloat(b: Array[Byte], end: Int): Boolean = {
    var i = 0
    if (i < end && (b(i) == '+' || b(i) == '-')) i += 1
    // mantissa: \d+\.\d* | \.\d+ | \d+
    val d0 = i
    while (i < end && isDigit(b(i) & 0xff)) i += 1
    val intDigits = i - d0
    if (i < end && b(i) == '.') {
      if (intDigits > 0) {
        i += 1
        while (i < end && isDigit(b(i) & 0xff)) i += 1 // \d+\.\d*
      } else {
        i += 1
        val f0 = i
        while (i < end && isDigit(b(i) & 0xff)) i += 1
        if (i == f0) return false // \.\d+ needs at least one digit
      }
    } else if (intDigits == 0) return false
    // optional exponent
    if (i < end && (b(i) == 'e' || b(i) == 'E')) {
      i += 1
      if (i < end && (b(i) == '+' || b(i) == '-')) i += 1
      val e0 = i
      while (i < end && isDigit(b(i) & 0xff)) i += 1
      if (i == e0) return false
    }
    i == end
  }

  private def matchBool(b: Array[Byte], end: Int): Boolean = {
    def eq(s: String): Boolean = {
      if (end != s.length) return false
      var i = 0
      while (i < end) {
        val c = (b(i) & 0xff) | 0x20 // ASCII lowercase
        if (c != s.charAt(i)) return false
        i += 1
      }
      true
    }
    end match {
      case 1 => eq("t") || eq("f") || eq("y") || eq("n")
      case 2 => eq("no")
      case 3 => eq("yes")
      case 4 => eq("true")
      case 5 => eq("false")
      case _ => false
    }
  }

  private def matchDate(b: Array[Byte], end: Int): Boolean = {
    if (end < 10) return false
    var i = 0
    while (i < 4) { if (!isDigit(b(i) & 0xff)) return false; i += 1 }
    if (b(4) != '-') return false
    if (!isDigit(b(5) & 0xff) || !isDigit(b(6) & 0xff)) return false
    if (b(7) != '-') return false
    if (!isDigit(b(8) & 0xff) || !isDigit(b(9) & 0xff)) return false
    if (end == 10) return true
    if (b(10) != ' ' && b(10) != 'T') return false
    // `.*` tail: anything except line terminators
    !hasTerminator(b, 11, end)
  }

  private def matchNumCell(b: Array[Byte], end: Int): Boolean = {
    var i = 0
    if (i < end && (b(i) == '+' || b(i) == '-')) i += 1
    val d0 = i
    while (i < end && isDigit(b(i) & 0xff)) i += 1
    if (i == d0) return false
    if (i == end) return true
    if (b(i) != '.') return false
    i += 1
    val f0 = i
    while (i < end && isDigit(b(i) & 0xff)) i += 1
    i > f0 && i == end
  }

  private def matchAlphaCell(b: Array[Byte], end: Int): Boolean = {
    if (end == 0) return false
    var i = 0
    while (i < end) {
      val c = b(i) & 0xff
      if (!((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || c == ' ')) return false
      i += 1
    }
    true
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column): Column =
    GraftBridge.column(CellTypeVote(GraftBridge.expression(c)))
}
