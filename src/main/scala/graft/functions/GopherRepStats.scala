package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row Gopher repetition suite (Rae et al. 2021 A1.2) — all
  * 13 fractions plus the line/paragraph counts in ONE pass per
  * document, the native form of
  * [[graft.text.Cleaning.gopherRepetitionReference]]'s join machinery.
  * Every signal is a PER-DOCUMENT function, so the reference form's
  * (id, n, gram) shuffle (~9 gram sizes × every token, long string
  * keys — measured 24.3 s at sf0.1 for a pure map-shaped metric) is
  * pure waste at scale; this kernel keeps the whole computation inside
  * the row, making t39 a stateless map (append-mode stream legal, the
  * [[QualityStats]]/[[RepetitionStats]]/[[LshBands]] pattern).
  *
  * BIT-IDENTICAL to the reference form (GopherRepSpec pins it on the
  * planted corpus plus adversarial inputs; the t39 oracle pins it
  * cross-engine):
  *
  *  - lines = split "\n", paragraphs = split "\n\n" (Java regex split,
  *    limit −1, empties dropped) — duplicate fractions by occurrence
  *    count and by code-point mass over the part lengths;
  *  - tokens = [[TokenArray.tokensOf]] ascii (the engine-wide
  *    lowercased [a-z0-9] runs); grams joined with single spaces;
  *  - top n-gram (n = 2..4) char fraction: count·len(gram) /
  *    max(len(text), 1), top by (count desc, gram asc) — a total
  *    order;
  *  - duplicate n-gram (n = 5..10) char fraction:
  *    Σ_{count ≥ 2} count·len(gram) / max(len(text), 1) — the
  *    overlap-counting convention, documented in the reference form;
  *  - every fraction divides first, then rounds to 4 dp
  *    (⌊x·10⁴ + 0.5⌋ / 10⁴ — the identical IEEE op order).
  *
  * Returns array<double> of 15: [n_lines, dup_line_frac,
  * dup_line_char_frac, n_paras, dup_para_frac, dup_para_char_frac,
  * top_2/3/4gram_char_frac, dup_5..10gram_char_frac]; the counts are
  * exact in a double far past any document's line count. */
case class GopherRepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_rep_stats requires a string input, got ${child.dataType}")
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gopher_rep_stats"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    GopherRepStats.statsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GopherRepStats.statsOf($c);")
}

object GopherRepStats {

  /** ⌊(num/den)·10⁴ + 0.5⌋ / 10⁴ with the reference's exact op order:
    * divide first (den clamped to ≥ 1), then scale. */
  private def frac(num: Long, den: Long): Double = {
    val x = num.toDouble / math.max(den, 1L).toDouble
    math.floor(x * 10000d + 0.5d) / 10000d
  }

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Duplicate-part stats for one grain: (n, dupFrac, dupCharFrac). */
  private def grainStats(parts: Array[String]): (Long, Double, Double) = {
    val cnt = new java.util.HashMap[String, Int]()
    var n = 0L
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) { cnt.merge(parts(i), 1, (a, b) => a + b); n += 1 }
      i += 1
    }
    var dup = 0L; var chars = 0L; var dupchars = 0L
    val it = cnt.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong
      val l = cp(e.getKey)
      chars += c * l
      if (c > 1) { dup += c; dupchars += c * l }
    }
    (n, frac(dup, n), frac(dupchars, chars))
  }

  def statsOf(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val textLen = cp(str)
    val (nL, dLF, dLCF) = grainStats(str.split("\n", -1))
    val (nP, dPF, dPCF) = grainStats(str.split("\n\n", -1))
    // tokens once (the engine-wide ascii walker)
    val toksAd = TokenArray.tokensOf(s, ascii = true)
    val nT = toksAd.numElements()
    val toks = new Array[String](nT)
    var i = 0
    while (i < nT) {
      toks(i) = toksAd.getUTF8String(i).toString
      i += 1
    }
    val out = new Array[Any](15)
    out(0) = nL.toDouble; out(1) = dLF; out(2) = dLCF
    out(3) = nP.toDouble; out(4) = dPF; out(5) = dPCF
    var slot = 6
    var n = 2
    while (n <= 10) {
      if (nT < n) { out(slot) = 0.0; slot += 1 }
      else {
        val cnt = new java.util.HashMap[String, Int](nT * 2)
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j + n <= nT) {
          sb.setLength(0)
          var k = j
          while (k < j + n) {
            if (k > j) sb.append(' ')
            sb.append(toks(k)); k += 1
          }
          cnt.merge(sb.toString, 1, (a, b) => a + b)
          j += 1
        }
        if (n <= 4) {
          // top by (count desc, gram asc)
          var bestC = -1; var bestG: String = null
          val it = cnt.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue > bestC ||
                (e.getValue == bestC && e.getKey.compareTo(bestG) < 0)) {
              bestC = e.getValue; bestG = e.getKey
            }
          }
          out(slot) = frac(bestC.toLong * cp(bestG), textLen); slot += 1
        } else {
          var dupchars = 0L
          val it = cnt.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue > 1) dupchars += e.getValue.toLong * cp(e.getKey)
          }
          out(slot) = frac(dupchars, textLen); slot += 1
        }
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftBridge.column(GopherRepStats(GraftBridge.expression(c)))
}
