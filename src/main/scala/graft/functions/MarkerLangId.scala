package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused marker-word language ID (SURVEY.md §7.3 "custom Catalyst
  * Expression, perf-only"): lowercase once, walk the token runs once,
  * count marker hits for every language in the same pass, return the
  * argmax language ('unknown' when nothing matches; ties break to the
  * lexicographically smallest language code).
  *
  * The Column formulation ([[graft.text.TextAnalysis.langId]]'s
  * original body) evaluated `size(filter(tokens(text), contains))`
  * per language, and the best-language arithmetic referenced the
  * scored array twice under a `when` — conditional branches defeat
  * subexpression elimination and higher-order functions are
  * CodegenFallback, so every document paid ~10 interpreted
  * split+filter passes (22 s for 50 k docs at sf1 vs ~0.6 s fused).
  *
  * BIT-IDENTICAL to the Column form (MarkerLangIdSpec pins it; the t1
  * oracle pins it cross-engine): tokens are maximal runs of
  * [a-zà-ÿ0-9] code points in `lower(text)` (the same
  * UTF8String.toLowerCase the `lower` builtin uses — the QualityStats
  * token rule), every occurrence counts, and the winner is the
  * (−hits, lang) minimum. */
case class MarkerLangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"marker_lang_id requires a string input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "marker_lang_id"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    MarkerLangId.langIdOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.MarkerLangId.langIdOf($c);"
    })
}

object MarkerLangId {
  // language codes sorted ascending: index order IS the tie-break order
  private val langs: Array[String] =
    graft.text.TextAnalysis.markers.keys.toArray.sorted
  private val sets: Array[java.util.HashSet[String]] = langs.map { l =>
    val s = new java.util.HashSet[String]()
    graft.text.TextAnalysis.markers(l).foreach(s.add)
    s
  }
  private val Unknown = UTF8String.fromString("unknown")
  private val LangU: Array[UTF8String] = langs.map(UTF8String.fromString)

  /** One pass over the lowercased bytes: token runs classified exactly
    * as [[QualityStats]] (maximal [a-z0-9 ∪ U+00E0–U+00FF] code-point
    * runs), each run looked up in every language's marker set. */
  def langIdOf(s: UTF8String): UTF8String = {
    val low = s.toLowerCase.getBytes
    val hits = new Array[Int](langs.length)
    val m = low.length
    var j = 0
    var runStart = -1
    def endRun(endExcl: Int): Unit = if (runStart >= 0) {
      val tok = new String(low, runStart, endExcl - runStart,
        java.nio.charset.StandardCharsets.UTF_8)
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(tok)) hits(l) += 1
        l += 1
      }
      runStart = -1
    }
    while (j < m) {
      val b = low(j) & 0xff
      var tok = false
      var step = 1
      if (b < 0x80) {
        tok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      } else if (b < 0xe0) {
        // dangling lead byte (malformed UTF-8) is a token break
        tok = j + 1 < m && {
          val cp = ((b & 0x1f) << 6) | (low(j + 1) & 0x3f)
          cp >= 0xe0 && cp <= 0xff
        }
        step = 2
      } else if (b < 0xf0) step = 3
      else step = 4
      if (tok) { if (runStart < 0) runStart = j }
      else endRun(j)
      j += step
    }
    endRun(m)
    var best = -1
    var bestHits = 0
    var l = 0
    while (l < hits.length) {
      if (hits(l) > bestHits) { best = l; bestHits = hits(l) }
      l += 1
    }
    if (best < 0) Unknown else LangU(best)
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column): Column =
    GraftBridge.column(MarkerLangId(GraftBridge.expression(c)))
}
