package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row duplicated-trigram fraction — the native form of
  * [[graft.text.TextAnalysis.inlineDupTrigramFrac]]'s Column body
  * (zip-sliced trigrams → sort_array → run-length `aggregate`). That
  * form is a chain of CodegenFallback higher-order functions whose
  * root is referenced three times (guard, numerator, denominator), so
  * interpreted evaluation re-ran the whole tokenize→zip→sort→fold per
  * reference: measured 15.9 s for 3.8 k docs at sf1 — ~4 ms/doc on a
  * pure map, the same interpreted-HOF cliff class as
  * [[QualityStats]]/[[PieceCounts]]/[[LshBands]]/[[MarkerLangId]]
  * (each ~30× once fused). This pass: lowercase once, walk the token
  * runs once ([[QualityStats]]' token rule: maximal
  * [a-z0-9 ∪ U+00E0–U+00FF] code-point runs), count trigram
  * multiplicities in one hash map.
  *
  * BIT-IDENTICAL to the Column reference (RepetitionStatsSpec pins it
  * on the gate corpus plus adversarial unicode; the w13 oracle pins it
  * cross-engine): dup = Σ count(g) over trigrams with count > 1,
  * total = tokens − 2, frac = dup/total as an IEEE double division,
  * 0.0 for documents with fewer than 3 tokens. A multiset count equals
  * the sorted-run-length fold exactly, so no sort is needed. Equality
  * holds for well-formed UTF-8; malformed bytes follow the
  * [[TokenWalk]] family rule, which may diverge from the regex
  * (documented there — do not assume regex equality on raw bytes). */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dup_trigram_frac requires a string input, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dup_trigram_frac"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.dupTrigramFracOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.RepetitionStats.dupTrigramFracOf($c);"
    })
}

object RepetitionStats {

  /** One pass: tokenize the lowercased bytes exactly as
    * [[MarkerLangId.langIdOf]] (same walker), join consecutive token
    * triples with single spaces, count multiplicities. */
  def dupTrigramFracOf(s: UTF8String): Double = {
    val low = s.toLowerCase.getBytes
    val toks = new java.util.ArrayList[String]()
    val m = low.length
    // [[TokenWalk]] classification (single-sourced family rule)
    var j = 0
    while (j < m) {
      val tl = TokenWalk.tokenLen(low, j, m, ascii = false)
      if (tl > 0) {
        var e = j + tl
        var nl = if (e < m) TokenWalk.tokenLen(low, e, m, ascii = false) else 0
        while (nl > 0) {
          e += nl
          nl = if (e < m) TokenWalk.tokenLen(low, e, m, ascii = false) else 0
        }
        toks.add(new String(low, j, e - j,
          java.nio.charset.StandardCharsets.UTF_8))
        j = e
      } else j += TokenWalk.sepStep(low(j) & 0xff)
    }
    val n = toks.size
    if (n < 3) return 0.0
    val total = n - 2
    val counts = new java.util.HashMap[String, Int](total * 2)
    var i = 0
    while (i < total) {
      val g = toks.get(i) + " " + toks.get(i + 1) + " " + toks.get(i + 2)
      counts.merge(g, 1, (a, b) => a + b)
      i += 1
    }
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > 1) dup += c
    }
    dup.toDouble / total.toDouble
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(c)))
}
