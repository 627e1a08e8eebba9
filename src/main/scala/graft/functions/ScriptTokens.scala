package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared one-pass machinery for the SCRIPT-AWARE text kernels
  * ([[ScriptTokens]], [[ScriptStats]]) — the multilingual twin of the
  * [[TokenWalk]] byte rule. Unlike the Latin-plane kernels this family
  * classifies full Unicode CODE POINTS (`Character.UnicodeScript` /
  * `Character.getType`, the exact tables Java regex `\p{IsHan}` /
  * `\p{L}` / `\p{N}` read), so the walk runs over the decoded string
  * rather than raw UTF-8 bytes. Same malformed-input caveat as
  * [[TokenArray]]: equality with the regex formulation is pinned for
  * well-formed strings (malformed bytes reach both paths through the
  * same UTF8String→String replacement decoding, so they agree there
  * too, but the spec pins well-formed input only). */
private[functions] object ScriptWalk {

  /** Code point is in the spaceless-script class
    * ([[graft.text.ScriptText.CjkClassJava]]: Han ∪ Hiragana ∪
    * Katakana — `Character.UnicodeScript` is the table Java regex
    * `\p{IsHan}` itself consults). */
  def isCjk(cp: Int): Boolean = {
    val s = Character.UnicodeScript.of(cp)
    s == Character.UnicodeScript.HAN || s == Character.UnicodeScript.HIRAGANA ||
      s == Character.UnicodeScript.KATAKANA
  }

  /** Code point is a token constituent: `[\p{L}\p{N}]`. */
  def isTokenCp(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** The `lower(spaced(text))` prefix of the tokens chain, with the
    * builtin operators' exact semantics: spacing inserts ' ' around
    * every CJK code point on the ORIGINAL string (regexp_replace order
    * — Java's final-sigma lowering is context-sensitive, so spacing
    * first is observable in principle), then the SAME
    * UTF8String.toLowerCase the `lower` builtin applies. */
  def lowSpaced(s: UTF8String): String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n + 16)
    var i = 0
    var anyCjk = false
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isCjk(cp)) {
        anyCjk = true
        sb.append(' ').appendCodePoint(cp).append(' ')
      } else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val spaced = if (anyCjk) sb.toString else str
    UTF8String.fromString(spaced).toLowerCase.toString
  }

  /** One pass over `lower(spaced(text))` emitting maximal
    * `[\p{L}\p{N}]` runs; with `out = null` only counts them. */
  def tokenize(s: UTF8String, out: java.util.ArrayList[Any]): Long = {
    val low = lowSpaced(s)
    val n = low.length
    var ntok = 0L
    var i = 0
    var start = -1
    while (i < n) {
      val cp = low.codePointAt(i)
      if (isTokenCp(cp)) { if (start < 0) start = i }
      else if (start >= 0) {
        ntok += 1
        if (out != null) out.add(UTF8String.fromString(low.substring(start, i)))
        start = -1
      }
      i += Character.charCount(cp)
    }
    if (start >= 0) {
      ntok += 1
      if (out != null) out.add(UTF8String.fromString(low.substring(start, n)))
    }
    ntok
  }
}

/** Fused SCRIPT-AWARE tokenizer (SURVEY.md §7.3 "custom Catalyst
  * Expression, perf-only"): ONE decoded pass replacing the
  * [[graft.text.ScriptText.tokens]] builtin chain
  * `filter(split(lower(regexp_replace(text, "([CJK])", " $1 ")),
  * "[^\p{L}\p{N}]+"), _ != "")` — two full Java-regex passes (both on
  * the slow non-ASCII path, the measured 4× cliff) plus a HOF filter
  * whose lambda exprId defeats subexpression elimination, paid again
  * at every consumer (shingling, LM bigrams ×2, chunking, token
  * counts). Semantics are IDENTICAL for well-formed input
  * (ScriptTextSpec property-pins native ≡ regex on mixed-script
  * strings): CJK code points are spaced into single-char tokens on the
  * original string, lowering uses the builtin's UTF8String.toLowerCase,
  * and token runs are maximal `[\p{L}\p{N}]` code-point runs under the
  * same Unicode tables Java regex consults. */
case class ScriptTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"script_tokens requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "script_tokens"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val out = new java.util.ArrayList[Any](16)
    ScriptWalk.tokenize(input.asInstanceOf[UTF8String], out)
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScriptTokens.tokensOf($c);")
}

object ScriptTokens {

  def tokensOf(s: UTF8String): GenericArrayData = {
    val out = new java.util.ArrayList[Any](16)
    ScriptWalk.tokenize(s, out)
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column): Column =
    GraftBridge.column(ScriptTokens(GraftBridge.expression(c)))
}

/** Fused SCRIPT-AWARE text statistics: ONE pass returning
  * [length, letters, digits, punct, n_tokens, n_arabic, n_cjk,
  * n_cyrillic, n_greek, n_latin] — the inputs of
  * [[graft.text.ScriptText.qualityScore]], `dominantScript` and
  * `langId`'s script gates, which as Column regex censuses cost ~11
  * full regexp_replace passes per document (each on the slow
  * non-ASCII JVM path). Counting rules are the regex classes', code
  * point for code point: length = code points (`length(text)`),
  * letters = `\p{L}`, digits = `[0-9]`, punct = ASCII `\p{Punct}`,
  * script counts = `Character.UnicodeScript` membership
  * (= `\p{IsArabic}` etc.), n_tokens = [[ScriptTokens]] run count.
  * Spec-pinned ≡ the regex formulation; the t26/t29/l7 DuckDB oracles
  * pin it cross-engine. */
case class ScriptStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"script_stats requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_stats"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ScriptStats.statsOf(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val stats = ctx.freshName("stats")
      s"""
         |long[] $stats = graft.functions.ScriptStats.statsOf($c);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($stats);
       """.stripMargin
    })
}

object ScriptStats {

  /** Element indices (1-based for `element_at`). */
  val Len = 1; val Letters = 2; val Digits = 3; val Punct = 4
  val NTokens = 5; val Arabic = 6; val Cjk = 7; val Cyrillic = 8
  val Greek = 9; val Latin = 10
  /** Dominant-script segment index: position in
    * [[graft.text.ScriptLm.Scripts]] name order (0=arabic … 4=latin),
    * −1 when no tracked-script code points — the argmax with
    * strict-> / earlier-name ties that
    * [[graft.text.ScriptText.dominantScript]]'s Column fold computes.
    * Computed IN the kernel so consumers read one element instead of
    * inlining a 10-element_at when-ladder per use site (the fused w15
    * gate stage blew past the JVM's 64 KB method limit that way —
    * whole-stage codegen fell back to interpreted). */
  val ScriptIdx = 11

  def statsOf(s: UTF8String): Array[Long] = {
    val str = s.toString
    val n = str.length
    var len = 0L; var letters = 0L; var digits = 0L; var punct = 0L
    var ar = 0L; var cjk = 0L; var cyr = 0L; var gr = 0L; var lat = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      len += 1
      if (Character.isLetter(cp)) letters += 1
      if (cp >= '0' && cp <= '9') digits += 1
      else if (cp < 0x80 && ((cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
        (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~'))) punct += 1
      if (cp >= 0x80) {
        // all five tracked scripts are non-ASCII; skip the table
        // lookups for the ASCII fast path (Latin ASCII letters ARE
        // script Latin — count them below)
        Character.UnicodeScript.of(cp) match {
          case Character.UnicodeScript.ARABIC => ar += 1
          case Character.UnicodeScript.HAN | Character.UnicodeScript.HIRAGANA |
               Character.UnicodeScript.KATAKANA => cjk += 1
          case Character.UnicodeScript.CYRILLIC => cyr += 1
          case Character.UnicodeScript.GREEK => gr += 1
          case Character.UnicodeScript.LATIN => lat += 1
          case _ => ()
        }
      } else if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
        lat += 1
      }
      i += Character.charCount(cp)
    }
    val ntok = ScriptWalk.tokenize(s, null)
    // argmax in name order (arabic, cjk, cyrillic, greek, latin) with
    // strict > — ties keep the earlier name, none when all zero
    val counts = Array(ar, cjk, cyr, gr, lat)
    var best = 0
    var i2 = 1
    while (i2 < counts.length) {
      if (counts(i2) > counts(best)) best = i2
      i2 += 1
    }
    val idx = if (counts(best) == 0L) -1L else best.toLong
    Array(len, letters, digits, punct, ntok, ar, cjk, cyr, gr, lat, idx)
  }

  def apply(c: Column): Column =
    GraftBridge.column(ScriptStats(GraftBridge.expression(c)))
}
