package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused hashed-LM document scoring (SURVEY.md §7.3 "custom Catalyst
  * Expression, perf-only"): ONE pass over the string returning
  * [n_grams, nll_fp] against a driver-built hashed bigram model.
  *
  * The Column formulation ([[graft.text.LanguageModel.nllColumnsReference]])
  * folds an `aggregate` HOF over the bigram array with two md5
  * expressions and two 31-branch CASE ladders per gram — all
  * CodegenFallback, evaluated interpreted per occurrence (measured
  * ~21 s for 50 k documents at sf1; this loop is ~0.3 s). Same upgrade
  * as LshBands/QualityStats/RepetitionStats.
  *
  * BIT-IDENTICAL to the Column/oracle formulation (spec + w14 oracle
  * pin):
  *  - tokens = maximal [a-z0-9] runs of `lower(text)` (the same
  *    UTF8String.toLowerCase the builtin applies; every non-ASCII byte
  *    of the lowercased string is ≥ 0x80, so byte-level run detection
  *    is exact for this ASCII class);
  *  - bucket(s, m) = first 15 md5 hex chars parsed base-16, mod m
  *    ([[graft.dedup.Dedup.md5Long]] — 60 bits, so the parse is exact
  *    and the value non-negative: % = pmod);
  *  - q = clamp((d2[bucket(w₁⌣' '⌣w₂, b2)] + 1)·2³⁰ /
  *              (d1[bucket(w₁, b1)] + b2), [1, 2³⁰]);
  *  - nll += 31·2¹⁶ − e·2¹⁶ − (q·2¹⁶)/2ᵉ with e = ⌊log2 q⌋
  *    (Long division of non-negative operands = the SQL `div`).
  *
  * Equality with the regex tokenizer holds for well-formed UTF-8;
  * malformed bytes follow the [[TokenWalk]] family rule (documented
  * there), which may diverge from the regex contract.
  */
case class LmScore(child: Expression, model: LmScore.Model)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lm_score requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lm_score"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      LmScore.scoreOf(model, input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmModel", model,
      classOf[LmScore.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.LmScore.scoreOf($ref, $c));
       """.stripMargin)
  }
}

object LmScore {

  /** Driver-built dense hashed counts (bounded O(b2+b1) by
    * construction — [[graft.text.LanguageModel.denseCounts]] enforces
    * the overflow envelope before this is built). */
  final class Model(val d2: Array[Long], val d1: Array[Long])
      extends Serializable {
    val b2: Int = d2.length
    val b1: Int = d1.length
    // value equality over the counts: without it two structurally
    // identical LmScore expressions never compare equal, so Catalyst
    // canonicalization / common-subexpression elimination treats
    // independently constructed score columns as distinct work
    override def equals(o: Any): Boolean = o match {
      case m: Model => java.util.Arrays.equals(d2, m.d2) &&
        java.util.Arrays.equals(d1, m.d1)
      case _ => false
    }
    override def hashCode: Int =
      31 * java.util.Arrays.hashCode(d2) + java.util.Arrays.hashCode(d1)
  }

  private val F = 65536L
  private val PScale = 1073741824L
  private val HEX = "0123456789abcdef".toCharArray

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def scoreOf(m: Model, s: UTF8String): Array[Long] = {
    val low = s.toLowerCase.getBytes
    // per-thread digest: getInstance per ROW pays a JCA provider lookup
    // + allocation on the declared hot path; reset() happens per bucket
    val md = mdPool.get()
    var nGrams = 0L
    var nll = 0L
    var prev: String = null
    var i = 0
    val n = low.length
    // [[TokenWalk]] classification (single-sourced family rule), so
    // the ASCII token stream equals TokenArray.asciiTokens on every
    // input, well-formed or not
    while (i < n) {
      if (TokenWalk.tokenLen(low, i, n, ascii = true) > 0) {
        var j = i + 1
        while (j < n && TokenWalk.tokenLen(low, j, n, ascii = true) > 0) j += 1
        val w = new String(low, i, j - i,
          java.nio.charset.StandardCharsets.UTF_8)
        if (prev != null) {
          nGrams += 1
          nll += nllOf(m, md, prev, w)
        }
        prev = w
        i = j
      } else {
        i += TokenWalk.sepStep(low(i) & 0xff)
      }
    }
    Array(nGrams, nll)
  }

  private def nllOf(m: Model, md: java.security.MessageDigest,
      w1: String, w2: String): Long = {
    val c2 = m.d2(bucket(md, w1 + " " + w2, m.b2))
    val c1 = m.d1(bucket(md, w1, m.b1))
    var q = ((c2 + 1L) * PScale) / (c1 + m.b2.toLong)
    if (q < 1L) q = 1L else if (q > PScale) q = PScale
    val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
    31L * F - e * F - (q * F) / (1L << e)
  }

  /** = pmod(md5Long(s), m): first 15 md5 hex chars base-16 (60 bits,
    * non-negative) mod the bucket count. */
  private def bucket(md: java.security.MessageDigest, s: String,
      m: Int): Int = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val cs = new Array[Char](15)
    var i = 0
    while (i < 15) {
      cs(i) = if (i % 2 == 0) HEX((d(i / 2) >> 4) & 0xf)
              else HEX(d(i / 2) & 0xf)
      i += 1
    }
    (java.lang.Long.parseLong(new String(cs), 16) % m).toInt
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column, d2: Seq[Long], d1: Seq[Long]): Column =
    GraftBridge.column(LmScore(GraftBridge.expression(c),
      new Model(d2.toArray, d1.toArray)))
}
