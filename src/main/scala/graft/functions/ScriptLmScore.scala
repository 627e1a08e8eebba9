package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Fused PER-SCRIPT hashed-LM scoring (the [[LmScore]] upgrade for the
  * multilingual plane): ONE pass over a document's script-aware token
  * array returning [n_grams, nll_fp] against the script's segment of a
  * concatenated dense count model.
  *
  * Unlike [[LmScore]] this kernel does NOT tokenize — the left child is
  * the already-built token array ([[graft.text.ScriptText.tokens]], a
  * codegen'd builtin regex chain that handles every Unicode script),
  * and the right child is the routed script's dense-segment index
  * ([[graft.text.ScriptLm.scriptIndex]]; −1 = unroutable → [0, 0],
  * the tagged-unscorable result). Per gram:
  *
  *   q = clamp((d2[idx·b2 + bucket(w₁⌣' '⌣w₂, b2)] + 1)·2³⁰ /
  *             (d1[idx·b1 + bucket(w₁, b1)] + b2), [1, 2³⁰])
  *   nll += 31·2¹⁶ − e·2¹⁶ − (q·2¹⁶)/2ᵉ,  e = ⌊log2 q⌋
  *
  * with bucket = first 15 md5 hex chars base-16 mod m (the
  * [[graft.dedup.Dedup.md5Long]] portable hash) — term for term the
  * [[graft.text.ScriptLm.score]] join form, which ScriptLmSpec pins
  * per row and the t29 oracle pins cross-engine.
  */
case class ScriptLmScore(left: Expression, right: Expression,
    model: ScriptLmScore.Model) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"script_lm_score requires (array<string>, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_lm_score"

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def nullSafeEval(toks: Any, idx: Any): Any =
    new GenericArrayData(ScriptLmScore.scoreOf(model,
      toks.asInstanceOf[ArrayData], idx.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scriptLmModel", model,
      classOf[ScriptLmScore.Model].getName)
    nullSafeCodeGen(ctx, ev, (t, i) =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ScriptLmScore.scoreOf($ref, $t, $i));
       """.stripMargin)
  }
}

object ScriptLmScore {

  /** Concatenated per-script dense counts: d2.length = nScripts·b2,
    * d1.length = nScripts·b1 ([[graft.text.ScriptLm.denseCounts]]
    * builds and envelope-checks them). Value equality so Catalyst
    * canonicalization dedups structurally identical score columns
    * (the LmScore.Model lesson). */
  final class Model(val d2: Array[Long], val d1: Array[Long],
      val b2: Int, val b1: Int) extends Serializable {
    require(d2.length % b2 == 0 && d1.length % b1 == 0 &&
      d2.length / b2 == d1.length / b1,
      s"dense segments must tile: (${d2.length}, ${d1.length}) vs ($b2, $b1)")
    val nScripts: Int = d2.length / b2
    override def equals(o: Any): Boolean = o match {
      case m: Model => b2 == m.b2 && b1 == m.b1 &&
        java.util.Arrays.equals(d2, m.d2) && java.util.Arrays.equals(d1, m.d1)
      case _ => false
    }
    override def hashCode: Int =
      31 * (31 * java.util.Arrays.hashCode(d2) +
        java.util.Arrays.hashCode(d1)) + b2
  }

  private val F = 65536L
  private val PScale = 1073741824L
  private val HEX = "0123456789abcdef".toCharArray

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def scoreOf(m: Model, toks: ArrayData, idx: Int): Array[Long] = {
    val n = toks.numElements()
    if (idx < 0 || idx >= m.nScripts || n < 2) return Array(0L, 0L)
    val md = mdPool.get()
    val off2 = idx * m.b2
    val off1 = idx * m.b1
    var nll = 0L
    var prev = toks.getUTF8String(0).toString
    var i = 1
    while (i < n) {
      val w = toks.getUTF8String(i).toString
      val c2 = m.d2(off2 + bucket(md, prev + " " + w, m.b2))
      val c1 = m.d1(off1 + bucket(md, prev, m.b1))
      var q = ((c2 + 1L) * PScale) / (c1 + m.b2.toLong)
      if (q < 1L) q = 1L else if (q > PScale) q = PScale
      val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
      nll += 31L * F - e * F - (q * F) / (1L << e)
      prev = w
      i += 1
    }
    Array((n - 1).toLong, nll)
  }

  /** = pmod(md5Long(s), m) — the [[LmScore]] bucket, duplicated here
    * because the md5-hex walk is 10 lines and sharing would force the
    * two kernels into one file's visibility. */
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

  def apply(toks: Column, scriptIdx: Column, d2: Seq[Long], d1: Seq[Long],
      b2: Int, b1: Int): Column =
    GraftBridge.column(ScriptLmScore(GraftBridge.expression(toks),
      GraftBridge.expression(scriptIdx),
      new Model(d2.toArray, d1.toArray, b2, b1)))
}
