package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused KNESER–NEY document scoring — the deployed form of
  * [[graft.text.LanguageModel.knScore]] (the [[LmScore]] relationship
  * for the discounted estimator): ONE pass over the string returning
  * [n_grams, nll_fp] against driver-built dense hashed counts plus the
  * type statistics the KN backoff needs. The join form pays FOUR
  * bucket equi-joins per gram occurrence and ran linear at the ×100
  * rehearsal (218 s / 500 k docs); this loop is a per-row fold — no
  * shuffle, no state, append-mode stream legal (the w17 gate).
  *
  * BIT-IDENTICAL to the join/oracle formulation (KneserNeySpec pins
  * the spec; the w17 oracle pins it cross-engine): tokens and buckets
  * are the [[LmScore]] rules ([a-z0-9] runs via [[TokenWalk]],
  * md5-15-hex buckets); per gram, with c2/c1/n1/cont the bucket counts
  * and T the type total,
  *
  *   c1 > 0: q = clamp(⌊max(4·c2 − 3, 0)·2³⁰ / (4·c1)⌋
  *               + ⌊⌊3·n1·2³⁰ / (4·c1)⌋·cont / T⌋, 1, 2³⁰)
  *   c1 = 0: q = clamp(⌊cont·2³⁰ / T⌋, 1, 2³⁰)
  *
  * then the shared fixed-point NLL ladder.
  */
case class KnScore(child: Expression, model: KnScore.Model)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kn_score requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kn_score"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      KnScore.scoreOf(model, input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("knModel", model,
      classOf[KnScore.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.KnScore.scoreOf($ref, $c));
       """.stripMargin)
  }
}

object KnScore {

  /** Driver-built dense KN statistics ([[graft.text.LanguageModel
    * .knDenseCounts]] builds and envelope-checks them): bigram counts
    * d2 (length b2), prefix counts/continuation-type counts c1/n1
    * (length b1, same prefix bucket), continuation counts cont (length
    * b1, the w₂ bucket), and the type total t. Value equality so
    * Catalyst canonicalization dedups identical score columns (the
    * LmScore.Model lesson). */
  final class Model(val d2: Array[Long], val c1: Array[Long],
      val n1: Array[Long], val cont: Array[Long], val t: Long)
      extends Serializable {
    require(c1.length == n1.length && c1.length == cont.length && t > 0L,
      s"KN model shapes: c1 ${c1.length}, n1 ${n1.length}, " +
        s"cont ${cont.length}, t $t")
    val b2: Int = d2.length
    val b1: Int = c1.length
    override def equals(o: Any): Boolean = o match {
      case m: Model => t == m.t &&
        java.util.Arrays.equals(d2, m.d2) &&
        java.util.Arrays.equals(c1, m.c1) &&
        java.util.Arrays.equals(n1, m.n1) &&
        java.util.Arrays.equals(cont, m.cont)
      case _ => false
    }
    override def hashCode: Int =
      java.util.Arrays.hashCode(d2) * 31 + java.util.Arrays.hashCode(cont)
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
    val md = mdPool.get()
    var nGrams = 0L
    var nll = 0L
    var prev: String = null
    var i = 0
    val n = low.length
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
    val jb = bucket(md, w1, m.b1)
    val ub = bucket(md, w2, m.b1)
    val c2 = m.d2(bucket(md, w1 + " " + w2, m.b2))
    val c1 = m.c1(jb)
    var q =
      if (c1 > 0L) {
        val t1 = (math.max(c2 * 4L - 3L, 0L) * PScale) / (c1 * 4L)
        val t2 = ((m.n1(jb) * 3L * PScale) / (c1 * 4L)) * m.cont(ub) / m.t
        t1 + t2
      } else m.cont(ub) * PScale / m.t
    if (q < 1L) q = 1L else if (q > PScale) q = PScale
    val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
    31L * F - e * F - (q * F) / (1L << e)
  }

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
  def apply(c: Column, d2: Seq[Long], c1: Seq[Long], n1: Seq[Long],
      cont: Seq[Long], t: Long): Column =
    GraftBridge.column(KnScore(GraftBridge.expression(c),
      new Model(d2.toArray, c1.toArray, n1.toArray, cont.toArray, t)))
}
