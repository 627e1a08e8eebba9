package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-word greedy wordpiece counts as ONE native pass (SURVEY.md §7.3
  * "custom Catalyst Expression, perf-only"): for an array of words,
  * the piece count of each word under the greedy longest-prefix walk
  * over [[graft.text.VocabTokenCounter.Vocab]].
  *
  * Bit-identical to [[graft.text.VocabTokenCounter.piecesOf]] (the
  * Column-expression reference walk, kept for the equivalence spec and
  * the t14 oracle's recursive-CTE replay) but ~100× faster: the HOF
  * walk evaluates a 30-way `substr` when-chain through the interpreted
  * expression path per character step — measured 28s warm for the 3M
  * words of the sf1 corpus, vs sub-second for this byte loop.
  *
  * Exactness of the byte walk: vocab pieces are pure ASCII, so a piece
  * matches at a byte offset iff it matches at the corresponding
  * CHARACTER offset (a multi-byte code point can never byte-match an
  * ASCII piece), and a match advances the same number of bytes as
  * characters; the no-match fallback consumes one full code point —
  * exactly the `substr` semantics of the reference walk. Null words
  * count 0, matching the reference's null-condition no-op steps.
  */
case class PieceCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"piece_counts requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "piece_counts"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PieceCounts.countsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PieceCounts.countsOf($c);")
}

object PieceCounts {

  // Pieces bucketed by first byte, longest-first within a bucket (the
  // canonical VocabTokenCounter.ordered priority — longest wins, and
  // equal-length distinct pieces can't both match at one position).
  private val byFirst: Array[Array[Array[Byte]]] = {
    val buckets = Array.fill(128)(Vector.empty[Array[Byte]])
    graft.text.VocabTokenCounter.ordered.foreach { p =>
      val b = p.getBytes("UTF-8")
      // the byte↔character offset equivalence the walk relies on holds
      // ONLY for ASCII pieces — fail fast if the vocab ever grows one
      // (the tokenizer's à-ÿ range makes that a plausible future edit;
      // a non-ASCII piece would silently alias into an ASCII bucket)
      require(b.forall(x => (x & 0xff) < 0x80),
        s"PieceCounts requires a pure-ASCII vocab; got piece '$p'")
      buckets(b(0) & 0x7f) = buckets(b(0) & 0x7f) :+ b
    }
    buckets.map(_.toArray)
  }

  /** Greedy piece count of one word's UTF-8 bytes. */
  def piecesOfBytes(bytes: Array[Byte]): Long = {
    var i = 0
    var cnt = 0L
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      var step = 0
      if (b < 0x80) {
        val cands = byFirst(b)
        var ci = 0
        while (step == 0 && ci < cands.length) {
          val p = cands(ci)
          if (i + p.length <= n) {
            var j = 1 // first byte matched by bucket construction
            while (j < p.length && bytes(i + j) == p(j)) j += 1
            if (j == p.length) step = p.length
          }
          ci += 1
        }
        if (step == 0) step = 1 // single ASCII char fallback
      } else if (b < 0xe0) step = 2 // one code point, 2 bytes
      else if (b < 0xf0) step = 3
      else step = 4
      i += step
      cnt += 1L
    }
    cnt
  }

  /** Per-element counts for an array of words (nulls count 0). */
  def countsOf(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 0L
        else piecesOfBytes(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column): Column =
    GraftBridge.column(PieceCounts(GraftBridge.expression(c)))
}
