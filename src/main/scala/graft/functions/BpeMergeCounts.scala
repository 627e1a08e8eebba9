package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-word piece counts under a LEARNED BPE merge table as one native
  * pass (SURVEY.md §7.3 "custom Catalyst Expression, perf-only") — the
  * scale path for [[graft.text.BpeTokenCounter]], whose Column form is
  * |merges| sequential interpreted `aggregate` folds PER WORD: already
  * the slowest bench query at the gate's 12 merges, and a structural
  * cliff at a real 30k-merge vocabulary (the same interpreted-HOF class
  * fixed in PieceCounts/DotProduct/LshBands/MarkerLangId).
  *
  * Semantics are the SEQUENTIAL application the engine pins
  * cross-engine (BpeSpec + the t25 oracle): each merge applies once, in
  * rank order, as a greedy left-to-right fold — a just-merged piece
  * cannot chain into the same merge, and a later merge re-creating an
  * earlier merge's adjacency does NOT revisit it. This is deliberately
  * NOT the priority-queue inference of production BPE encoders (which
  * can differ on novel words); it is bit-identical to
  * [[graft.text.BpeTrainer.applyMerge]] folded over the table.
  *
  * The one-pass trick that makes 30k merges affordable: almost every
  * merge's sides are ABSENT from a given word, so ranks are pulled from
  * a per-piece inverted index (piece → ranks it participates in) into a
  * min-heap and processed in rank order — the word only pays for merges
  * whose sides it actually contains, O(candidates · |pieces|) instead
  * of O(|merges| · |pieces|). Merges applied here may enable later
  * ranks (the out piece's index entries are pushed as they appear);
  * popped ranks ≤ the last processed rank are skipped, which is exactly
  * the no-revisit rule.
  */
case class BpeMergeCounts(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_counts requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_merge_counts"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  @transient private lazy val table = BpeMergeCounts.Table(merges)

  override def nullSafeEval(input: Any): Any =
    BpeMergeCounts.countsOf(table, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeCounts.Table].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeMergeCounts.countsOf($ref, $c);")
  }
}

object BpeMergeCounts {

  /** Driver-compiled merge table: pieces interned to dense ids so word
    * state is int arrays and membership is an O(1) stamp check. */
  final class Table(mergeSeq: Seq[(String, String)]) extends Serializable {
    val nMerges: Int = mergeSeq.size
    // piece universe: every merge side and every merge output. Word
    // characters outside this set are INERT (they can never match a
    // side), so they all share the sentinel id -1 — equality among
    // inert pieces never matters for merging.
    private val idOf = new java.util.HashMap[String, Integer]()
    private def intern(p: String): Int = {
      val got = idOf.get(p)
      if (got != null) got.intValue()
      else { val id = idOf.size(); idOf.put(p, id); id }
    }
    val mergeL: Array[Int] = new Array[Int](nMerges)
    val mergeR: Array[Int] = new Array[Int](nMerges)
    val mergeOut: Array[Int] = new Array[Int](nMerges)
    mergeSeq.zipWithIndex.foreach { case ((l, r), k) =>
      mergeL(k) = intern(l); mergeR(k) = intern(r)
      mergeOut(k) = intern(l + r)
    }
    val nPieces: Int = idOf.size()
    /** piece id → ascending ranks the piece participates in (as l or r). */
    val ranksOf: Array[Array[Int]] = {
      val b = Array.fill(nPieces)(Vector.empty[Int])
      var k = 0
      while (k < nMerges) {
        b(mergeL(k)) = b(mergeL(k)) :+ k
        if (mergeR(k) != mergeL(k)) b(mergeR(k)) = b(mergeR(k)) :+ k
        k += 1
      }
      b.map(_.toArray)
    }
    def pieceId(p: String): Int = {
      val got = idOf.get(p); if (got == null) -1 else got.intValue()
    }
    // single-char piece ids are the hot lookup (every word character):
    // direct-indexed for the BMP, bypassing the HashMap + String alloc
    val charId: Array[Int] = {
      val a = Array.fill(65536)(-1)
      val it = idOf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.length == 1) a(e.getKey.charAt(0).toInt) = e.getValue.intValue()
      }
      a
    }
  }

  /** Per-thread scratch: piece-presence stamps (versioned — no clearing
    * between words), the candidate min-heap, and the piece buffer. */
  private final class Scratch(nPieces: Int) {
    var stamp: Array[Int] = new Array[Int](math.max(nPieces, 1))
    var version: Int = 0
    var heap: Array[Int] = new Array[Int](64)
    var heapN: Int = 0
    var buf: Array[Int] = new Array[Int](64)
    def present(p: Int): Boolean = p >= 0 && stamp(p) == version
    def mark(p: Int): Unit = if (p >= 0) stamp(p) = version
    def push(k: Int): Unit = {
      if (heapN == heap.length) heap = java.util.Arrays.copyOf(heap, heapN * 2)
      var i = heapN; heap(i) = k; heapN += 1
      while (i > 0 && heap((i - 1) / 2) > heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t; i = p
      }
    }
    def pop(): Int = {
      val top = heap(0); heapN -= 1
      heap(0) = heap(heapN)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < heapN && heap(l) < heap(m)) m = l
        if (r < heapN && heap(r) < heap(m)) m = r
        if (m == i) done = true
        else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
      }
      top
    }
  }

  private val scratch = new ThreadLocal[Scratch]()

  /** Piece count of one word under `t`'s sequential merge application. */
  def countOf(t: Table, word: String): Long = {
    var s = scratch.get()
    if (s == null || s.stamp.length < math.max(t.nPieces, 1)) {
      s = new Scratch(t.nPieces); scratch.set(s)
    }
    // initial pieces: one per CODE POINT (the reference fold's
    // substr-by-character walk); supplementary-plane characters fall
    // outside charId's BMP table and intern as inert via pieceId
    val wlen = word.length
    if (s.buf.length < wlen) s.buf = new Array[Int](wlen * 2)
    val buf = s.buf
    s.version += 1
    s.heapN = 0
    var n = 0
    var i = 0
    while (i < wlen) {
      val cp = word.codePointAt(i)
      val id =
        if (cp < 65536) t.charId(cp)
        else t.pieceId(new String(Character.toChars(cp)))
      buf(n) = id
      if (id >= 0 && !s.present(id)) {
        s.mark(id)
        val ranks = t.ranksOf(id)
        var j = 0
        while (j < ranks.length) { s.push(ranks(j)); j += 1 }
      }
      n += 1
      i += Character.charCount(cp)
    }
    if (n < 2 || t.nMerges == 0) return n.toLong
    var lastK = -1
    while (s.heapN > 0) {
      val k = s.pop()
      if (k > lastK) {
        lastK = k
        val l = t.mergeL(k); val r = t.mergeR(k)
        if (s.present(l) && s.present(r)) {
          // greedy left-to-right, exactly the applyMerge fold: merge
          // when the last WRITTEN piece is l and the incoming is r; the
          // written merge output (strictly longer than l) can never
          // itself equal l, so chains break by value equality alone
          var read = 0; var write = 0
          var merged = false
          val out = t.mergeOut(k)
          while (read < n) {
            val x = buf(read)
            if (write > 0 && buf(write - 1) == l && x == r) {
              buf(write - 1) = out; merged = true
            } else { buf(write) = x; write += 1 }
            read += 1
          }
          n = write
          if (merged && !s.present(out)) {
            s.mark(out)
            val ranks = t.ranksOf(out)
            var j = 0
            while (j < ranks.length) {
              if (ranks(j) > k) s.push(ranks(j))
              j += 1
            }
          }
        }
      }
    }
    n.toLong
  }

  /** Per-element counts for an array of words (nulls count 0,
    * mirroring the reference fold's null-condition no-op steps). */
  def countsOf(t: Table, arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 0L
        else countOf(t, arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  object Table { def apply(m: Seq[(String, String)]): Table = new Table(m) }

  /** Column wrapper (Spark 4 classic API via [[GraftBridge]]). */
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeMergeCounts(GraftBridge.expression(c), merges))
}
