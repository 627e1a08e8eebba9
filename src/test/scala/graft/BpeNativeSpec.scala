package graft

import graft.text.{BpeTokenCounter, BpeTrainer}
import org.apache.spark.sql.functions._

/** Pins the native [[graft.functions.BpeMergeCounts]] pass to the
  * Column-expression fold it replaces — bit-identical sequential
  * no-revisit semantics — and demonstrates the vocab-scale win the
  * fold structurally cannot have (the round-8 `weak` mark). */
class BpeNativeSpec extends SparkSpec {
  import spark.implicits._

  /** The fold semantics in plain Scala: each merge applies once, in
    * rank order, greedy left-to-right, last-written-piece equality. */
  private def seqApplyCount(word: String, merges: Seq[(String, String)]): Long = {
    var pieces: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val acc = Vector.newBuilder[String]
      var last: String = null
      pieces.foreach { x =>
        if (last == l && x == r) last = l + r
        else { if (last != null) acc += last; last = x }
      }
      if (last != null) acc += last
      pieces = acc.result()
    }
    pieces.size.toLong
  }

  private def nativeCounts(words: Seq[String],
      merges: Seq[(String, String)]): Seq[Long] = {
    val counter = BpeTokenCounter(merges)
    words.toDF("w").select(counter.pieceCounts(array(col("w"))).as("c"))
      .collect().map(_.getSeq[Long](0).head).toSeq
  }

  test("native merge application ≡ the Column fold on the gate corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val merges = BpeTrainer.trainMerges(docs, "text", numMerges = 12)
      .map(m => (m._2, m._3))
    val counter = BpeTokenCounter(merges)
    val mismatches = docs.select(
        counter.count(col("text")).as("native"),
        counter.referenceCount(col("text")).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(mismatches == 0L)
  }

  test("native ≡ fold on adversarial chaining/no-revisit words") {
    // (a,a) chaining parity; (b,c) then (a,bc) ordering; a late merge
    // re-creating an early adjacency must NOT be revisited:
    // merges [(x,y) rank1, (z,x) rank2] on "zxy": rank1 merges xy →
    // [z, xy]; rank2 needs z+x adjacency — x is gone, nothing fires.
    // But on "zxxy": rank1 → [z,x,xy]; rank2 → [zx, xy] (zx+xy never
    // re-enters rank1 because rank1 is past). Multi-byte à pieces ride
    // the BMP char table.
    val merges = Seq(("a", "a"), ("x", "y"), ("z", "x"), ("aa", "b"),
      ("à", "è"), ("xy", "xy"))
    val words = Seq("aaaa", "aaaaa", "ab", "aab", "aaab", "zxy", "zxxy",
      "xyxy", "xyxyxy", "àè", "àèàè", "zzz", "", "q", "aabaab")
    val native = nativeCounts(words, merges)
    val expected = words.map(seqApplyCount(_, merges))
    assert(native == expected, s"native=$native expected=$expected")
    // and against the interpreted Column fold itself (non-empty words —
    // split never yields empties)
    val counter = BpeTokenCounter(merges)
    val ne = words.filter(_.nonEmpty)
    val viaFold = ne.toDF("text")
      .select(counter.referenceCount(col("text")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    val viaNative = ne.toDF("text")
      .select(counter.count(col("text")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaNative == viaFold)
  }

  test("native handles a 30k-merge vocabulary exactly (vs Scala reference) and fast") {
    val rnd = new scala.util.Random(42)
    val alphabet = ('a' to 'z').map(_.toString)
    // chained synthetic vocab: each merge pairs two existing pieces, so
    // deep merge cascades actually fire on real words
    val pieces = scala.collection.mutable.ArrayBuffer[String](alphabet: _*)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val seen = scala.collection.mutable.HashSet[(String, String)]()
    while (merges.size < 30000) {
      val l = pieces(rnd.nextInt(math.min(pieces.size, 2000)))
      val r = pieces(rnd.nextInt(math.min(pieces.size, 2000)))
      if ((l + r).length <= 12 && seen.add((l, r))) {
        merges += ((l, r)); pieces += (l + r)
      }
    }
    val table = merges.toSeq
    val words = (1 to 300).map(_ =>
      (1 to (3 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(26))).mkString)
    val native = nativeCounts(words, table)
    val expected = words.map(seqApplyCount(_, table))
    assert(native == expected)
    // scale sanity: 20k words under the 30k-merge table in seconds, not
    // the fold's hours (the fold cannot even ANALYZE a 30k-deep
    // expression tree — see the timing test below for the measured gap
    // at a fold-feasible size)
    val many = (1 to 20000).map(_ =>
      (1 to (3 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(26))).mkString)
    val t0 = System.nanoTime()
    val df = many.toDF("w")
      .select(graft.functions.BpeMergeCounts(array(col("w")), table).as("c"))
    val total = df.agg(sum(element_at(col("c"), 1))).head.getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"native 30k merges × 20k words: $sec%.2fs (sum=$total)")
    assert(total > 0)
    assert(sec < 30.0)
  }

  test("native beats the interpreted fold ≥10× at a fold-feasible vocab size") {
    val rnd = new scala.util.Random(7)
    val alphabet = ('a' to 'z').map(_.toString)
    val pieces = scala.collection.mutable.ArrayBuffer[String](alphabet: _*)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val seen = scala.collection.mutable.HashSet[(String, String)]()
    while (merges.size < 48) {
      val l = pieces(rnd.nextInt(pieces.size))
      val r = pieces(rnd.nextInt(pieces.size))
      if ((l + r).length <= 8 && seen.add((l, r))) {
        merges += ((l, r)); pieces += (l + r)
      }
    }
    val table = merges.toSeq
    val counter = BpeTokenCounter(table)
    val texts = (1 to 400).map(_ =>
      (1 to 40).map(_ =>
        (1 to (3 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(26))).mkString)
        .mkString(" "))
    val df = texts.toDF("text").cache()
    df.count()
    def time(c: org.apache.spark.sql.Column): (Long, Double) = {
      // warm once (codegen/JIT), then measure
      df.select(sum(c)).head.getLong(0)
      val t0 = System.nanoTime()
      val v = df.select(sum(c)).head.getLong(0)
      (v, (System.nanoTime() - t0) / 1e9)
    }
    val (nv, nt) = time(counter.count(col("text")))
    val (rv, rt) = time(counter.referenceCount(col("text")))
    df.unpersist()
    assert(nv == rv)
    info(f"native $nt%.3fs vs fold $rt%.3fs (×${rt / nt}%.0f) at ${table.size} merges")
    assert(rt / nt >= 10.0,
      f"expected ≥10× native win, got ×${rt / nt}%.1f (native $nt%.3fs fold $rt%.3fs)")
  }
}
