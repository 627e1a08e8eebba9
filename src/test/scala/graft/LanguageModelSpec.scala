package graft

import graft.text.LanguageModel
import org.apache.spark.sql.functions._

/** Pins [[graft.text.LanguageModel]]: the fixed-point log2 surrogate
  * against an exact BigInt mirror, the smoothed bigram probabilities on
  * a hand-computed corpus, the ntile bucket identity, the
  * unscorable-ranks-tail contract, and the envelope guard. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side mirror of nllFp: 30·F − (e·F + ⌊q·F/2ᵉ⌋ − F). */
  private def nllRef(q: Long): Long = {
    require(q >= 1 && q <= LanguageModel.PScale)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
    31L * LanguageModel.F - e * LanguageModel.F -
      (q * LanguageModel.F) / (1L << e)
  }

  test("fixed-point log2 surrogate matches the bit-arithmetic mirror " +
      "at boundaries and random points") {
    val qs = (Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, 1025L,
      LanguageModel.PScale - 1, LanguageModel.PScale) ++
      (1 to 200).map(i => (math.abs(i * 2654435761L) %
        LanguageModel.PScale) + 1)).distinct
    val got = qs.toDF("q")
      .select(col("q"), LanguageModel.nllFp(col("q")).as("nll"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    qs.foreach { q =>
      assert(got(q) == nllRef(q), s"q=$q")
      assert(got(q) >= 0 && got(q) <= 30L * LanguageModel.F)
    }
    // strictly monotone non-increasing in q (higher prob → lower cost)
    val sorted = qs.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(got(a) >= got(b), s"monotonicity at $a,$b") }
    assert(got(1L) == 30L * LanguageModel.F)      // the clamp floor
    assert(got(LanguageModel.PScale) == 0L)       // p = 1 costs nothing
  }

  test("smoothed bigram scores match hand-computed counts on a tiny corpus") {
    // ref: "a b a b c" → bigrams: ab, ba, ab, bc; c1: a→2, b→2; V = 3+1
    val ref = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),      // c2(ab)=2, c1(a)=2 → p=(2+1)/(2+4)=1/2
      (2L, "a c"),      // c2(ac)=0, c1(a)=2 → p=1/6
      (3L, "z q"),      // unseen prefix → p=1/V=1/4
      (4L, "solo"),     // no bigrams
      (5L, "")          // empty
    ).toDF("doc_id", "text")
    val got = LanguageModel.score(docs, LanguageModel.train(ref, "text"),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def q(num: Long, den: Long) =
      math.max((num * LanguageModel.PScale) / den, 1L)
    assert(got(1L) == ((1L, nllRef(q(3, 6)))))
    assert(got(2L) == ((1L, nllRef(q(1, 6)))))
    assert(got(3L) == ((1L, nllRef(q(1, 4)))))
    assert(got(4L) == ((0L, 0L)))
    assert(got(5L) == ((0L, 0L)))
  }

  test("bucketing follows the exact ntile identity and ranks " +
      "unscorable docs tail") {
    // 7 docs: 5 scorable with distinct avg keys, 2 unscorable
    val ref = Seq((0L, "a b a b a c a d a e")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b"), (3L, "a c"), (4L, "a z"),
      (5L, "z z"), (6L, "solo"), (7L, "")).toDF("doc_id", "text")
    val out = LanguageModel.perplexityBuckets(docs, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    // unscorable docs carry the sentinel key and land in the last bucket
    assert(out(6L)._1 == LanguageModel.UnscorableKey)
    assert(out(7L)._1 == LanguageModel.UnscorableKey)
    assert(out(6L)._2 == 3L && out(7L)._2 == 3L)
    // ntile identity: rank by (key, id), bucket = (rank-1)*3 div 7 + 1
    val ranked = out.toSeq.sortBy { case (id, (k, _)) => (k, id) }
    ranked.zipWithIndex.foreach { case ((id, (_, b)), i) =>
      assert(b == i * 3 / 7 + 1, s"doc $id rank ${i + 1}") }
    // 7 docs over 3 buckets → sizes 3, 2, 2
    assert(ranked.map(_._2._2).groupBy(identity).view
      .mapValues(_.size).toMap == Map(1L -> 3, 2L -> 2, 3L -> 2))
  }

  test("the envelope guard trips loudly past the configured bound") {
    val ref = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      LanguageModel.score(docs,
        LanguageModel.train(ref, "text", maxSafeDen = 10L),
        "text", "doc_id").collect()
    }
    assert(ex.getMessage.contains("Long-exact envelope") ||
      Option(ex.getCause).exists(_.getMessage.contains("Long-exact envelope")))
  }

  test("scoring is reference-corpus linear: a doc's score is the sum " +
      "of its occurrences' costs (multiplicity counted)") {
    val ref = Seq((0L, "x y x y")).toDF("doc_id", "text")
    val m = LanguageModel.train(ref, "text")
    val one = LanguageModel.score(
      Seq((1L, "x y")).toDF("doc_id", "text"), m, "text", "doc_id")
      .select("nll_fp").as[Long].head()
    val three = LanguageModel.score(
      Seq((1L, "x y x y x y")).toDF("doc_id", "text"), m, "text", "doc_id")
      .collect().head
    // "x y x y x y": bigrams xy, yx, xy, yx, xy — 3 xy + 2 yx
    assert(three.getLong(1) == 5L)
    val yx = LanguageModel.score(
      Seq((1L, "y x")).toDF("doc_id", "text"), m, "text", "doc_id")
      .select("nll_fp").as[Long].head()
    assert(three.getLong(2) == 3 * one + 2 * yx)
  }
}
