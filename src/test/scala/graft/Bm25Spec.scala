package graft

import graft.text.{Bm25, LanguageModel}
import org.apache.spark.sql.functions._

/** Pins [[Bm25.score]]/[[Bm25.topK]] against a from-scratch driver
  * recompute of the documented integer spec — the clamped Robertson idf
  * through the shared lg2 ladder, the 20·S-scaled tf saturation, avgdl
  * as max(1, ⌊T/N⌋) — plus the retrieval laws the formula must satisfy
  * (self-pair exclusion, tf monotonicity, rare-term dominance).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val F = LanguageModel.F
  private val P = LanguageModel.PScale
  private val S = Bm25.S

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def lg2(q: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
    e * F + (q * F) / (1L << e) - F
  }

  /** Driver recompute over a (id, text) corpus for query (qid, terms). */
  private def bm25(corpus: Seq[(Long, String)], qid: Long,
      terms: Seq[String]): Map[Long, Long] = {
    val tf = corpus.map { case (id, t) => id -> toks(t) }
    val n = corpus.size.toLong
    val tt = tf.map(_._2.size.toLong).sum
    val avgdl = math.max(1L, tt / n)
    val dfm = terms.distinct.map { t =>
      t -> tf.count(_._2.contains(t)).toLong
    }.toMap
    tf.filter(_._1 != qid).flatMap { case (id, ws) =>
      val dl = ws.size.toLong
      val rel = dl * S / avgdl
      val score = terms.distinct.map { t =>
        val c = ws.count(_ == t).toLong
        if (c == 0L || dfm(t) == 0L) 0L
        else {
          val q = math.min(math.max((2L * n + 2L) * F / (2L * dfm(t) + 1L),
            1L), P)
          (lg2(q) - 16L * F) *
            (c * 44L * S * S / (c * 20L * S + 6L * S + 18L * rel))
        }
      }.sum
      if (terms.distinct.exists(t => ws.contains(t))) Some(id -> score)
      else None
    }.toMap
  }

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick red fox runs past the sleeping dog"),
    (2L, "a slow green turtle crawls under the old fence"),
    (3L, "quick quick quick fox fox brown"),
    (4L, "entirely unrelated words about cooking pasta tonight"),
    (5L, "the brown dog and the brown fox share a brown den"))

  test("score == the documented integer spec, per (query, doc)") {
    val docs = corpus.toDF("doc_id", "text")
    val qterms = Seq("quick", "brown", "fox")
    val queries = qterms.map(t => (0L, t)).toDF("query_id", "term")
    val got = Bm25.score(docs, queries, "text", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val want = bm25(corpus, 0L, qterms)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, s) => assert(s === want(id), s"doc $id") }
  }

  test("retrieval laws: self excluded, tf-monotone, rare term dominates") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq((0L, "quick"), (0L, "fox"), (1L, "turtle"))
      .toDF("query_id", "term")
    val rows = Bm25.topK(docs, queries, "text", "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    // no self pair
    assert(!rows.exists(r => r._1 == r._2))
    // query 0: doc 3 (tf quick=3, fox=2, short) outranks doc 1 (tf 1+1)
    val q0 = rows.filter(_._1 == 0L).sortBy(_._4).map(_._2)
    assert(q0.head === 3L)
    // query 1 ("turtle", df=1): exactly the one containing doc
    assert(rows.filter(_._1 == 1L).map(_._2).toSeq === Seq(2L))
    // ranks are 1..k dense per query, ordered by (score desc, doc_id)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to rs.length))
      assert(sorted.map(r => (-r._3, r._2)).toSeq ===
        sorted.map(r => (-r._3, r._2)).sortBy(identity).toSeq)
    }
  }

  test("plan shape: query-term joins broadcast, no pairwise scan") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq((0L, "quick"), (0L, "fox")).toDF("query_id", "term")
    val plan = Bm25.topK(docs, queries, "text", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop joins are 1-row broadcast totals frames
    // (saturation in the champion stage, N in the idf stage)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 3, plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term joins must broadcast:\n$plan")
    graft.ops.StagePersists.release(spark)
  }

  test("idf clamp: a term in every document still scores non-negative") {
    val docs = corpus.toDF("doc_id", "text")
    // "the" appears in most docs → tiny idf, never negative
    val queries = Seq((0L, "the")).toDF("query_id", "term")
    val got = Bm25.score(docs, queries, "text", "doc_id").collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(2) >= 0L))
  }
}
