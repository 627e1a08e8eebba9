package graft

import graft.text.Bm25
import org.apache.spark.sql.functions._

/** Pins the incremental BM25 index ([[Bm25.State]]): fold(old, new) ≡
  * build(old ∪ new) for every component, and retrieval from the
  * folded state ≡ the one-shot [[Bm25.score]] over the full corpus.
  */
class Bm25StateSpec extends SparkSpec {
  import spark.implicits._

  private val oldDocs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick red fox runs past the sleeping dog"),
    (2L, "a slow green turtle crawls under the old fence"))
  private val newDocs = Seq(
    (3L, "quick quick quick fox fox brown"),
    (4L, "entirely unrelated words about cooking pasta tonight"),
    (5L, ""))

  test("fold(old, new) == build(old ++ new), component by component") {
    val o = oldDocs.toDF("doc_id", "text")
    val n = newDocs.toDF("doc_id", "text")
    val folded = Bm25.foldState(
      Bm25.buildState(o, "text", "doc_id"),
      Bm25.buildState(n, "text", "doc_id"))
    val full = Bm25.buildState((oldDocs ++ newDocs).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(folded.post.as[(Long, Long, String, Long)].collect().toSet ===
      full.post.as[(Long, Long, String, Long)].collect().toSet)
    assert(folded.dfreq.as[(String, Long)].collect().toSet ===
      full.dfreq.as[(String, Long)].collect().toSet)
    assert(folded.sums.as[(Long, Long)].collect().toSeq ===
      full.sums.as[(Long, Long)].collect().toSeq)
  }

  test("scoreFromState(folded) == one-shot score over the union") {
    val all = (oldDocs ++ newDocs).toDF("doc_id", "text")
    val queries = Seq((10L, "quick"), (10L, "fox"), (20L, "turtle"))
      .toDF("query_id", "term")
    val folded = Bm25.foldState(
      Bm25.buildState(oldDocs.toDF("doc_id", "text"), "text", "doc_id"),
      Bm25.buildState(newDocs.toDF("doc_id", "text"), "text", "doc_id"))
    val inc = Bm25.scoreFromState(folded, queries)
      .as[(Long, Long, Long)].collect().toSet
    val full = Bm25.score(all, queries, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(inc === full)
    assert(inc.nonEmpty)
    graft.ops.StagePersists.release(spark)
  }
}
