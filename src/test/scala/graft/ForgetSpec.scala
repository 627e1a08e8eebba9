package graft

import graft.dedup.{Components, Forget}
import org.apache.spark.sql.functions._

/** Pins [[Forget]] — deletion propagation across the maintained
  * states — against the rebuild-from-remaining ground truth, including
  * the contracts the l10 oracle can only exercise when the LSH capture
  * cooperates: component SPLITS (a deleted bridge), root takeover,
  * whole-component removal, members that lose their last edge leaving
  * the state, untouched-component byte-identity, and the BM25
  * negative-batch fold's edge cases (zero-token docs, df reaching 0,
  * delete ids absent from the corpus). */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  // ---- components ---------------------------------------------------------

  /** Rebuild ground truth: closure over the pairs among remaining ids. */
  private def rebuilt(pairs: Seq[(Long, Long)],
      deletes: Seq[Long]): Map[Long, Long] = {
    val del = deletes.toSet
    val rem = pairs.filter(p => !del(p._1) && !del(p._2))
    if (rem.isEmpty) Map.empty
    else Components.connectedComponents(rem.toDF("a", "b"), "a", "b")._1
      .as[(Long, Long)].collect().toMap
  }

  private def folded(pairs: Seq[(Long, Long)],
      deletes: Seq[Long]): Map[Long, Long] = {
    val stored = Components.connectedComponents(
      pairs.toDF("a", "b"), "a", "b")._1
    Forget.components(stored, pairs.toDF("a", "b"),
        deletes.toDF("id"), "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("deleting a bridge SPLITS the component; both sides re-root") {
    val pairs = Seq((10L, 11L), (11L, 50L), (50L, 20L), (20L, 21L))
    val got = folded(pairs, Seq(50L))
    assert(got == rebuilt(pairs, Seq(50L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("deleting the root re-elects the next-smallest member") {
    val pairs = Seq((10L, 11L), (11L, 12L))
    val got = folded(pairs, Seq(10L))
    assert(got == rebuilt(pairs, Seq(10L)))
    assert(got == Map(11L -> 11L, 12L -> 11L))
  }

  test("deleting a whole component removes it; others untouched") {
    val pairs = Seq((1L, 2L), (30L, 31L), (31L, 32L))
    val got = folded(pairs, Seq(1L, 2L))
    assert(got == rebuilt(pairs, Seq(1L, 2L)))
    assert(got == Map(30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("a member that loses its last edge leaves the state") {
    // 5—6 and 6—7: deleting 6 leaves 5 and 7 edge-less → both drop,
    // exactly as a rebuild over the remaining corpus never labels them
    val pairs = Seq((5L, 6L), (6L, 7L), (30L, 31L))
    val got = folded(pairs, Seq(6L))
    assert(got == rebuilt(pairs, Seq(6L)))
    assert(got == Map(30L -> 30L, 31L -> 30L))
  }

  test("deleting ids outside the state is a no-op") {
    val pairs = Seq((1L, 2L), (3L, 4L))
    assert(folded(pairs, Seq(999L)) == rebuilt(pairs, Nil))
  }

  test("untouched components pass through byte-identical (same rows)") {
    val pairs = Seq((10L, 11L), (11L, 50L), (50L, 20L), // touched via 50
      (30L, 31L), (31L, 32L), (40L, 41L))               // untouched
    val stored = Components.connectedComponents(
      pairs.toDF("a", "b"), "a", "b")._1
    val out = Forget.components(stored, pairs.toDF("a", "b"),
      Seq(50L).toDF("id"), "a", "b")
    val untouchedStored = stored
      .filter(col("component_id").isin(30L, 40L))
      .as[(Long, Long)].collect().toSet
    val untouchedOut = out.filter(col("component_id").isin(30L, 40L))
      .as[(Long, Long)].collect().toSet
    assert(untouchedStored == untouchedOut && untouchedStored.size == 5)
  }

  test("multi-way split: star center deletion shatters into pairs") {
    // center 1 connects three 2-cliques; deleting 1 yields 3 components
    val pairs = Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (10L, 11L), (20L, 21L), (30L, 31L))
    val got = folded(pairs, Seq(1L))
    assert(got == rebuilt(pairs, Seq(1L)))
    assert(got.values.toSet == Set(10L, 20L, 30L))
  }

  // ---- bm25 ---------------------------------------------------------------

  private def stateRows(st: graft.text.Bm25.State)
      : (Set[(Long, String, Long)], Map[String, Long], (Long, Long)) = {
    val post = st.post.select(col("id").cast("long"), col("term"),
      col("tf").cast("long")).as[(Long, String, Long)].collect().toSet
    val df = st.dfreq.as[(String, Long)].collect().toMap
    val sums = st.sums.as[(Long, Long)].collect().head
    (post, df, sums)
  }

  test("bm25 fold ≡ rebuild over remaining docs (incl. df → 0 terms)") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta gamma"),
      (3L, "gamma delta unique"),
      (4L, "")).toDF("doc_id", "text") // zero-token doc
    val bm = graft.text.Bm25
    val full = bm.buildState(docs, "text", "doc_id")
    val deletes = docs.filter(col("doc_id").isin(3L, 4L))
    val foldSt = Forget.bm25(full, deletes, "text", "doc_id")
    val rebuildSt = bm.buildState(
      docs.filter(!col("doc_id").isin(3L, 4L)), "text", "doc_id")
    assert(stateRows(foldSt) == stateRows(rebuildSt))
    // 'delta'/'unique' reached df 0 and left the dictionary
    assert(!stateRows(foldSt)._2.contains("delta"))
    // the zero-token doc still decremented __n: 4 docs − 2 = 2
    assert(stateRows(foldSt)._3._1 == 2L)
  }

  test("bm25 fold with an empty delete set is identity") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val bm = graft.text.Bm25
    val full = bm.buildState(docs, "text", "doc_id")
    val foldSt = Forget.bm25(full, docs.filter(lit(false)), "text", "doc_id")
    assert(stateRows(foldSt) == stateRows(full))
  }
}
