package graft

import graft.dedup.Components

/** Pins [[Components.incrementalComponents]] ≡ a full
  * [[Components.connectedComponents]] recompute over
  * (original pairs ∪ new pairs) — the correctness contract that lets a
  * 100 TB corpus fold each dump's near-dup pairs into its stored
  * component map without re-running the corpus closure. */
class IncrementalComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def full(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b")._1
      .as[(Long, Long)].collect().toMap

  private def incr(corpusPairs: Seq[(Long, Long)],
      newPairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val stored = Components.connectedComponents(
      corpusPairs.toDF("a", "b"), "a", "b")._1
    Components.incrementalComponents(stored, newPairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("bridge merges two stored components; untouched pass through") {
    val corpus = Seq((10L, 11L), (11L, 12L), // comp 10
      (20L, 21L),                            // comp 20
      (30L, 31L), (31L, 32L))                // comp 30 (untouched)
    val fresh = Seq((12L, 100L), (100L, 20L)) // new doc 100 bridges 10↔20
    val got = incr(corpus, fresh)
    assert(got == full(corpus ++ fresh))
    // the merged component takes the global min root; 30 is untouched
    assert(got(100L) == 10L && got(20L) == 10L && got(21L) == 10L)
    assert(got(30L) == 30L && got(32L) == 30L)
  }

  test("smaller new id takes over a stored component's root") {
    val corpus = Seq((10L, 11L))
    val fresh = Seq((5L, 10L)) // 5 < 10: root must become 5
    val got = incr(corpus, fresh)
    assert(got == full(corpus ++ fresh))
    assert(got == Map(5L -> 5L, 10L -> 5L, 11L -> 5L))
  }

  test("new-only pairs form components without touching the corpus") {
    val corpus = Seq((1L, 2L), (3L, 4L))
    val fresh = Seq((100L, 101L), (101L, 102L))
    val got = incr(corpus, fresh)
    assert(got == full(corpus ++ fresh))
    assert(got(102L) == 100L && got(1L) == 1L && got(4L) == 3L)
  }

  test("no new pairs returns the stored labelling unchanged") {
    val corpus = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    assert(incr(corpus, Seq.empty) == full(corpus))
  }

  test("chain of new docs merging three stored components (multi-round)") {
    // three stored components bridged through a long new-doc chain:
    // the touched-subgraph closure itself needs >1 star round
    val corpus = Seq((10L, 11L), (40L, 41L), (70L, 71L), (90L, 91L))
    val chain = (100L until 110L).map(i => (i, i + 1))
    val fresh = chain ++ Seq((11L, 100L), (105L, 40L), (110L, 70L))
    val got = incr(corpus, fresh)
    assert(got == full(corpus ++ fresh))
    assert(got(71L) == 10L && got(41L) == 10L && got(110L) == 10L)
    assert(got(90L) == 90L && got(91L) == 90L) // untouched
  }

  test("randomized graphs: incremental ≡ full recompute") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 5) {
      val corpus = Seq.fill(30)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      // new ids overlap the corpus range AND extend past it
      val fresh = Seq.fill(15)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      if (corpus.nonEmpty && fresh.nonEmpty)
        assert(incr(corpus, fresh) == full(corpus ++ fresh))
    }
  }
}
