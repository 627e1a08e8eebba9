package graft

import graft.dedup.Contrastive
import org.apache.spark.sql.functions._

/** Pins [[Contrastive]] — contrastive-triple mining: the class
  * boundaries (≥ posThr positive; [negFloor, negThr) hard negative;
  * the [negThr, posThr) dead zone and the sub-floor easy-negative
  * zone fill neither slot), the both-classes emission rule, the
  * argmax tie-breaks, symmetric anchoring, and the end-to-end MinHash
  * path on exact copies. */
class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  private def triples(pairs: Seq[(Long, Long, Double)])
      : Map[Long, (Long, Double, Long, Double)] =
    Contrastive.triplesFromPairs(
        pairs.toDF("ida", "idb", "jaccard"), 0.8, 0.6, 0.3)
      .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("class boundaries: inclusive posThr/negFloor, exclusive negThr") {
    val got = triples(Seq(
      (1L, 10L, 0.8),   // exactly posThr → positive
      (1L, 11L, 0.3),   // exactly negFloor → hard negative
      (2L, 20L, 0.85),
      (2L, 21L, 0.6),   // exactly negThr → dead zone, NOT a negative
      (3L, 30L, 0.9),
      (3L, 31L, 0.29))) // below floor → easy negative, no slot
    assert(got(1L) == ((10L, 0.8, 11L, 0.3)))
    assert(!got.contains(2L) && !got.contains(3L))
  }

  test("both classes required; dead-zone candidates fill neither slot") {
    val got = triples(Seq(
      (1L, 10L, 0.95), // positive only → no triple
      (2L, 20L, 0.45), // negative only → no triple
      (3L, 30L, 0.7))) // dead zone only → no triple
    assert(got.isEmpty)
  }

  test("argmax per class with id tie-break; symmetric anchoring") {
    val got = triples(Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.95), // best pos = 11
      (1L, 12L, 0.5), (1L, 13L, 0.55), // best neg = 13
      (1L, 14L, 0.55)))                // tie with 13 → smaller id wins
    assert(got(1L) == ((11L, 0.95, 13L, 0.55)))
    // 11 anchors symmetrically: pos = 1 (its only ≥ 0.8 partner), but
    // it has no negative candidate → no triple for 11
    assert(!got.contains(11L))
  }

  test("a pair serves as positive for BOTH endpoints when each has a neg") {
    val got = triples(Seq(
      (1L, 2L, 0.9),
      (1L, 5L, 0.4), (2L, 6L, 0.5)))
    assert(got(1L) == ((2L, 0.9, 5L, 0.4)))
    assert(got(2L) == ((1L, 0.9, 6L, 0.5)))
  }

  test("end-to-end MinHash path: exact copies are certain positives") {
    // 30-word docs; 2 is a verbatim copy of 1 (j = 1.0, every band
    // collides); 3 shares the first 14 words of 1 with a distinct tail
    // (j ≈ 0.25 — sub-floor, never a hard negative even if captured)
    val w = (1 to 30).map(i => s"w$i").mkString(" ")
    val shared = (1 to 14).map(i => s"w$i").mkString(" ")
    val tail = (1 to 16).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, w), (2L, w), (3L, s"$shared $tail"))
      .toDF("doc_id", "text")
    val out = Contrastive.minedTriples(docs, "text", "doc_id")
      .as[(Long, Long, Double, Long, Double)].collect()
    // 1↔2 is the certain positive pair; neither endpoint has a hard
    // negative in [0.3, 0.6), so no triples emit — but the pair DOES
    // appear in the underlying verified candidates
    assert(out.isEmpty)
    val pairs = graft.dedup.Dedup.minhashNearDuplicates(
        docs, "text", "doc_id", 3, 16, 4, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }
}
