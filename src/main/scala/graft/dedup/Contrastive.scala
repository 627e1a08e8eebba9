package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive-pair mining for embedding-model training: (anchor,
  * positive, hard-negative) triples surfaced from the SAME MinHash-LSH
  * candidate structure the dedup path already maintains. A retrieval /
  * representation model trains best against negatives that are almost
  * positives; random negatives are trivial and teach nothing. The LSH
  * candidate set is exactly the "almost" population — pairs lexically
  * close enough to collide in a band — so mining it costs one verify
  * pass over candidates the pipeline was going to generate anyway:
  *
  *  - POSITIVE: a verified candidate with Jaccard ≥ `posThr`
  *    (a near-duplicate — same content, different surface);
  *  - HARD NEGATIVE: a candidate that collided in some band but
  *    verifies in [`negFloor`, `negThr`) — the s-curve's
  *    false-positive tail, normally discarded by the dedup threshold,
  *    here the most valuable rows. The floor matters: a j ≈ 0.01
  *    band collision is an EASY negative (in-batch randoms already
  *    cover it), so it must not satisfy the hard-negative slot;
  *  - one triple per anchor: the highest-Jaccard member of each class
  *    (ties to the smaller id), anchors emitted only when both exist.
  *
  * The band shape STAYS the dedup path's (rowsPerBand = 4): the
  * s-curve's false-positive tail already supplies hard negatives in
  * the 0.4–0.6 band (P(collide | j=0.5) ≈ 0.23), while a
  * recall-biased 2-row shape would admit the j ≈ 0.1 ocean — on a
  * low-entropy corpus that is a near-quadratic candidate set, the
  * exact blowup the banding exists to avoid. Scale shape: identical
  * to [[Dedup.minhashNearDuplicates]] — banded equi-join candidates,
  * candidate-first verify, never all-pairs; the triple selection is
  * two salted top-1s at anchor grain. Work ∝ candidates, which the
  * 4-row bands bound exactly as they do for dedup. */
object Contrastive {

  def minedTriples(df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numPerms: Int = 16, rowsPerBand: Int = 4,
      posThr: Double = 0.8, negThr: Double = 0.6,
      negFloor: Double = 0.3): DataFrame = {
    require(posThr >= negThr && negThr > negFloor,
      s"need posThr >= negThr > negFloor; got $posThr/$negThr/$negFloor")
    // threshold 0.0 keeps EVERY verified candidate with its raw
    // Jaccard (common/(sza+szb-common): one double division — the
    // same correctly-rounded IEEE op in any engine)
    triplesFromPairs(
      Dedup.minhashNearDuplicates(df, textCol, idCol,
        shingleSize, numPerms, rowsPerBand, threshold = 0.0),
      posThr, negThr, negFloor)
  }

  /** The classification + selection stage over any verified pair
    * frame `(ida, idb, jaccard)` — the pair SOURCE is policy (word
    * shingles here; CJK script shingles, embedding cosine, … equally
    * valid), the triple law is not. Exposed so the spec can pin the
    * class boundaries and the both-classes rule exhaustively on
    * hand-built pairs, independent of LSH capture. */
  def triplesFromPairs(pairs: DataFrame, posThr: Double,
      negThr: Double, negFloor: Double): DataFrame = {
    require(posThr >= negThr && negThr > negFloor,
      s"need posThr >= negThr > negFloor; got $posThr/$negThr/$negFloor")
    // the verified-pair frame feeds FOUR downstream executions (both
    // sides of sym × the pos and neg selections): persist it, or the
    // whole candidate-verify machinery re-runs per consumer (r13
    // optimization — measured 8.2 s → the verify now runs once)
    val kept = graft.ops.StagePersists.track(pairs)
    val sym = kept.unionByName(kept.select(col("idb").as("ida"),
      col("ida").as("idb"), col("jaccard")))
    def best(f: DataFrame): DataFrame =
      graft.ops.Scale.saltedTopK(f, Seq(col("ida")),
        Seq(col("jaccard").desc, col("idb")), 1,
        saltOn = col("idb"), rankCol = "__rk")
    val pos = best(sym.filter(col("jaccard") >= posThr))
      .select(col("ida").as("anchor_id"), col("idb").as("pos_id"),
        col("jaccard").as("pos_jaccard"))
    val neg = best(sym.filter(col("jaccard") < negThr &&
        col("jaccard") >= negFloor))
      .select(col("ida").as("anchor_id"), col("idb").as("neg_id"),
        col("jaccard").as("neg_jaccard"))
    pos.join(neg, Seq("anchor_id"))
  }
}
