package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixing statistics: assign every embedding to its nearest of k
  * fixed centroids, then weigh the resulting semantic clusters by token
  * mass. This is the curation step that decides sampling ratios for a
  * training mix (cluster the corpus, count tokens per cluster, derive
  * per-domain weights) — the reference's cluster-then-rank loop
  * (`main.py` / `rule_generation_pipleline.py`) applied to corpus
  * curation instead of column profiles.
  *
  * The centroids are a control-plane constant (k vectors collected on
  * the driver, broadcast as literals inside the expression tree), so
  * assignment is one map-side pass — no shuffle, no iteration — and the
  * only shuffles are the id-keyed join to the token counts and a k-row
  * aggregate. That is the shape that survives 100 TB: scoring scales
  * linearly and embarrassingly, and k stays fixed.
  *
  * Scores round to `scale` decimals before the argmax (ties break to
  * the smaller centroid id), the same cross-engine determinism contract
  * as [[Similarity.cosineTopK]].
  */
object DomainMix {

  /** Nearest-centroid assignment. Returns (idCol, cluster_id, score)
    * with one row per input row. `centroids` are (id, vector) pairs —
    * k of them, driver-held by contract. */
  def assign(df: DataFrame, centroids: Seq[(Long, Array[Double])],
      idCol: String, vecCol: String, scale: Int = 4): DataFrame = {
    require(centroids.nonEmpty, "assign needs at least one centroid")
    // struct max is lexicographic: highest score wins, then highest
    // -cid = lowest centroid id
    val scored = centroids.map { case (cid, v) =>
      struct(
        round(Similarity.cosine(col(vecCol), typedLit(v)), scale).as("score"),
        lit(-cid).as("negId"))
    }
    val best = array_max(array(scored: _*))
    df.select(col(idCol),
      (-best.getField("negId")).as("cluster_id"),
      best.getField("score").as("score"))
  }

  /** Per-cluster mixing weights: document count, token mass, and the
    * token share of the whole corpus (the sampling weight a mixer
    * would feed a temperature rule). `tokens` carries (docIdCol,
    * tokenCol); the share denominator is the joined corpus total. */
  def tokenShares(assigned: DataFrame, tokens: DataFrame,
      docIdCol: String, tokenCol: String, idCol: String): DataFrame = {
    val joined = assigned.join(tokens,
      assigned(idCol) === tokens(docIdCol))
    val perCluster = joined.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("total_tokens"))
    // grand total via a global window on the POST-AGG frame: it holds
    // k rows, so the single-partition exchange is control-plane sized,
    // and the one lineage means the corpus join+agg runs once (a
    // derived-aggregate branch would recompute the whole scan)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    perCluster
      .select(col("cluster_id"), col("n_docs"), col("total_tokens"),
        halfUp4(col("total_tokens").cast("double") /
            sum("total_tokens").over(w).cast("double"))
          .as("token_share"))
  }

  /** Bit-stable half-up rounding to 4 decimals (t2's cross-engine
    * contract: floor(x·10⁴ + 0.5)/10⁴ on identical doubles). */
  private def halfUp4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
}
