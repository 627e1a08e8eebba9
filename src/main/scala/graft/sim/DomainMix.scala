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

  /** Integer exp2 over the shared fixed-point scale — the EXACT
    * inverse of [[graft.text.LanguageModel]]'s linear-interpolated
    * lg2: for x = e·F + frac (0 ≤ frac < F, e ≤ capBits),
    * exp2_fp(x) = 2ᵉ·(F + frac) — an F-scaled multiplier in
    * [F, 2^capBits·2F). Both engines replay the same ≤5-branch 2ᵉ
    * CASE and Long products. */
  private def exp2Fp(x: Column, capBits: Int): Column = {
    val F = graft.text.LanguageModel.F
    val e = graft.text.LanguageModel.ldiv(x, lit(F))
    val pw = (1 to capBits).foldLeft(when(e === 0L, 1L)) {
      (c, b) => c.when(e === b.toLong, 1L << b)
    }.otherwise(1L << capBits)
    pw * (lit(F) + (x - e * lit(F)))
  }

  /** DoReMi-style loss-aware domain reweighting (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining" — the one-shot deterministic gesture of its
    * excess-loss update): score every document with the trusted-corpus
    * bigram LM ([[graft.text.LanguageModel]], the t28 estimator), roll
    * per-domain average NLL up against the corpus baseline, and
    * upweight each domain by exp2 of its EXCESS bits-per-gram, capped
    * at `capBits` (DoReMi clips its updates too; exp is replaced by
    * the ladder-exact [[exp2Fp]] so the mixture hash-oracles).
    * Returns one control-plane row per domain: (domain, n_docs,
    * n_grams, avg_nll_fp, excess_fp, weight_fp, share_fp) with
    * share_fp = ⌊weight·2²⁰ / Σweights⌋ — the sampling mixture.
    * Unscorable domains (zero grams) carry the unscorable avg key,
    * zero excess, and the base weight.
    *
    * Scale shape: LM training + scoring are the t28 linear passes; the
    * rollup is one domain-sized agg; the share normalization is a
    * global window over the POST-AGG domain frame (control-plane
    * sized, the [[tokenShares]] device). */
  def lossReweight(docs: DataFrame, ref: DataFrame, textCol: String,
      idCol: String, domainCol: String, capBits: Int = 4): DataFrame = {
    val lm = graft.text.LanguageModel
    val F = lm.F
    val scored = lm.score(docs, lm.train(ref, textCol), textCol, idCol)
    val per = scored
      .join(docs.select(col(s"`$idCol`").as("id"),
        col(s"`$domainCol`").as("domain")), Seq("id"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("n_grams").as("n_grams"),
        sum("nll_fp").as("__nll"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val totGrams = sum("n_grams").over(w)
    val totNll = sum("__nll").over(w)
    val baseline = lm.ldiv(totNll * 1024L, totGrams)
    val avg = when(col("n_grams") > 0L,
      lm.ldiv(col("__nll") * 1024L, col("n_grams")))
      .otherwise(lit(lm.UnscorableKey))
    val excess = when(col("n_grams") > 0L,
      least(lm.ldiv(greatest(avg - baseline, lit(0L)), lit(1024L)),
        lit(capBits.toLong * F))).otherwise(lit(0L))
    val stats = per.select(col("domain"), col("n_docs"), col("n_grams"),
      avg.as("avg_nll_fp"), excess.as("excess_fp"),
      exp2Fp(excess, capBits).as("weight_fp"))
    stats.select(col("domain"), col("n_docs"), col("n_grams"),
      col("avg_nll_fp"), col("excess_fp"), col("weight_fp"),
      lm.ldiv(col("weight_fp") * 1048576L, sum("weight_fp").over(w))
        .as("share_fp"))
  }

  /** The epoch/sampling PLAN — the artifact a training run actually
    * consumes: given per-document token counts grouped by `groupCol`
    * and a token budget B = total·budgetNum/budgetDen, allocate B
    * across groups by √-temperature weights (target_g ∝ ⌊√T_g⌋, the
    * α = 0.5 multilingual rebalance in INTEGER form — isqrt is
    * floor(correctly-rounded sqrt) of an exactly-represented Long,
    * identical in any engine) and report per group:
    *
    *  - tokens_avail / n_docs — what the corpus holds;
    *  - target_tokens = B·s_g/Σs — what the mixture wants;
    *  - epochs = ⌈target/avail⌉ capped at `maxEpochs` — how many
    *    passes over an UNDER-sized group the plan repeats (the
    *    LLaMA-style per-source epoch table);
    *  - achieved_tokens = min(target, maxEpochs·avail) and the
    *    deficit the cap leaves — reported, NOT silently
    *    redistributed: reweighting is the consumer's next call;
    *  - rate_thr — for an OVER-sized group, the 60-bit md5-gate
    *    threshold ([[mixtureRates]] convention) that downsamples a
    *    single pass to the target.
    *
    * Shape: one groupBy(`groupCol`) partial agg + a broadcast 1-row
    * total — control-plane output, corpus-linear input. Long
    * arithmetic holds to ~8·10¹² target tokens per group (target·2⁴⁰
    * in the threshold); beyond that, pre-shift the fixed-point scale.
    */
  def epochPlan(perDoc: DataFrame, groupCol: String, tokCol: String,
      budgetNum: Long, budgetDen: Long, maxEpochs: Int): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && maxEpochs >= 1,
      s"bad plan parameters: $budgetNum/$budgetDen, $maxEpochs")
    import graft.text.LanguageModel.ldiv
    val g = perDoc.groupBy(col(s"`$groupCol`").as("group"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(s"`$tokCol`")), lit(0L)).as("tokens_avail"))
      .withColumn("sqrt_w",
        floor(sqrt(col("tokens_avail").cast("double"))).cast("long"))
    val tot = g.agg(sum("tokens_avail").as("__tt"), sum("sqrt_w").as("__sw"))
    val planned = g.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        ldiv(ldiv(col("__tt") * lit(budgetNum), lit(budgetDen)) * col("sqrt_w"),
          greatest(col("__sw"), lit(1L))))
      .withColumn("epochs",
        least(when(col("tokens_avail") > 0L,
            ldiv(col("target_tokens") + col("tokens_avail") - 1L,
              col("tokens_avail")))
          .otherwise(lit(0L)), lit(maxEpochs.toLong)))
      .withColumn("achieved_tokens",
        least(col("target_tokens"), lit(maxEpochs.toLong) * col("tokens_avail")))
      .withColumn("deficit", col("target_tokens") - col("achieved_tokens"))
      .withColumn("rate_thr",
        when(col("tokens_avail") > col("target_tokens"),
          ldiv(col("target_tokens") * lit(1L << 40),
            col("tokens_avail")) * lit(1L << 20))
          .otherwise(lit(1L << 60)))
    planned.select("group", "n_docs", "tokens_avail", "sqrt_w",
      "target_tokens", "epochs", "achieved_tokens", "deficit", "rate_thr")
  }

  /** The mixture as 60-bit SAMPLING thresholds — the form
    * [[graft.text.Sampling.weightedSample]]'s md5 gate consumes: the
    * hottest domain keeps everything (threshold 2⁶⁰), the others scale
    * by weight. Integer-exact at 2⁴⁰ intermediate scale
    * (weight·2⁴⁰ stays in Long; the low 20 bits of the threshold are
    * zeros, immaterial against a uniform 60-bit key). Returns
    * (domain, rate_thr). */
  def mixtureRates(mixture: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    mixture.select(col("domain"),
      (graft.text.LanguageModel.ldiv(col("weight_fp") * lit(1L << 40),
        max("weight_fp").over(w)) * lit(1L << 20)).as("rate_thr"))
  }
}
