package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for LLM training pipelines: quota
  * (stratified) selection per group — e.g. "at most N documents per
  * language" to rebalance a web crawl.
  *
  * The sample must be reproducible across engines and runs, so the
  * selection key is a PORTABLE uniform hash: md5 of the document id's
  * decimal string (identical in any engine), not a JVM-specific hash
  * or an RNG. Taking the `quota` smallest keys per group is then an
  * exact, seedless uniform sample.
  */
object Sampling {

  /** Portable per-row rank key. */
  def rankKey(id: Column): Column = md5(id.cast("string"))

  /** At most `quota` rows per `groupCol`, the ones with the smallest
    * md5(id), tie-broken by id — [[graft.ops.Scale.saltedTopK]] keeps
    * a hot group (one dominant language) from buffering in one task. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
      quota: Int, salts: Int = 32): DataFrame =
    graft.ops.Scale.saltedTopK(
        df.withColumn("__key", rankKey(col(s"`$idCol`"))),
        Seq(col(s"`$groupCol`")), Seq(col("__key"), col(s"`$idCol`")),
        quota, saltOn = col(s"`$idCol`"), rankCol = "sample_rank", salts = salts)
      .drop("__key")

  /** Keep each row of group g independently with probability p_g —
    * the standard data-mixing primitive (language rebalancing, domain
    * up/down-weighting). Selection is seedless and engine-reproducible:
    * keep iff uint60(md5(id)) < ⌊p_g·2^60⌋ — the 60-bit md5 prefix is a
    * portable uniform key ([[graft.dedup.Dedup.md5Long]]), the
    * threshold multiply/floor are exact IEEE ops, and the comparison is
    * integer, so any engine derives the identical sample. A pure
    * broadcast-join + filter: no shuffle of the data side at all.
    *
    * `probs` = (groupCol, `probCol` ∈ [0,1]) — one row per group;
    * p ≥ 1 keeps the whole group. */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      probs: DataFrame, probCol: String = "p"): DataFrame = {
    val thr = floor(least(col(s"`$probCol`"), lit(1.0)) *
      lit(1152921504606846976.0)).cast("long") // 2^60, exact as double
    df.join(broadcast(probs.select(col(s"`$groupCol`"), thr.as("__thr"))),
        groupCol)
      .filter(graft.dedup.Dedup.md5Long(col(s"`$idCol`").cast("string")) <
        col("__thr"))
      .drop("__thr")
  }

  /** Temperature-rebalanced sampling at α = 0.5 (the common
    * multilingual-mixing temperature): keep probability
    * p_g = √(n_min / n_g), so the smallest group is kept whole and a
    * group k× larger is downsampled to √k× the smallest's volume —
    * post-sample sizes ∝ n_g^α. Counts are exact; the probability
    * derivation uses only division and sqrt, both CORRECTLY ROUNDED
    * under IEEE 754 (unlike pow), so the per-group thresholds — and
    * hence the sample — are bit-reproducible in any engine. The counts
    * pass is one partially-aggregated groupBy; the sample itself
    * inherits [[weightedSample]]'s broadcast-filter shape. */
  def temperatureSample(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(col(s"`$groupCol`")).agg(count(lit(1)).as("__n"))
    val probs = counts.crossJoin(broadcast(counts.agg(min("__n").as("__nmin"))))
      .select(col(s"`$groupCol`"),
        sqrt(col("__nmin").cast("double") / col("__n").cast("double")).as("p"))
    weightedSample(df, groupCol, idCol, probs)
  }
}
