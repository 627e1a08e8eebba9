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

  /** Deterministic train/val/test split assignment: the 60-bit md5 key
    * of the id partitions [0, 2^60) into consecutive ranges sized by
    * `fractions` (name → fraction, summing to 1). Every engine and
    * every run assigns each document to the same split — the property
    * a reproducible corpus release needs — and membership is a pure
    * map-side expression (no shuffle, stateless on streams). The
    * thresholds ⌊cum·2^60⌋ are computed once on the driver, so the
    * oracle interpolates identical literals. */
  def splitAssign(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.size >= 2 && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1: $fractions")
    val h = graft.dedup.Dedup.md5Long(col(s"`$idCol`").cast("string"))
    val thresholds = splitThresholds(fractions)
    val chain = fractions.init.zip(thresholds)
      .foldLeft(Option.empty[Column]) {
        case (None, ((name, _), thr)) => Some(when(h < thr, name))
        case (Some(c), ((name, _), thr)) => Some(c.when(h < thr, name))
      }
    df.withColumn("split",
      chain.map(_.otherwise(fractions.last._1)).getOrElse(lit(fractions.last._1)))
  }

  /** The ⌊cum·2^60⌋ range boundaries (one per non-final split) —
    * shared with the SQL mirror so both engines compare against the
    * same literals. */
  def splitThresholds(fractions: Seq[(String, Double)]): Seq[Long] =
    fractions.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(c => math.floor(c * 1152921504606846976.0).toLong)

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

  /** Quality-greedy corpus selection under a global TOKEN budget — the
    * curation step that answers "we can afford to train on B tokens;
    * which documents?": take documents in (score desc, id asc) order
    * until the running token total exceeds `budgetFraction` of the
    * corpus's total tokens. Greedy-by-score is the standard budgeted
    * curation rule (score thresholding with an exact token target
    * instead of a hand-tuned cutoff).
    *
    * `scoreCol` must be an INTEGER score (fixed-point-scale doubles
    * first — e.g. ⌊q·10⁴+½⌋, the engine's portable rounding) and
    * `idCol` a UNIQUE non-negative id below 10¹², so the composite
    * order key id − score·10¹² is collision-free and fits a Long
    * (duplicate ids would tie the order key and make the running sum
    * order-dependent). The budget is
    * ⌊total·fraction⌋ with the multiply on the driver — one exact IEEE
    * op any engine reproduces.
    *
    * Scale shape: one [[graft.ops.Scale.prefixSums]] spine (range
    * partition on the order key, parallel per-partition windows, an
    * O(#partitions) offset broadcast) — the corpus total falls out of
    * the same pass, so the budget costs no extra job — then a pure
    * filter. No global single-task window, no driver-side data. */
  def budgetSelect(df: DataFrame, idCol: String, tokensCol: String,
      scoreCol: String, budgetFraction: Double): DataFrame = {
    require(budgetFraction > 0.0 && budgetFraction <= 1.0,
      s"budgetFraction must be in (0, 1]: $budgetFraction")
    // the composite key is only collision-free/monotone under the
    // documented contract (unique non-negative id < 10¹², |score| small
    // enough that score·10¹² fits Long); violating inputs — raw DSIR
    // scores, synthetic 2⁶³-ish ids — would silently CORRUPT the
    // selection order, so the contract is enforced per row in the same
    // projection (zero extra jobs; ~two comparisons per row)
    val idL = col(s"`$idCol`").cast("long")
    val scL = col(s"`$scoreCol`").cast("long")
    val contractOk = idL.between(0L, 999999999999L) &&
      abs(scL) <= lit(9000000L)
    val ordered = df
      .withColumn("__n", col(s"`$tokensCol`").cast("long"))
      .withColumn("__ord", when(contractOk, idL - scL * 1000000000000L)
        .otherwise(raise_error(concat(
          lit("[graft] budgetSelect order-key contract violated " +
            "(need 0 <= id < 10^12 and |score| <= 9e6; fixed-point-scale " +
            "scores first): id="), idL.cast("string"),
          lit(" score="), scL.cast("string"))).cast("long")))
    val (cum, totals) = graft.ops.Scale.prefixSums(ordered, "__ord", Seq("__n"))
    val budget = math.floor(totals("__n") * budgetFraction).toLong
    cum.filter(col("__cum___n") <= budget)
      .select(col(s"`$idCol`"), col(s"`$tokensCol`"),
        col("__cum___n").as("cum_tokens"))
  }

  /** One strategy surface over the engine's per-group samplers, so a
    * composed pipeline (l2's stage 5) can swap count-capped for
    * probabilistic selection per call site. Every strategy keeps a
    * SUBSET of the input rows with the input schema (quota's rank
    * column is internal) and is seedless-deterministic. */
  sealed trait Strategy
  /** ≤ `quota` rows per group, smallest md5 keys ([[quotaSample]]). */
  final case class Quota(quota: Int, salts: Int = 32) extends Strategy
  /** Independent keep with per-group probability table
    * ([[weightedSample]]). */
  final case class Probability(probs: DataFrame, probCol: String = "p") extends Strategy
  /** α = 0.5 temperature rebalancing ([[temperatureSample]]). */
  case object Temperature extends Strategy

  def sample(df: DataFrame, groupCol: String, idCol: String,
      strategy: Strategy): DataFrame = strategy match {
    case Quota(q, s) =>
      quotaSample(df, groupCol, idCol, q, s).drop("sample_rank")
    case Probability(p, pc) => weightedSample(df, groupCol, idCol, p, pc)
    case Temperature => temperatureSample(df, groupCol, idCol)
  }

  /** Deterministic training-order shuffle + sharding: every document
    * gets a seeded 60-bit hash key; shard = key mod `shards`, and the
    * within-shard sequence is the (key, id) order — the reproducible
    * global shuffle a training dataloader needs over a 100 TB corpus,
    * where a true random permutation (a global sort by random key)
    * is exactly the thing to avoid. Shape: ONE shuffle on the shard
    * key (hash-balanced by construction) and a per-shard sort — no
    * global ordering anywhere; each shard is an independently
    * writable, independently readable training file whose order is a
    * pure function of (seed, id), so a re-run, a resume, or a
    * different cluster produces byte-identical shards. Changing the
    * seed re-deals both the shard assignment and the order — epoch
    * reshuffling without state. */
  /** Leakage-free train/val/test split: documents sharing a near-dup
    * component are assigned as a UNIT, so no near-duplicate pair ever
    * straddles train and test — the contamination a doc-grain hash
    * split ([[splitAssign]], t16) silently permits whenever a crawl
    * carries near-identical copies. `labels` is any component
    * labelling `(id, component_id)` (MinHash, SimHash, embedding —
    * the method is the caller's policy); the split hash reads
    * group_key = component root for labelled docs, the document's own
    * id otherwise, so on unlabelled docs this IS splitAssign —
    * adopting the leakage-safe split changes nothing outside dup
    * groups. Shape: one broadcast-sized left join (labels ∝ dup docs,
    * not the corpus) + the stateless hash; no new shuffle at corpus
    * grain. */
  def componentSplit(df: DataFrame, labels: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    val keyed = df.join(
        labels.select(col("id").as("__lid"), col("component_id")),
        col(s"`$idCol`") === col("__lid"), "left_outer")
      .withColumn("group_key",
        coalesce(col("component_id"), col(s"`$idCol`")))
      .drop("__lid", "component_id")
    splitAssign(keyed, "group_key", fractions)
  }

  def shuffleShards(df: DataFrame, idCol: String, shards: Int,
      seed: String): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val key = graft.dedup.Dedup.md5Long(
      concat(lit(seed), lit(":"), col(s"`$idCol`").cast("string")))
    df.withColumn("__k", key)
      .withColumn("shard", pmod(col("__k"), lit(shards.toLong)))
      .withColumn("seq", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("__k"), col(s"`$idCol`"))).cast("long"))
      .drop("__k")
  }
}
