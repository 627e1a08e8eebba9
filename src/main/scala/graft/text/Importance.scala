package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection via n-gram importance (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much its n-grams are
  * over-represented in a TARGET corpus (the high-quality set you want
  * more of) relative to the raw pool, then keep the top slice.
  *
  * INTEGER-EXACT variant: DSIR's per-gram weight is a log-probability
  * ratio; logs are transcendental and their summation order is not
  * portable across engines, so this uses the cross-multiplied linear
  * form of the same signal —
  *   weight(g) = cnt_target(g)·N_raw − cnt_raw(g)·N_target
  * (positive iff g's relative frequency is higher in the target), and
  *   score(doc) = Σ over the doc's gram OCCURRENCES of weight(g).
  * Pure Long arithmetic: bit-identical everywhere, no float summation.
  *
  * Scale shape: one gram explode over each corpus → two
  * map-side-combinable gram-count aggregations (distinct-gram sized) →
  * gram totals as a broadcast 1-row frame → one keyed equi-join of the
  * raw gram stream against the weight table → per-doc sum. Linear in
  * corpus grams; nothing pairwise, nothing on the driver. Overflow
  * bound: a doc's score sums one |weight| ≤ cnt·N per gram
  * OCCURRENCE, so the Long arithmetic is exact while
  * max(cnt·N) · (grams per doc) < 2⁶³ — gram totals up to ~10⁸ per
  * side with 10⁴-gram docs, NOT the 2⁶³ product bound alone; beyond
  * that cast the products and the sum to DecimalType(38,0) — same
  * plan, wider buffers. */
object Importance {

  private def grams(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val ws = filter(split(lower(col(s"`$textCol`")), "[^a-z0-9]+"),
      w => w =!= "")
    // occurrences WITH multiplicity — DSIR sums over the token stream
    df.select(col(s"`$idCol`").as("id"), ws.as("__ws"))
      .select(col("id"), explode(when(size(col("__ws")) >= n,
          transform(sequence(lit(1), size(col("__ws")) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(j =>
              element_at(col("__ws"), i + lit(j))): _*)))
        .otherwise(array().cast("array<string>"))).as("g"))
  }

  /** (id, n_grams, score) for every raw document (docs with fewer than
    * `n` words report 0/0). `target` is any frame with the same text
    * column — typically a filtered subset of `raw`. */
  def importanceScores(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, n: Int = 2): DataFrame = {
    // raw grams feed three consumers (raw counts, totals, per-doc
    // join): persist the corpus-sized explode once (StagePersists
    // release contract applies)
    val rawG = graft.ops.StagePersists.track(grams(raw, textCol, idCol, n))
    val tgtG = graft.ops.StagePersists.track(
      grams(target, textCol, idCol, n).select("g"))
    val cntR = rawG.groupBy("g").agg(count(lit(1)).as("__nr"))
    val cntT = tgtG.groupBy("g").agg(count(lit(1)).as("__nt"))
    val totals = broadcast(
      cntR.agg(coalesce(sum("__nr"), lit(0L)).as("__nr_tot"))
        .crossJoin(cntT.agg(coalesce(sum("__nt"), lit(0L)).as("__nt_tot"))))
    val weights = cntR.join(cntT, Seq("g"), "left_outer")
      .crossJoin(totals)
      .select(col("g"),
        (coalesce(col("__nt"), lit(0L)) * col("__nr_tot") -
          col("__nr") * col("__nt_tot")).as("__w"))
    val perDoc = rawG.join(weights, "g")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), sum("__w").as("score"))
    raw.select(col(s"`$idCol`").as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("score"), lit(0L)).as("score"))
  }
}
