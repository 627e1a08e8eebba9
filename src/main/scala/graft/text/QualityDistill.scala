package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distilled linear quality classifier — the "cheap model trained on a
  * seed signal, applied map-side to the whole corpus" stage of a web
  * training-data pipeline (the role a fastText/logistic quality filter
  * plays in CCNet-style curation; cf. the reference's one-shot
  * heuristic gates, quality_rules.py). The seed label here is the
  * engine's own composite heuristic ([[TextAnalysis.qualityE4]]):
  * training distills the branchy composite into a LINEAR scorer over
  * raw census ratios, which then scores (and gates) documents in one
  * codegen'd map pass — no branches, no regex, and a model a user can
  * swap for real human/LLM seed labels by passing any (0..10⁴)
  * label column.
  *
  * Determinism contract (the c1/t18 device, GD edition): every
  * DISTRIBUTED sum is an exact integer sum — features are quantized to
  * 10⁻⁴ fixed point ONCE, per-row residuals to 10⁻⁶ — so partial
  * aggregation order cannot perturb the gradient; the per-round weight
  * update runs on the DRIVER as a fixed sequence of IEEE-754 double
  * ops on those exact integers, which the DuckDB mirror replays as
  * one-row chained CTEs, term order identical. No transcendental
  * functions anywhere (squared loss, not logistic: `exp` differs
  * between libms, doubles don't).
  *
  * Long-exactness envelope: a gradient term is Σᵢ Fᵢⱼ·rᵢ with
  * |F| ≤ 10⁴ and |r| ≤ 10⁶ (first round; ~10⋅10⁴ once warm), exact in
  * Long up to ~9·10¹⁷/10¹⁰ ≈ 10⁸ docs per training shard — train on a
  * sample or per-shard average past that (the [[Importance]]
  * convention). Cross-engine equality holds even past 2⁵³ in the
  * gradient because both engines round Long→double to nearest.
  *
  * Scale shape: training is `rounds` one-row aggregations over a
  * persisted 7-column integer projection (map-side partial aggs, no
  * shuffle beyond the final combine); scoring is a pure map — the
  * trained weights travel as literals, so the scorer inlines into any
  * downstream gate's whole-stage codegen. */
object QualityDistill {

  val Dim = 6

  /** The census features, quantized to 10⁻⁴ fixed point (Long):
    * bias, alpha/len, punct/len, digits/len, len capped at 20k,
    * mean word length capped at 20 — the raw ratios the composite
    * heuristic is built from, NOT the heuristic's branchy terms. */
  def features(c: String): Seq[Column] = {
    val qs = graft.functions.QualityStats(col(s"`$c`"))
    val len = element_at(qs, 1).cast(DoubleType)
    val alpha = element_at(qs, 2).cast(DoubleType)
    val digits = element_at(qs, 3).cast(DoubleType)
    val punct = element_at(qs, 4).cast(DoubleType)
    val nTok = element_at(qs, 5).cast(DoubleType)
    def q(x: Column): Column = floor(x * 10000d + 0.5d).cast(LongType)
    Seq(
      lit(10000L),
      q(when(len > 0, alpha / len).otherwise(0.0)),
      q(when(len > 0, punct / len).otherwise(0.0)),
      q(when(len > 0, digits / len).otherwise(0.0)),
      q(least(len, lit(20000.0)) / 20000.0),
      q(when(nTok > 0, least(alpha / nTok, lit(20.0)) / 20.0).otherwise(0.0)))
  }

  /** `rounds` full-batch gradient steps on squared loss from w = 0:
    * wⱼ ← wⱼ + η·(Σᵢ Fᵢⱼ·rᵢ) / (n·10¹⁰), rᵢ = ⌊(yᵢ − pᵢ)·10⁶ + ½⌋.
    * `labelE4` is any per-doc label in 0..10⁴ fixed point. */
  def train(docs: DataFrame, textCol: String, labelE4: Column,
      rounds: Int = 8, eta: Double = 0.5): Array[Double] = {
    val fcols = features(textCol)
    val feats = graft.ops.StagePersists.track(docs.select(
      fcols.zipWithIndex.map { case (f, i) => f.as(s"f$i") } :+
        labelE4.cast(LongType).as("y"): _*))
    var w = Array.fill(Dim)(0.0)
    for (_ <- 1 to rounds) {
      val p = (0 until Dim).map(j =>
        col(s"f$j").cast(DoubleType) / 10000d * w(j)).reduce(_ + _)
      val resid = floor((col("y").cast(DoubleType) / 10000d - p) * 1000000d + 0.5d)
        .cast(LongType)
      val aggs = (0 until Dim).map(j =>
        sum(col(s"f$j") * resid).as(s"g$j")) :+ count(lit(1)).as("n")
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getAs[Long]("n")
      require(n > 0, "QualityDistill.train on an empty corpus")
      w = Array.tabulate(Dim)(j =>
        w(j) + eta * (row.getAs[Long](s"g$j").toDouble / (n.toDouble * 1.0e10)))
    }
    w
  }

  /** The trained scorer as a pure map-side Column (weights inline as
    * literals): p = Σⱼ (Fⱼ/10⁴)·wⱼ, same term order as training. */
  def score(c: String, w: Array[Double]): Column = {
    require(w.length == Dim, s"expected $Dim weights, got ${w.length}")
    features(c).zipWithIndex.map { case (f, j) =>
      f.cast(DoubleType) / 10000d * w(j) }.reduce(_ + _)
  }
}
