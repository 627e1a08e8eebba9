package graft.matching

import graft.rules._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Cross-table column matching (SURVEY.md §2.3 J6/J7; reference:
  * method_2/pipleline_2.py:153-206, 387-477).
  *
  * Profiles are O(#columns) rows, so the candidate space is a
  * crossJoin of two tiny frames — scored with deterministic Column
  * arithmetic (name edit distance + type agreement + structural
  * feature distances), top-k via window, optional driver-side Hungarian
  * for a global 1-1 assignment (the score matrix is #columns², local by
  * design — reference uses scipy's linear_sum_assignment).
  */
object ColumnMatcher {

  /** Similarity ∈ [0,1] between two column profiles:
    * 0.4·name + 0.2·type + 0.4·structure. */
  def scoreExpr: org.apache.spark.sql.Column = {
    val nameSim = lit(1.0) -
      levenshtein(col("src_column"), col("tgt_column")).cast(DoubleType) /
        greatest(length(col("src_column")), length(col("tgt_column"))).cast(DoubleType)
    val typeSim = when(col("src_type") === col("tgt_type"), 1.0).otherwise(0.0)
    val structSim = lit(1.0) - (
      abs(col("src_unique_ratio") - col("tgt_unique_ratio")) +
      abs(col("src_null_ratio") - col("tgt_null_ratio")) +
      least(abs(col("src_avg_len") - col("tgt_avg_len")) / lit(100.0), lit(1.0))) / 3.0
    nameSim * 0.4 + typeSim * 0.2 + structSim * 0.4
  }

  /** All candidate pairs with scores; `src`/`tgt` are profile frames
    * from [[graft.profile.Profiler]]. */
  def candidates(src: DataFrame, tgt: DataFrame): DataFrame = {
    def prep(p: DataFrame, prefix: String) = p.select(
      col("column").as(s"${prefix}_column"),
      col("inferred_type").as(s"${prefix}_type"),
      col("unique_ratio").as(s"${prefix}_unique_ratio"),
      col("null_ratio").as(s"${prefix}_null_ratio"),
      col("avg_len").as(s"${prefix}_avg_len"))
    prep(src, "src").crossJoin(prep(tgt, "tgt"))
      .withColumn("score", round(scoreExpr, 6))
      .select("src_column", "tgt_column", "score")
  }

  /** Top-k matches per source column, deterministic tie-break. */
  def topK(cands: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("src_column").orderBy(desc("score"), asc("tgt_column"))
    cands.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Driver-side Hungarian algorithm (J7/M13) over the collected score
    * matrix — maximizes total score for a 1-1 assignment. O(n³),
    * n = #columns. */
  def hungarian(scores: Map[(String, String), Double]): Seq[(String, String)] = {
    val srcs = scores.keys.map(_._1).toSeq.sorted
    val tgts = scores.keys.map(_._2).toSeq.sorted
    val n = math.max(srcs.size, tgts.size)
    val big = 1e9
    // cost matrix: minimize (big used for missing pairs / padding)
    val cost = Array.tabulate(n, n) { (i, j) =>
      if (i < srcs.size && j < tgts.size)
        1.0 - scores.getOrElse((srcs(i), tgts(j)), -big)
      else 0.0
    }
    // O(n^3) Jonker-style potentials implementation of the assignment
    // problem (standard public algorithm)
    val u = Array.fill(n + 1)(0.0)
    val v = Array.fill(n + 1)(0.0)
    val p = Array.fill(n + 1)(0)
    val way = Array.fill(n + 1)(0)
    for (i <- 1 to n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(n + 1)(Double.MaxValue)
      val used = Array.fill(n + 1)(false)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = Double.MaxValue
        var j1 = 0
        for (j <- 1 to n if !used(j)) {
          val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
          if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
          if (minv(j) < delta) { delta = minv(j); j1 = j }
        }
        for (j <- 0 to n) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
        }
        j0 = j1
        if (p(j0) == 0) done = true
      }
      var j = j0
      while (j != 0) { p(j) = p(way(j)); j = way(j) }
    }
    (1 to n).flatMap { j =>
      val i = p(j)
      if (i >= 1 && i <= srcs.size && j <= tgts.size &&
          scores.contains((srcs(i - 1), tgts(j - 1))))
        Some(srcs(i - 1) -> tgts(j - 1))
      else None
    }
  }

  /** Global 1-1 assignment from a candidates frame. */
  def assign(cands: DataFrame): Seq[(String, String)] = {
    val m = cands.collect().map { r =>
      (r.getAs[String]("src_column"), r.getAs[String]("tgt_column")) ->
        r.getAs[Double]("score")
    }.toMap
    hungarian(m)
  }

  /** Top-k keyword overlap similarity (SURVEY.md §2.3 J8; reference:
    * rules/cluster_matcher.py:468-478, method_2/pipleline_2.py:104-111):
    * Jaccard of the profiles' top_keywords arrays. Profiles are tiny →
    * crossJoin + array_intersect/array_union, all codegen'd. */
  def keywordSimilarity(src: DataFrame, tgt: DataFrame): DataFrame = {
    val s = src.select(col("column").as("src_column"),
      col("top_keywords").as("src_kw"))
    val t = tgt.select(col("column").as("tgt_column"),
      col("top_keywords").as("tgt_kw"))
    s.crossJoin(t)
      .withColumn("n_union", size(array_union(col("src_kw"), col("tgt_kw"))))
      .withColumn("keyword_jaccard",
        when(col("n_union") === 0, 0.0)
          .otherwise(size(array_intersect(col("src_kw"), col("tgt_kw")))
            .cast(DoubleType) / col("n_union").cast(DoubleType)))
      .select("src_column", "tgt_column", "keyword_jaccard")
  }

  /** Re-bind rules trained on source columns to their matched target
    * columns (reference: method_2/pipleline_2.py:507-531). Rules whose
    * column has no match are dropped. */
  def bindRules(rules: Seq[RuleSpec], mapping: Map[String, String]): Seq[RuleSpec] =
    rules.flatMap {
      // the composite key survives only if EVERY component column has a
      // match — a partial tuple is a different (weaker) constraint
      case x: CompositeUniqueRule =>
        val mapped = x.columns.map(mapping.get)
        if (mapped.forall(_.isDefined)) Some(x.copy(columns = mapped.flatten)) else None
      case r =>
      mapping.get(r.column).map { tgt =>
        r match {
          case x: NotNullRule => x.copy(column = tgt)
          case x: RegexRule => x.copy(column = tgt)
          case x: RangeRule => x.copy(column = tgt)
          case x: EnumRule => x.copy(column = tgt)
          case x: DateFormatRule => x.copy(column = tgt)
          case x: DecimalPrecisionRule => x.copy(column = tgt)
          case x: LengthRule => x.copy(column = tgt)
          case x: SingleValueRule => x.copy(column = tgt)
          case x: UniqueRule => x.copy(column = tgt)
          case x: FunctionalDependencyRule => x.copy(rhs = tgt)
          case x: InclusionRule => x.copy(column = tgt)
          case x: CrossFieldRule => x
          case x: CompositeUniqueRule => x // unreachable: handled above
        }
      }
    }
}
