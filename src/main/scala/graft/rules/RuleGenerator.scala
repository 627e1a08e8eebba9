package graft.rules

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Generates rules from clean-data column profiles — the reference's
  * central capability (trained rules: rules/train_clean_rules.py:7-103;
  * dictionary-rule `applies` conditions: rules/dictionary_rule.py:8-243).
  *
  * Input is the profile DataFrame from [[graft.profile.Profiler]] —
  * O(#columns) rows, so generation collects it to the driver (the
  * control plane is tiny by construction; SURVEY.md §7.3).
  */
object RuleGenerator {

  /** Translate a dominant pattern (digits→9, letters→A) back into an
    * anchored regex (reference generalizes the other way at
    * profiling/profiler.py:134-165). */
  def patternToRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    pattern.foreach {
      case '9' => sb.append("\\d")
      case 'A' => sb.append("[A-Za-z]")
      case ' ' => sb.append("\\s")
      case ch if "\\^$.|?*+()[]{}".contains(ch) => sb.append("\\").append(ch)
      case ch => sb.append(ch)
    }
    sb.append("$").toString
  }

  /** Every profile field [[fromProfileRow]] reads. Pipelines that
    * prune the profile frame (MultiTablePipeline) derive their column
    * list from this, so keep it in lockstep with the getAs calls
    * below — a new field read without a matching entry here crashes
    * the pruned pipelines at runtime. */
  val consumedProfileColumns: Seq[String] = Seq(
    "column", "row_count", "null_ratio", "distinct_count", "unique_ratio",
    "dominant_pattern", "dominant_pattern_ratio", "inferred_type",
    "mode_value", "num_count", "num_q1", "num_q3", "min_len", "max_len",
    "max_decimals")

  /** Rules implied by one column's profile row. Thresholds mirror the
    * reference's trained-rule bands (rules/train_clean_rules.py:46-59)
    * and dictionary conditions. */
  def fromProfileRow(p: Row): Seq[RuleSpec] = {
    val c = p.getAs[String]("column")
    val rows = p.getAs[Long]("row_count")
    val nullRatio = p.getAs[Double]("null_ratio")
    val distinct = p.getAs[Long]("distinct_count")
    val uniqueRatio = p.getAs[Double]("unique_ratio")
    val patRatio = p.getAs[Double]("dominant_pattern_ratio")
    val pattern = p.getAs[String]("dominant_pattern")
    val inferred = p.getAs[String]("inferred_type")
    val numCount = p.getAs[Long]("num_count")
    val q1 = p.getAs[Double]("num_q1")
    val q3 = p.getAs[Double]("num_q3")
    val minLen = p.getAs[Long]("min_len")
    val maxLen = p.getAs[Long]("max_len")
    val maxDec = p.getAs[Int]("max_decimals")
    val mode = p.getAs[String]("mode_value")

    val b = Seq.newBuilder[RuleSpec]
    if (rows > 0 && nullRatio == 0.0) b += NotNullRule(c)
    if (rows > 1 && uniqueRatio == 1.0) b += UniqueRule(c)
    if (rows > 1 && distinct == 1) b += SingleValueRule(c, mode)
    if (patRatio >= 0.95 && pattern.nonEmpty) b += RegexRule(c, patternToRegex(pattern))
    if ((inferred == "integer" || inferred == "float") && numCount > 0 && !q1.isNaN && !q3.isNaN) {
      val iqr = q3 - q1
      b += RangeRule(c, q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    }
    if (inferred == "float" && maxDec > 0) b += DecimalPrecisionRule(c, maxDec)
    // length bands apply to any textual type — categorical columns
    // (few distinct values) have the tightest, most useful bands
    if (minLen > 0 && maxLen > 0 && (inferred == "string" || inferred == "categorical"))
      b += LengthRule(c, minLen.toInt, maxLen.toInt)
    b.result()
  }

  /** Generate rules for every profiled column. */
  def fromProfiles(profiles: DataFrame): Seq[RuleSpec] =
    profiles.collect().toSeq.flatMap(fromProfileRow)

  /** Enum rule for a low-cardinality column: collect its distinct
    * values (guarded by `maxValues`). */
  def enumRule(df: DataFrame, column: String, maxValues: Int = 100): Option[EnumRule] = {
    val vals = df.select(col(s"`$column`").cast(StringType))
      .filter(col(column).isNotNull).distinct().limit(maxValues + 1)
      .collect().map(_.getString(0)).toSeq
    if (vals.size <= maxValues) Some(EnumRule(column, vals.sorted)) else None
  }

  // ---- FD discovery ------------------------------------------------------

  /** Mine candidate functional dependencies lhs → rhs from data — the
    * reference's rule-GENERATION purpose (profile_similarity.py:55-83
    * support/conflict) done relationally instead of per-column pandas.
    *
    * Two phases:
    *  1. Cardinality screen (one aggregation over the table, the A26
    *     convention): a column is an eligible LHS iff
    *     2 ≤ distinct ≤ `maxLhsDistinctRatio`·non-null rows (near-key
    *     columns determine everything trivially) and an eligible RHS
    *     iff distinct ≥ 2 (constants satisfy every FD trivially). With
    *     `exact = false` the screen uses `approx_count_distinct` — the
    *     scale mode; exact mode is bit-reproducible for the oracle.
    *  2. One pair-exploded aggregation: rows fan out to one struct per
    *     surviving ordered pair (null on either side excluded, standard
    *     FD semantics), then two partially-aggregated groupBys compute
    *     per-lhs-value majority counts and per-pair g3 conflict totals.
    *     Shuffle volume is n·|pairs| counting rows with map-side
    *     combine — linear, no self-join, no driver data.
    *
    * Output: one row per screened pair with `n_groups` (lhs values),
    * `n_violating_groups`, `conflict_rows` (g3: rows to delete for the
    * FD to hold exactly), `n_rows`, `confidence` = 1 − conflict/rows,
    * and `holds` = confidence ≥ 1 − `maxConflictRatio`. */
  def discoverFds(df: DataFrame, columns: Seq[String],
      maxLhsDistinctRatio: Double = 0.5,
      maxConflictRatio: Double = 0.05,
      exact: Boolean = true): DataFrame = {
    require(columns.size >= 2, "FD discovery needs at least two columns")
    val spark = df.sparkSession
    def dcnt(c: String) =
      if (exact) countDistinct(col(s"`$c`"))
      else approx_count_distinct(col(s"`$c`"))
    val screenAggs = columns.flatMap(c => Seq(
      dcnt(c).as(s"__d_$c"), count(col(s"`$c`")).as(s"__n_$c")))
    val st = df.agg(screenAggs.head, screenAggs.tail: _*).collect().head
    def d(c: String) = st.getAs[Long](s"__d_$c")
    def n(c: String) = st.getAs[Long](s"__n_$c")
    def lhsOk(c: String) = d(c) >= 2 && d(c).toDouble <= maxLhsDistinctRatio * n(c)
    def rhsOk(c: String) = d(c) >= 2
    val pairs = for {
      a <- columns if lhsOk(a)
      b <- columns if b != a && rhsOk(b)
    } yield (a, b)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lhs_col", StringType),
      org.apache.spark.sql.types.StructField("rhs_col", StringType)))
    if (pairs.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .withColumn("n_groups", lit(0L)).withColumn("n_violating_groups", lit(0L))
        .withColumn("conflict_rows", lit(0L)).withColumn("n_rows", lit(0L))
        .withColumn("confidence", lit(0.0)).withColumn("holds", lit(false))
    val perVal = pairLong(df, pairs)
      .groupBy("lhs_col", "rhs_col", "lhs_val", "rhs_val")
      .agg(count(lit(1)).as("c"))
    val perLhs = perVal.groupBy("lhs_col", "rhs_col", "lhs_val")
      .agg(sum("c").as("n"), max("c").as("mx"), count(lit(1)).as("n_rhs"))
    perLhs.groupBy("lhs_col", "rhs_col")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(col("n") - col("mx")).as("conflict_rows"),
        sum("n").as("n_rows"))
      .withColumn("confidence",
        lit(1.0) - col("conflict_rows").cast("double") / col("n_rows").cast("double"))
      .withColumn("holds", col("confidence") >= lit(1.0 - maxConflictRatio))
  }

  /** The `holds` subset of [[discoverFds]] as rule specs, ready for
    * [[RuleSerde]] round-trip and [[ViolationScanner]] evaluation. */
  def discoveredFdRules(stats: DataFrame): Seq[FunctionalDependencyRule] =
    stats.filter(col("holds"))
      .select("lhs_col", "rhs_col").collect().toSeq
      .map(r => FunctionalDependencyRule(r.getString(0), r.getString(1)))
      .sortBy(_.name)

  /** The shared pair-explode kernel of [[discoverFds]] and
    * [[discoverConstantCfds]]: one row per (ordered pair, row) with
    * both values as canonical strings, nulls excluded (standard FD
    * semantics). */
  private def pairLong(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    df.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("lhs_col"), lit(b).as("rhs_col"),
          col(s"`$a`").cast(StringType).as("lhs_val"),
          col(s"`$b`").cast(StringType).as("rhs_val")) }: _*)).as("p"))
      .select(col("p.*"))
      .filter(col("lhs_val").isNotNull && col("rhs_val").isNotNull)

  // ---- Constant conditional-FD discovery ---------------------------------

  /** Mine constant conditional functional dependencies — bindings
    * (lhs = v) → (rhs = w) that hold with high confidence even where
    * the global FD lhs → rhs fails (the constant-pattern tableau of
    * CFDMiner, Fan et al. 2011, done relationally). The natural
    * companion to [[discoverFds]]: run it on the pairs whose global
    * `holds` came back false.
    *
    * For every ordered pair and every lhs value: support (rows with
    * that value, nulls excluded), the majority rhs value (ties broken
    * to the larger string — deterministic), the number of distinct rhs
    * values seen, and confidence = majority/support. Bindings below
    * `minSupport` (pattern too rare to generalize) or `minConfidence`
    * are dropped.
    *
    * Scale shape: one pair explode (n·|pairs| rows) and two
    * partially-aggregated groupBys — linear, no self-join, no driver
    * data; same as the [[discoverFds]] kernel with an argmax instead
    * of a conflict sum. */
  def discoverConstantCfds(df: DataFrame, pairs: Seq[(String, String)],
      minSupport: Long = 10L, minConfidence: Double = 0.9): DataFrame = {
    require(pairs.nonEmpty, "CFD discovery needs at least one column pair")
    pairLong(df, pairs).groupBy("lhs_col", "rhs_col", "lhs_val", "rhs_val")
      .agg(count(lit(1)).as("c"))
      .groupBy("lhs_col", "rhs_col", "lhs_val")
      .agg(sum("c").as("support"),
        max(struct(col("c"), col("rhs_val"))).as("m"),
        count(lit(1)).as("n_rhs"))
      .select(col("lhs_col"), col("rhs_col"), col("lhs_val"),
        col("m.rhs_val").as("rhs_val"), col("support"), col("n_rhs"),
        (col("m.c").cast("double") / col("support").cast("double"))
          .as("confidence"))
      .filter(col("support") >= lit(minSupport) &&
        col("confidence") >= lit(minConfidence))
  }

  /** [[discoverConstantCfds]] bindings as scannable rule specs: each
    * becomes a cross-field predicate "lhs ≠ v OR rhs = w" (violated
    * exactly by rows matching the pattern but not the binding). */
  def conditionalRules(bindings: DataFrame): Seq[CrossFieldRule] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    bindings.select("lhs_col", "rhs_col", "lhs_val", "rhs_val")
      .collect().toSeq
      .map { r =>
        val (lc, rc) = (r.getString(0), r.getString(1))
        val (lv, rv) = (esc(r.getString(2)), esc(r.getString(3)))
        CrossFieldRule(s"cfd($lc='$lv'->$rc='$rv')",
          s"`$lc` <> '$lv' OR `$rc` = '$rv'")
      }
      .sortBy(_.ruleName)
  }

  // ---- Candidate-key (unique column combination) discovery ---------------

  /** Mine candidate keys — single columns and minimal column PAIRS
    * whose values are unique across the table (UCC discovery, the
    * profile-driven face of the reference's uniqueness rule family;
    * r4/r9 EVALUATE declared keys, this generates them).
    *
    * Phase 1: one aggregation computes every column's exact distinct
    * and non-null counts. A single column holds as a key iff it has no
    * nulls and no duplicate values.
    * Phase 2: pairs. Only pairs where NEITHER member already holds are
    * tested (any superset of a key is trivially unique — minimality,
    * the same pruning lattice HyUCC walks); their distinct-tuple counts
    * all come from one more aggregation. Rows with a null in either
    * column are excluded from the distinct count but charged against
    * `holds` (a key admits no nulls).
    *
    * Scale shape: two aggregation jobs total, each a multi-distinct
    * agg Spark plans as one expand×|combos| + partial-agg shuffle —
    * linear in rows, no self-join; only O(|columns|²) counters reach
    * the driver.
    *
    * Output: one row per tested combination — `key_cols`
    * (comma-joined), `arity`, `n_rows`, `n_nonnull` (rows with the
    * full combination present), `n_distinct`, `n_duplicate_rows`
    * (n_nonnull − n_distinct), `holds`. */
  def discoverKeys(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "key discovery needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val singleAggs = count(lit(1)).as("__n") +: columns.flatMap(c => Seq(
      countDistinct(col(s"`$c`")).as(s"__d_$c"),
      count(col(s"`$c`")).as(s"__nn_$c")))
    val st = df.agg(singleAggs.head, singleAggs.tail: _*).collect().head
    val n = st.getAs[Long]("__n")
    def d(c: String) = st.getAs[Long](s"__d_$c")
    def nn(c: String) = st.getAs[Long](s"__nn_$c")
    def singleHolds(c: String) = nn(c) == n && d(c) == n
    val pairs = for {
      (a, ia) <- columns.zipWithIndex
      b <- columns.drop(ia + 1)
      if !singleHolds(a) && !singleHolds(b)
    } yield (a, b)
    val pairStats: Map[(String, String), (Long, Long)] =
      if (pairs.isEmpty) Map.empty
      else {
        val pairAggs = pairs.flatMap { case (a, b) =>
          val both = col(s"`$a`").isNotNull && col(s"`$b`").isNotNull
          Seq(
            countDistinct(when(both, struct(col(s"`$a`"), col(s"`$b`"))))
              .as(s"__d_${a}__$b"),
            count(when(both, lit(1))).as(s"__nn_${a}__$b"))
        }
        val pr = df.agg(pairAggs.head, pairAggs.tail: _*).collect().head
        pairs.map { case (a, b) =>
          (a, b) -> (pr.getAs[Long](s"__d_${a}__$b"), pr.getAs[Long](s"__nn_${a}__$b"))
        }.toMap
      }
    val rows =
      columns.map(c => (c, 1, n, nn(c), d(c), nn(c) - d(c), singleHolds(c))) ++
      pairs.map { case (a, b) =>
        val (dd, nnp) = pairStats((a, b))
        (s"$a,$b", 2, n, nnp, dd, nnp - dd, nnp == n && dd == n)
      }
    rows.toDF("key_cols", "arity", "n_rows", "n_nonnull", "n_distinct",
      "n_duplicate_rows", "holds")
  }

  /** The `holds` subset of [[discoverKeys]] as rule specs: singles as
    * [[UniqueRule]], pairs as [[CompositeUniqueRule]]. */
  def discoveredKeyRules(stats: DataFrame): Seq[RuleSpec] =
    stats.filter(col("holds")).select("key_cols").collect().toSeq
      .map(_.getString(0).split(',').toSeq)
      .map {
        case Seq(c) => UniqueRule(c)
        case cs => CompositeUniqueRule(cs)
      }
      .sortBy(_.name)

  // ---- Inclusion-dependency (foreign-key candidate) discovery -----------

  /** Mine candidate inclusion dependencies child ⊆ parent across
    * tables — the cross-table face of rule generation (the reference
    * only EVALUATES declared inclusions, rules.yaml:29-30 / J5; this
    * discovers them, the SPIDER/Bauckmann approach done relationally).
    *
    * One distinct pass builds the (column, value) inverted index; a
    * groupBy(value) collects the ≤|columns| column-set per value; an
    * ordered-pair explode of each set (|S|² ≤ |columns|² structs per
    * distinct value — bounded fanout, map-side combined) counts shared
    * distinct values per directed pair. child ⊆ parent holds iff
    * shared == |distinct(child)| (coverage 1.0); `minCoverage` < 1
    * admits partial INDs. Values compare as canonical strings (ints
    * render without decimals), nulls excluded — standard IND semantics.
    * Pairs sharing zero values are omitted (their coverage is 0).
    *
    * Scale shape: distinct + three linear groupBys, all with map-side
    * combine; per-column stats broadcast back; no self-join of the
    * value stream. The inverted index feeds two consumers, so it is
    * persisted via [[graft.ops.StagePersists]] (release contract in
    * that object's doc).
    *
    * `tables`: (tableName, frame, candidateColumns). Column names must
    * not contain '.' (qualified ids are "table.column").
    *
    * Output: one row per directed pair with ≥1 shared value —
    * child_table, child_column, parent_table, parent_column,
    * child_distinct, parent_distinct, shared_distinct, coverage,
    * parent_is_key (parent unique over its non-nulls: a true FK
    * target), holds. */
  def discoverInds(tables: Seq[(String, DataFrame, Seq[String])],
      minCoverage: Double = 1.0): DataFrame = {
    require(tables.nonEmpty, "IND discovery needs at least one table")
    require(tables.forall(t => t._3.forall(!_.contains("."))),
      "candidate column names must not contain '.'")
    def longFor(t: String, df: DataFrame, cols: Seq[String]) =
      df.select(explode(array(cols.map(c =>
          struct(lit(s"$t.$c").as("col_id"),
            col(s"`$c`").cast(StringType).as("v"))): _*)).as("p"))
        .select(col("p.*")).filter(col("v").isNotNull)
    val inv = graft.ops.StagePersists.track(
      tables.map { case (t, df, cs) => longFor(t, df, cs) }
        .reduce(_ unionByName _).distinct())
    val colDistinct = inv.groupBy("col_id").agg(count(lit(1)).as("d"))
    // per-column non-null row counts for the parent-is-key flag: all
    // tables' one-row aggs unioned into ONE control-plane job (a
    // per-table collect was |tables| round trips of pure job overhead)
    val nonNull: Map[String, Long] = tables.map { case (t, df, cs) =>
      val aggs = cs.map(c => count(col(s"`$c`")).as(c))
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cs.map(c =>
          struct(lit(s"$t.$c").as("k"), col(s"`$c`").as("v"))): _*)).as("p"))
        .select(col("p.*"))
    }.reduce(_ unionByName _)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shared = inv.groupBy("v").agg(collect_set(col("col_id")).as("s"))
      .select(explode(flatten(transform(col("s"), a =>
          transform(filter(col("s"), b => b =!= a),
            b => struct(a.as("child_id"), b.as("parent_id")))))).as("p"))
      .select(col("p.*"))
      .groupBy("child_id", "parent_id").agg(count(lit(1)).as("shared_distinct"))
    val nn = typedLit(nonNull)
    shared
      .join(broadcast(colDistinct.withColumnRenamed("d", "child_distinct")),
        col("child_id") === col("col_id")).drop("col_id")
      .join(broadcast(colDistinct.withColumnRenamed("d", "parent_distinct")),
        col("parent_id") === col("col_id")).drop("col_id")
      .select(
        substring_index(col("child_id"), ".", 1).as("child_table"),
        substring_index(col("child_id"), ".", -1).as("child_column"),
        substring_index(col("parent_id"), ".", 1).as("parent_table"),
        substring_index(col("parent_id"), ".", -1).as("parent_column"),
        col("child_distinct"), col("parent_distinct"), col("shared_distinct"),
        (col("shared_distinct").cast("double") /
          col("child_distinct").cast("double")).as("coverage"),
        (col("parent_distinct") === element_at(nn, col("parent_id")))
          .as("parent_is_key"))
      .withColumn("holds", col("coverage") >= lit(minCoverage))
  }

  /** The foreign-key-shaped subset of [[discoverInds]] as rule specs:
    * holding INDs whose parent column is a key and whose parent is a
    * different table (self-referencing column pairs are FDs' domain,
    * not FK candidates). */
  def discoveredInclusionRules(stats: DataFrame): Seq[InclusionRule] =
    stats.filter(col("holds") && col("parent_is_key") &&
        col("child_table") =!= col("parent_table"))
      .select("child_column", "parent_table", "parent_column").collect().toSeq
      .map(r => InclusionRule(r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_.name)
}
