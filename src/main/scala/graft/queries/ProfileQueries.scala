package graft.queries

import graft.Tables
import graft.profile.{Profiler, ProfilerConfig, StopWords}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the profiler (SURVEY.md §2.4).
  * Each query runs the real [[Profiler]] and projects a feature subset;
  * the oracle SQL recomputes the same features in DuckDB from scratch
  * over the identical all-values-as-string semantics.
  */
object ProfileQueries {

  // table -> columns (TESTDATA.md schemas; static so SQL can be generated)
  private val documentsCols = Seq("doc_id", "text", "lang", "source", "n_chars")
  private val customerCols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  private val partCols = Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
  private val lineitemNumCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** DuckDB fragment: value-as-string and not-missing predicate. */
  private def v(c: String) = s"CAST($c AS VARCHAR)"
  private def nn(c: String) = s"($c IS NOT NULL AND TRIM(${v(c)}) <> '')"

  // ---- p1: basic per-column stats --------------------------------------

  def profileBasic(spark: SparkSession, dir: String): DataFrame =
    Profiler.profileAuto(Tables.load(spark, dir, "documents"), "documents",
        features = Set("mode"))
      .select("column", "row_count", "null_count", "distinct_count",
              "min_len", "max_len", "avg_len")
      .orderBy("column")

  val profileBasicSql: String = documentsCols.map { c =>
    s"""SELECT '$c' AS "column", COUNT(*) AS row_count,
       |  CAST(COALESCE(SUM(CASE WHEN NOT ${nn(c)} THEN 1 ELSE 0 END), 0) AS BIGINT) AS null_count,
       |  COUNT(DISTINCT CASE WHEN ${nn(c)} THEN ${v(c)} END) AS distinct_count,
       |  COALESCE(MIN(CASE WHEN ${nn(c)} THEN LENGTH(${v(c)}) END), 0) AS min_len,
       |  COALESCE(MAX(CASE WHEN ${nn(c)} THEN LENGTH(${v(c)}) END), 0) AS max_len,
       |  COALESCE(CAST(SUM(CASE WHEN ${nn(c)} THEN LENGTH(${v(c)}) END) AS DOUBLE)
       |    / CAST(SUM(CASE WHEN ${nn(c)} THEN 1 ELSE 0 END) AS DOUBLE), 0.0) AS avg_len
       |FROM documents""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  // ---- p2: numeric stats -----------------------------------------------

  /** exactThreshold raised to cover sf0.1's 600k rows: the oracle
    * computes quantile_cont, which only the exact kernel reproduces —
    * the auto-switch itself is exercised by the profileManyAuto users.
    * The exact kernel is the sketch-bracketed one (no per-group sort),
    * so this stays scale-shaped either way. */
  def profileNumeric(spark: SparkSession, dir: String): DataFrame =
    Profiler.profileAuto(Tables.load(spark, dir, "lineitem"), "lineitem",
        exactThreshold = 1000000L,
        features = Set("quartiles"))
      .filter(col("column").isin(lineitemNumCols: _*))
      .select("column", "num_count", "num_min", "num_max", "num_mean",
              "num_q1", "num_median", "num_q3")
      .orderBy("column")

  val profileNumericSql: String = lineitemNumCols.map { c =>
    s"""SELECT '$c' AS "column", COUNT($c) AS num_count,
       |  MIN($c) AS num_min, MAX($c) AS num_max,
       |  CAST(SUM(CAST($c AS DECIMAL(30,6))) AS DOUBLE) / COUNT($c) AS num_mean,
       |  quantile_cont($c, 0.25) AS num_q1,
       |  quantile_cont($c, 0.5) AS num_median,
       |  quantile_cont($c, 0.75) AS num_q3
       |FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  // ---- p3: type inference ----------------------------------------------

  def profileTypes(spark: SparkSession, dir: String): DataFrame = {
    val c = Profiler.profileAuto(Tables.load(spark, dir, "customer"), "customer",
      features = Set("mode"))
    val p = Profiler.profileAuto(Tables.load(spark, dir, "part"), "part",
      features = Set("mode"))
    c.unionByName(p)
      .select("table", "column", "inferred_type")
      .orderBy("table", "column")
  }

  private def typeSqlFor(table: String, cols: Seq[String]): String = cols.map { c =>
    val intR = "'^[+-]?\\d+$'"
    val floatR = "'^[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$'"
    val boolR = "'^(?i)(true|false|yes|no|t|f|y|n)$'"
    val dateR = "'^\\d{4}-\\d{2}-\\d{2}([ T].*)?$'"
    // our regexes are anchored, so regexp_matches (partial) is equivalent
    def r(re: String) =
      s"COALESCE(CAST(SUM(CASE WHEN ${nn(c)} AND regexp_matches(${v(c)}, $re) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN ${nn(c)} THEN 1 ELSE 0 END) AS DOUBLE), 0.0)"
    s"""SELECT '$table' AS "table", '$c' AS "column",
       |  CASE
       |    WHEN COUNT(*) = SUM(CASE WHEN NOT ${nn(c)} THEN 1 ELSE 0 END) THEN 'empty'
       |    WHEN ${r(dateR)} >= 0.7 THEN 'date'
       |    WHEN ${r(boolR)} >= 0.7 THEN 'boolean'
       |    WHEN ${r(intR)} >= 0.7 THEN 'integer'
       |    WHEN ${r(floatR)} >= 0.7 THEN 'float'
       |    WHEN COUNT(DISTINCT CASE WHEN ${nn(c)} THEN ${v(c)} END) <= 20
       |         AND CAST(COUNT(DISTINCT CASE WHEN ${nn(c)} THEN ${v(c)} END) AS DOUBLE)
       |             / CAST(COUNT(*) AS DOUBLE) <= 0.1 THEN 'categorical'
       |    ELSE 'string'
       |  END AS inferred_type
       |FROM $table""".stripMargin
  }.mkString("\nUNION ALL\n")

  val profileTypesSql: String =
    s"""SELECT * FROM (
       |${typeSqlFor("customer", customerCols)}
       |UNION ALL
       |${typeSqlFor("part", partCols)}
       |) ORDER BY "table", "column"""".stripMargin

  // ---- p4: dominant pattern --------------------------------------------

  def profilePatterns(spark: SparkSession, dir: String): DataFrame =
    Profiler.profileAuto(Tables.load(spark, dir, "customer"), "customer",
        features = Set("pattern"))
      .select("column", "dominant_pattern", "dominant_pattern_ratio")
      .orderBy("column")

  val profilePatternsSql: String = customerCols.map { c =>
    val pat = s"regexp_replace(regexp_replace(regexp_replace(${v(c)}, '[0-9]', '9', 'g'), '[A-Za-z]', 'A', 'g'), '\\s', ' ', 'g')"
    s"""SELECT "column", pattern AS dominant_pattern,
       |  CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS dominant_pattern_ratio
       |FROM (
       |  SELECT '$c' AS "column", pattern, cnt,
       |    ROW_NUMBER() OVER (ORDER BY cnt DESC, pattern ASC) AS rk,
       |    SUM(cnt) OVER () AS tot
       |  FROM (
       |    SELECT $pat AS pattern, COUNT(*) AS cnt FROM customer
       |    WHERE ${nn(c)} GROUP BY 1) a) b
       |WHERE rk = 1""".stripMargin
  }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")

  // ---- p5: top keywords ------------------------------------------------

  def topKeywords(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("word"))
      .filter(length(col("word")) > 1 && !col("word").isin(StopWords.english: _*))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))
      .limit(25)
  }

  val topKeywordsSql: String = {
    val stop = StopWords.english.map(w => s"'$w'").mkString(", ")
    s"""SELECT word, COUNT(*) AS cnt FROM (
       |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
       |  FROM documents)
       |WHERE LENGTH(word) > 1 AND word NOT IN ($stop)
       |GROUP BY word ORDER BY cnt DESC, word LIMIT 25""".stripMargin
  }

  // ---- p6: semantic typing (M8/M9 heuristic default) -------------------

  def semanticTypes(spark: SparkSession, dir: String): DataFrame = {
    import graft.profile.SemanticTyping
    val profiles = Profiler.profileAuto(Tables.load(spark, dir, "customer"),
      "customer", features = Set("mode"))
    SemanticTyping.annotate(profiles)
      .select("column", "semantic_type")
      .orderBy("column")
  }

  /** Expected labels are known a priori from the heuristic's rules —
    * a literal oracle pins them against regressions. */
  val semanticTypesSql: String =
    """SELECT * FROM (VALUES
      |  ('c_acctbal', 'amount'), ('c_custkey', 'identifier'),
      |  ('c_mktsegment', 'category'), ('c_name', 'name'),
      |  ('c_nationkey', 'country')) AS t("column", semantic_type)
      |ORDER BY "column"""".stripMargin

  // ---- p7/p8: equi-width and equi-depth bins (A12/A13) -----------------

  def equiWidthBins(spark: SparkSession, dir: String): DataFrame =
    graft.profile.Histograms.equiWidthBins(
        Tables.load(spark, dir, "lineitem"), "l_extendedprice", 10)
      .orderBy("bin")

  val equiWidthBinsSql: String =
    """WITH s AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      |           FROM lineitem)
      |SELECT CASE WHEN mx = mn THEN 0
      |         ELSE LEAST(FLOOR((l_extendedprice - mn) * 10 / (mx - mn)), 9) END::INT AS bin,
      |  MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi, COUNT(*) AS cnt
      |FROM lineitem, s WHERE l_extendedprice IS NOT NULL
      |GROUP BY 1 ORDER BY bin""".stripMargin

  def equiDepthBins(spark: SparkSession, dir: String): DataFrame =
    graft.profile.Histograms.equiDepthBins(
        Tables.load(spark, dir, "lineitem"), "l_extendedprice", 10)
      .orderBy("bin")

  val equiDepthBinsSql: String =
    """SELECT bin, MIN(x) AS lo, MAX(x) AS hi, COUNT(*) AS cnt FROM (
      |  SELECT l_extendedprice AS x,
      |    ntile(10) OVER (ORDER BY l_extendedprice) - 1 AS bin
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
      |GROUP BY bin ORDER BY bin""".stripMargin

  // ---- p9: dataset-level profile rollup (A17) --------------------------

  def datasetProfile(spark: SparkSession, dir: String): DataFrame = {
    val profiles = Profiler.profileAuto(Tables.load(spark, dir, "customer"),
      "customer", features = Set("mode"))
    Profiler.datasetProfile(profiles)
      .select(col("table"), col("n_columns"), col("n_rows"),
        round(col("avg_null_ratio"), 6).as("avg_null_ratio"),
        round(col("var_null_ratio"), 6).as("var_null_ratio"),
        round(col("avg_unique_ratio"), 6).as("avg_unique_ratio"),
        round(col("var_unique_ratio"), 6).as("var_unique_ratio"),
        round(col("avg_len_mean"), 6).as("avg_len_mean"),
        round(col("numeric_column_ratio"), 6).as("numeric_column_ratio"),
        round(col("string_column_ratio"), 6).as("string_column_ratio"))
  }

  val datasetProfileSql: String = {
    val perCol = customerCols.map { c =>
      s"""SELECT COUNT(*) AS row_count,
         |  CAST(SUM(CASE WHEN NOT ${MatchQueries.nn(c)} THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS null_ratio,
         |  CAST(COUNT(DISTINCT CASE WHEN ${MatchQueries.nn(c)} THEN ${MatchQueries.v(c)} END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS unique_ratio,
         |  COALESCE(CAST(SUM(CASE WHEN ${MatchQueries.nn(c)} THEN LENGTH(${MatchQueries.v(c)}) END) AS DOUBLE)
         |    / CAST(SUM(CASE WHEN ${MatchQueries.nn(c)} THEN 1 ELSE 0 END) AS DOUBLE), 0.0) AS avg_len,
         |  ${MatchQueries.typeCase(c)} AS type
         |FROM customer""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH profs AS (
       |$perCol
       |)
       |SELECT 'customer' AS "table", COUNT(*) AS n_columns,
       |  MAX(row_count) AS n_rows,
       |  ROUND(AVG(null_ratio), 6) AS avg_null_ratio,
       |  ROUND(COALESCE(var_pop(null_ratio), 0.0), 6) AS var_null_ratio,
       |  ROUND(AVG(unique_ratio), 6) AS avg_unique_ratio,
       |  ROUND(COALESCE(var_pop(unique_ratio), 0.0), 6) AS var_unique_ratio,
       |  ROUND(AVG(avg_len), 6) AS avg_len_mean,
       |  ROUND(AVG(CASE WHEN type IN ('integer', 'float') THEN 1.0 ELSE 0.0 END), 6)
       |    AS numeric_column_ratio,
       |  ROUND(AVG(CASE WHEN type = 'string' THEN 1.0 ELSE 0.0 END), 6)
       |    AS string_column_ratio
       |FROM profs""".stripMargin
  }

  // ---- p10: sketch-configuration error-bound certificate -----------------

  /** The 100 TB sketch path (percentile_approx + HLL distincts)
    * certified against exact in-engine ground truth: GK rank-interval
    * check per column × quartile plus a 4σ HLL distinct check. The
    * booleans are deterministic for fixed data; the oracle pins every
    * row to true, so any bound violation fails the hash gate loudly. */
  def sketchBounds(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    graft.profile.SketchBounds.percentileRankCheck(li, lineitemNumCols,
        Seq("q1" -> 0.25, "med" -> 0.5, "q3" -> 0.75), accuracy = 10000)
      .unionByName(graft.profile.SketchBounds.distinctCheck(li,
        Seq("l_quantity", "l_partkey", "l_orderkey", "l_shipdate")))
      .orderBy("column", "metric")
  }

  val sketchBoundsSql: String = {
    val pctRows = lineitemNumCols.flatMap(c =>
      Seq("med", "q1", "q3").map(m => s"('$c', '$m', true)"))
    val dRows = Seq("l_quantity", "l_partkey", "l_orderkey", "l_shipdate")
      .map(c => s"('$c', 'distinct', true)")
    s"""SELECT * FROM (VALUES ${(pctRows ++ dRows).mkString(",\n  ")})
       |AS t("column", metric, ok)
       |ORDER BY "column", metric""".stripMargin
  }

  // ---- p11: incremental profile maintenance ----------------------------

  /** Profile three disjoint increments of `documents` independently,
    * merge their mergeable histogram states, and derive the profile
    * from the merged state alone — no re-scan of the union. The oracle
    * profiles the whole table directly, so hash-equality proves the
    * merge algebra exact: state(A∪B∪C) ≡ merge(state(A), state(B),
    * state(C)). The 100 TB shape: per-increment profiling touches
    * each increment once; the merge is one shuffle bounded by the
    * combined distinct-value count, never the data. */
  def profileMerge(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val states = (0 until 3).map(i =>
      Profiler.incrementState(Seq("documents" ->
        d.filter(pmod(col("doc_id"), lit(3)) === i))))
    Profiler.profileFromState(Profiler.mergeStates(states),
        ProfilerConfig(features = Set("mode")))
      .select("column", "row_count", "null_count", "distinct_count",
              "min_len", "max_len", "avg_len")
      .orderBy("column")
  }

  /** Same oracle as p1: the direct whole-table profile. */
  val profileMergeSql: String = profileBasicSql

  // ---- p12: profile drift between snapshots ------------------------------

  /** Diff the profile states of two deterministic snapshots of
    * `documents` (even vs odd doc_id — a stand-in for yesterday's vs
    * today's crawl): per-column row/null/distinct deltas plus the
    * integer-exact total-variation distance over the value
    * histograms. */
  def profileDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val a = Profiler.incrementState(Seq("documents" ->
      d.filter(pmod(col("doc_id"), lit(2)) === 0)))
    val b = Profiler.incrementState(Seq("documents" ->
      d.filter(pmod(col("doc_id"), lit(2)) === 1)))
    Profiler.stateDrift(a, b)
      .select("column", "n_a", "n_b", "null_a", "null_b",
              "distinct_a", "distinct_b", "l1_scaled", "tv_distance")
      .orderBy("column")
  }

  val profileDriftSql: String = {
    def st(par: Int) = documentsCols.map { c =>
      s"""SELECT '$c' AS "column", ${v(c)} AS value, COUNT(*) AS cnt
         |FROM documents WHERE doc_id % 2 = $par GROUP BY 1, 2""".stripMargin
    }.mkString("(", "\nUNION ALL\n", ")")
    s"""WITH a AS ${st(0)},
       |b AS ${st(1)},
       |ta AS (SELECT "column", CAST(SUM(cnt) AS BIGINT) AS n_a,
       |  CAST(COALESCE(SUM(CASE WHEN value IS NULL OR TRIM(value) = ''
       |    THEN cnt END), 0) AS BIGINT) AS null_a,
       |  CAST(COUNT(CASE WHEN NOT (value IS NULL OR TRIM(value) = '')
       |    THEN 1 END) AS BIGINT) AS distinct_a
       |  FROM a GROUP BY 1),
       |tb AS (SELECT "column", CAST(SUM(cnt) AS BIGINT) AS n_b,
       |  CAST(COALESCE(SUM(CASE WHEN value IS NULL OR TRIM(value) = ''
       |    THEN cnt END), 0) AS BIGINT) AS null_b,
       |  CAST(COUNT(CASE WHEN NOT (value IS NULL OR TRIM(value) = '')
       |    THEN 1 END) AS BIGINT) AS distinct_b
       |  FROM b GROUP BY 1),
       |j AS (SELECT COALESCE(a."column", b."column") AS "column",
       |  COALESCE(a.cnt, 0) AS cnt_a, COALESCE(b.cnt, 0) AS cnt_b
       |  FROM a FULL OUTER JOIN b
       |    ON a."column" = b."column" AND a.value IS NOT DISTINCT FROM b.value),
       |l1 AS (SELECT j."column",
       |  CAST(SUM(ABS(j.cnt_a * COALESCE(tb.n_b, 0)
       |            - j.cnt_b * COALESCE(ta.n_a, 0))) AS BIGINT)
       |    AS l1_scaled
       |  FROM j LEFT JOIN ta ON j."column" = ta."column"
       |         LEFT JOIN tb ON j."column" = tb."column"
       |  GROUP BY 1),
       |t AS (SELECT COALESCE(ta."column", tb."column") AS "column",
       |  COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
       |  COALESCE(null_a, 0) AS null_a, COALESCE(null_b, 0) AS null_b,
       |  COALESCE(distinct_a, 0) AS distinct_a,
       |  COALESCE(distinct_b, 0) AS distinct_b
       |  FROM ta FULL OUTER JOIN tb ON ta."column" = tb."column")
       |SELECT t."column", n_a, n_b, null_a, null_b, distinct_a, distinct_b,
       |  l1_scaled,
       |  CASE WHEN n_a = 0 OR n_b = 0 THEN 1.0
       |       ELSE CAST(l1_scaled AS DOUBLE) /
       |    (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS tv_distance
       |FROM t JOIN l1 ON t."column" = l1."column"
       |ORDER BY t."column"""".stripMargin
  }

  // ---- p13: column concentration (HHI) -----------------------------------

  /** Value-concentration index per `documents` column from the p11
    * profile state — integer-exact Σcnt²/n² with one closing
    * division. */
  def profileConcentration(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    Profiler.stateConcentration(
        Profiler.incrementState(Seq("documents" -> d)))
      .select("column", "n", "n_buckets", "sum_sq", "hhi")
      .orderBy("column")
  }

  val profileConcentrationSql: String = {
    val st = documentsCols.map { c =>
      s"""SELECT '$c' AS "column", ${v(c)} AS value, COUNT(*) AS cnt
         |FROM documents GROUP BY 1, 2""".stripMargin
    }.mkString("(", "\nUNION ALL\n", ")")
    s"""WITH s AS ${st}
       |SELECT "column", CAST(SUM(cnt) AS BIGINT) AS n,
       |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |  CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq,
       |  CAST(SUM(cnt * cnt) AS DOUBLE) /
       |    (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)) AS hhi
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p12_profile_drift" -> (profileDrift _),
    "p13_concentration" -> (profileConcentration _),
    "p11_profile_merge" -> (profileMerge _),
    "p10_sketch_bounds" -> (sketchBounds _),
    "p9_dataset_profile" -> (datasetProfile _),
    "p6_semantic_types" -> (semanticTypes _),
    "p7_equiwidth_bins" -> (equiWidthBins _),
    "p8_equidepth_bins" -> (equiDepthBins _),
    "p1_profile_basic" -> (profileBasic _),
    "p2_profile_numeric" -> (profileNumeric _),
    "p3_profile_types" -> (profileTypes _),
    "p4_profile_patterns" -> (profilePatterns _),
    "p5_top_keywords" -> (topKeywords _))

  def oracleSql: Map[String, String] = Map(
    "p12_profile_drift" -> profileDriftSql,
    "p13_concentration" -> profileConcentrationSql,
    "p11_profile_merge" -> profileMergeSql,
    "p10_sketch_bounds" -> sketchBoundsSql,
    "p9_dataset_profile" -> datasetProfileSql,
    "p6_semantic_types" -> semanticTypesSql,
    "p7_equiwidth_bins" -> equiWidthBinsSql,
    "p8_equidepth_bins" -> equiDepthBinsSql,
    "p1_profile_basic" -> profileBasicSql,
    "p2_profile_numeric" -> profileNumericSql,
    "p3_profile_types" -> profileTypesSql,
    "p4_profile_patterns" -> profilePatternsSql,
    "p5_top_keywords" -> topKeywordsSql)
}
