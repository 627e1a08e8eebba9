package graft.queries

import graft.Tables
import graft.outlier.Outliers
import graft.rules._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the rule engine and statistical
  * detectors (SURVEY.md §2.2/§2.3 J3-J5/§2.4 A21-A22).
  */
object RuleQueries {

  // ---- r1: scalar rule violation scan ----------------------------------

  private val orderRules: Seq[RuleSpec] = Seq(
    RangeRule("o_totalprice", 2000.0, 450000.0),
    EnumRule("o_orderstatus", Seq("F", "O")),
    RegexRule("o_orderpriority", "^[1-5]-[A-Z]+$"))

  def ruleViolations(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    ViolationScanner.scan(o, "orders", orderRules, "o_orderkey")
      .select("column", "row_id", "value", "rule", "severity")
      .orderBy("row_id", "column")
  }

  val ruleViolationsSql: String =
    s"""SELECT * FROM (
       |  SELECT 'o_totalprice' AS "column", o_orderkey AS row_id,
       |    CAST(o_totalprice AS VARCHAR) AS value,
       |    'range(o_totalprice)' AS rule, 'warning' AS severity
       |  FROM orders WHERE o_totalprice < 2000.0 OR o_totalprice > 450000.0
       |  UNION ALL
       |  SELECT 'o_orderstatus', o_orderkey, o_orderstatus,
       |    'enum(o_orderstatus)', 'error'
       |  FROM orders WHERE o_orderstatus NOT IN ('F', 'O')
       |  UNION ALL
       |  SELECT 'o_orderpriority', o_orderkey, o_orderpriority,
       |    'regex(o_orderpriority)', 'error'
       |  FROM orders WHERE NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$$')
       |) ORDER BY row_id, "column"""".stripMargin

  // ---- r2: functional-dependency conflict summary (J3) -----------------

  def fdConflicts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupBy(col("o_custkey"))
      .agg(countDistinct("o_orderpriority").as("n_rhs"),
           count(lit(1)).as("n_rows"))
      .filter(col("n_rhs") > 1)
      .orderBy("o_custkey")
  }

  val fdConflictsSql: String =
    """SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_rhs,
      |  COUNT(*) AS n_rows
      |FROM orders GROUP BY o_custkey
      |HAVING COUNT(DISTINCT o_orderpriority) > 1
      |ORDER BY o_custkey""".stripMargin

  // ---- r3: inclusion-dependency violations (J5) ------------------------

  def inclusionViolations(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    ViolationScanner.scan(c, "customer",
        Seq(InclusionRule("c_custkey", "orders", "o_custkey")),
        "c_custkey", parents = Map("orders" -> o))
      .select("row_id")
      .orderBy("row_id")
  }

  val inclusionViolationsSql: String =
    """SELECT c_custkey AS row_id FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY row_id""".stripMargin

  // ---- r4: unique-rule violations (window path) ------------------------

  def uniqueViolations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    // l_orderkey repeats across line numbers — every multi-line order is
    // a "violation", exercising the window path deterministically
    ViolationScanner.scan(li.select("l_orderkey", "l_linenumber"),
        "lineitem", Seq(UniqueRule("l_orderkey")), "l_orderkey")
      .groupBy("value").agg(count(lit(1)).as("n_dup_rows"))
      .orderBy(col("value").cast("long"))
  }

  val uniqueViolationsSql: String =
    """SELECT CAST(l_orderkey AS VARCHAR) AS value, COUNT(*) AS n_dup_rows
      |FROM lineitem
      |GROUP BY l_orderkey HAVING COUNT(*) > 1
      |ORDER BY l_orderkey""".stripMargin

  // ---- r9: composite-key uniqueness violations (is_composite_key) ------

  def compositeKeyViolations(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    // (o_custkey, o_orderdate) is ALMOST a key — the few same-day repeat
    // customers are the violations, exercising the multi-column tuple path
    ViolationScanner.scan(o.select("o_orderkey", "o_custkey", "o_orderdate"),
        "orders", Seq(CompositeUniqueRule(Seq("o_custkey", "o_orderdate"))),
        "o_orderkey")
      .select("row_id", "value")
      .orderBy("row_id")
  }

  val compositeKeyViolationsSql: String =
    """SELECT o_orderkey AS row_id,
      |  CAST(o_custkey AS VARCHAR) || ',' || CAST(o_orderdate AS VARCHAR) AS value
      |FROM orders
      |QUALIFY COUNT(*) OVER (PARTITION BY o_custkey, o_orderdate) > 1
      |ORDER BY row_id""".stripMargin

  // ---- o1: 3-sigma outliers (A21) --------------------------------------

  def sigmaOutliers(spark: SparkSession, dir: String): DataFrame =
    Outliers.sigmaOutliers(Tables.load(spark, dir, "events"), "value",
        "event_id", k = 3.0)
      .select("row_id", "value")
      .orderBy("row_id")

  val sigmaOutliersSql: String =
    """WITH s AS (
      |  SELECT CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS m,
      |         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS m2
      |  FROM events)
      |SELECT event_id AS row_id, value FROM events, s
      |WHERE value IS NOT NULL AND ABS(value - m) > 3.0 * sqrt(m2 - m * m)
      |ORDER BY row_id""".stripMargin

  // ---- o4: MAD robust outliers -----------------------------------------

  /** Modified z-score outliers on the skewed event values: the robust
    * estimator (median/MAD via the exact-percentile kernel) flags the
    * heavy right tail that drags the o1 Gaussian fit toward itself. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame =
    Outliers.madOutliers(Tables.load(spark, dir, "events"), "value",
        "event_id", k = 3.5)
      .select("row_id", "value", "median", "mad")
      .orderBy("row_id")

  val madOutliersSql: String =
    """WITH s AS (SELECT quantile_cont(value, 0.5) AS med FROM events),
      |m AS (SELECT quantile_cont(ABS(value - med), 0.5) AS mad FROM events, s)
      |SELECT event_id AS row_id, value, med AS median, mad
      |FROM events, s, m
      |WHERE value IS NOT NULL AND mad > 0
      |  AND 0.6745 * ABS(value - med) > 3.5 * mad
      |ORDER BY row_id""".stripMargin

  // ---- o2: low-frequency categorical outliers (A22) --------------------

  def lowFrequency(spark: SparkSession, dir: String): DataFrame =
    Outliers.lowFrequencyValues(Tables.load(spark, dir, "part"), "p_brand",
        minRatio = 0.04)
      .orderBy("value")

  val lowFrequencySql: String =
    """SELECT value, cnt FROM (
      |  SELECT p_brand AS value, COUNT(*) AS cnt, SUM(COUNT(*)) OVER () AS total
      |  FROM part WHERE p_brand IS NOT NULL GROUP BY p_brand)
      |WHERE CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) < 0.04
      |ORDER BY value""".stripMargin

  // ---- o3: per-group sigma outliers (dBoost partitioned A28) -----------

  def groupedSigma(spark: SparkSession, dir: String): DataFrame =
    Outliers.groupedSigmaOutliers(Tables.load(spark, dir, "events"),
        "value", "event_type", "event_id", k = 3.0)
      .select("group", "row_id", "value")
      .orderBy("row_id")

  val groupedSigmaSql: String =
    """WITH s AS (
      |  SELECT event_type AS g,
      |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS m,
      |    CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS m2
      |  FROM events GROUP BY event_type)
      |SELECT event_type AS "group", event_id AS row_id, value
      |FROM events JOIN s ON event_type = g
      |WHERE value IS NOT NULL AND ABS(value - m) > 3.0 * sqrt(m2 - m * m)
      |ORDER BY row_id""".stripMargin

  // ---- r5: denial constraints (J4) -------------------------------------

  private val dcs = Seq(
    "t1&t2&EQ(t1.o_custkey,t2.o_custkey)&IQ(t1.o_orderpriority,t2.o_orderpriority)",
    "t1&t2&EQ(t1.o_custkey,t2.o_custkey)&GT(t1.o_totalprice,t2.o_totalprice)&IQ(t1.o_orderstatus,t2.o_orderstatus)")

  def denialConstraints(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    DenialConstraints.scan(o, "orders", dcs.map(DenialConstraints.parse), "o_orderkey")
      .select("rule", "row_id")
      .orderBy("rule", "row_id")
  }

  val denialConstraintsSql: String =
    s"""SELECT * FROM (
       |  SELECT '${dcs(0)}' AS rule, row_id FROM (
       |    SELECT a.o_orderkey AS row_id FROM orders a JOIN orders b
       |      ON a.o_custkey = b.o_custkey
       |     AND a.o_orderpriority <> b.o_orderpriority
       |     AND a.o_orderkey <> b.o_orderkey
       |    UNION
       |    SELECT b.o_orderkey FROM orders a JOIN orders b
       |      ON a.o_custkey = b.o_custkey
       |     AND a.o_orderpriority <> b.o_orderpriority
       |     AND a.o_orderkey <> b.o_orderkey)
       |  UNION ALL
       |  SELECT '${dcs(1)}', row_id FROM (
       |    SELECT a.o_orderkey AS row_id FROM orders a JOIN orders b
       |      ON a.o_custkey = b.o_custkey
       |     AND a.o_totalprice > b.o_totalprice
       |     AND a.o_orderstatus <> b.o_orderstatus
       |     AND a.o_orderkey <> b.o_orderkey
       |    UNION
       |    SELECT b.o_orderkey FROM orders a JOIN orders b
       |      ON a.o_custkey = b.o_custkey
       |     AND a.o_totalprice > b.o_totalprice
       |     AND a.o_orderstatus <> b.o_orderstatus
       |     AND a.o_orderkey <> b.o_orderkey)
       |) ORDER BY rule, row_id""".stripMargin

  // ---- r6: trained threshold bands (A18) -------------------------------

  private val bandCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** The lineitem band columns are money-style 2-decimal values, so
    * the moments run the exact Long fixed-point kernel; the oracle
    * mirrors the identical integer arithmetic. */
  def trainedBands(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    TrainedRules.thresholdBands(li, bandCols, fixedPointDecimals = Some(2))
      .select(col("column"), round(col("p05"), 6).as("p05"),
        round(col("p95"), 6).as("p95"), round(col("mean"), 6).as("mean"),
        round(col("std"), 6).as("std"))
      .orderBy("column")
  }

  val trainedBandsSql: String = {
    import graft.ops.FixedPoint.{favgSql, fsumSql}
    def meanSql(c: String) = favgSql(c, 2)
    def m2Sql(c: String) = s"(${fsumSql(s"$c * $c", 4, base = 1000000000L)} / COUNT($c))"
    bandCols.map { c =>
      s"""SELECT '$c' AS "column",
         |  ROUND(quantile_cont($c, 0.05), 6) AS p05,
         |  ROUND(quantile_cont($c, 0.95), 6) AS p95,
         |  ROUND(${meanSql(c)}, 6) AS mean,
         |  ROUND(sqrt(${m2Sql(c)} - ${meanSql(c)} * ${meanSql(c)}), 6) AS std
         |FROM lineitem""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")
  }

  // ---- r7: trained-rule violation scan (A18 end to end) ----------------

  def trainedViolations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .withColumn("lkey", col("l_orderkey") * 10 + col("l_linenumber"))
    TrainedRules.fitAndScan(li, li, "lineitem", bandCols, "lkey")
      .select("column", "row_id")
      .orderBy("row_id", "column")
  }

  val trainedViolationsSql: String = {
    val scans = bandCols.map { c =>
      s"""SELECT '$c' AS "column", l_orderkey * 10 + l_linenumber AS row_id
         |FROM lineitem, b
         |WHERE $c < b.${c}_lo OR $c > b.${c}_hi""".stripMargin
    }.mkString("\nUNION ALL\n")
    val bands = bandCols.map(c =>
      s"quantile_cont($c, 0.05) AS ${c}_lo, quantile_cont($c, 0.95) AS ${c}_hi")
      .mkString(", ")
    s"""WITH b AS (SELECT $bands FROM lineitem)
       |SELECT * FROM (
       |$scans
       |) ORDER BY row_id, "column"""".stripMargin
  }

  // ---- r8: dictionary membership misses (P8) ---------------------------

  def dictionaryMisses(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val part = Tables.load(spark, dir, "part")
    // probe: dotted-lowercase nation names (normalize to dictionary hits)
    // plus part names (all misses)
    val probe = nation.select(concat(lower(col("n_name")), lit(".")).as("v"))
      .unionByName(part.select(col("p_name").as("v")))
    Dictionary.misses(probe, "v", nation, "n_name")
      .orderBy("value")
  }

  val dictionaryMissesSql: String = {
    def norm(e: String) =
      "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        s"regexp_replace(lower($e), '\\.', '', 'g'), " +
        "'\\bst\\b', 'saint', 'g'), '\\bmt\\b', 'mount', 'g'), " +
        "'\\bft\\b', 'fort', 'g'), '\\s+', ' ', 'g'))"
    s"""WITH probe AS (
       |  SELECT lower(n_name) || '.' AS v FROM nation
       |  UNION ALL SELECT p_name FROM part),
       |dict AS (SELECT DISTINCT ${norm("n_name")} AS dv FROM nation)
       |SELECT DISTINCT v AS value FROM probe
       |WHERE ${norm("v")} <> ''
       |  AND ${norm("v")} NOT IN (SELECT dv FROM dict)
       |ORDER BY value""".stripMargin
  }

  // ---- r10: FD discovery (rule generation from data) ---------------------

  /** Mine candidate FDs over a DENORMALIZED view (customer ⋈ nation):
    * discovery must recover the normalization dependencies — every
    * column determined by the embedded nation key (c_nationkey ↔ n_name
    * both ways, both → n_regionkey) — and reject the noise pairs
    * (c_mktsegment determines nothing, n_regionkey determines nothing),
    * using [[RuleGenerator.discoverFds]]' screen + g3 conflict counting
    * in exact mode. */
  private val FdCols = Seq("c_mktsegment", "c_nationkey", "n_name", "n_regionkey")

  def fdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val denorm = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(FdCols.map(c => col(c)): _*)
    RuleGenerator.discoverFds(denorm, FdCols,
        maxLhsDistinctRatio = 0.5, maxConflictRatio = 0.05)
      .orderBy("lhs_col", "rhs_col")
  }

  val fdDiscoverySql: String = {
    val base = "SELECT c_mktsegment, c_nationkey, n_name, n_regionkey " +
      "FROM customer JOIN nation ON c_nationkey = n_nationkey"
    val cs = FdCols.map(c =>
      s"SELECT '$c' AS c, COUNT(DISTINCT $c) AS d, COUNT($c) AS n FROM denorm")
      .mkString("\nUNION ALL ")
    val longSel = (for { a <- FdCols; b <- FdCols if a != b } yield
      s"SELECT '$a' AS lhs_col, '$b' AS rhs_col, CAST($a AS VARCHAR) AS lhs_val, " +
        s"CAST($b AS VARCHAR) AS rhs_val FROM denorm WHERE $a IS NOT NULL AND $b IS NOT NULL")
      .mkString("\nUNION ALL ")
    s"""WITH denorm AS ($base),
       |cs AS ($cs),
       |long AS ($longSel),
       |screened AS (
       |  SELECT l.* FROM long l
       |  JOIN cs a ON a.c = l.lhs_col AND a.d >= 2 AND CAST(a.d AS DOUBLE) <= 0.5 * a.n
       |  JOIN cs b ON b.c = l.rhs_col AND b.d >= 2),
       |perval AS (
       |  SELECT lhs_col, rhs_col, lhs_val, rhs_val, COUNT(*) AS c
       |  FROM screened GROUP BY 1, 2, 3, 4),
       |perlhs AS (
       |  SELECT lhs_col, rhs_col, lhs_val, SUM(c) AS n, MAX(c) AS mx,
       |    COUNT(*) AS n_rhs
       |  FROM perval GROUP BY 1, 2, 3)
       |SELECT lhs_col, rhs_col, COUNT(*) AS n_groups,
       |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
       |  CAST(SUM(n - mx) AS BIGINT) AS conflict_rows,
       |  CAST(SUM(n) AS BIGINT) AS n_rows,
       |  CAST(1 AS DOUBLE) - CAST(SUM(n - mx) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS confidence,
       |  (CAST(1 AS DOUBLE) - CAST(SUM(n - mx) AS DOUBLE) / CAST(SUM(n) AS DOUBLE))
       |    >= CAST(0.95 AS DOUBLE) AS holds
       |FROM perlhs GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  // ---- r11: inclusion-dependency (FK candidate) discovery ---------------

  /** Mine INDs over the TPC-H key/FK columns with
    * [[RuleGenerator.discoverInds]]: discovery must recover the schema's
    * four foreign keys (n_regionkey⊆r_regionkey, c_nationkey⊆n_nationkey,
    * s_nationkey⊆n_nationkey, o_custkey⊆c_custkey) and flag their
    * parents as keys, alongside the coincidental containments any real
    * IND run surfaces (small key domains nest in larger ones) — which is
    * exactly why [[RuleGenerator.discoveredInclusionRules]] filters on
    * parent_is_key before emitting FK rules. */
  private val IndCandidates: Seq[(String, Seq[String])] = Seq(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "orders" -> Seq("o_custkey"))

  def indDiscovery(spark: SparkSession, dir: String): DataFrame =
    RuleGenerator.discoverInds(
        IndCandidates.map { case (t, cs) => (t, Tables.load(spark, dir, t), cs) })
      .orderBy("child_table", "child_column", "parent_table", "parent_column")

  val indDiscoverySql: String = {
    val inv = IndCandidates.flatMap { case (t, cs) => cs.map(c =>
      s"SELECT DISTINCT '$t' AS tbl, '$c' AS col, CAST($c AS VARCHAR) AS v " +
        s"FROM $t WHERE $c IS NOT NULL") }
      .mkString("\nUNION ALL ")
    val cnts = IndCandidates.flatMap { case (t, cs) => cs.map(c =>
      s"SELECT '$t' AS tbl, '$c' AS col, COUNT($c) AS nn FROM $t") }
      .mkString("\nUNION ALL ")
    s"""WITH inv AS ($inv),
       |cnts AS ($cnts),
       |cd AS (SELECT tbl, col, COUNT(*) AS d FROM inv GROUP BY 1, 2),
       |shared AS (
       |  SELECT a.tbl AS child_table, a.col AS child_column,
       |    b.tbl AS parent_table, b.col AS parent_column,
       |    COUNT(*) AS shared_distinct
       |  FROM inv a JOIN inv b USING (v)
       |  WHERE a.tbl <> b.tbl OR a.col <> b.col
       |  GROUP BY 1, 2, 3, 4)
       |SELECT s.child_table, s.child_column, s.parent_table, s.parent_column,
       |  ca.d AS child_distinct, cp.d AS parent_distinct, s.shared_distinct,
       |  CAST(s.shared_distinct AS DOUBLE) / CAST(ca.d AS DOUBLE) AS coverage,
       |  cp.d = n.nn AS parent_is_key,
       |  CAST(s.shared_distinct AS DOUBLE) / CAST(ca.d AS DOUBLE)
       |    >= CAST(1.0 AS DOUBLE) AS holds
       |FROM shared s
       |JOIN cd ca ON ca.tbl = s.child_table AND ca.col = s.child_column
       |JOIN cd cp ON cp.tbl = s.parent_table AND cp.col = s.parent_column
       |JOIN cnts n ON n.tbl = s.parent_table AND n.col = s.parent_column
       |ORDER BY 1, 2, 3, 4""".stripMargin
  }

  // ---- r12: constant conditional-FD discovery ----------------------------

  /** Mine constant CFDs from a planted conditional structure on orders
    * (the synthetic tables are uniform, so the query plants the pattern
    * the way d9/d10 plant boilerplate): priorities 1-3 map to a fixed
    * handling class — the global FD prio → handling FAILS (4/5 split
    * ~50/50 on order parity) but the three per-value bindings hold
    * exactly, and [[RuleGenerator.discoverConstantCfds]] must recover
    * exactly those three. */
  def cfdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val prio = substring(col("o_orderpriority"), 1, 1)
    val planted = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), prio.as("prio"),
        when(prio.isin("1", "2", "3"), concat(lit("class-"), prio))
          .otherwise(concat(lit("mix-"), pmod(col("o_orderkey"), lit(2L))))
          .as("handling"))
    RuleGenerator.discoverConstantCfds(planted, Seq("prio" -> "handling"),
        minSupport = 10L, minConfidence = 0.9)
      .orderBy("lhs_val")
  }

  val cfdDiscoverySql: String =
    """WITH planted AS (
      |  SELECT o_orderkey, substr(o_orderpriority, 1, 1) AS prio,
      |    CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2', '3')
      |         THEN 'class-' || substr(o_orderpriority, 1, 1)
      |         ELSE 'mix-' || CAST(o_orderkey % 2 AS VARCHAR) END AS handling
      |  FROM orders),
      |perval AS (
      |  SELECT prio AS lhs_val, handling AS rhs_val, COUNT(*) AS c
      |  FROM planted GROUP BY 1, 2),
      |ranked AS (
      |  SELECT lhs_val, rhs_val, c,
      |    row_number() OVER (PARTITION BY lhs_val ORDER BY c DESC, rhs_val DESC) AS rn,
      |    SUM(c) OVER (PARTITION BY lhs_val) AS support,
      |    COUNT(*) OVER (PARTITION BY lhs_val) AS n_rhs
      |  FROM perval)
      |SELECT 'prio' AS lhs_col, 'handling' AS rhs_col, lhs_val, rhs_val,
      |  CAST(support AS BIGINT) AS support, CAST(n_rhs AS BIGINT) AS n_rhs,
      |  CAST(c AS DOUBLE) / CAST(support AS DOUBLE) AS confidence
      |FROM ranked
      |WHERE rn = 1 AND support >= 10
      |  AND CAST(c AS DOUBLE) / CAST(support AS DOUBLE) >= CAST(0.9 AS DOUBLE)
      |ORDER BY lhs_val""".stripMargin

  // ---- r13: candidate-key (UCC) discovery --------------------------------

  /** Mine candidate keys over events with
    * [[RuleGenerator.discoverKeys]]. The query plants a two-part key
    * the way r12 plants its conditional structure (the synthetic
    * event_id is dense): shard = event_id % 97 and seq = event_id / 97
    * — neither holds alone, ONLY their pair does. Expected discovery:
    * `ts` as the lone single key (event timestamps are distinct) and
    * (shard, seq) as the lone minimal composite; pairs containing `ts`
    * must be pruned (minimality), every other combination must report
    * its duplicate counts and fail. */
  private val KeyCols = Seq("shard", "seq", "user_id", "event_type", "ts")

  def keyDiscovery(spark: SparkSession, dir: String): DataFrame =
    RuleGenerator.discoverKeys(
        Tables.load(spark, dir, "events").select(
          (col("event_id") % 97).as("shard"),
          floor(col("event_id") / 97).cast("long").as("seq"),
          col("user_id"), col("event_type"), col("ts")),
        KeyCols)
      .orderBy("key_cols")

  /** Mirror: one wide single-column aggregate CTE, one wide pair CTE;
    * pair rows are emitted only where neither member holds alone —
    * replicating discoverKeys' minimality pruning in SQL. */
  val keyDiscoverySql: String = {
    val kcPairs = for {
      (a, ia) <- KeyCols.zipWithIndex
      b <- KeyCols.drop(ia + 1)
    } yield (a, b)
    val sAggs = ("COUNT(*) AS n" +: KeyCols.flatMap(c => Seq(
      s"COUNT($c) AS nn_$c", s"COUNT(DISTINCT $c) AS d_$c"))).mkString(",\n    ")
    val pAggs = kcPairs.flatMap { case (a, b) =>
      val both = s"$a IS NOT NULL AND $b IS NOT NULL"
      Seq(s"COUNT(CASE WHEN $both THEN 1 END) AS nn_${a}__$b",
        s"COUNT(DISTINCT CASE WHEN $both THEN row($a, $b) END) AS d_${a}__$b")
    }.mkString(",\n    ")
    def holdsSql(nn: String, dd: String) = s"($nn = s.n AND $dd = s.n)"
    val singleSel = KeyCols.map { c =>
      s"""SELECT '$c' AS key_cols, 1 AS arity, s.n AS n_rows,
         |  nn_$c AS n_nonnull, d_$c AS n_distinct,
         |  nn_$c - d_$c AS n_duplicate_rows,
         |  ${holdsSql(s"nn_$c", s"d_$c")} AS holds FROM s""".stripMargin
    }
    val pairSel = kcPairs.map { case (a, b) =>
      s"""SELECT '$a,$b' AS key_cols, 2 AS arity, s.n AS n_rows,
         |  nn_${a}__$b AS n_nonnull, d_${a}__$b AS n_distinct,
         |  nn_${a}__$b - d_${a}__$b AS n_duplicate_rows,
         |  ${holdsSql(s"nn_${a}__$b", s"d_${a}__$b")} AS holds
         |FROM s, p
         |WHERE NOT ${holdsSql(s"s.nn_$a", s"s.d_$a")}
         |  AND NOT ${holdsSql(s"s.nn_$b", s"s.d_$b")}""".stripMargin
    }
    s"""WITH base AS (
       |  SELECT event_id % 97 AS shard, event_id // 97 AS seq,
       |    user_id, event_type, ts
       |  FROM events),
       |s AS (
       |  SELECT $sAggs
       |  FROM base),
       |p AS (
       |  SELECT $pAggs
       |  FROM base)
       |${(singleSel ++ pairSel).mkString("\nUNION ALL\n")}
       |ORDER BY key_cols""".stripMargin
  }

  // ---- r14: source-blocklist rule generation -----------------------------

  /** Roll up per-source corpus quality with
    * [[graft.rules.CorpusRules.sourceStats]] and flag the sources a
    * curation pass should block (avg quality < 0.91 or >45% short
    * docs) — rule generation pointed at the training-data pipeline:
    * the blocked rows become scannable `source <> '...'` rules via
    * [[graft.rules.CorpusRules.blocklistRules]]. */
  def sourceRules(spark: SparkSession, dir: String): DataFrame =
    graft.rules.CorpusRules.sourceStats(
        Tables.load(spark, dir, "documents"), "source", "text",
        minAvgQuality = 0.91, maxShortFrac = 0.45)
      .orderBy("source")

  val sourceRulesSql: String =
    s"""WITH q AS (
       |  SELECT source, CAST(${CorpusQueries.qualityE4ExprSql} AS BIGINT) AS e4,
       |    LENGTH(text) AS len
       |  FROM documents),
       |agg AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(e4) AS BIGINT) AS sum_quality_e4,
       |    CAST(SUM(CASE WHEN len < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
       |  FROM q GROUP BY source)
       |SELECT source, n_docs, sum_quality_e4, n_short,
       |  CAST(sum_quality_e4 AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 10000.0) AS avg_quality,
       |  CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE) AS short_frac,
       |  (CAST(sum_quality_e4 AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 10000.0) < CAST(0.91 AS DOUBLE)
       |   OR CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE) > CAST(0.45 AS DOUBLE)) AS blocked
       |FROM agg ORDER BY source""".stripMargin

  // ---- r15: host-grain curation ------------------------------------------

  // quota/threshold constants, declared before the SQL val that
  // interpolates them (object-init order)
  private val R15Quota = 10
  private val R15MinAvgQ = 0.91
  private val R15MaxShort = 0.45
  private val R15MaxUrlDup = 0.12

  /** Deterministic URL derivation over the documents table — the
    * synthetic crawl addresses for the host-curation rehearsal. Every
    * doc id ending in 7 is a TRACKING TWIN: its URL replays the decade
    * anchor's address (same scheme/host/port/path/semantic params)
    * plus a click id, so URL canonicalization provably collapses it;
    * anchors ending in 0 concentrate in the src0/src10 hosts, which
    * therefore cross the URL-duplication blocklist threshold. Case,
    * default-port, tracking-param, param-order, and fragment
    * normalization are each exercised on a deterministic id slice. */
  private def withUrls(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val a = when(d % 10 === 7, d - 7).otherwise(d)
    val scheme = when(a % 9 === 0, "HTTP://").otherwise("https://")
    val hostRaw = concat(
      when(a % 3 === 0, "www.").when(a % 3 === 1, "M.").otherwise(""),
      lit("src"), (a % 20).cast("string"),
      when(a % 5 === 0, ".co.uk").otherwise(".com"))
    val host = when(a % 9 === 0, upper(hostRaw)).otherwise(hostRaw)
    val port = when(a % 11 === 0, ":443").otherwise("")
    val query = when(a % 4 === 0, concat(lit("?utm_source=feed&id="), a))
      .when(a % 6 === 0, concat(lit("?id="), a, lit("&b=2&ref=tw")))
      .otherwise("?v=1")
    val url = concat(scheme, host, port, lit("/p/"), a.cast("string"), query,
      when(d % 10 === 7, concat(lit("&fbclid="), d.cast("string")))
        .otherwise(""),
      when(d % 7 === 0, "#top").otherwise(""))
    docs.select(d, col("text"), url.as("url"))
  }

  /** Host-grain curation end to end ([[graft.rules.HostCuration]]):
    * per-host rollups (quality, short fraction, URL-duplication
    * fraction over canonical URLs) with the blocklist decision, then
    * the curation pass itself — canonical-URL dedup, blocked-host
    * anti-join, per-host quota ([[graft.text.Sampling.quotaSample]]) —
    * reported back as each host's post-curation kept count. */
  def hostCuration(spark: SparkSession, dir: String): DataFrame = {
    import graft.rules.HostCuration
    val docs = withUrls(Tables.load(spark, dir, "documents"))
    val stats = HostCuration.hostStats(docs, "url", "text",
      minAvgQuality = R15MinAvgQ, maxShortFrac = R15MaxShort,
      maxUrlDupFrac = R15MaxUrlDup)
    val blockedHosts = stats.filter(col("blocked")).select("host")
    val deduped = HostCuration.dropUrlDuplicates(docs, "url", "doc_id")
      .withColumn("host", HostCuration.canonicalHost(col("url")))
      .join(broadcast(blockedHosts), Seq("host"), "left_anti")
    val kept = graft.text.Sampling
      .quotaSample(deduped, "host", "doc_id", quota = R15Quota)
      .groupBy("host").agg(count(lit(1)).as("n_kept"))
    stats.join(kept, Seq("host"), "left_outer")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .orderBy("host")
  }

  // the canonical URL pieces over a url column (RE2 forms) — shared by
  // the r15 and r16 mirrors so the two canonicalizations cannot drift
  private val UrlTrackRe = "^(?:utm_[a-z]+|ref|fbclid|gclid|sessionid)="
  private val UrlAuthSql =
    """CASE WHEN regexp_extract(lower(url),
      |    '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1) <> ''
      |  THEN regexp_extract(lower(url),
      |    '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1)
      |  ELSE regexp_extract(lower(url), '^(?:[^/?#@]*@)?([^/?#]+)', 1)
      |END""".stripMargin
  private val UrlDomainSql =
    """CASE
      |  WHEN regexp_extract(host,
      |    '([^.]+\.(?:co|com|net|org|gov|edu|ac)\.[a-z][a-z])$', 1) <> ''
      |  THEN regexp_extract(host,
      |    '([^.]+\.(?:co|com|net|org|gov|edu|ac)\.[a-z][a-z])$', 1)
      |  WHEN regexp_extract(host, '([^.]+\.[^.]+)$', 1) <> ''
      |  THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
      |  ELSE host
      |END""".stripMargin
  private val UrlHostFromA2Sql =
    """regexp_replace(regexp_replace(regexp_replace(a2,
      |  ':[0-9]+$', ''), '\.$', ''), '^(?:www[0-9]*|m|amp)\.', '')"""
      .stripMargin
  /** The k0-CTE body: raw canonical pieces (scheme, a2, upath, params)
    * of `url`, given extra pass-through columns. */
  private def urlPiecesSql(extraCols: String): String =
    s"""  SELECT doc_id,$extraCols
       |    regexp_extract(lower(url), '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
       |    $UrlAuthSql AS a2,
       |    regexp_extract(url,
       |      '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?[^/?#]*([^?#]*)', 1)
       |      AS upath,
       |    array_to_string(list_sort(list_filter(
       |      string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
       |      p -> p <> '' AND NOT regexp_matches(p, '$UrlTrackRe'))), '&')
       |      AS params""".stripMargin
  /** The assembled canonical URL over the [[urlPiecesSql]] columns.
    * No continuation line may start with `|` — this fragment is
    * interpolated into outer `.stripMargin` strings, which would strip
    * a leading `||` operator down to `|`. */
  private val UrlCanonSql =
    """(CASE WHEN scheme <> '' THEN scheme || '://' ELSE '' END) ||
      |    (CASE WHEN (scheme = 'http' AND a2 LIKE '%:80')
      |            OR (scheme = 'https' AND a2 LIKE '%:443')
      |          THEN regexp_replace(a2, ':[0-9]+$', '') ELSE a2 END) ||
      |    upath ||
      |    (CASE WHEN params <> '' THEN '?' || params ELSE '' END)"""
      .stripMargin

  /** The deterministic `u(doc_id, text, url)` derivation CTE body —
    * the [[withUrls]] mirror, shared by the r15 and r16 mirrors. */
  private val UrlDeriveCteSql =
    """u AS (
      |  SELECT doc_id, text,
      |    (CASE WHEN a % 9 = 0 THEN 'HTTP://' ELSE 'https://' END) ||
      |    (CASE WHEN a % 9 = 0 THEN upper(hostraw) ELSE hostraw END) ||
      |    (CASE WHEN a % 11 = 0 THEN ':443' ELSE '' END) ||
      |    '/p/' || a::VARCHAR ||
      |    (CASE WHEN a % 4 = 0 THEN '?utm_source=feed&id=' || a::VARCHAR
      |          WHEN a % 6 = 0 THEN '?id=' || a::VARCHAR || '&b=2&ref=tw'
      |          ELSE '?v=1' END) ||
      |    (CASE WHEN doc_id % 10 = 7 THEN '&fbclid=' || doc_id::VARCHAR
      |          ELSE '' END) ||
      |    (CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END) AS url
      |  FROM (
      |    SELECT doc_id, text, a,
      |      (CASE WHEN a % 3 = 0 THEN 'www.'
      |            WHEN a % 3 = 1 THEN 'M.' ELSE '' END) ||
      |      'src' || (a % 20)::VARCHAR ||
      |      (CASE WHEN a % 5 = 0 THEN '.co.uk' ELSE '.com' END) AS hostraw
      |    FROM (SELECT doc_id, text,
      |            CASE WHEN doc_id % 10 = 7 THEN doc_id - 7
      |                 ELSE doc_id END AS a
      |          FROM documents)))""".stripMargin

  val hostCurationSql: String = {
    val trackRe = UrlTrackRe
    val auth = UrlAuthSql
    val domain = UrlDomainSql
    val hostFromA2 = UrlHostFromA2Sql
    s"""WITH $UrlDeriveCteSql,
       |k0 AS (
       |  SELECT doc_id, text,
       |    regexp_extract(lower(url), '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
       |    $auth AS a2,
       |    regexp_extract(url,
       |      '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?[^/?#]*([^?#]*)', 1)
       |      AS upath,
       |    array_to_string(list_sort(list_filter(
       |      string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
       |      p -> p <> '' AND NOT regexp_matches(p, '$trackRe'))), '&')
       |      AS params
       |  FROM u),
       |k AS (
       |  SELECT doc_id, $hostFromA2 AS host,
       |    (CASE WHEN scheme <> '' THEN scheme || '://' ELSE '' END) ||
       |    (CASE WHEN (scheme = 'http' AND a2 LIKE '%:80')
       |            OR (scheme = 'https' AND a2 LIKE '%:443')
       |          THEN regexp_replace(a2, ':[0-9]+$$', '') ELSE a2 END)
       |    || upath ||
       |    (CASE WHEN params <> '' THEN '?' || params ELSE '' END) AS cu,
       |    CAST(${CorpusQueries.qualityE4ExprSql} AS BIGINT) AS e4,
       |    LENGTH(text) AS len
       |  FROM k0),
       |agg AS (
       |  SELECT host, COUNT(*) AS n_docs, COUNT(DISTINCT cu) AS n_urls,
       |    CAST(SUM(e4) AS BIGINT) AS sum_quality_e4,
       |    CAST(SUM(CASE WHEN len < 200 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_short
       |  FROM k GROUP BY host),
       |stats AS (
       |  SELECT host, n_docs, n_urls, sum_quality_e4, n_short,
       |    $domain AS domain,
       |    CAST(sum_quality_e4 AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 10000.0)
       |      AS avg_quality,
       |    CAST(n_docs - n_urls AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |      AS url_dup_frac,
       |    CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE) AS short_frac,
       |    (CAST(sum_quality_e4 AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 10000.0)
       |       < CAST($R15MinAvgQ AS DOUBLE)
       |     OR CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |       > CAST($R15MaxShort AS DOUBLE)
       |     OR CAST(n_docs - n_urls AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |       > CAST($R15MaxUrlDup AS DOUBLE)) AS blocked
       |  FROM agg),
       |dedup AS (
       |  SELECT k.doc_id, k.host FROM k
       |  JOIN (SELECT cu, MIN(doc_id) AS doc_id FROM k GROUP BY cu) w
       |    ON k.cu = w.cu AND k.doc_id = w.doc_id
       |  WHERE k.host NOT IN (SELECT host FROM stats WHERE blocked)),
       |quota AS (
       |  SELECT host, COUNT(*) AS n_kept FROM (
       |    SELECT host,
       |      ROW_NUMBER() OVER (PARTITION BY host
       |        ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
       |    FROM dedup)
       |  WHERE rn <= $R15Quota GROUP BY host)
       |SELECT s.host, s.domain, s.n_docs, s.n_urls, s.sum_quality_e4,
       |  s.n_short, s.avg_quality, s.url_dup_frac, s.short_frac, s.blocked,
       |  coalesce(q.n_kept, 0)::BIGINT AS n_kept
       |FROM stats s LEFT JOIN quota q USING (host)
       |ORDER BY s.host""".stripMargin
  }

  // ---- r16: URL-grain keep-newest revisit dedup ---------------------------

  /** Cross-dump revisit policy over the r15 URL plane
    * ([[graft.rules.HostCuration.keepNewestRevisit]]): the crawler
    * re-fetches living pages every dump, so each canonical URL keeps
    * its NEWEST fetch (deterministic fetch stamp derived per doc;
    * tracking twins share their anchor's canonical URL and therefore
    * compete with it). Reported per canonical URL: the surviving doc,
    * its stamp, and the revisit count — ordered by the surviving id. */
  def urlRevisits(spark: SparkSession, dir: String): DataFrame = {
    import graft.rules.HostCuration
    val docs = withUrls(Tables.load(spark, dir, "documents"))
      .withColumn("fetch_ts", (col("doc_id") * 37) % 1000)
    val counts = docs
      .groupBy(HostCuration.canonicalUrl(col("url")).as("canonical_url"))
      .agg(count(lit(1)).as("n_revisits"))
    HostCuration.keepNewestRevisit(docs, "url", "doc_id", "fetch_ts")
      .select(HostCuration.canonicalUrl(col("url")).as("canonical_url"),
        col("doc_id").as("kept_id"), col("fetch_ts").as("last_ts"))
      .join(counts, Seq("canonical_url"))
      .orderBy("kept_id")
  }

  /** Mirror: the shared URL derivation + canonicalization CTEs, the
    * argmax encoded as MAX(ts·2⁴⁰ + id) per canonical URL (ids are far
    * below 2⁴⁰ at every test SF, so the encoded max IS the
    * lexicographic (ts, id) struct max the Spark side takes). */
  val urlRevisitsSql: String = {
    val enc = 1099511627776L // 2^40
    s"""WITH $UrlDeriveCteSql,
       |k0 AS (
       |${urlPiecesSql(" (doc_id * 37) % 1000 AS fetch_ts,")}
       |  FROM u),
       |k AS (
       |  SELECT doc_id, fetch_ts, $UrlCanonSql AS cu
       |  FROM k0),
       |won AS (
       |  SELECT cu AS canonical_url,
       |    MAX(fetch_ts * $enc + doc_id) % $enc AS kept_id,
       |    MAX(fetch_ts * $enc + doc_id) // $enc AS last_ts,
       |    COUNT(*) AS n_revisits
       |  FROM k GROUP BY cu)
       |SELECT canonical_url, kept_id, last_ts, n_revisits
       |FROM won ORDER BY kept_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r16_url_revisits" -> (urlRevisits _),
    "r15_host_curation" -> (hostCuration _),
    "r14_source_rules" -> (sourceRules _),
    "r10_fd_discovery" -> (fdDiscovery _),
    "r11_ind_discovery" -> (indDiscovery _),
    "r12_cfd_discovery" -> (cfdDiscovery _),
    "r13_key_discovery" -> (keyDiscovery _),
    "r1_rule_violations" -> (ruleViolations _),
    "r2_fd_conflicts" -> (fdConflicts _),
    "r3_inclusion_violations" -> (inclusionViolations _),
    "r4_unique_violations" -> (uniqueViolations _),
    "r5_denial_constraints" -> (denialConstraints _),
    "r6_trained_bands" -> (trainedBands _),
    "r7_trained_violations" -> (trainedViolations _),
    "r8_dictionary_misses" -> (dictionaryMisses _),
    "r9_composite_key" -> (compositeKeyViolations _),
    "o1_sigma_outliers" -> (sigmaOutliers _),
    "o4_mad_outliers" -> (madOutliers _),
    "o2_low_frequency" -> (lowFrequency _),
    "o3_grouped_sigma" -> (groupedSigma _))

  def oracleSql: Map[String, String] = Map(
    "r16_url_revisits" -> urlRevisitsSql,
    "r15_host_curation" -> hostCurationSql,
    "r10_fd_discovery" -> fdDiscoverySql,
    "r11_ind_discovery" -> indDiscoverySql,
    "r12_cfd_discovery" -> cfdDiscoverySql,
    "r13_key_discovery" -> keyDiscoverySql,
    "r14_source_rules" -> sourceRulesSql,
    "r1_rule_violations" -> ruleViolationsSql,
    "r2_fd_conflicts" -> fdConflictsSql,
    "r3_inclusion_violations" -> inclusionViolationsSql,
    "r4_unique_violations" -> uniqueViolationsSql,
    "r5_denial_constraints" -> denialConstraintsSql,
    "r6_trained_bands" -> trainedBandsSql,
    "r7_trained_violations" -> trainedViolationsSql,
    "r8_dictionary_misses" -> dictionaryMissesSql,
    "r9_composite_key" -> compositeKeyViolationsSql,
    "o1_sigma_outliers" -> sigmaOutliersSql,
    "o4_mad_outliers" -> madOutliersSql,
    "o2_low_frequency" -> lowFrequencySql,
    "o3_grouped_sigma" -> groupedSigmaSql)
}
