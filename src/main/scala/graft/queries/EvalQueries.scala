package graft.queries

import graft.Tables
import graft.eval.Metrics
import graft.rules._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the evaluation module (J1/A31/A32).
  * Dirtiness is injected deterministically in-query (orderkey-modulo
  * mutations of `orders`), giving a dirty/clean golden pair from the
  * read-only testdata; the oracle replays the identical mutation.
  */
object EvalQueries {

  /** Deterministic dirty copy of orders: status→'X' on keys ≡0 (mod 97),
    * priority→NULL on keys ≡0 (mod 89). */
  private def dirtyOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    o.select(col("o_orderkey"),
      when(col("o_orderkey") % 97 === 0, "X").otherwise(col("o_orderstatus"))
        .as("o_orderstatus"),
      when(col("o_orderkey") % 89 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderpriority")).as("o_orderpriority"),
      col("o_totalprice"))
  }

  private def cleanOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")

  private val dirtySql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |  CASE WHEN o_orderkey % 89 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority,
      |  o_totalprice
      |FROM orders""".stripMargin

  // ---- e1: ground-truth cell diff (J1) ---------------------------------

  def cellDiff(spark: SparkSession, dir: String): DataFrame =
    Metrics.actualErrorCells(dirtyOrders(spark, dir), cleanOrders(spark, dir),
        "o_orderkey")
      .orderBy("row_id", "column")

  val cellDiffSql: String =
    s"""WITH dirty AS ($dirtySql),
       |d AS (
       |  SELECT o_orderkey AS row_id, 'o_orderstatus' AS "column",
       |    o_orderstatus AS dirty_value FROM dirty
       |  UNION ALL
       |  SELECT o_orderkey, 'o_orderpriority', o_orderpriority FROM dirty
       |  UNION ALL
       |  SELECT o_orderkey, 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM dirty),
       |c AS (
       |  SELECT o_orderkey AS row_id, 'o_orderstatus' AS "column",
       |    o_orderstatus AS clean_value FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, 'o_orderpriority', o_orderpriority FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders)
       |SELECT d.row_id AS row_id, d."column" AS "column",
       |  d.dirty_value, c.clean_value
       |FROM d JOIN c ON d.row_id = c.row_id AND d."column" = c."column"
       |WHERE d.dirty_value IS DISTINCT FROM c.clean_value
       |ORDER BY d.row_id, d."column"""".stripMargin

  // ---- e2: detector P/R/F1 against the golden diff (A31/A32) -----------

  private val detectorRules: Seq[RuleSpec] = Seq(
    EnumRule("o_orderstatus", Seq("F", "O", "P")),
    NotNullRule("o_orderpriority"),
    RangeRule("o_totalprice", 2000.0, 450000.0)) // imprecise: produces FPs

  def detectorScore(spark: SparkSession, dir: String): DataFrame = {
    val dirty = dirtyOrders(spark, dir)
    val predicted = Metrics.mergeErrors(
      ViolationScanner.scan(dirty, "orders", detectorRules, "o_orderkey"))
    val actual = Metrics.actualErrorCells(dirty, cleanOrders(spark, dir), "o_orderkey")
    Metrics.score(predicted, actual)
      .withColumn("precision", round(col("precision"), 6))
      .withColumn("recall", round(col("recall"), 6))
      .withColumn("f1", round(col("f1"), 6))
      .orderBy("column")
  }

  val detectorScoreSql: String =
    s"""WITH dirty AS ($dirtySql),
       |predicted AS (
       |  SELECT o_orderkey AS row_id, 'o_orderstatus' AS "column" FROM dirty
       |  WHERE o_orderstatus IS NOT NULL AND TRIM(o_orderstatus) <> ''
       |    AND o_orderstatus NOT IN ('F', 'O', 'P')
       |  UNION
       |  SELECT o_orderkey, 'o_orderpriority' FROM dirty
       |  WHERE o_orderpriority IS NULL OR TRIM(o_orderpriority) = ''
       |  UNION
       |  SELECT o_orderkey, 'o_totalprice' FROM dirty
       |  WHERE o_totalprice IS NOT NULL
       |    AND (TRY_CAST(o_totalprice AS DOUBLE) IS NULL
       |         OR o_totalprice < 2000.0 OR o_totalprice > 450000.0)),
       |actual AS (
       |  SELECT o_orderkey AS row_id, 'o_orderstatus' AS "column" FROM dirty d
       |  JOIN orders o USING (o_orderkey)
       |  WHERE d.o_orderstatus IS DISTINCT FROM o.o_orderstatus
       |  UNION
       |  SELECT o_orderkey, 'o_orderpriority' FROM dirty d
       |  JOIN orders o USING (o_orderkey)
       |  WHERE d.o_orderpriority IS DISTINCT FROM o.o_orderpriority),
       |joined AS (
       |  SELECT COALESCE(p.row_id, a.row_id) AS row_id,
       |    COALESCE(p."column", a."column") AS "column",
       |    p.row_id IS NOT NULL AS has_p, a.row_id IS NOT NULL AS has_a
       |  FROM predicted p FULL OUTER JOIN actual a
       |    ON p.row_id = a.row_id AND p."column" = a."column"),
       |per_col AS (
       |  SELECT "column",
       |    SUM(CASE WHEN has_p AND has_a THEN 1 ELSE 0 END) AS tp,
       |    SUM(CASE WHEN has_p AND NOT has_a THEN 1 ELSE 0 END) AS fp,
       |    SUM(CASE WHEN NOT has_p AND has_a THEN 1 ELSE 0 END) AS fn
       |  FROM joined GROUP BY "column"
       |  UNION ALL
       |  SELECT '__overall__',
       |    SUM(CASE WHEN has_p AND has_a THEN 1 ELSE 0 END),
       |    SUM(CASE WHEN has_p AND NOT has_a THEN 1 ELSE 0 END),
       |    SUM(CASE WHEN NOT has_p AND has_a THEN 1 ELSE 0 END)
       |  FROM joined)
       |SELECT "column", CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn,
       |  ROUND(CASE WHEN tp + fp > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END, 6) AS precision,
       |  ROUND(CASE WHEN tp + fn > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END, 6) AS recall,
       |  ROUND(CASE WHEN (CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
       |           + (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END) > 0
       |    THEN 2.0 * (CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
       |             * (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END)
       |             / ((CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
       |              + (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END))
       |    ELSE 0.0 END, 6) AS f1
       |FROM per_col ORDER BY "column"""".stripMargin

  // ---- e3: detection + correction eval (A33) ---------------------------

  /** A deterministic constant-value "repairer": X-status → 'O',
    * null priority → '1-URGENT'. Detection is perfect by construction;
    * correction is right only where the constants match the clean
    * values — so ed_* and ec_* separate measurably. */
  def repairScore(spark: SparkSession, dir: String): DataFrame = {
    val dirty = dirtyOrders(spark, dir)
    val repairs = dirty.filter(col("o_orderstatus") === "X")
      .select(col("o_orderkey").as("row_id"),
        lit("o_orderstatus").as("column"), lit("O").as("repaired_value"))
      .unionByName(dirty.filter(col("o_orderpriority").isNull)
        .select(col("o_orderkey").as("row_id"),
          lit("o_orderpriority").as("column"),
          lit("1-URGENT").as("repaired_value")))
    Metrics.repairScore(repairs, dirty, cleanOrders(spark, dir), "o_orderkey")
      .select(col("ed_tp"), col("ed_fp"), col("ed_fn"), col("ec_tp"),
        round(col("ed_precision"), 6).as("ed_precision"),
        round(col("ed_recall"), 6).as("ed_recall"),
        round(col("ec_precision"), 6).as("ec_precision"),
        round(col("ec_recall"), 6).as("ec_recall"))
  }

  val repairScoreSql: String =
    s"""WITH dirty AS ($dirtySql),
       |repairs AS (
       |  SELECT o_orderkey AS row_id, 'o_orderstatus' AS "column",
       |    'O' AS repaired_value FROM dirty WHERE o_orderstatus = 'X'
       |  UNION ALL
       |  SELECT o_orderkey, 'o_orderpriority', '1-URGENT' FROM dirty
       |  WHERE o_orderpriority IS NULL),
       |actual AS (
       |  SELECT o_orderkey AS row_id, 'o_orderstatus' AS "column",
       |    o.o_orderstatus AS clean_value
       |  FROM dirty d JOIN orders o USING (o_orderkey)
       |  WHERE d.o_orderstatus IS DISTINCT FROM o.o_orderstatus
       |  UNION ALL
       |  SELECT o_orderkey, 'o_orderpriority', o.o_orderpriority
       |  FROM dirty d JOIN orders o USING (o_orderkey)
       |  WHERE d.o_orderpriority IS DISTINCT FROM o.o_orderpriority
       |  UNION ALL
       |  SELECT o_orderkey, 'o_totalprice', CAST(o.o_totalprice AS VARCHAR)
       |  FROM dirty d JOIN orders o USING (o_orderkey)
       |  WHERE d.o_totalprice IS DISTINCT FROM o.o_totalprice),
       |joined AS (
       |  SELECT r.repaired_value, a.clean_value
       |  FROM repairs r FULL OUTER JOIN actual a
       |    ON r.row_id = a.row_id AND r."column" = a."column"),
       |counts AS (
       |  SELECT
       |    SUM(CASE WHEN repaired_value IS NOT NULL AND clean_value IS NOT NULL
       |      THEN 1 ELSE 0 END) AS ed_tp,
       |    SUM(CASE WHEN repaired_value IS NOT NULL AND clean_value IS NULL
       |      THEN 1 ELSE 0 END) AS ed_fp,
       |    SUM(CASE WHEN repaired_value IS NULL AND clean_value IS NOT NULL
       |      THEN 1 ELSE 0 END) AS ed_fn,
       |    SUM(CASE WHEN repaired_value = clean_value THEN 1 ELSE 0 END) AS ec_tp
       |  FROM joined)
       |SELECT CAST(ed_tp AS BIGINT) AS ed_tp, CAST(ed_fp AS BIGINT) AS ed_fp,
       |  CAST(ed_fn AS BIGINT) AS ed_fn, CAST(ec_tp AS BIGINT) AS ec_tp,
       |  ROUND(CASE WHEN ed_tp + ed_fp > 0
       |    THEN CAST(ed_tp AS DOUBLE) / (ed_tp + ed_fp) ELSE 0.0 END, 6) AS ed_precision,
       |  ROUND(CASE WHEN ed_tp + ed_fn > 0
       |    THEN CAST(ed_tp AS DOUBLE) / (ed_tp + ed_fn) ELSE 0.0 END, 6) AS ed_recall,
       |  ROUND(CASE WHEN ed_tp + ed_fp > 0
       |    THEN CAST(ec_tp AS DOUBLE) / (ed_tp + ed_fp) ELSE 0.0 END, 6) AS ec_precision,
       |  ROUND(CASE WHEN ed_tp + ed_fn > 0
       |    THEN CAST(ec_tp AS DOUBLE) / (ed_tp + ed_fn) ELSE 0.0 END, 6) AS ec_recall
       |FROM counts""".stripMargin

  // ---- e4: per-rule detection attribution ------------------------------

  /** The e2 construction scored per RULE instead of per column: the
    * enum and not-null detectors must attribute their planted errors
    * exactly; the deliberately imprecise range rule must surface its
    * false positives with zero coverage of the real errors. */
  def ruleAttribution(spark: SparkSession, dir: String): DataFrame = {
    val dirty = dirtyOrders(spark, dir)
    val violations = ViolationScanner.scan(dirty, "orders", detectorRules,
      "o_orderkey")
    val actual = Metrics.actualErrorCells(dirty, cleanOrders(spark, dir),
      "o_orderkey")
    Metrics.scoreByRule(violations, actual)
      .withColumn("precision", round(col("precision"), 6))
      .withColumn("error_coverage", round(col("error_coverage"), 6))
      .orderBy("rule")
  }

  val ruleAttributionSql: String =
    s"""WITH dirty AS ($dirtySql),
       |predicted AS (
       |  SELECT 'enum(o_orderstatus)' AS rule, o_orderkey AS row_id,
       |    'o_orderstatus' AS "column" FROM dirty
       |  WHERE o_orderstatus IS NOT NULL AND TRIM(o_orderstatus) <> ''
       |    AND o_orderstatus NOT IN ('F', 'O', 'P')
       |  UNION
       |  SELECT 'not_null(o_orderpriority)', o_orderkey, 'o_orderpriority' FROM dirty
       |  WHERE o_orderpriority IS NULL OR TRIM(o_orderpriority) = ''
       |  UNION
       |  SELECT 'range(o_totalprice)', o_orderkey, 'o_totalprice' FROM dirty
       |  WHERE o_totalprice IS NOT NULL
       |    AND (TRY_CAST(o_totalprice AS DOUBLE) IS NULL
       |         OR o_totalprice < 2000.0 OR o_totalprice > 450000.0)),
       |actual AS (
       |  SELECT o_orderkey AS row_id, 'o_orderstatus' AS "column" FROM dirty d
       |  JOIN orders o USING (o_orderkey)
       |  WHERE d.o_orderstatus IS DISTINCT FROM o.o_orderstatus
       |  UNION
       |  SELECT o_orderkey, 'o_orderpriority' FROM dirty d
       |  JOIN orders o USING (o_orderkey)
       |  WHERE d.o_orderpriority IS DISTINCT FROM o.o_orderpriority),
       |tot AS (SELECT COUNT(*) AS n_actual FROM actual),
       |per_rule AS (
       |  SELECT p.rule, COUNT(*) AS n_flagged,
       |    SUM(CASE WHEN a.row_id IS NOT NULL THEN 1 ELSE 0 END) AS tp
       |  FROM predicted p LEFT JOIN actual a
       |    ON p.row_id = a.row_id AND p."column" = a."column"
       |  GROUP BY p.rule)
       |SELECT rule, CAST(n_flagged AS BIGINT) AS n_flagged,
       |  CAST(tp AS BIGINT) AS tp,
       |  CAST(n_flagged - tp AS BIGINT) AS fp,
       |  ROUND(CASE WHEN n_flagged > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(n_flagged AS DOUBLE) ELSE 0.0 END, 6)
       |    AS precision,
       |  ROUND(CASE WHEN n_actual > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(n_actual AS DOUBLE) ELSE 0.0 END, 6)
       |    AS error_coverage
       |FROM per_rule, tot ORDER BY rule""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_cell_diff" -> (cellDiff _),
    "e2_detector_score" -> (detectorScore _),
    "e3_repair_score" -> (repairScore _),
    "e4_rule_attribution" -> (ruleAttribution _))

  def oracleSql: Map[String, String] = Map(
    "e1_cell_diff" -> cellDiffSql,
    "e2_detector_score" -> detectorScoreSql,
    "e3_repair_score" -> repairScoreSql,
    "e4_rule_attribution" -> ruleAttributionSql)
}
