package graft.queries

import graft.Tables
import graft.outlier.DBoost
import graft.profile.Profiler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the dBoost-parity statistics
  * (expansions, histogram model, correlations, chi-squared). */
object StatQueries {

  // ---- x1: tuple expansions (F8/F9/F10) --------------------------------

  def expansions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir).filter(col("event_id") < 200)
    val dateCols = DBoost.dateExpansions(col("ts")).map { case (n, c) => c.as(n) }
    val numCols = DBoost.numericExpansions(col("value")).collect {
      case (n @ ("mod10" | "is_negative"), c) => c.as(n)
    }
    val strCols = DBoost.stringExpansions(col("event_type")).collect {
      case (n @ ("length" | "is_upper" | "is_lower" | "is_digit"), c) => c.as(n)
    }
    ev.select(col("event_id") +: (dateCols ++ numCols ++ strCols): _*)
      .orderBy("event_id")
  }

  val expansionsSql: String =
    """SELECT event_id,
      |  year(ts)::INT AS year, month(ts)::INT AS month, day(ts)::INT AS day,
      |  hour(ts)::INT AS hour, minute(ts)::INT AS minute,
      |  CAST(date_part('second', ts) AS INT) AS second,
      |  (dayofweek(ts) + 1)::INT AS dayofweek,
      |  dayofyear(ts)::INT AS dayofyear,
      |  CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend,
      |  ((CAST(floor(value) AS BIGINT) % 10) + 10) % 10 AS mod10,
      |  CASE WHEN value < 0 THEN 1 ELSE 0 END AS is_negative,
      |  LENGTH(event_type)::INT AS length,
      |  CASE WHEN UPPER(event_type) = event_type THEN 1 ELSE 0 END AS is_upper,
      |  CASE WHEN LOWER(event_type) = event_type THEN 1 ELSE 0 END AS is_lower,
      |  CASE WHEN regexp_matches(event_type, '^\d+$') THEN 1 ELSE 0 END AS is_digit
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin

  // ---- x2: histogram model fit (A27) -----------------------------------

  def histogramFit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderstatus", "o_orderpriority")
    DBoost.histogramFit(Profiler.longValues(o), maxClasses = 16, peakMass = 0.4)
      .withColumn("top_mass", round(col("top_mass"), 6))
      .orderBy("column")
  }

  val histogramFitSql: String = {
    def part(c: String) =
      s"""SELECT '$c' AS "column", COUNT(*) AS n_classes,
         |  ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_mass,
         |  CAST(SUM(cnt) AS BIGINT) AS n_values,
         |  CASE WHEN COUNT(*) <= 16
         |    AND CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) >= 0.4
         |    THEN 1 ELSE 0 END AS peaked
         |FROM (SELECT $c, COUNT(*) AS cnt FROM orders
         |      WHERE $c IS NOT NULL AND TRIM(CAST($c AS VARCHAR)) <> '' GROUP BY $c)""".stripMargin
    s"""SELECT * FROM (
       |${part("o_orderstatus")}
       |UNION ALL
       |${part("o_orderpriority")}
       |) ORDER BY "column"""".stripMargin
  }

  // ---- x3: Pearson correlation pairs (A24) -----------------------------

  private val liNum = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** The lineitem measures are money-style fixed-point (≤ 2 decimals),
    * so the gate runs the exact Long-sum kernel (~20× the Decimal(38,10)
    * form); the oracle mirrors the identical integer arithmetic. */
  def correlations(spark: SparkSession, dir: String): DataFrame =
    DBoost.correlationPairsFixedPoint(Tables.load(spark, dir, "lineitem"), liNum)
      .withColumn("r", round(col("r"), 6))
      .orderBy("col_a", "col_b")

  val correlationsSql: String = {
    // mirrors correlationPairsFixedPoint through the shared
    // FixedPoint twins: plain values at scale 2, products at the
    // doubled scale with the wider hi/lo split
    import graft.ops.FixedPoint.fsumSql
    val sums = liNum.map(c => s"${fsumSql(c, 2)} AS s_$c") ++
      liNum.map(c => s"${fsumSql(s"$c * $c", 4, base = 1000000000L)} AS ss_$c") ++
      liNum.combinations(2).toSeq.map { p =>
        s"${fsumSql(s"${p(0)} * ${p(1)}", 4, base = 1000000000L)} AS sp_${p(0)}_${p(1)}"
      } :+ "CAST(COUNT(*) AS DOUBLE) AS n"
    val pairs = liNum.combinations(2).toSeq.map { p =>
      val (a, b) = (p(0), p(1))
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  ROUND((n * sp_${a}_$b - s_$a * s_$b) /
         |    (sqrt(n * ss_$a - s_$a * s_$a) * sqrt(n * ss_$b - s_$b * s_$b)), 6) AS r
         |FROM stats""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH stats AS (SELECT ${sums.mkString(", ")} FROM lineitem)
       |SELECT * FROM (
       |$pairs
       |) ORDER BY col_a, col_b""".stripMargin
  }

  // ---- x4: chi-squared dependence (A25) --------------------------------

  def chiSquared(spark: SparkSession, dir: String): DataFrame =
    DBoost.chiSquared(Tables.load(spark, dir, "orders"),
        "o_orderstatus", "o_orderpriority")
      .withColumn("chi2", round(col("chi2"), 6))
      .select("chi2", "n_cells", "card_a", "card_b", "dof")

  val chiSquaredSql: String =
    """WITH obs AS (
      |  SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS cnt
      |  FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
      |  GROUP BY 1, 2),
      |tot AS (SELECT SUM(cnt) AS n FROM obs),
      |ra AS (SELECT a, SUM(cnt) AS ra FROM obs GROUP BY a),
      |cb AS (SELECT b, SUM(cnt) AS cb FROM obs GROUP BY b),
      |cells AS (
      |  SELECT obs.cnt,
      |    CAST(ra.ra AS DOUBLE) * CAST(cb.cb AS DOUBLE) / CAST(tot.n AS DOUBLE) AS e
      |  FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot)
      |SELECT
      |  ROUND(CAST(SUM(CAST((CAST(cnt AS DOUBLE) - e) * (CAST(cnt AS DOUBLE) - e) / e
      |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS chi2,
      |  COUNT(*) AS n_cells,
      |  (SELECT COUNT(*) FROM ra) AS card_a,
      |  (SELECT COUNT(*) FROM cb) AS card_b,
      |  ((SELECT COUNT(*) FROM ra) - 1) * ((SELECT COUNT(*) FROM cb) - 1) AS dof
      |FROM cells""".stripMargin

  // ---- x5: contingency table (A26) -------------------------------------

  def cooccurrence(spark: SparkSession, dir: String): DataFrame =
    DBoost.contingency(Tables.load(spark, dir, "orders"),
        "o_orderstatus", "o_orderpriority")
      .orderBy("a", "b")

  val cooccurrenceSql: String =
    """SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS cnt
      |FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
      |GROUP BY 1, 2 ORDER BY a, b""".stripMargin

  // ---- x6: Benford first-digit distribution (A11) ----------------------

  def benford(spark: SparkSession, dir: String): DataFrame =
    graft.profile.Benford.distribution(
        Tables.load(spark, dir, "lineitem"), "l_extendedprice")
      .select(col("digit"), col("cnt"), round(col("share"), 6).as("share"),
        round(col("expected"), 6).as("expected"))
      .orderBy("digit")

  val benfordSql: String = {
    val expectedCase = (1 to 9).map(d =>
      s"WHEN $d THEN ${graft.profile.Benford.expected(d)}").mkString(" ")
    s"""SELECT digit, cnt,
       |  ROUND(CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE), 6) AS share,
       |  ROUND(CASE digit $expectedCase END, 6) AS expected
       |FROM (
       |  SELECT CAST(regexp_extract(CAST(l_extendedprice AS VARCHAR), '[1-9]') AS INT) AS digit,
       |    COUNT(*) AS cnt
       |  FROM lineitem
       |  WHERE regexp_extract(CAST(l_extendedprice AS VARCHAR), '[1-9]') <> ''
       |  GROUP BY 1)
       |ORDER BY digit""".stripMargin
  }

  // ---- x7: one-pass stream stats (A23) ---------------------------------

  private val statCols = Seq("value", "user_id")

  def streamStats(spark: SparkSession, dir: String): DataFrame =
    DBoost.streamStats(Tables.load(spark, dir, "events"), statCols, exact = true)
      .select(col("column"), col("cnt"), round(col("mean"), 6).as("mean"),
        round(col("std"), 6).as("std"), col("min"), col("max"),
        col("distinct_capped"))
      .orderBy("column")

  val streamStatsSql: String = statCols.map { c =>
    s"""SELECT '$c' AS "column", COUNT($c) AS cnt,
       |  ROUND(CAST(SUM(CAST($c AS DECIMAL(30,6))) AS DOUBLE) / COUNT($c), 6) AS mean,
       |  ROUND(sqrt(CAST(SUM(CAST(CAST($c AS DOUBLE) * CAST($c AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) / COUNT($c)
       |    - (CAST(SUM(CAST($c AS DECIMAL(30,6))) AS DOUBLE) / COUNT($c))
       |      * (CAST(SUM(CAST($c AS DECIMAL(30,6))) AS DOUBLE) / COUNT($c))), 6) AS std,
       |  MIN(CAST($c AS DOUBLE)) AS min, MAX(CAST($c AS DOUBLE)) AS max,
       |  LEAST(COUNT(DISTINCT $c), 25) AS distinct_capped
       |FROM events""".stripMargin
  }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")

  // ---- x8: GMM outliers (A29; seeded MLlib fit — rows-only check) ------

  def gmmOutliers(spark: SparkSession, dir: String): DataFrame =
    DBoost.gmmOutliers(Tables.load(spark, dir, "events"), "value", "event_id",
        k = 2, cutoff = 1e-5)
      .select("row_id", "value")
      .orderBy("row_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_expansions" -> (expansions _),
    "x2_histogram_fit" -> (histogramFit _),
    "x3_correlations" -> (correlations _),
    "x4_chi_squared" -> (chiSquared _),
    "x5_cooccurrence" -> (cooccurrence _),
    "x6_benford" -> (benford _),
    "x7_stream_stats" -> (streamStats _),
    "x8_gmm_outliers" -> (gmmOutliers _))

  /** x8 is a seeded iterative MLlib fit — no SQL equivalent; the driver
    * records a rows-only check for it. */
  def oracleSql: Map[String, String] = Map(
    "x1_expansions" -> expansionsSql,
    "x2_histogram_fit" -> histogramFitSql,
    "x3_correlations" -> correlationsSql,
    "x4_chi_squared" -> chiSquaredSql,
    "x5_cooccurrence" -> cooccurrenceSql,
    "x6_benford" -> benfordSql,
    "x7_stream_stats" -> streamStatsSql)
}
