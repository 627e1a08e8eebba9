package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Cell-level evaluation against dirty/clean golden pairs
  * (reference: dataset.py:56-62, utils/metrics.py:74-319).
  *
  * Cell identity is (row_id, column) where row_id comes from a key
  * column or [[graft.ingest.Ingest.withRowId]]. The ground-truth diff
  * and the P/R/F1 join are both shuffle-on-cell-key equi joins — the
  * natural Spark shape for A31; nothing collects to the driver.
  */
object Metrics {

  /** Unpivot to cell grain: (row_id, column, value). */
  def cells(df: DataFrame, keyCol: String, cols: Seq[String]): DataFrame = {
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col(s"`$c`").cast(StringType).as("value"))
    }
    df.select(col(s"`$keyCol`").cast("long").as("row_id"),
        explode(array(entries: _*)).as("cv"))
      .select(col("row_id"), col("cv.column").as("column"), col("cv.value").as("value"))
  }

  /** Ground-truth error cells: positions where dirty differs from clean
    * (J1 — positional alignment via the shared key). Null-safe compare:
    * null vs value counts as a difference; null vs null does not.
    * A row absent from one side surfaces every non-null cell of the
    * other side as a diff (full-outer row semantics).
    *
    * Scale shape: ONE row-grain join, then explode only the differing
    * cells — exploding both sides to cell grain first (the naive
    * unpivot-join) multiplies the shuffled volume by #columns while
    * the join output is just as sparse. Columns are aliased
    * positionally (__d_i/__c_i) so table columns cannot collide with
    * the working names. */
  def actualErrorCells(dirty: DataFrame, clean: DataFrame, keyCol: String): DataFrame = {
    val cols = dirty.columns.filter(_ != keyCol).toSeq
    def side(df: DataFrame, p: String): DataFrame =
      df.select(col(s"`$keyCol`").cast("long").as(s"__rid_$p") +:
        cols.zipWithIndex.map { case (c, i) =>
          col(s"`$c`").cast(StringType).as(s"__${p}_$i")
        }: _*)
    val d = side(dirty, "d")
    val c = side(clean, "c")
    val diffs = cols.zipWithIndex.map { case (cn, i) =>
      when(!(col(s"__d_$i") <=> col(s"__c_$i")),
        struct(lit(cn).as("column"), col(s"__d_$i").as("dirty_value"),
          col(s"__c_$i").as("clean_value")))
    }
    // array_compact drops the non-diff nulls BEFORE the explode, so a
    // clean row (the common case) generates zero rows instead of #cols
    // null entries that a filter then discards
    d.join(c, col("__rid_d") <=> col("__rid_c"), "full_outer")
      .select(coalesce(col("__rid_d"), col("__rid_c")).as("row_id"),
        explode(array_compact(array(diffs: _*))).as("e"))
      .select(col("row_id"), col("e.column"), col("e.dirty_value"),
        col("e.clean_value"))
  }

  /** Merge predicted violations to distinct cell grain (A32 — the
    * reference unions error indices per column: utils/metrics.py:11-19). */
  def mergeErrors(violations: DataFrame): DataFrame =
    violations.select("row_id", "column").distinct()

  /** Detection + correction evaluation (A33; reference:
    * dataset.py:86-110): error-detection P/R/F1 plus error-correction
    * scores where a repair counts as TP only when the repaired value
    * EQUALS the clean value. `repairs` carries (row_id, column,
    * repaired_value); `dirty`/`clean` are the golden pair. */
  def repairScore(repairs: DataFrame, dirty: DataFrame, clean: DataFrame,
      keyCol: String): DataFrame = {
    val actual = actualErrorCells(dirty, clean, keyCol)
    val joined = repairs
      .select(col("row_id"), col("column"),
        col("repaired_value").cast(StringType))
      .join(actual.select("row_id", "column", "clean_value"),
        Seq("row_id", "column"), "full_outer")
    joined.agg(
      sum(when(col("repaired_value").isNotNull && col("clean_value").isNotNull, 1)
        .otherwise(0)).as("ed_tp"),
      sum(when(col("repaired_value").isNotNull && col("clean_value").isNull, 1)
        .otherwise(0)).as("ed_fp"),
      sum(when(col("repaired_value").isNull && col("clean_value").isNotNull, 1)
        .otherwise(0)).as("ed_fn"),
      sum(when(col("repaired_value") === col("clean_value"), 1).otherwise(0))
        .as("ec_tp"))
      .withColumn("ed_precision", when(col("ed_tp") + col("ed_fp") > 0,
        col("ed_tp").cast(DoubleType) / (col("ed_tp") + col("ed_fp"))).otherwise(0.0))
      .withColumn("ed_recall", when(col("ed_tp") + col("ed_fn") > 0,
        col("ed_tp").cast(DoubleType) / (col("ed_tp") + col("ed_fn"))).otherwise(0.0))
      .withColumn("ec_precision", when(col("ed_tp") + col("ed_fp") > 0,
        col("ec_tp").cast(DoubleType) / (col("ed_tp") + col("ed_fp"))).otherwise(0.0))
      .withColumn("ec_recall", when(col("ed_tp") + col("ed_fn") > 0,
        col("ec_tp").cast(DoubleType) / (col("ed_tp") + col("ed_fn"))).otherwise(0.0))
  }

  /** Cell-level precision/recall/F1, overall row plus one row per
    * column (A31; reference: utils/metrics.py:112-319). `predicted`
    * and `actual` both at (row_id, column) grain. */
  def score(predicted: DataFrame, actual: DataFrame): DataFrame = {
    val p = predicted.select("row_id", "column").distinct()
      .withColumn("p", lit(1))
    val a = actual.select("row_id", "column").distinct()
      .withColumn("a", lit(1))
    val joined = p.join(a, Seq("row_id", "column"), "full_outer")
    val perColumn = joined.groupBy("column").agg(
      sum(when(col("p").isNotNull && col("a").isNotNull, 1).otherwise(0)).as("tp"),
      sum(when(col("p").isNotNull && col("a").isNull, 1).otherwise(0)).as("fp"),
      sum(when(col("p").isNull && col("a").isNotNull, 1).otherwise(0)).as("fn"))
    val overall = perColumn.agg(sum("tp").as("tp"), sum("fp").as("fp"),
        sum("fn").as("fn"))
      .withColumn("column", lit("__overall__"))
      .select("column", "tp", "fp", "fn")
    val prf = (df: DataFrame) => df
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        col("tp").cast(DoubleType) / (col("tp") + col("fp")).cast(DoubleType))
        .otherwise(0.0))
      .withColumn("recall", when(col("tp") + col("fn") > 0,
        col("tp").cast(DoubleType) / (col("tp") + col("fn")).cast(DoubleType))
        .otherwise(0.0))
      .withColumn("f1", when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
        .otherwise(0.0))
    prf(perColumn.select("column", "tp", "fp", "fn").unionByName(overall))
  }

  /** Per-RULE detection attribution — the detector-tuning view of
    * [[score]]: which rule catches which share of the actual errors,
    * and how noisy each rule is. `violations` at (rule, row_id, column)
    * grain (the scanner's layout); `actual` at (row_id, column).
    *
    * Output per rule: `n_flagged` (distinct flagged cells), `tp`
    * (flagged cells that are real errors), `fp`, `precision`, and
    * `error_coverage` = tp / |actual errors| (a rule's recall share —
    * undetected errors attribute to NO rule, so per-rule fn is
    * undefined by construction).
    *
    * Scale shape: one distinct, one cell-keyed left join against the
    * (smaller) truth set, one partially-aggregated groupBy(rule), and
    * a broadcast one-row total. */
  def scoreByRule(violations: DataFrame, actual: DataFrame): DataFrame = {
    val p = violations.select("rule", "row_id", "column").distinct()
    val a = actual.select("row_id", "column").distinct().withColumn("__a", lit(1))
    val total = a.agg(count(lit(1)).as("__n_actual"))
    p.join(a, Seq("row_id", "column"), "left")
      .groupBy("rule")
      .agg(count(lit(1)).as("n_flagged"),
        sum(when(col("__a").isNotNull, 1L).otherwise(0L)).as("tp"))
      .withColumn("fp", col("n_flagged") - col("tp"))
      .crossJoin(broadcast(total))
      .withColumn("precision", when(col("n_flagged") > 0,
        col("tp").cast(DoubleType) / col("n_flagged").cast(DoubleType))
        .otherwise(0.0))
      .withColumn("error_coverage", when(col("__n_actual") > 0,
        col("tp").cast(DoubleType) / col("__n_actual").cast(DoubleType))
        .otherwise(0.0))
      .drop("__n_actual")
  }
}
