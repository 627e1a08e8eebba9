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
}
