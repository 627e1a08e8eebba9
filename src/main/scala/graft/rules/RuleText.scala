package graft.rules

import org.apache.spark.sql.{DataFrame, Row}

/** Human-readable rule suggestions (reference:
  * generate_rules_from_profile.py:15-48) — the NL surface of the rule
  * engine. Two layers:
  *
  *  - [[suggest]] mirrors the reference's profile-driven suggestions
  *    (type sentence, name-based pattern hints, null-rate note) over
  *    the [[graft.profile.Profiler]] profile frame;
  *  - [[describe]] renders any [[RuleSpec]] the generator produced as
  *    one plain sentence, so generated + declared rules share the same
  *    text surface.
  *
  * Driver-side by design: input is the O(#columns) profile frame.
  */
object RuleText {

  final case class ColumnSuggestion(column: String, inferredType: String,
      rules: Seq[String])

  /** NL sentence for one ADT rule. */
  def describe(rule: RuleSpec): String = rule match {
    case NotNullRule(c, _) => s"$c should not contain null or blank values."
    case RegexRule(c, p, _) => s"$c should match the pattern $p."
    case RangeRule(c, lo, hi, _) => f"$c should lie between $lo%.4g and $hi%.4g."
    case EnumRule(c, allowed, _) =>
      s"$c should be one of: ${allowed.mkString(", ")}."
    case DateFormatRule(c, f, _) => s"$c should be a date in the format $f."
    case DecimalPrecisionRule(c, k, _) =>
      s"$c should have at most $k decimal place${if (k == 1) "" else "s"}."
    case LengthRule(c, lo, hi, _) =>
      if (lo == hi) s"$c should be exactly $lo character${if (lo == 1) "" else "s"} long."
      else s"$c should be between $lo and $hi characters long."
    case SingleValueRule(c, v, _) => s"$c should always equal '$v'."
    case UniqueRule(c, _) => s"$c should be a unique identifier with no duplicates."
    case CompositeUniqueRule(cols, _) =>
      s"The combination of ${cols.mkString(", ")} should be unique."
    case CrossFieldRule(n, pred, _) => s"Each row should satisfy $pred ($n)."
    case FunctionalDependencyRule(lhs, rhs, _) =>
      s"$rhs should be functionally determined by $lhs."
    case InclusionRule(c, pt, pc, _) =>
      s"Every value of $c should appear in $pt.$pc."
  }

  /** Type-based sentence (reference: generate_rules_from_profile.py:20-27;
    * the profiler's type vocabulary adds categorical). */
  private def typeSentence(c: String, t: String): Option[String] = t match {
    case "integer" => Some(s"$c should contain only integers.")
    case "float" => Some(s"$c should contain only float or numeric values.")
    case "date" => Some(s"$c should follow a standard date format (e.g., YYYY-MM-DD).")
    case "string" =>
      Some(s"$c should contain text data and not consist of only special characters.")
    case "categorical" =>
      Some(s"$c should stay within its small set of expected values.")
    case _ => None
  }

  /** Name-based pattern hints (reference: generate_rules_from_profile.py:29-36). */
  private def nameSentence(c: String): Option[String] = {
    val lower = c.toLowerCase
    if (lower.contains("email") || lower.contains("mail"))
      Some(s"$c should match a valid email format (e.g., name@example.com).")
    else if (lower.contains("phone") || lower.contains("mobile"))
      Some(s"$c should be a valid phone number (e.g., 10 or 11 digits).")
    else if (lower.contains("id"))
      Some(s"$c should be a unique identifier with no duplicates.")
    else None
  }

  /** Suggestions for one profile row: type + name + null-rate sentences,
    * then the texts of every generated rule not already covered. */
  def suggestRow(p: Row): ColumnSuggestion = {
    val c = p.getAs[String]("column")
    val t = p.getAs[String]("inferred_type")
    val nullRatio = p.getAs[Double]("null_ratio")
    val base = typeSentence(c, t).toSeq ++ nameSentence(c).toSeq ++
      (if (nullRatio > 0.1)
        Seq(f"$c has a high null rate (${nullRatio * 100}%.2f%%), " +
          "consider filling or validating missing values.")
      else Nil)
    val generated = RuleGenerator.fromProfileRow(p).map(describe)
    ColumnSuggestion(c, t, (base ++ generated).distinct)
  }

  /** Suggestions for every profiled column, in profile order. */
  def suggest(profiles: DataFrame): Seq[ColumnSuggestion] =
    profiles.collect().toSeq.map(suggestRow)

  /** One flat report text, for sinks/logs. */
  def report(profiles: DataFrame): String =
    suggest(profiles).map { s =>
      s"## ${s.column} (${s.inferredType})\n" + s.rules.map("- " + _).mkString("\n")
    }.mkString("\n\n")
}
