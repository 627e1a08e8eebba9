package graft.rules

/** Sealed rule ADT (SURVEY.md §2.10) — data-only so specs round-trip
  * through JSON/Parquet (reference scrubs callables at
  * utils/rule_utils.py:16-39; we avoid closures entirely).
  *
  * Scalar rules compile to a per-row Catalyst predicate; relational
  * rules (unique, FD, inclusion) compile to join/window plans in
  * [[ViolationScanner]]. Severity mirrors method_2's rule engine
  * (reference: method_2/pipleline_2.py:209-264).
  */
sealed trait RuleSpec {
  def name: String
  def column: String
  def severity: String
}

/** P1 — value must be present (reference: rules/dictionary_rule.py:314-315). */
final case class NotNullRule(column: String,
    severity: String = "error") extends RuleSpec {
  val name = s"not_null($column)"
}

/** P2 — value must fully match a regex (reference:
  * rules/dictionary_rule.py:317-321, rules/evaluation.py:585-601). */
final case class RegexRule(column: String, pattern: String,
    severity: String = "error") extends RuleSpec {
  val name = s"regex($column)"
}

/** P4 — numeric range (reference: method_2/pipleline_2.py:233-239). */
final case class RangeRule(column: String, lo: Double, hi: Double,
    severity: String = "warning") extends RuleSpec {
  val name = s"range($column)"
}

/** P5 — enumeration / domain membership (reference:
  * method_2/pipleline_2.py:241-243). */
final case class EnumRule(column: String, allowed: Seq[String],
    severity: String = "error") extends RuleSpec {
  val name = s"enum($column)"
}

/** P6 — value parses as a date in the given format (reference:
  * method_2/pipleline_2.py:245-253). */
final case class DateFormatRule(column: String, format: String,
    severity: String = "error") extends RuleSpec {
  val name = s"date_format($column)"
}

/** P7 — at most `maxDecimals` decimal places after stripping trailing
  * zeros (reference: rules/evaluation.py:192-200, 603-618). */
final case class DecimalPrecisionRule(column: String, maxDecimals: Int,
    severity: String = "warning") extends RuleSpec {
  val name = s"decimal_precision($column)"
}

/** String length within [minLen, maxLen] (reference `length_within`,
  * rules/dictionary_rule.py). */
final case class LengthRule(column: String, minLen: Int, maxLen: Int,
    severity: String = "warning") extends RuleSpec {
  val name = s"length($column)"
}

/** P10 — column must hold a single constant value (reference:
  * rules/dictionary_rule.py:310-312, 329-333). */
final case class SingleValueRule(column: String, expected: String,
    severity: String = "warning") extends RuleSpec {
  val name = s"single_value($column)"
}

/** is_unique — no value may occur twice (reference:
  * rules/dictionary_rule.py `is_unique`). Relational: window count. */
final case class UniqueRule(column: String,
    severity: String = "error") extends RuleSpec {
  val name = s"unique($column)"
}

/** is_composite_key — the VALUE TUPLE of `columns` must be unique
  * (reference rules.yaml:22 `is_composite_key`). Relational: window
  * count partitioned by the multi-column key (generalizes
  * [[UniqueRule]]'s single-column window). */
final case class CompositeUniqueRule(columns: Seq[String],
    severity: String = "error") extends RuleSpec {
  val name = s"composite_unique(${columns.mkString(",")})"
  val column = columns.mkString(",")
}

/** Cross-field comparison, e.g. "start_date <= end_date"
  * (reference rules.yaml:24-27 `field_comparison`/`cross_field_sum` —
  * declared but unimplemented in the reference; implemented here).
  * `predicate` is a SQL boolean expression over the row; a row
  * violates when the predicate is FALSE. */
final case class CrossFieldRule(ruleName: String, predicate: String,
    severity: String = "error") extends RuleSpec {
  val name = s"cross_field($ruleName)"
  val column = ruleName
}

/** Functional dependency lhs -> rhs (reference:
  * profile_similarity.py:55-61 support/conflict). Relational. */
final case class FunctionalDependencyRule(lhs: String, rhs: String,
    severity: String = "warning") extends RuleSpec {
  val name = s"fd($lhs->$rhs)"
  val column = rhs
}

/** Inclusion dependency: every value of `column` must appear in
  * `parentColumn` of the parent table (reference rules.yaml:29-30;
  * J5). Relational: left_anti join. */
final case class InclusionRule(column: String, parentTable: String,
    parentColumn: String, severity: String = "error") extends RuleSpec {
  val name = s"inclusion($column⊆$parentTable.$parentColumn)"
}
