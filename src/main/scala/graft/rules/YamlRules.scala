package graft.rules

import scala.jdk.CollectionConverters._

/** Loader for the reference's declared-rule YAML dialect (reference:
  * rules.yaml:1-32, loaded at rules/modular_rule_system.py:7-9).
  *
  * The dialect is a flat map `rule_name: condition template` where the
  * condition is a feature expression ("distinct == num_rows AND nulls
  * == 0") documenting the rule's semantics. The reference loads
  * "structure only" and evaluates a feature-threshold subset
  * (modular_rule_system.py TrainedRule.applies); here every entry gets
  * a first-class mapping:
  *
  *  - SCAN entries instantiate (given per-column bindings) into the
  *    existing [[RuleSpec]] ADT and run through [[ViolationScanner]];
  *  - PROFILE entries compile the condition text itself into a
  *    predicate over profiler features (the reference's applies());
  *  - MATCHING entries are cross-source semantics served by
  *    [[graft.matching.ColumnMatcher]] / the profiler, not a row scan.
  *
  * Uses the snakeyaml shipped with Spark; no extra deps.
  */
object YamlRules {

  /** One parsed YAML entry: rule name and its condition template. */
  final case class YamlRuleDef(name: String, condition: String)

  /** How an entry plugs into the engine. */
  sealed trait RuleKind
  /** Instantiates to [[RuleSpec]]s; scanned row-by-row. */
  case object ScanKind extends RuleKind
  /** Condition evaluates over a column's profile features. */
  case object ProfileKind extends RuleKind
  /** Cross-source column semantics (ColumnMatcher / profiler). */
  case object MatchingKind extends RuleKind

  /** Parse the YAML dialect, preserving entry order. */
  def load(yamlText: String): Seq[YamlRuleDef] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Any]](yamlText)
    if (root == null) Seq.empty
    else root.asScala.toSeq.map { case (k, v) => YamlRuleDef(k, String.valueOf(v)) }
  }

  def loadFile(path: String): Seq[YamlRuleDef] =
    load(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** Classification of every rule name the reference dialect declares.
    * `is_primary_key`/`is_unique`/`is_constant` are both profile
    * classifiers AND scannable constraints; they appear as ScanKind
    * because that is the stronger (row-addressable) surface. */
  def kindOf(name: String): RuleKind = name match {
    case "is_primary_key" | "is_unique" | "is_constant" | "value_in_range" |
         "matches_regex" | "length_within" | "decimal_precision" | "domain_is" |
         "is_composite_key" | "conditional_dependency" | "field_comparison" |
         "cross_field_sum" | "inclusion_dependency" | "foreign_key" => ScanKind
    case "is_nullable" | "has_low_cardinality" | "quartile_thresholds" |
         "semantic_class_is" | "benford_conformity" => ProfileKind
    case "topical_equivalence" | "schematic_alignment" => MatchingKind
    case other => throw new IllegalArgumentException(s"unknown rule name: $other")
  }

  private def str(params: Map[String, Any], k: String): String =
    params.get(k) match {
      case Some(s: String) => s
      case other => throw new IllegalArgumentException(
        s"binding '$k' must be a string, got: $other")
    }
  private def num(params: Map[String, Any], k: String): Double =
    params.get(k) match {
      case Some(n: Number) => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"binding '$k' must be numeric, got: $other")
    }
  private def strList(params: Map[String, Any], k: String): Seq[String] =
    params.get(k) match {
      case Some(xs: Seq[_]) => xs.map(String.valueOf)
      case other => throw new IllegalArgumentException(
        s"binding '$k' must be a string list, got: $other")
    }

  /** Instantiate a SCAN-kind entry into ADT rules. Binding keys follow
    * the condition template's parameter names (domain_min,
    * expected_pattern, approved_list, ...). */
  def toScanRules(name: String, params: Map[String, Any]): Seq[RuleSpec] = name match {
    case "is_primary_key" =>
      // distinct == num_rows AND nulls == 0 → present everywhere + unique
      val c = str(params, "column")
      Seq(NotNullRule(c), UniqueRule(c))
    case "is_unique" => Seq(UniqueRule(str(params, "column")))
    case "is_constant" =>
      Seq(SingleValueRule(str(params, "column"), str(params, "expected")))
    case "value_in_range" =>
      Seq(RangeRule(str(params, "column"),
        num(params, "domain_min"), num(params, "domain_max")))
    case "matches_regex" =>
      Seq(RegexRule(str(params, "column"), str(params, "expected_pattern")))
    case "length_within" =>
      Seq(LengthRule(str(params, "column"),
        num(params, "min_length").toInt, num(params, "max_length").toInt))
    case "decimal_precision" =>
      Seq(DecimalPrecisionRule(str(params, "column"), num(params, "max_decimals").toInt))
    case "domain_is" =>
      Seq(EnumRule(str(params, "column"), strList(params, "approved_list")))
    case "is_composite_key" =>
      Seq(CompositeUniqueRule(strList(params, "columns")))
    case "conditional_dependency" =>
      // IF cond THEN consequent ≡ NOT(cond) OR consequent
      Seq(CrossFieldRule(name,
        s"NOT (${str(params, "if")}) OR (${str(params, "then")})"))
    case "field_comparison" | "cross_field_sum" =>
      Seq(CrossFieldRule(name, str(params, "predicate")))
    case "inclusion_dependency" | "foreign_key" =>
      // foreign_key additionally requires the parent side unique — that
      // is the parent table's own is_primary_key declaration
      Seq(InclusionRule(str(params, "column"),
        str(params, "parent_table"), str(params, "parent_column")))
    case other => throw new IllegalArgumentException(
      s"$other is not a scan-kind rule (kind: ${kindOf(other)})")
  }

  /** End-to-end: scan `df` with every scan-kind entry of a parsed YAML
    * rule file (the reference's main_with_yaml.py flow — load rules,
    * bind to columns, evaluate). `bindings` maps rule name → parameter
    * map; entries without bindings are skipped (declared but unbound,
    * as in the reference's structure-only load). Profile/matching-kind
    * entries never scan rows — route them through [[profilePredicate]]
    * / the column matcher. */
  def scanWith(df: org.apache.spark.sql.DataFrame, table: String,
      entries: Seq[YamlRuleDef], bindings: Map[String, Map[String, Any]],
      keyCol: String,
      parents: Map[String, org.apache.spark.sql.DataFrame] = Map.empty)
      : org.apache.spark.sql.DataFrame = {
    val rules = entries
      .filter(e => kindOf(e.name) == ScanKind)
      .flatMap(e => bindings.get(e.name).toSeq.flatMap(b => toScanRules(e.name, b)))
    ViolationScanner.scan(df, table, rules, keyCol, parents)
  }

  // --- profile-feature condition evaluator ------------------------------
  // Grammar of the profile-kind conditions in the dialect:
  //   cond   := clause (AND clause)*
  //   clause := expr (== | >= | <= | > | <) expr
  //   expr   := atom (('+' | '/') atom)?
  //   atom   := number | 'string' | feature_name
  // A clause referencing a missing feature is FALSE (reference:
  // modular_rule_system.py applies() returns False on missing feats).

  private sealed trait Atom
  private final case class NumAtom(v: Double) extends Atom
  private final case class StrAtom(v: String) extends Atom

  private def evalExpr(s: String, feats: Map[String, Any]): Option[Atom] = {
    val t = s.trim
    def atom(a: String): Option[Atom] = {
      val x = a.trim
      if (x.matches("[+-]?\\d+(\\.\\d+)?")) Some(NumAtom(x.toDouble))
      else if (x.startsWith("'") && x.endsWith("'") && x.length >= 2)
        Some(StrAtom(x.substring(1, x.length - 1)))
      else feats.get(x).map {
        case n: Number => NumAtom(n.doubleValue())
        case v => StrAtom(String.valueOf(v))
      }
    }
    val bin = "(.+?)\\s*([+/])\\s*(.+)".r
    t match {
      case bin(l, op, r) =>
        (atom(l), atom(r)) match {
          case (Some(NumAtom(a)), Some(NumAtom(b))) =>
            Some(NumAtom(if (op == "+") a + b else a / b))
          case _ => None
        }
      case _ => atom(t)
    }
  }

  /** The dialect's feature names for one profiler row (the reference's
    * FeatureExtractor, modular_rule_system.py:14-27, over OUR profile
    * schema) — so profile-kind conditions evaluate directly against a
    * [[graft.profile.Profiler]] frame. Bindings (min_threshold,
    * expected_class, ...) merge in via `extra`. */
  def featuresOf(p: org.apache.spark.sql.Row,
      extra: Map[String, Any] = Map.empty): Map[String, Any] = {
    def d(c: String): Double = p.getAs[Double](c)
    val base = Map[String, Any](
      "num_rows" -> p.getAs[Long]("row_count"),
      "nulls" -> p.getAs[Long]("null_count"),
      "null_ratio" -> d("null_ratio"),
      "distinct" -> p.getAs[Long]("distinct_count"),
      "unique_ratio" -> d("unique_ratio"),
      "min" -> d("num_min"), "max" -> d("num_max"),
      "q1" -> d("num_q1"), "q3" -> d("num_q3"),
      "length_min" -> p.getAs[Long]("min_len"),
      "length_max" -> p.getAs[Long]("max_len"),
      "decimal_places" -> p.getAs[Int]("max_decimals"),
      "pattern" -> p.getAs[String]("dominant_pattern"),
      "inferred_class" -> p.getAs[String]("inferred_type"))
    // NaN features (no numeric values) drop out → clauses on them are
    // FALSE, matching the reference's missing-feature semantics
    base.filterNot {
      case (_, v: Double) => v.isNaN
      case _ => false
    } ++ extra
  }

  /** Classify one profiled column: the profile-kind entries whose
    * condition holds for its features. */
  def classify(entries: Seq[YamlRuleDef], p: org.apache.spark.sql.Row,
      extra: Map[String, Any] = Map.empty): Seq[String] = {
    val feats = featuresOf(p, extra)
    entries.filter(e => kindOf(e.name) == ProfileKind)
      .filter(e => profilePredicate(e.condition)(feats))
      .map(_.name)
  }

  /** First-digit probabilities under Benford's law — injected as the
    * `benford_distribution` feature so the dialect's
    * `first_digit_distribution matches benford_distribution` entry
    * evaluates against the profiler's digit histogram (A16/x6). */
  val benfordDistribution: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Tolerance for the `matches` distribution operator (max absolute
    * per-bucket deviation). */
  val matchesTolerance = 0.05

  private def dist(feats: Map[String, Any], k: String): Option[Seq[Double]] =
    feats.get(k).collect {
      case xs: Seq[_] => xs.map { case n: Number => n.doubleValue() }
    }

  /** Compile a profile-kind condition into a feature predicate. */
  def profilePredicate(condition: String): Map[String, Any] => Boolean = {
    val matchesPat = "(\\S+)\\s+matches\\s+(\\S+)".r
    val clausePat = "(.+?)\\s*(==|>=|<=|>|<)\\s*(.+)".r
    val clauses: Seq[Map[String, Any] => Boolean] =
      condition.split("(?i)\\s+AND\\s+").toSeq.map {
        case matchesPat(l, r) => (feats0: Map[String, Any]) => {
          val feats = if (feats0.contains("benford_distribution")) feats0
            else feats0 + ("benford_distribution" -> benfordDistribution)
          (dist(feats, l), dist(feats, r)) match {
            case (Some(a), Some(b)) if a.size == b.size =>
              a.zip(b).map { case (x, y) => math.abs(x - y) }.max <= matchesTolerance
            case _ => false
          }
        }
        case clausePat(l, op, r) => (feats: Map[String, Any]) =>
          (evalExpr(l, feats), evalExpr(r, feats)) match {
            case (Some(NumAtom(a)), Some(NumAtom(b))) => op match {
              case "==" => a == b
              case ">=" => a >= b
              case "<=" => a <= b
              case ">" => a > b
              case "<" => a < b
            }
            case (Some(StrAtom(a)), Some(StrAtom(b))) if op == "==" => a == b
            case _ => false
          }
        case c => throw new IllegalArgumentException(s"cannot parse clause: $c")
      }
    feats => clauses.forall(_(feats))
  }
}
