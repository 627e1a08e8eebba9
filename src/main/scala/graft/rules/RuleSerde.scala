package graft.rules

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** JSON round-trip for rule specs (SURVEY.md §2.1 S6; reference:
  * utils/rule_utils.py:16-39 scrubs lambdas before serializing — our
  * ADT is data-only by construction, so every rule family round-trips
  * losslessly). Uses the Jackson shipped with Spark; no extra deps.
  */
object RuleSerde {

  private def mapper = new ObjectMapper()

  private def toMap(r: RuleSpec): java.util.Map[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    def put(kvs: (String, Any)*): java.util.Map[String, Any] = {
      kvs.foreach { case (k, v) => m.put(k, v) }; m
    }
    r match {
      case NotNullRule(c, s) => put("kind" -> "not_null", "column" -> c, "severity" -> s)
      case RegexRule(c, p, s) =>
        put("kind" -> "regex", "column" -> c, "pattern" -> p, "severity" -> s)
      case RangeRule(c, lo, hi, s) =>
        put("kind" -> "range", "column" -> c, "lo" -> lo, "hi" -> hi, "severity" -> s)
      case EnumRule(c, a, s) =>
        put("kind" -> "enum", "column" -> c, "allowed" -> a.asJava, "severity" -> s)
      case DateFormatRule(c, f, s) =>
        put("kind" -> "date_format", "column" -> c, "format" -> f, "severity" -> s)
      case DecimalPrecisionRule(c, k, s) =>
        put("kind" -> "decimal_precision", "column" -> c, "max_decimals" -> k, "severity" -> s)
      case LengthRule(c, lo, hi, s) =>
        put("kind" -> "length", "column" -> c, "min_len" -> lo, "max_len" -> hi, "severity" -> s)
      case SingleValueRule(c, e, s) =>
        put("kind" -> "single_value", "column" -> c, "expected" -> e, "severity" -> s)
      case UniqueRule(c, s) => put("kind" -> "unique", "column" -> c, "severity" -> s)
      case CompositeUniqueRule(cs, s) =>
        put("kind" -> "composite_unique", "columns" -> cs.asJava, "severity" -> s)
      case CrossFieldRule(n, p, s) =>
        put("kind" -> "cross_field", "rule_name" -> n, "predicate" -> p, "severity" -> s)
      case FunctionalDependencyRule(l, rr, s) =>
        put("kind" -> "fd", "lhs" -> l, "rhs" -> rr, "severity" -> s)
      case InclusionRule(c, pt, pc, s) =>
        put("kind" -> "inclusion", "column" -> c, "parent_table" -> pt,
          "parent_column" -> pc, "severity" -> s)
    }
  }

  private def fromMap(m: java.util.Map[String, Any]): RuleSpec = {
    def s(k: String) = m.get(k).asInstanceOf[String]
    def d(k: String) = m.get(k) match { case n: Number => n.doubleValue() }
    def i(k: String) = m.get(k) match { case n: Number => n.intValue() }
    def strList(k: String): Seq[String] = m.get(k) match {
      case l: java.util.List[_] => l.asScala.toSeq.map {
        case str: String => str
        case other => throw new IllegalArgumentException(
          s"rule field '$k' must hold strings, got: $other")
      }
      case other => throw new IllegalArgumentException(
        s"rule field '$k' must be a list of strings, got: $other")
    }
    val sev = s("severity")
    s("kind") match {
      case "not_null" => NotNullRule(s("column"), sev)
      case "regex" => RegexRule(s("column"), s("pattern"), sev)
      case "range" => RangeRule(s("column"), d("lo"), d("hi"), sev)
      case "enum" => EnumRule(s("column"), strList("allowed"), sev)
      case "date_format" => DateFormatRule(s("column"), s("format"), sev)
      case "decimal_precision" => DecimalPrecisionRule(s("column"), i("max_decimals"), sev)
      case "length" => LengthRule(s("column"), i("min_len"), i("max_len"), sev)
      case "single_value" => SingleValueRule(s("column"), s("expected"), sev)
      case "unique" => UniqueRule(s("column"), sev)
      case "composite_unique" => CompositeUniqueRule(strList("columns"), sev)
      case "cross_field" => CrossFieldRule(s("rule_name"), s("predicate"), sev)
      case "fd" => FunctionalDependencyRule(s("lhs"), s("rhs"), sev)
      case "inclusion" => InclusionRule(s("column"), s("parent_table"),
        s("parent_column"), sev)
      case k => throw new IllegalArgumentException(s"unknown rule kind: $k")
    }
  }

  def toJson(rules: Seq[RuleSpec]): String =
    mapper.writeValueAsString(rules.map(toMap).asJava)

  def fromJson(json: String): Seq[RuleSpec] =
    mapper.readValue(json, classOf[java.util.List[java.util.Map[String, Any]]])
      .asScala.toSeq.map(fromMap)
}
