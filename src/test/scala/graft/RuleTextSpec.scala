package graft

import graft.rules._
import org.apache.spark.sql.functions._

/** Snapshot spec for the NL rule-text surface (reference:
  * generate_rules_from_profile.py:15-48). */
class RuleTextSpec extends SparkSpec {

  test("describe renders every rule family as one sentence") {
    assert(RuleText.describe(NotNullRule("a")) ===
      "a should not contain null or blank values.")
    assert(RuleText.describe(RegexRule("a", "^\\d+$")) ===
      "a should match the pattern ^\\d+$.")
    assert(RuleText.describe(RangeRule("a", 0.0, 10.5)) ===
      "a should lie between 0.000 and 10.50.")
    assert(RuleText.describe(EnumRule("a", Seq("x", "y"))) ===
      "a should be one of: x, y.")
    assert(RuleText.describe(DateFormatRule("a", "yyyy-MM-dd")) ===
      "a should be a date in the format yyyy-MM-dd.")
    assert(RuleText.describe(DecimalPrecisionRule("a", 1)) ===
      "a should have at most 1 decimal place.")
    assert(RuleText.describe(DecimalPrecisionRule("a", 2)) ===
      "a should have at most 2 decimal places.")
    assert(RuleText.describe(LengthRule("a", 1, 1)) ===
      "a should be exactly 1 character long.")
    assert(RuleText.describe(LengthRule("a", 2, 5)) ===
      "a should be between 2 and 5 characters long.")
    assert(RuleText.describe(SingleValueRule("a", "v")) ===
      "a should always equal 'v'.")
    assert(RuleText.describe(UniqueRule("a")) ===
      "a should be a unique identifier with no duplicates.")
    assert(RuleText.describe(CompositeUniqueRule(Seq("a", "b"))) ===
      "The combination of a, b should be unique.")
    assert(RuleText.describe(CrossFieldRule("sum", "a + b = c")) ===
      "Each row should satisfy a + b = c (sum).")
    assert(RuleText.describe(FunctionalDependencyRule("zip", "city")) ===
      "city should be functionally determined by zip.")
    assert(RuleText.describe(InclusionRule("ck", "customer", "c_custkey")) ===
      "Every value of ck should appear in customer.c_custkey.")
  }

  test("profile-driven suggestions mirror the reference semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, "a@x.com", "555-1234", 9.99, null.asInstanceOf[String]),
      (2L, "b@y.org", "555-9876", 11.50, null.asInstanceOf[String]),
      (3L, "c@z.net", "555-4567", 13.25, "rare"))
      .toDF("user_id", "email", "phone", "price", "note")
    val prof = graft.profile.Profiler.profile(df, "t")
      .orderBy("column")
    val sugg = RuleText.suggest(prof).map(s => s.column -> s).toMap

    // type sentences
    assert(sugg("user_id").rules.contains("user_id should contain only integers."))
    assert(sugg("price").rules.contains(
      "price should contain only float or numeric values."))
    // name-based hints
    assert(sugg("email").rules.contains(
      "email should match a valid email format (e.g., name@example.com)."))
    assert(sugg("phone").rules.contains(
      "phone should be a valid phone number (e.g., 10 or 11 digits)."))
    assert(sugg("user_id").rules.contains(
      "user_id should be a unique identifier with no duplicates."))
    // null-rate note (note is 2/3 null)
    assert(sugg("note").rules.exists(_.startsWith(
      "note has a high null rate (66.67%)")))
    // generated-rule texts flow through (id is unique + never null)
    assert(sugg("user_id").rules.contains(
      "user_id should not contain null or blank values."))
    // dedup: the unique sentence appears once despite name hint + rule
    assert(sugg("user_id").rules.count(
      _ == "user_id should be a unique identifier with no duplicates.") === 1)
  }

  test("report renders one markdown block per column") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val prof = graft.profile.Profiler.profile(df, "t").orderBy("column")
    val text = RuleText.report(prof)
    assert(text.contains("## id (integer)"))
    assert(text.contains("- id should contain only integers."))
  }
}
