package graft

import graft.rules._
import graft.rules.YamlRules._

/** The YAML rule loader must consume the reference's rules.yaml dialect
  * VERBATIM (reference: rules.yaml:1-32, loaded at
  * rules/modular_rule_system.py:7-9) and compile every entry into the
  * engine: scan-kind entries through [[ViolationScanner]], profile-kind
  * entries into feature predicates, matching-kind entries classified. */
class YamlRulesSpec extends SparkSpec {

  private val referenceYaml = "/root/reference/rules.yaml"

  test("loads the reference rules.yaml verbatim — all 21 entries, in order") {
    val defs = YamlRules.loadFile(referenceYaml)
    assert(defs.size === 21)
    assert(defs.head === YamlRuleDef(
      "is_primary_key", "distinct == num_rows AND nulls == 0"))
    assert(defs.last === YamlRuleDef(
      "schematic_alignment", "data_type_A == data_type_B AND pattern_A == pattern_B"))
    // every entry classifies — no unknown rule names
    val kinds = defs.map(d => kindOf(d.name))
    assert(kinds.count(_ == ScanKind) === 14)
    assert(kinds.count(_ == ProfileKind) === 5)
    assert(kinds.count(_ == MatchingKind) === 2)
    assertThrows[IllegalArgumentException](kindOf("no_such_rule"))
  }

  /** Bindings instantiating each scan-kind entry against the fixture. */
  private val bindings: Map[String, Map[String, Any]] = Map(
    "is_primary_key" -> Map("column" -> "id"),
    "is_unique" -> Map("column" -> "code"),
    "is_constant" -> Map("column" -> "country", "expected" -> "US"),
    "value_in_range" -> Map("column" -> "qty", "domain_min" -> 0, "domain_max" -> 100),
    "matches_regex" -> Map("column" -> "code", "expected_pattern" -> "^[A-Z]{2}\\d+$"),
    "length_within" -> Map("column" -> "code", "min_length" -> 3, "max_length" -> 5),
    "decimal_precision" -> Map("column" -> "price", "max_decimals" -> 2),
    "domain_is" -> Map("column" -> "country", "approved_list" -> Seq("US", "CA")),
    "is_composite_key" -> Map("columns" -> Seq("country", "code")),
    "conditional_dependency" -> Map(
      "if" -> "country = 'US'", "then" -> "state IS NOT NULL"),
    "field_comparison" -> Map("predicate" -> "start_d <= end_d"),
    "cross_field_sum" -> Map("predicate" -> "subtotal + tax = total"),
    "inclusion_dependency" -> Map(
      "column" -> "country", "parent_table" -> "countries", "parent_column" -> "cc"),
    "foreign_key" -> Map(
      "column" -> "country", "parent_table" -> "countries", "parent_column" -> "cc"))

  test("every scan-kind entry in the reference file compiles and scans") {
    import spark.implicits._
    // id, code, country, state, qty, price, start_d, end_d, subtotal, tax, total
    val df = Seq(
      (1L, "AB1", "US", "MA", 10, "9.99", "2024-01-01", "2024-02-01", 10.0, 1.0, 11.0),
      (2L, "AB2", "US", null, 50, "1.5", "2024-01-01", "2024-02-01", 2.0, 0.5, 2.5),
      (3L, "ab3", "FR", null, 200, "1.234", "2024-03-01", "2024-02-01", 1.0, 1.0, 3.0),
      (4L, "AB2", "CA", "QC", -5, "2.00", "2024-01-01", "2024-01-02", 4.0, 0.0, 4.0))
      .toDF("id", "code", "country", "state", "qty", "price",
        "start_d", "end_d", "subtotal", "tax", "total")
    val countries = Seq("US", "CA", "DE").toDF("cc")

    val defs = YamlRules.loadFile(referenceYaml).filter(d => kindOf(d.name) == ScanKind)
    assert(defs.map(_.name).toSet === bindings.keySet)
    val rules = defs.flatMap(d => toScanRules(d.name, bindings(d.name)))
    val out = ViolationScanner
      .scan(df, "t", rules, "id", parents = Map("countries" -> countries))
      .select("row_id", "rule").as[(Long, String)].collect().toSet

    assert(out.contains((3L, "regex(code)")))          // matches_regex: lowercase
    assert(out.contains((2L, "unique(code)")))         // is_unique: AB2 twice
    assert(out.contains((4L, "unique(code)")))
    assert(out.contains((3L, "single_value(country)")))// is_constant: FR
    assert(out.contains((3L, "range(qty)")))           // value_in_range: 200
    assert(out.contains((4L, "range(qty)")))           // value_in_range: -5
    assert(out.contains((3L, "decimal_precision(price)"))) // 3 decimals
    assert(out.contains((3L, "enum(country)")))        // domain_is: FR
    assert(out.contains((2L, "cross_field(conditional_dependency)"))) // US, null state
    assert(out.contains((3L, "cross_field(field_comparison)")))       // start > end
    assert(out.contains((3L, "cross_field(cross_field_sum)")))        // 1+1 != 3
    assert(out.contains((3L, "inclusion(country⊆countries.cc)")))     // FR not parent
    // is_primary_key on id: unique + not null → no violations from it
    assert(!out.exists(_._2 == "unique(id)"))
    assert(!out.exists(_._2 == "not_null(id)"))
    // composite (country, code): no tuple repeats in the fixture
    assert(!out.exists(_._2.startsWith("composite_unique")))
  }

  test("composite-key entry flags duplicated tuples") {
    import spark.implicits._
    val df = Seq((1L, "US", "A"), (2L, "US", "A"), (3L, "US", "B"))
      .toDF("id", "country", "code")
    val rules = toScanRules("is_composite_key",
      Map("columns" -> Seq("country", "code")))
    val hit = ViolationScanner.scan(df, "t", rules, "id")
      .select("row_id").as[Long].collect().sorted
    assert(hit === Array(1L, 2L))
  }

  test("scanWith runs the whole reference file end to end") {
    import spark.implicits._
    val df = Seq((1L, "AB1", "US"), (2L, "ab2", "US"), (3L, "AB3", "FR"))
      .toDF("id", "code", "country")
    val entries = YamlRules.loadFile(referenceYaml)
    // bind only two entries — unbound entries are skipped, profile-kind
    // entries never reach the row scan
    val out = YamlRules.scanWith(df, "t", entries, Map(
        "matches_regex" -> Map("column" -> "code", "expected_pattern" -> "^[A-Z]{2}\\d$"),
        "domain_is" -> Map("column" -> "country", "approved_list" -> Seq("US"))),
      keyCol = "id")
      .select("row_id", "rule").as[(Long, String)].collect().toSet
    assert(out === Set((2L, "regex(code)"), (3L, "enum(country)")))
  }

  test("malformed bindings are rejected, not deferred") {
    assertThrows[IllegalArgumentException](
      toScanRules("value_in_range", Map("column" -> "x", "domain_min" -> "zero")))
    assertThrows[IllegalArgumentException](
      toScanRules("is_composite_key", Map("columns" -> "a,b")))
    assertThrows[IllegalArgumentException](
      toScanRules("is_nullable", Map("column" -> "x"))) // profile-kind
  }

  test("every profile-kind condition in the reference file compiles") {
    val defs = YamlRules.loadFile(referenceYaml).filter(d => kindOf(d.name) == ProfileKind)
    val preds = defs.map(d => d.name -> profilePredicate(d.condition)).toMap
    assert(preds.size === 5)

    // is_nullable: nulls > 0
    assert(preds("is_nullable")(Map("nulls" -> 3)))
    assert(!preds("is_nullable")(Map("nulls" -> 0)))
    assert(!preds("is_nullable")(Map.empty)) // missing feature → false

    // has_low_cardinality: distinct / num_rows < 0.1
    assert(preds("has_low_cardinality")(Map("distinct" -> 5, "num_rows" -> 100)))
    assert(!preds("has_low_cardinality")(Map("distinct" -> 50, "num_rows" -> 100)))

    // quartile_thresholds: q1 >= min_threshold AND q3 <= max_threshold
    // (thresholds are bindings — merged into the feature map by caller)
    val q = Map[String, Any]("q1" -> 10.0, "q3" -> 90.0,
      "min_threshold" -> 0.0, "max_threshold" -> 100.0)
    assert(preds("quartile_thresholds")(q))
    assert(!preds("quartile_thresholds")(q + ("max_threshold" -> 50.0)))

    // semantic_class_is: inferred_class == expected_class
    assert(preds("semantic_class_is")(
      Map("inferred_class" -> "email", "expected_class" -> "email")))
    assert(!preds("semantic_class_is")(
      Map("inferred_class" -> "phone", "expected_class" -> "email")))

    // benford_conformity: first_digit_distribution matches benford_distribution
    assert(preds("benford_conformity")(
      Map("first_digit_distribution" -> YamlRules.benfordDistribution)))
    assert(!preds("benford_conformity")(
      Map("first_digit_distribution" -> Seq.fill(9)(1.0 / 9))))
  }

  test("profile-kind entries classify real profiled columns") {
    import spark.implicits._
    val df = Seq(
      (1L, "US", null.asInstanceOf[java.lang.Double]),
      (2L, "US", java.lang.Double.valueOf(2.0)),
      (3L, "CA", java.lang.Double.valueOf(3.0)),
      (4L, "US", java.lang.Double.valueOf(4.0)))
      .toDF("id", "cc", "v")
    val prof = graft.profile.Profiler.profile(df, "t")
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val entries = YamlRules.loadFile(referenceYaml)
    // id: 4 distinct of 4 rows, no nulls → NOT nullable, NOT low-card
    assert(YamlRules.classify(entries, prof("id")) === Seq.empty)
    // the primary-key CONDITION (scan-kind, so not in classify) holds
    assert(YamlRules.profilePredicate(
      "distinct == num_rows AND nulls == 0")(YamlRules.featuresOf(prof("id"))))
    // v: one null → is_nullable fires
    assert(YamlRules.classify(entries, prof("v")).contains("is_nullable"))
    // quartile_thresholds via merged bindings on v (q1=2.5, q3=3.5)
    assert(YamlRules.classify(entries, prof("v"),
      Map("min_threshold" -> 0.0, "max_threshold" -> 10.0))
      .contains("quartile_thresholds"))
    // semantic_class_is with a matching expected class (cc is 2-of-4
    // distinct → "string"; categorical needs unique_ratio ≤ 0.1)
    assert(YamlRules.classify(entries, prof("cc"),
      Map("expected_class" -> "string")).contains("semantic_class_is"))
    assert(!YamlRules.classify(entries, prof("cc"),
      Map("expected_class" -> "categorical")).contains("semantic_class_is"))
  }

  test("condition grammar: arithmetic, strings, and malformed input") {
    // expr arithmetic (+, /) on both clause sides
    val p1 = profilePredicate("distinct + nulls == num_rows")
    assert(p1(Map("distinct" -> 95, "nulls" -> 5, "num_rows" -> 100)))
    assert(!p1(Map("distinct" -> 95, "nulls" -> 4, "num_rows" -> 100)))
    // quoted string literal comparison
    val p2 = profilePredicate("inferred_class == 'date'")
    assert(p2(Map("inferred_class" -> "date")))
    assert(!p2(Map("inferred_class" -> "float")))
    // numeric-vs-string clause is false, not an error
    assert(!profilePredicate("pattern == 5")(Map("pattern" -> "999")))
    // unparseable clause fails at compile time, not evaluation time
    assertThrows[IllegalArgumentException](profilePredicate("just words"))
  }

  test("primary-key condition evaluates over profiler features too") {
    // is_primary_key doubles as a profile classifier: distinct == num_rows AND nulls == 0
    val p = profilePredicate("distinct == num_rows AND nulls == 0")
    assert(p(Map("distinct" -> 100, "num_rows" -> 100, "nulls" -> 0)))
    assert(!p(Map("distinct" -> 99, "num_rows" -> 100, "nulls" -> 0)))
    assert(!p(Map("distinct" -> 100, "num_rows" -> 100, "nulls" -> 1)))
  }
}
