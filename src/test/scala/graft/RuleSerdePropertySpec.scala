package graft

import graft.rules._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trip for the JSON rule serde: any rule the ADT can
  * express must survive toJson → fromJson bit-identically, including
  * hostile strings (quotes, newlines, unicode, regex metacharacters)
  * in every parameter position. Generators are driven with fixed seeds
  * (no scalatestplus bridge in the offline cache). */
class RuleSerdePropertySpec extends AnyFunSuite {

  private val hostile: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12) + "c"),
    Gen.const("""qu"ote"""), Gen.const("line\nbreak\ttab"),
    Gen.const("""back\slash"""), Gen.const("ünïcödé⊆"),
    Gen.const("^[A-Z]{2}\\d+$"), Gen.const("a,b"), Gen.const(""))

  private val sev: Gen[String] = Gen.oneOf("error", "warning", "info")

  private val ruleGen: Gen[RuleSpec] = Gen.oneOf[Gen[RuleSpec]](
    Gen.zip(hostile, sev).map { case (c, s) => NotNullRule(c, s) },
    Gen.zip(hostile, hostile, sev).map { case (c, p, s) => RegexRule(c, p, s) },
    Gen.zip(hostile, Gen.choose(-1e9, 1e9), Gen.choose(-1e9, 1e9), sev)
      .map { case (c, lo, hi, s) => RangeRule(c, math.min(lo, hi), math.max(lo, hi), s) },
    Gen.zip(hostile, Gen.listOfN(3, hostile), sev)
      .map { case (c, a, s) => EnumRule(c, a, s) },
    Gen.zip(hostile, Gen.oneOf("yyyy-MM-dd", "M/d/yy"), sev)
      .map { case (c, f, s) => DateFormatRule(c, f, s) },
    Gen.zip(hostile, Gen.choose(0, 12), sev)
      .map { case (c, k, s) => DecimalPrecisionRule(c, k, s) },
    Gen.zip(hostile, Gen.choose(0, 50), Gen.choose(50, 500), sev)
      .map { case (c, lo, hi, s) => LengthRule(c, lo, hi, s) },
    Gen.zip(hostile, hostile, sev).map { case (c, v, s) => SingleValueRule(c, v, s) },
    Gen.zip(hostile, sev).map { case (c, s) => UniqueRule(c, s) },
    Gen.zip(Gen.listOfN(2, hostile), sev)
      .map { case (cs, s) => CompositeUniqueRule(cs, s) },
    Gen.zip(hostile, hostile, sev).map { case (n, p, s) => CrossFieldRule(n, p, s) },
    Gen.zip(hostile, hostile, sev)
      .map { case (l, r, s) => FunctionalDependencyRule(l, r, s) },
    Gen.zip(hostile, hostile, hostile, sev)
      .map { case (c, pt, pc, s) => InclusionRule(c, pt, pc, s) }
  ).flatMap(identity)

  test("every rule family round-trips through JSON bit-identically") {
    val batches = (1 to 50).map { i =>
      Gen.listOfN(13, ruleGen)(Gen.Parameters.default, Seed(i.toLong)).get
    }
    batches.foreach { rules =>
      val back = RuleSerde.fromJson(RuleSerde.toJson(rules))
      assert(back === rules)
    }
    // all 13 families actually exercised across the batches
    val kinds = batches.flatten.map(_.getClass.getSimpleName).toSet
    assert(kinds.size === 13, s"families covered: $kinds")
  }
}
