package graft.transfer

import graft.rules._

/** Leveled rule transfer across tables (SURVEY.md §2.10 family 6;
  * reference: rule_generation_piplepline_org.py:12-348).
  *
  * Rules carry a level (1 universal … 4 instance-specific) and a
  * confidence; transfer to a new table is gated on profile similarity
  * and decays confidence — higher-level (more specific) rules need
  * higher similarity and decay faster.
  */
final case class LeveledRule(rule: RuleSpec, level: Int, confidence: Double)

object RuleTransfer {

  /** Per-level minimum similarity to transfer at all (reference's
    * similarity gates). */
  val minSimilarity: Map[Int, Double] =
    Map(1 -> 0.0, 2 -> 0.4, 3 -> 0.6, 4 -> 0.8)

  /** Per-level confidence decay factor applied on each transfer hop. */
  val decay: Map[Int, Double] =
    Map(1 -> 1.0, 2 -> 0.9, 3 -> 0.75, 4 -> 0.5)

  /** Transfer `rules` to a target whose profile similarity to the
    * source is `similarity`; drops gated-out rules and rules whose
    * decayed confidence falls below `minConfidence`. */
  def transfer(rules: Seq[LeveledRule], similarity: Double,
      minConfidence: Double = 0.3): Seq[LeveledRule] =
    rules.flatMap { lr =>
      val gate = minSimilarity.getOrElse(lr.level, 1.0)
      if (similarity < gate) None
      else {
        val c = lr.confidence * decay.getOrElse(lr.level, 0.5) * similarity
        if (c < minConfidence) None else Some(lr.copy(confidence = c))
      }
    }

  /** Parameter adaptation (reference's range widening on transfer):
    * widen numeric ranges by `slack` of their width, lengths by one
    * char each way — transferred rules should be more permissive on
    * unseen data. */
  def adapt(rule: RuleSpec, slack: Double = 0.1): RuleSpec = rule match {
    case r @ RangeRule(c, lo, hi, sev) =>
      val w = (hi - lo) * slack
      RangeRule(c, lo - w, hi + w, sev)
    case r @ LengthRule(c, lo, hi, sev) =>
      LengthRule(c, math.max(0, lo - 1), hi + 1, sev)
    case other => other
  }

  /** Default level for a generated rule kind (universal constraints vs
    * instance-specific values). */
  def levelOf(rule: RuleSpec): Int = rule match {
    case _: NotNullRule | _: UniqueRule => 1
    case _: RangeRule | _: LengthRule | _: DecimalPrecisionRule => 2
    case _: RegexRule | _: EnumRule | _: DateFormatRule => 3
    case _: SingleValueRule => 4
    case _ => 3
  }
}
