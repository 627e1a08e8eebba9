package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HoloClean-style two-tuple denial constraints (SURVEY.md §2.3 J4;
  * reference: rules/hospital_constraints.txt:1-20 — e.g.
  * `t1&t2&EQ(t1.ZipCode,t2.ZipCode)&IQ(t1.City,t2.City)`).
  *
  * A constraint DENIES the existence of a row pair satisfying every
  * predicate; a satisfied pair is a violation.
  *
  * Scale design: all EQ predicates become the equi-join keys of the
  * self-join — a shuffle hash/sort-merge join partitioned on those
  * columns — and the remaining predicates are post-join filters. A
  * constraint with no EQ predicate would be a cross join; we require at
  * least one (every constraint in the reference's sets has one), so the
  * plan never degenerates at scale.
  */
final case class DCPredicate(op: String, leftCol: String, rightCol: String)

final case class DenialConstraint(raw: String, predicates: Seq[DCPredicate]) {
  def eqPredicates: Seq[DCPredicate] = predicates.filter(_.op == "EQ")
}

object DenialConstraints {

  private val PredRe = """(EQ|IQ|LT|GT|LTE|GTE)\(t1\.([A-Za-z0-9_]+),t2\.([A-Za-z0-9_]+)\)""".r

  /** Parse one constraint line: `t1&t2&PRED(...)&PRED(...)...`. */
  def parse(line: String): DenialConstraint = {
    val preds = PredRe.findAllMatchIn(line).map { m =>
      DCPredicate(m.group(1), m.group(2), m.group(3))
    }.toSeq
    require(preds.nonEmpty, s"no predicates parsed from: $line")
    DenialConstraint(line.trim, preds)
  }

  /** Parse a constraints file (one constraint per non-empty line). */
  def parseAll(text: String): Seq[DenialConstraint] =
    text.linesIterator.map(_.trim).filter(_.nonEmpty).map(parse).toSeq

  private def cmp(op: String, l: Column, r: Column): Column = op match {
    case "EQ"  => l === r
    case "IQ"  => l =!= r
    case "LT"  => l < r
    case "GT"  => l > r
    case "LTE" => l <= r
    case "GTE" => l >= r
  }

  /** Row pairs violating `dc` (both orientations for asymmetric
    * predicates; self-pairs excluded). Output: (row_a, row_b). */
  def violatingPairs(df: DataFrame, dc: DenialConstraint, keyCol: String): DataFrame = {
    require(dc.eqPredicates.nonEmpty,
      s"constraint needs >=1 EQ predicate to join on (else cross join): ${dc.raw}")
    val a = df.alias("t1")
    val b = df.alias("t2")
    val cond = dc.predicates.map { p =>
      cmp(p.op, col(s"t1.`${p.leftCol}`"), col(s"t2.`${p.rightCol}`"))
    }.reduce(_ && _) && col(s"t1.`$keyCol`") =!= col(s"t2.`$keyCol`")
    a.join(b, cond)
      .select(col(s"t1.`$keyCol`").cast("long").as("row_a"),
        col(s"t2.`$keyCol`").cast("long").as("row_b"))
  }

  /** Distinct rows participating in any violating pair of `dc`. */
  def violatingRows(df: DataFrame, dc: DenialConstraint, keyCol: String): DataFrame = {
    val pairs = violatingPairs(df, dc, keyCol)
    pairs.select(col("row_a").as("row_id"))
      .unionByName(pairs.select(col("row_b").as("row_id")))
      .distinct()
  }

  /** Violation layout over a set of constraints (one row per
    * participating row per constraint). */
  def scan(df: DataFrame, table: String, dcs: Seq[DenialConstraint],
      keyCol: String): DataFrame =
    dcs.map { dc =>
      violatingRows(df, dc, keyCol)
        .select(lit(table).as("table"), lit(dc.raw).as("rule"), col("row_id"))
    }.reduceLeft(_.unionByName(_))
}
