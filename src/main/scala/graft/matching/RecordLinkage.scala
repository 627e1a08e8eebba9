package graft.matching

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — record-grain entity resolution over
  * structured rows, the classic complement of the document-grain dedup
  * suite (reference gestures: typo-conflict merging in
  * profile_similarity.py:67-74 is cell-grain; this is whole-record).
  *
  * Candidate pairs come from an equi-self-join on a caller-supplied
  * BLOCKING key (never a cross product — the t6 typo-pair convention):
  * two records are comparable only when their blocks collide, which is
  * what makes linkage linear-ish at 100 TB (pair volume is
  * Σ(block²), controlled by the key's selectivity; skewed blocks are
  * AQE's skew-join case). Each candidate pair scores a WEIGHTED MEAN
  * of per-field similarities; pairs at or above `threshold` are links.
  *
  * Field similarity (all engine-portable, oracle-replayable):
  *  - string fields: 1 − levenshtein/max(len) (0 when both empty);
  *  - numeric fields: 1 − |a−b| / max(|a|, |b|, 1e-9), floored at 0.
  *
  * Determinism: the score is rounded half-up to 4 decimals (the
  * [[graft.queries.TextQueries.round4]] convention) BEFORE the
  * threshold, and pairs are emitted once (ida < idb).
  */
object RecordLinkage {

  sealed trait FieldSim { def column: String; def weight: Double }
  /** Levenshtein-normalized string field. */
  final case class StringField(column: String, weight: Double) extends FieldSim
  /** Relative-difference numeric field. */
  final case class NumericField(column: String, weight: Double) extends FieldSim

  private def round4(c: Column): Column =
    floor(c * 10000 + lit(0.5)) / 10000.0

  private def sim(f: FieldSim, a: Column, b: Column): Column = f match {
    case StringField(_, _) =>
      val la = length(a)
      val lb = length(b)
      when(la === 0 && lb === 0, lit(1.0))
        .otherwise(lit(1.0) -
          levenshtein(a, b).cast("double") / greatest(la, lb).cast("double"))
    case NumericField(_, _) =>
      greatest(lit(0.0), lit(1.0) -
        abs(a.cast("double") - b.cast("double")) /
          greatest(abs(a.cast("double")), abs(b.cast("double")), lit(1e-9)))
  }

  /** Candidate links: (ida, idb, score) with ida < idb and
    * score ≥ `threshold`. `blockKey` is the blocking expression
    * (evaluated on the input frame); `fields` the weighted comparators.
    * Null field values compare as empty strings / 0.0 via coalesce. */
  def linkRecords(df: DataFrame, idCol: String, blockKey: Column,
      fields: Seq[FieldSim], threshold: Double): DataFrame = {
    require(fields.nonEmpty, "record linkage needs at least one field")
    val total = fields.map(_.weight).sum
    require(total > 0, "field weights must sum to a positive total")
    def side(tag: String) = df.select(
      (col(s"`$idCol`").as(s"id$tag") +: blockKey.as(s"__bk$tag") +:
        fields.map {
          case StringField(c, _) =>
            coalesce(col(s"`$c`").cast("string"), lit("")).as(s"__$c$tag")
          case NumericField(c, _) =>
            coalesce(col(s"`$c`").cast("double"), lit(0.0)).as(s"__$c$tag")
        }): _*)
    val weighted = fields.map { f =>
      val s = sim(f, col(s"__${f.column}a"), col(s"__${f.column}b"))
      s * lit(f.weight)
    }.reduce(_ + _) / lit(total)
    side("a").join(side("b"),
        col("__bka") === col("__bkb") && col("ida") < col("idb"))
      .select(col("ida"), col("idb"), round4(weighted).as("score"))
      .filter(col("score") >= threshold)
  }
}
