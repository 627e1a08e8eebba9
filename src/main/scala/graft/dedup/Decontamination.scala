package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for LLM training corpora: flag training
  * documents that share word n-grams with an evaluation set, so eval
  * answers cannot leak into the training data (the standard 8-13-gram
  * overlap filter used when preparing web-scale corpora; the reference
  * has no counterpart — this extends its similarity family to the
  * north-star pipeline).
  *
  * Scale shape: the eval side of a real pipeline is benchmark-sized
  * (10^4-10^6 grams) — its distinct-gram frame broadcasts, so the
  * corpus side is a map-side hash-join probe over its own shingle
  * explode: no shuffle of corpus grams at all when the broadcast
  * threshold allows, a plain equi-join shuffle otherwise (Catalyst
  * picks). The per-doc overlap count is one partially-aggregated
  * groupBy.
  */
object Decontamination {

  /** (id, n_overlap): corpus documents sharing at least `minOverlap`
    * DISTINCT word `n`-grams with any eval document. Shingles are
    * lowercased word n-grams, distinct per document
    * ([[Dedup.wordShingles]]), so n_overlap counts distinct
    * contaminated phrases, not repeated occurrences. */
  def contaminatedDocs(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 8,
      minOverlap: Long = 1): DataFrame = {
    val corpusGrams = Dedup.wordShingles(corpus, textCol, idCol, n)
    val evalGrams = Dedup.wordShingles(evalSet, textCol, idCol, n)
      .select(col("shingle")).distinct()
    corpusGrams.join(evalGrams, "shingle")
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Script-aware twin of [[contaminatedDocs]]: shingles via
    * [[graft.text.ScriptText.shingles]] (word n-grams for worded
    * scripts, CHAR n-grams for CJK), so a non-Latin benchmark is
    * actually visible to the probe — under the Latin plane a
    * CJK/Cyrillic/Arabic eval set yields ZERO grams and its answers
    * leak into training silently. Same scale shape: the eval gram
    * frame is benchmark-sized (broadcast), the corpus side is one
    * explode + equi-join + partial-agg. */
  def contaminatedDocsScript(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 8,
      minOverlap: Long = 1): DataFrame = {
    val corpusGrams = graft.text.ScriptText.shingles(corpus, textCol, idCol, n)
    val evalGrams = graft.text.ScriptText.shingles(evalSet, textCol, idCol, n)
      .select(col("shingle")).distinct()
    corpusGrams.join(evalGrams, "shingle")
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Stream-safe evidence form at the script grain (the w4 pattern:
    * [[graft.text.ScriptText.shingles]] is a per-row distinct +
    * explode — stateless, append-mode legal against a broadcast eval
    * gram table). */
  def contaminationEvidenceScript(corpus: DataFrame, evalGrams: DataFrame,
      textCol: String, idCol: String, n: Int = 8): DataFrame =
    graft.text.ScriptText.shingles(corpus, textCol, idCol, n)
      .join(evalGrams, "shingle")
      .select(col("id"), col("shingle"))

  /** The decontaminated corpus: drop every flagged document. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, textCol: String,
      idCol: String, n: Int = 8, minOverlap: Long = 1): DataFrame =
    corpus.join(
      contaminatedDocs(corpus, evalSet, textCol, idCol, n, minOverlap)
        .select(col("id").as(s"__flagged_$idCol")),
      corpus(idCol) === col(s"__flagged_$idCol"), "left_anti")

  /** Stateless, stream-safe evidence form of the probe: one row per
    * (document, overlapping eval gram). The per-document DISTINCT
    * happens INSIDE each row (array_distinct before the explode) — no
    * shuffle, no state — so the whole operator is a narrow map plus a
    * stream-static equi-join and runs unchanged in append mode on a
    * Structured Stream. n_overlap is the per-id evidence row count:
    * [[contaminatedDocs]] is this operator's batch rollup, and the
    * streaming spec pins the two to identical evidence sets.
    *
    * `evalGrams` must be the DISTINCT (shingle) frame of the eval set
    * (static/broadcast side by contract — benchmark-sized). */
  def contaminationEvidence(corpus: DataFrame, evalGrams: DataFrame,
      textCol: String, idCol: String, n: Int = 8): DataFrame =
    Dedup.wordShingles(corpus, textCol, idCol, n)
      .join(evalGrams, "shingle")
      .select(col("id"), col("shingle"))
}
