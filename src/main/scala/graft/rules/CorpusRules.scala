package graft.rules

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Rule generation from corpus-level quality signals — the reference's
  * profile→rule loop (rules/train_clean_rules.py:7-103) applied to a
  * training-data pipeline: aggregate per-source document quality, then
  * emit scannable blocklist rules for the sources a curation pass
  * should drop (the domain-level filtering step of web-corpus
  * pipelines, e.g. RefinedWeb §3.1's URL/domain triage).
  */
object CorpusRules {

  /** Per-source quality rollup with a blocklist decision.
    *
    * Scores aggregate as exact ×10⁴ integers (`sum_quality_e4`), so the
    * sum is order-independent and reproducible on any engine — only the
    * final per-source average performs a floating division. A source is
    * `blocked` when its average quality falls below `minAvgQuality` or
    * its short-document fraction (length < `shortLen`) exceeds
    * `maxShortFrac`.
    *
    * Scale shape: one partially-aggregated groupBy(source) — counters
    * only, map-side combined; output is source-cardinality sized. */
  def sourceStats(docs: DataFrame, sourceCol: String, textCol: String,
      minAvgQuality: Double = 0.0, maxShortFrac: Double = 1.0,
      shortLen: Int = 200): DataFrame = {
    val qE4 = TextAnalysis.qualityE4(textCol)
    docs.groupBy(col(s"`$sourceCol`").as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(qE4).as("sum_quality_e4"),
        sum(when(length(col(s"`$textCol`")) < shortLen, 1L).otherwise(0L))
          .as("n_short"))
      .withColumn("avg_quality",
        col("sum_quality_e4").cast(DoubleType) /
          (col("n_docs").cast(DoubleType) * 10000d))
      .withColumn("short_frac",
        col("n_short").cast(DoubleType) / col("n_docs").cast(DoubleType))
      .withColumn("blocked",
        col("avg_quality") < lit(minAvgQuality) ||
          col("short_frac") > lit(maxShortFrac))
  }

  /** The `blocked` subset of [[sourceStats]] as scannable rule specs:
    * one cross-field predicate per blocked source, so a violation scan
    * over the corpus flags exactly the documents a curation pass should
    * drop. Blocked-source cardinality is a control-plane collect by
    * construction (sources, not documents). */
  def blocklistRules(stats: DataFrame, sourceCol: String = "source"): Seq[CrossFieldRule] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    stats.filter(col("blocked")).select("source").collect().toSeq
      .map(_.getString(0))
      .sorted
      .map(s => CrossFieldRule(s"source_block($s)", s"`$sourceCol` <> '${esc(s)}'"))
  }
}
