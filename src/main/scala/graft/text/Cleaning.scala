package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** C4-style heuristic corpus cleaning (Raffel et al. 2020 §2.2 — the
  * rule set behind the C4 dataset, and the template for most web-crawl
  * cleaning since): line-level keep rules plus document-level drop
  * rules, as ONE pure map-side pass.
  *
  * Line rules (a line survives iff ALL hold):
  *  - at least `minLineWords` words (the engine's canonical token rule:
  *    maximal [a-z0-9] runs of `lower(line)`);
  *  - ends in terminal punctuation (`.` `!` `?` `"`).
  * Document rules (a document is dropped — `kept = false` — iff ANY
  * hold):
  *  - `lower(text)` contains a blocked phrase ("lorem ipsum" et al.);
  *  - contains a curly brace (C4's code-page heuristic);
  *  - fewer than `minKeptLines` lines survive the line rules.
  *
  * Scale shape: pure per-row Columns — split, per-line filters, join.
  * No shuffle, no UDF; runs identically over a stream (stateless
  * append). At 100 TB this is a map-only stage fused into whatever
  * scan precedes it. */
object Cleaning {

  private def lineWords(l: Column): Column =
    size(graft.functions.TokenArray.asciiTokens(l))

  private def terminal(l: Column): Column =
    substring(l, -1, 1).isin(".", "!", "?", "\"")

  /** (id, n_lines, n_kept, kept, clean_text): the C4 rule set over
    * `sep`-separated lines. `clean_text` is the surviving lines joined
    * by `sep` (reported even for dropped docs — callers gate on
    * `kept`). */
  def c4Clean(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n", minLineWords: Int = 5, minKeptLines: Int = 2,
      badPhrases: Seq[String] = Seq("lorem ipsum"),
      braceFilter: Boolean = true,
      keep: Seq[String] = Nil): DataFrame = {
    val lines = split(col(s"`$textCol`"), java.util.regex.Pattern.quote(sep))
    val keptLines = filter(lines,
      l => lineWords(l) >= minLineWords && terminal(l))
    val low = lower(col(s"`$textCol`"))
    val phraseHit = badPhrases
      .map(p => low.contains(p.toLowerCase(java.util.Locale.ROOT)))
      .foldLeft(lit(false))(_ || _)
    val braceHit =
      if (braceFilter) col(s"`$textCol`").contains("{") ||
        col(s"`$textCol`").contains("}")
      else lit(false)
    df.select(col(s"`$idCol`").as("id") +:
        size(lines).cast("long").as("n_lines") +:
        size(keptLines).cast("long").as("n_kept") +:
        (!phraseHit && !braceHit &&
          size(keptLines) >= minKeptLines).as("kept") +:
        array_join(keptLines, sep).as("clean_text") +:
        keep.map(k => col(s"`$k`")): _*)
  }
}
