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

  /** The GOPHER stop-word list (Rae et al. 2021, A1.1): a document
    * must contain at least [[GopherMinStops]] distinct members. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStops = 2

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Appendix
    * A1.1) — the OTHER canonical web-filter set next to [[c4Clean]],
    * in exact integer form (every ratio threshold cross-multiplied;
    * the repetition rules of the same appendix live in
    * [[graft.functions.RepetitionStats]]/t13):
    *  - word count ∈ [50, 100 000];
    *  - mean word length ∈ [3, 10] characters
    *    (3·n ≤ Σlen ≤ 10·n);
    *  - symbol-to-word ratio ≤ 1/10, symbols = '#' occurrences +
    *    '…'-as-'...' occurrences;
    *  - ≤ 90% of lines start with a bullet ('- ' or '* ');
    *  - ≤ 30% of lines end with an ellipsis;
    *  - ≥ 80% of words contain at least one alphabetic character;
    *  - ≥ 2 distinct stop words from [[GopherStops]].
    * Pure per-row Columns — stateless, shuffle-free, append-mode
    * stream legal verbatim (the c4 convention; the per-word fold costs
    * one pass over the token array per row). Returns (id, n_words,
    * n_lines, stop_hits, the seven rule booleans, kept = AND). */
  def gopherRules(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val text = col(s"`$textCol`")
    val ws = graft.functions.TokenArray.asciiTokens(text)
    val nW = size(ws).cast("long")
    val totWLen = aggregate(ws, lit(0L), (a, w) => a + length(w))
    val alphaW = size(filter(ws, w => w.rlike("[a-z]"))).cast("long")
    val stops = size(array_intersect(array_distinct(ws),
      typedLit(GopherStops))).cast("long")
    val hashes = (length(text) - length(regexp_replace(text, "#", "")))
      .cast("long")
    val ell = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletL = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val ellL = size(filter(lines, l => l.endsWith("..."))).cast("long")
    df.select(col(s"`$idCol`").as("id"), nW.as("n_words"),
        nLines.as("n_lines"), stops.as("stop_hits"),
        (nW >= 50L && nW <= 100000L).as("r_words"),
        (lit(3L) * nW <= totWLen && totWLen <= lit(10L) * nW)
          .as("r_meanlen"),
        (lit(10L) * (hashes + ell) <= nW).as("r_symbol"),
        (lit(10L) * bulletL <= lit(9L) * nLines).as("r_bullet"),
        (lit(10L) * ellL <= lit(3L) * nLines).as("r_ellipsis"),
        (lit(5L) * alphaW >= lit(4L) * nW).as("r_alpha"),
        (stops >= GopherMinStops.toLong).as("r_stop"))
      .withColumn("kept", col("r_words") && col("r_meanlen") &&
        col("r_symbol") && col("r_bullet") && col("r_ellipsis") &&
        col("r_alpha") && col("r_stop"))
  }
}
