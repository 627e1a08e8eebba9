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

  /** The Gopher REPETITION rule thresholds (Rae et al. 2021, Table A1
    * "repetitious text"): a document is repetition-clean iff every
    * fraction is at or below its cut. */
  val GopherRepCuts: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30, "dup_para_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20, "dup_para_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16, "dup_5gram_char_frac" -> 0.15,
    "dup_6gram_char_frac" -> 0.14, "dup_7gram_char_frac" -> 0.13,
    "dup_8gram_char_frac" -> 0.12, "dup_9gram_char_frac" -> 0.11,
    "dup_10gram_char_frac" -> 0.10)

  /** The FULL Gopher repetition signal suite (Rae et al. 2021 A1.2) —
    * the family t13's dup-trigram fraction belongs to, completed:
    * per document,
    *
    *  - duplicate LINE / PARAGRAPH fractions, by occurrence count and
    *    by character mass (a line/para is duplicated iff its exact
    *    text occurs ≥ 2× in the document; the char denominators are
    *    the summed part lengths, so separators don't dilute),
    *  - top n-gram character fraction for n = 2..4: count(top gram) ×
    *    len(top gram) / len(text), top = (count desc, gram asc) — a
    *    total order, so the pick is deterministic cross-engine,
    *  - duplicate n-gram character fraction for n = 5..10:
    *    Σ_{gram: count ≥ 2} count·len(gram) / len(text) — the
    *    overlap-counting fast form production filters use (exact
    *    non-double-counting needs per-position interval union; the
    *    documented convention here counts every occurrence's span).
    *
    * All fractions are single divisions of exact integers, rounded to
    * 4 dp (the t13 convention), so they hash cross-engine. `rep_keep`
    * ANDs the [[GopherRepCuts]] thresholds.
    *
    * Scale shape: every signal is a per-DOCUMENT function, so the
    * whole suite is ONE fused kernel pass per row
    * ([[graft.functions.GopherRepStats]]) — no shuffle, no state,
    * append-mode stream legal; at 100 TB it fuses into whatever scan
    * precedes it. */
  def gopherRepetition(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    // NULL text is pinned to the empty-document convention (all-zero
    // fractions, rep_keep = true) on BOTH engines — the kernel is
    // null-intolerant and the DuckDB mirror's LEFT JOIN path would
    // otherwise be the only thing deciding what NULL means
    val st = graft.functions.GopherRepStats(
      coalesce(col(s"`$textCol`"), lit("")))
    val names = Seq("n_lines", "dup_line_frac", "dup_line_char_frac",
      "n_paras", "dup_para_frac", "dup_para_char_frac") ++
      (2 to 4).map(n => s"top_${n}gram_char_frac") ++
      (5 to 10).map(n => s"dup_${n}gram_char_frac")
    val cols = names.zipWithIndex.map { case (nm, i) =>
      val e = element_at(col("__st"), i + 1)
      (if (nm.startsWith("n_")) e.cast("long") else e).as(nm)
    }
    df.select(col(s"`$idCol`").as("id"), st.as("__st"))
      .select(col("id") +: cols: _*)
      .withColumn("rep_keep",
        GopherRepCuts.map { case (c, thr) => col(c) <= thr }.reduce(_ && _))
  }

  /** The join-machinery reference form of [[gopherRepetition]] —
    * GopherRepSpec pins the kernel bit-identical to it; kept as the
    * executable spec of the semantics, not a production path (its
    * (id, n, gram) shuffle is pure waste for a per-document metric). */
  private[graft] def gopherRepetitionReference(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val text = col(s"`$textCol`")
    def r4(x: Column): Column =
      floor(x * lit(10000d) + lit(0.5d)) / lit(10000d)
    def frac(num: Column, den: Column): Column =
      r4(coalesce(num, lit(0L)).cast(DoubleType) /
        greatest(den, lit(1L)).cast(DoubleType))
    val base = df.select(col(s"`$idCol`").as("id"), text.as("__t"),
      length(text).cast("long").as("__len"),
      graft.functions.TokenArray.asciiTokens(text).as("__ws"))
    // ---- line/paragraph grain: ONE explode with a grain tag --------------
    val parts = base.select(col("id"), explode(array(
        struct(lit("line").as("g"), split(col("__t"), "\n").as("ps")),
        struct(lit("para").as("g"), split(col("__t"), "\n\n").as("ps"))))
        .as("e"))
      .select(col("id"), col("e.g").as("g"), explode(col("e.ps")).as("p"))
      .filter(col("p") =!= "")
    val partAgg = parts.groupBy("id", "g", "p")
      .agg(count(lit(1)).as("c"))
      .groupBy("id", "g")
      .agg(sum("c").as("n"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup"),
        sum(col("c") * length(col("p"))).as("chars"),
        coalesce(sum(when(col("c") > 1, col("c") * length(col("p")))),
          lit(0L)).as("dupchars"))
    def grain(g: String, pfx: String) = partAgg.filter(col("g") === g)
      .select(col("id"), col("n").as(s"n_${pfx}s"),
        frac(col("dup"), col("n")).as(s"dup_${pfx}_frac"),
        frac(col("dupchars"), col("chars")).as(s"dup_${pfx}_char_frac"))
    // ---- n-gram grain: all n in 2..10 built in-row, exploded ONCE --------
    val gramRows = base.select(col("id"), col("__len"),
        explode(flatten(transform(sequence(lit(2), lit(10)), n =>
          when(size(col("__ws")) >= n,
            transform(sequence(lit(1), size(col("__ws")) - n + 1), i =>
              struct(n.cast("int").as("n"),
                array_join(slice(col("__ws"), i, n), " ").as("gram"))))
            .otherwise(array())))).as("e"))
      .select(col("id"), col("__len"), col("e.n").as("n"),
        col("e.gram").as("gram"))
    val gramCnt = gramRows.groupBy("id", "n", "gram")
      .agg(count(lit(1)).as("c"), max("__len").as("__len"))
    val gramAgg = gramCnt.groupBy("id", "n")
      .agg(max("__len").as("__len"),
        coalesce(sum(when(col("c") > 1, col("c") * length(col("gram")))),
          lit(0L)).as("dupchars"),
        // top = (count desc, gram asc): min over (-c, gram) with the
        // char mass carried as payload ((-c, gram) is unique per group,
        // so the payload never decides the min)
        min(struct((-col("c")).as("nc"), col("gram").as("g"),
          (col("c") * length(col("gram"))).as("topchars"))).as("top"))
    def gramCol(n: Int, top: Boolean) = {
      val one = gramAgg.filter(col("n") === n)
      val name = if (top) s"top_${n}gram_char_frac"
        else s"dup_${n}gram_char_frac"
      val num = if (top) col("top.topchars") else col("dupchars")
      one.select(col("id"), frac(num, col("__len")).as(name))
    }
    val withAll = (Seq(grain("line", "line"), grain("para", "para")) ++
      (2 to 4).map(gramCol(_, top = true)) ++
      (5 to 10).map(gramCol(_, top = false)))
      .foldLeft(base.select(col("id"))) { (acc, f) =>
        acc.join(f, Seq("id"), "left_outer")
      }
    val filled = GopherRepCuts.foldLeft(
        withAll.na.fill(0L, Seq("n_lines", "n_paras"))) { (acc, cut) =>
      acc.withColumn(cut._1, coalesce(col(cut._1), lit(0.0)))
    }
    filled.withColumn("rep_keep",
      GopherRepCuts.map { case (c, thr) => col(c) <= thr }.reduce(_ && _))
  }
}
