package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Script-aware text plane for multilingual corpora (north-star
  * mandate: at 100 TB web scale the Latin-1-only tokenizer contract —
  * `[^a-zà-ÿ0-9]+` everywhere — makes CJK/Cyrillic/Arabic/Greek text
  * yield ZERO tokens, so whole languages become invisible to dedup,
  * score ≈ 0 on every quality gate, and carry meaningless token
  * weights in packing/sampling. The reference corpus is Latin-only so
  * §2 parity never needed this; a real crawl does).
  *
  * Design: Unicode SCRIPT classes, not code-page ranges.
  *  - Latin/Cyrillic/Arabic/Greek text has word boundaries → letter
  *    runs are tokens, exactly the Latin convention extended by
  *    `\p{L}`.
  *  - CJK (Han + Hiragana + Katakana) has NO spaces → each character
  *    is one token (the standard unit for CJK dedup/counting; shingling
  *    over char tokens then yields character n-grams, the CJK
  *    near-dup convention).
  * Both engines agree on every construct here: Java regex script
  * classes (`\p{IsHan}`) mirror RE2's (`\p{Han}`), `\p{L}`/`\p{N}`
  * are shared, and `lower` applies the same simple case mappings on
  * the scripts involved — every operator below is DuckDB-oracled
  * (t26/d16).
  *
  * All pure Column expressions: map-side, codegen'd, stream-safe. The
  * default Latin plane ([[TextAnalysis]], [[graft.dedup.Dedup.words]])
  * is UNCHANGED — its oracles pin the historic semantics; this module
  * is the opt-in multilingual twin of each operator. */
object ScriptText {

  /** The spaceless-script character class (Java regex form). */
  val CjkClassJava = "\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}"
  /** Same class, RE2 form (DuckDB oracles). */
  val CjkClassRe2 = "\\p{Han}\\p{Hiragana}\\p{Katakana}"

  /** CJK characters spaced out so the letter-run splitter sees each as
    * its own token. */
  private def spaced(c: Column): Column =
    regexp_replace(c, s"([$CjkClassJava])", " $1 ")

  /** Script-aware tokens: lowercased letter/digit runs over ALL
    * scripts, with CJK characters as single-character tokens. The
    * multilingual extension of the `[^a-zà-ÿ0-9]+` contract. Native
    * one-pass kernel ([[graft.functions.ScriptTokens]]); the regex
    * formulation it is pinned identical to (ScriptTextSpec) stays
    * below as [[tokensRegex]]. */
  def tokens(c: Column): Column = graft.functions.ScriptTokens(c)

  /** The builtin-regex formulation of [[tokens]] — two slow-path regex
    * passes per call, so spec-only: the ground truth the native kernel
    * is property-pinned against. */
  private[graft] def tokensRegex(c: Column): Column =
    filter(split(lower(spaced(c)), "[^\\p{L}\\p{N}]+"), w => w =!= "")

  def tokenCount(c: String): Column =
    size(tokens(col(s"`$c`"))).cast(LongType)

  /** Code-point census of a script class (regex-definable, so the
    * DuckDB oracle replays it verbatim). Spec-only ground truth for
    * the [[graft.functions.ScriptStats]] kernel. */
  private[graft] def census(c: Column, clazz: String): Column =
    length(regexp_replace(c, s"[^$clazz]", "")).cast(LongType)

  /** The fused one-pass census ([[graft.functions.ScriptStats]]) every
    * script-plane operator reads from; Catalyst canonicalization plus
    * whole-stage subexpression elimination collapse the repeated
    * element_at reads to ONE kernel evaluation per row. */
  private def stats(c: Column): Column = graft.functions.ScriptStats(c)
  private def stat(c: Column, idx: Int): Column =
    element_at(stats(c), idx)

  // script classes, not letter intersections: RE2 (the oracle engine)
  // has no character-class intersection syntax, and Script=Latin is
  // letters + a handful of letter-marks anyway — identical under both
  // engines' Unicode tables on real text
  def nLatin(c: Column): Column = stat(c, graft.functions.ScriptStats.Latin)
  def nCjk(c: Column): Column = stat(c, graft.functions.ScriptStats.Cjk)
  def nCyrillic(c: Column): Column = stat(c, graft.functions.ScriptStats.Cyrillic)
  def nArabic(c: Column): Column = stat(c, graft.functions.ScriptStats.Arabic)
  def nGreek(c: Column): Column = stat(c, graft.functions.ScriptStats.Greek)
  def nLetters(c: Column): Column = stat(c, graft.functions.ScriptStats.Letters)

  /** Dominant-script vote: the script with the most letter code
    * points; 'none' when the text has no letters. Deterministic
    * tie-break by script name (the t1 langId convention). The argmax
    * runs INSIDE the [[graft.functions.ScriptStats]] kernel (index
    * element) — the Column-fold form (nested whens over 10 censuses)
    * inlines at every use site after projection collapse, and the
    * fused w15 gate stage blew past the 64 KB codegen method limit
    * that way. Here the decode is one element_at + 5 literal
    * branches. */
  def dominantScript(c: Column): Column = {
    val idx = stat(c, graft.functions.ScriptStats.ScriptIdx)
    ScriptLm.Scripts.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (None, (s, i)) => Some(when(idx === i.toLong, lit(s)))
      case (Some(e), (s, i)) => Some(e.when(idx === i.toLong, lit(s)))
    }.get.otherwise(lit("none"))
  }

  /** The Column-fold formulation of [[dominantScript]] over the
    * regex censuses — spec-only ground truth for the kernel argmax. */
  private[graft] def dominantScriptRegex(c: Column): Column = {
    val counts = Seq(
      ("arabic", census(c, "\\p{IsArabic}")), ("cjk", census(c, CjkClassJava)),
      ("cyrillic", census(c, "\\p{IsCyrillic}")),
      ("greek", census(c, "\\p{IsGreek}")),
      ("latin", census(c, "\\p{IsLatin}")))
    var name: Column = lit(counts.head._1)
    var cnt: Column = counts.head._2
    counts.tail.foreach { case (n2, c2) =>
      name = when(c2 > cnt, lit(n2)).otherwise(name)
      cnt = when(c2 > cnt, c2).otherwise(cnt)
    }
    when(cnt > 0L, name).otherwise(lit("none"))
  }

  /** Language ID with a script gate in front of the Latin marker vote:
    * a text whose letters are >30% CJK/Cyrillic/Arabic/Greek is
    * classified by script (zh/ru/ar/el — the script's dominant
    * language standing in for a per-language model, the same "tiny
    * deterministic heuristic" contract as [[TextAnalysis.markers]]);
    * otherwise the existing marker vote decides among the five Latin
    * languages. Integer arithmetic only (cnt·10 > letters·3), so the
    * oracle replays it exactly. */
  def langId(c: String): Column = {
    val t = col(s"`$c`")
    val letters = nLetters(t)
    def gate(n: Column) = n * 10 > letters * 3
    when(letters === 0L, TextAnalysis.langId(c))
      .when(gate(nCjk(t)), "zh")
      .when(gate(nCyrillic(t)), "ru")
      .when(gate(nArabic(t)), "ar")
      .when(gate(nGreek(t)), "el")
      .otherwise(TextAnalysis.langId(c))
  }

  /** Script-aware quality score: [[TextAnalysis.qualityScore]]'s exact
    * formula with alpha = ALL letters (`\p{L}`) and the script-aware
    * token count — so a Chinese or Russian document scores on its
    * merits instead of ≈ 0. The word-length band [3,10] naturally
    * passes CJK (char tokens, ~1 letter each → the 0.5 branch) without
    * special-casing; length/punct/digit terms are script-neutral.
    * Cross-engine: same construction as the t2 oracle with the two
    * substituted inputs. */
  def qualityScore(c: String): Column = {
    import graft.functions.ScriptStats
    val t = col(s"`$c`")
    val len = stat(t, ScriptStats.Len).cast("double")
    val alpha = stat(t, ScriptStats.Letters).cast("double")
    val digits = stat(t, ScriptStats.Digits).cast("double")
    val punct = stat(t, ScriptStats.Punct).cast("double")
    val nTok = stat(t, ScriptStats.NTokens).cast("double")
    val lenScore = when(len >= 200 && len <= 20000, 1.0)
      .when(len < 200, len / 200.0)
      .otherwise(lit(20000.0) / len)
    val alphaScore = when(len > 0, alpha / len).otherwise(0.0)
    val punctPenalty = when(len > 0, punct / len).otherwise(1.0)
    val digitPenalty = when(len > 0, digits / len).otherwise(1.0)
    val wordLenScore = when(nTok > 0,
      when(alpha / nTok >= 3 && alpha / nTok <= 10, 1.0).otherwise(0.5))
      .otherwise(0.0)
    (lenScore * 0.3 + alphaScore * 0.3 + wordLenScore * 0.2 +
      (lit(1.0) - least(punctPenalty * 5, lit(1.0))) * 0.1 +
      (lit(1.0) - least(digitPenalty * 5, lit(1.0))) * 0.1)
  }

  /** [[qualityScore]] in the engine's exact 10⁻⁴ fixed point. */
  def qualityE4(c: String): Column =
    floor(qualityScore(c) * 10000d + 0.5d).cast(LongType)

  /** (id, shingle) pairs over SCRIPT-AWARE tokens — for CJK text the
    * n-grams are character n-grams (the standard CJK near-dup unit),
    * for everything else word n-grams; one corpus, one operator, every
    * script visible to the whole [[graft.dedup.Dedup]] pair machinery
    * (jaccard/containment/MinHash/LSH all consume this frame
    * unchanged). Same shape as [[graft.dedup.Dedup.wordShingles]]:
    * per-row distinct before the explode, no extra shuffle. */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    // fused native gram kernel — see Dedup.wordShingles (r13): the
    // higher-order transform/slice chain was CodegenFallback on the
    // corpus scan; WordShingles is the flat loop, spec-pinned
    // bit-identical
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__ws"))
      .select(col("id"),
        explode(graft.functions.WordShingles(col("__ws"), n)).as("shingle"))
}
