package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable token accounting for the corpus operators (chunking,
  * packing, domain mixing, token stats). The engine default is
  * whitespace-word counting — cheap, engine-portable, and what the
  * t3/t7/t9/s7 oracles pin. A real LLM pipeline counts SUBWORD tokens;
  * [[VocabTokenCounter]] provides a deterministic greedy longest-match
  * tokenizer over a fixed vocabulary, implemented as pure Column
  * expressions (higher-order functions, no UDF) so any consumer taking
  * a token-count column — [[graft.sim.DomainMix.tokenShares]]'s
  * `tokenCol`, [[Packing.binSegments]]'s `nTokensCol` — can swap it in
  * without touching the operator. */
trait TokenCounter extends Serializable {
  /** Token count of a text column (Long). */
  def count(text: Column): Column
}

/** Default: lowercased word count on the `[^a-zà-ÿ0-9]+` splitter —
  * identical to [[TextAnalysis.tokenCount]] (the t3 contract). */
object WhitespaceTokenCounter extends TokenCounter {
  def count(text: Column): Column =
    size(graft.functions.TokenArray(text)).cast("long")
}

/** Deterministic subword proxy for a BPE/WordPiece tokenizer: greedy
  * LONGEST-PREFIX match over a fixed multi-character piece list; a
  * position no piece matches consumes one character as one piece (the
  * single-char fallback every real vocab has). Greedy longest-match is
  * exactly WordPiece's inference rule, so piece counts scale like a
  * real tokenizer's (common affixes compress, rare strings fall back
  * to characters) while staying bit-reproducible in any engine — the
  * t14 oracle replays the same walk as a recursive CTE. */
object VocabTokenCounter extends TokenCounter {

  /** Fixed wordpiece list (multi-char pieces only — single characters
    * are the implicit fallback). Match priority is longest-first, ties
    * alphabetical; [[ordered]] is the canonical order both the Column
    * walk and the SQL mirror use. */
  val Vocab: Seq[String] = Seq(
    "tion", "ment", "able", "ight", "ound",
    "ing", "ent", "ers", "est", "and", "the", "ere",
    "er", "ed", "ly", "es", "re", "un", "in", "on",
    "at", "en", "an", "th", "he", "nd", "ou", "st", "or", "ar")

  private[graft] val ordered: Seq[String] = Vocab.sortBy(p => (-p.length, p))

  /** Longest piece matching at 1-based `pos` of `word`, else 1. */
  private def matchLenAt(word: Column, pos: Column): Column =
    ordered.foldRight(lit(1): Column) { (p, els) =>
      when(substr(word, pos, lit(p.length)) === p, lit(p.length)).otherwise(els)
    }

  /** Piece count of ONE word: the greedy walk as an `aggregate` over
    * at-most-length(word) steps, carrying (next position, pieces so
    * far). Steps after the walk passes the end are no-ops, so the
    * fixed-length iteration is exact. */
  private[graft] def piecesOf(word: Column): Column =
    aggregate(
      sequence(lit(1), greatest(length(word), lit(1))),
      struct(lit(1).as("pos"), lit(0L).as("cnt")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val cnt = acc.getField("cnt")
        val active = pos <= length(word)
        val m = matchLenAt(word, pos)
        struct(
          when(active, pos + m).otherwise(pos).as("pos"),
          when(active, cnt + 1).otherwise(cnt).as("cnt"))
      },
      acc => acc.getField("cnt"))

  def count(text: Column): Column = {
    val toks = graft.functions.TokenArray(text)
    // the walk itself runs in the native PieceCounts expression (byte
    // loop, codegen) — the interpreted HOF walk costs ~10µs/word; the
    // Column form [[piecesOf]] stays as the semantic reference
    // (TokenCounterSpec pins native ≡ Column on adversarial words)
    coalesce(aggregate(graft.functions.PieceCounts(toks),
      lit(0L), (acc, x) => acc + x), lit(0L))
  }

  /** The SQL step expression of the same walk (`w`/`pos` free
    * variables), shared with the t14 oracle so the match order cannot
    * drift between engines. */
  def sqlStepCase: String =
    ordered.map(p =>
      s"WHEN substr(w, pos, ${p.length}) = '$p' THEN ${p.length}")
      .mkString("CASE ", " ", " ELSE 1 END")
}

/** Script-aware token counting ([[ScriptText.tokens]]): CJK characters
  * count one each, all other scripts count letter/digit runs — the
  * multilingual twin of [[WhitespaceTokenCounter]], pluggable into
  * every `TokenCounter` consumer (chunking, packing, domain mixing)
  * so token budgets stop reading 0 for non-Latin documents. */
object ScriptTokenCounter extends TokenCounter {
  def count(text: Column): Column =
    size(ScriptText.tokens(text)).cast("long")
}
