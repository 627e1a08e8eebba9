package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for LLM training pipelines: split each document
  * into overlapping token-window chunks (the standard pre-tokenization
  * step before embedding or packing). Pure codegen'd Columns — one
  * projection + one explode, no shuffle, no UDF — so the operator is
  * map-side only and scales linearly with corpus bytes at any cluster
  * width.
  */
object Chunking {

  /** Whitespace tokens (the repo's tokenizer convention,
    * [[TextAnalysis]]): non-space runs, no empty tokens. */
  def tokens(text: Column): Column = regexp_extract_all(text, lit("\\S+"), lit(0))

  /** One row per (doc, chunk): windows of `window` tokens starting
    * every `step` tokens (overlap = window − step). Chunks are
    * addressed by `token_start` (0-based offset of the chunk's first
    * token); the final chunks truncate at the document tail. Empty
    * documents produce no chunks. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 64, step: Int = 48,
      keep: Seq[String] = Nil,
      tokenizer: Column => Column = tokens): DataFrame = {
    require(window >= 1 && step >= 1, s"window/step must be >= 1")
    // pluggable tokenizer: the default whitespace grain, or a
    // script-aware one ([[ScriptText.tokens]]) so a spaceless-script
    // document chunks at its real token grain instead of arriving as
    // a handful of giant non-space runs (the l7 pipeline)
    val toks = tokenizer(col(s"`$textCol`"))
    // `keep` columns ride along unchanged — a composed STREAM cannot
    // join chunks back to their source frame (stream-stream joins),
    // so shard keys like `lang` must flow through the explode
    val kept = keep.map(k => col(s"`$k`"))
    df.select(col(s"`$idCol`") +: toks.as("__toks") +: kept: _*)
      .filter(size(col("__toks")) > 0)
      .select(col(s"`$idCol`") +:
        explode(sequence(lit(0), size(col("__toks")) - 1, lit(step)))
          .as("token_start") +: col("__toks") +: kept: _*)
      .select(col(s"`$idCol`") +: col("token_start") +:
        size(slice(col("__toks"), col("token_start") + 1, lit(window)))
          .as("n_tokens") +:
        concat_ws(" ", slice(col("__toks"), col("token_start") + 1, lit(window)))
          .as("chunk") +: kept: _*)
  }

  /** Subword-grain chunking: windows of `window` SUBWORD PIECES starting
    * every `step` pieces, with piece counts from the deterministic
    * [[VocabTokenCounter]] greedy walk — the chunk grain a real LLM
    * pipeline uses (sequence budgets are token budgets, not word
    * budgets). A chunk is addressed by `piece_start` (0-based in the
    * document's piece stream) and maps back to the COVERING word span
    * (`word_start`, `n_words`, and the joined `chunk` text) — pieces
    * never split words, so the span is the smallest word range whose
    * pieces include the window.
    *
    * Shape: pure map-side Columns + one explode, no shuffle, no UDF —
    * t7's scale shape at piece grain, stateless on streams. The
    * per-word piece-prefix array costs O(words²) HOF steps per document
    * (prefix via slice-and-sum; Spark HOFs have no scan primitive), so
    * web-scale docs (≤ ~10k words) are cheap but book-length documents
    * should be pre-split (the same ≤10^6-token contract as packing). */
  def pieceChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 16, step: Int = 12): DataFrame = {
    require(window >= 1 && step >= 1, s"window/step must be >= 1")
    val toks = graft.functions.TokenArray(col(s"`$textCol`"))
    // __wordof inverts the per-word piece counts into a piece → covering
    // word (1-based) index built ONCE per doc, so each exploded window
    // resolves its word span with two O(1) element_at lookups. The
    // first formulation counted a filter over the cumulative-piece
    // array per window — O(words) of interpreted HOF lambda per window,
    // O(words²) per doc: 38s warm for 50k sf1 docs, vs ~1s for this.
    // Every word is >= 1 piece, so the index is total and well-defined.
    val withArrays = df.select(col(s"`$idCol`"), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__wordof",
        flatten(transform(graft.functions.PieceCounts(col("__toks")),
          (c, i) => array_repeat(i + 1, c.cast("int")))))
      .withColumn("__p", size(col("__wordof")).cast("long"))
    val exploded = withArrays
      .select(col(s"`$idCol`"), col("__toks"), col("__wordof"), col("__p"),
        explode(sequence(lit(0L), col("__p") - 1, lit(step.toLong)))
          .as("piece_start"))
    val nPieces = least(lit(window.toLong), col("__p") - col("piece_start"))
    val lastPiece = col("piece_start") + nPieces - 1
    val wsI = element_at(col("__wordof"), (col("piece_start") + 1).cast("int"))
    val weI = element_at(col("__wordof"), (lastPiece + 1).cast("int"))
    exploded.select(col(s"`$idCol`"), col("piece_start"),
      nPieces.as("n_pieces"),
      (wsI - 1).cast("long").as("word_start"),
      (weI - wsI + 1).cast("long").as("n_words"),
      concat_ws(" ", slice(col("__toks"), wsI, weI - wsI + 1)).as("chunk"))
  }
}
