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
      window: Int = 64, step: Int = 48): DataFrame = {
    require(window >= 1 && step >= 1, s"window/step must be >= 1")
    val toks = tokens(col(s"`$textCol`"))
    df.select(col(s"`$idCol`"), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(s"`$idCol`"),
        explode(sequence(lit(0), size(col("__toks")) - 1, lit(step)))
          .as("token_start"),
        col("__toks"))
      .select(col(s"`$idCol`"), col("token_start"),
        size(slice(col("__toks"), col("token_start") + 1, lit(window)))
          .as("n_tokens"),
        concat_ws(" ", slice(col("__toks"), col("token_start") + 1, lit(window)))
          .as("chunk"))
  }
}
