package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: concatenate the chunk
  * stream in a fixed deterministic order and cut it into bins of
  * `seqLen` tokens — the "greedy concat then split" packing that
  * maximizes token utilization (each training sequence is full except
  * the last). A chunk is assigned to the bin where it STARTS
  * (`bin_id`), at `bin_offset` tokens into it; a chunk may straddle
  * into the next bin, which the packer accepts by construction.
  *
  * Scale shape: the running token count is [[graft.ops.Scale.prefixSums]]
  * — range-partition on the order key, per-partition parallel windows,
  * an O(#partitions) broadcast offset frame — NOT a global
  * single-task window. All arithmetic is exact integer (the bin split
  * uses `before − before % seqLen`, exact in double below 2^53), so
  * the assignment is deterministic and engine-reproducible.
  */
object Packing {

  /** Pack the output of [[Chunking.tokenChunks]] (or any
    * (id, token_start, n_tokens) stream) into `seqLen`-token bins in
    * (id, token_start) order. `token_start` must stay below 10^6 so
    * the composite order key id·10^6 + token_start is collision-free
    * (documents beyond 10^6 tokens should be chunked per shard). */
  def packChunks(chunks: DataFrame, idCol: String, startCol: String,
      nTokCol: String, seqLen: Int = 512): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val ordered = chunks
      .withColumn("__ord",
        col(s"`$idCol`").cast("long") * 1000000L + col(s"`$startCol`"))
      .withColumn("__n", col(s"`$nTokCol`").cast("long"))
    val (cum, _) = graft.ops.Scale.prefixSums(ordered, "__ord", Seq("__n"))
    val before = col("__cum___n") - col("__n")
    val binId = ((before - pmod(before, lit(seqLen.toLong))) / seqLen)
      .cast("long")
    cum.select(col(s"`$idCol`"), col(s"`$startCol`"), col(s"`$nTokCol`"),
      binId.as("bin_id"),
      pmod(before, lit(seqLen.toLong)).as("bin_offset"))
  }
}
