package graft.text

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row of the stateful packer: one chunk of `n` tokens starting
  * at document-token `start`, belonging to packing shard `shard`. */
private[text] final case class PackChunk(shard: String, id: Long, start: Long, n: Long)

/** Per-shard packer state: the running token offset plus the one OPEN
  * bin (only the last bin is ever incomplete) and its segment count —
  * O(1) state per shard regardless of stream length. */
private[text] final case class PackState(offset: Long, openBin: Long, openSegs: Long)

private[text] final case class PackSegment(shard: String, bin_id: Long, seq: Long,
    id: Long, token_start: Long, token_len: Long)

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

  /** Materialized training sequences: one row per (bin, contiguous
    * token span) — a chunk that straddles a bin boundary is SPLIT at
    * the boundary, so each bin's segments cover exactly `seqLen` tokens
    * (except the final bin) and a consumer can build fixed-length
    * training sequences without re-tokenizing. Output: (bin_id, seq,
    * id, token_start, token_len) where `seq` is the segment's 1-based
    * position in its bin and `token_start` indexes into the DOCUMENT's
    * token stream (the chunk's own start plus the split offset).
    *
    * Shape: the same prefix-sum spine as [[packChunks]], then pure
    * per-row arithmetic — a chunk spanning global tokens [b, b+n)
    * explodes into one row per bin in [⌊b/L⌋, ⌊(b+n−1)/L⌋], at most
    * 1 + n/L rows. The only addition is the `seq` ranking window,
    * partitioned by bin_id with ≤ seqLen rows per bin — thousands of
    * tiny groups, shuffle-parallel, no hot partition possible. */
  def binSegments(chunks: DataFrame, idCol: String, startCol: String,
      nTokCol: String, seqLen: Int = 512): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val L = lit(seqLen.toLong)
    val ordered = chunks
      .withColumn("__ord",
        col(s"`$idCol`").cast("long") * 1000000L + col(s"`$startCol`"))
      .withColumn("__n", col(s"`$nTokCol`").cast("long"))
      .filter(col("__n") > 0)
    val (cum, _) = graft.ops.Scale.prefixSums(ordered, "__ord", Seq("__n"))
    val before = col("__cum___n") - col("__n")
    val last = before + col("__n") - 1
    def div(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, L)) / L).cast("long")
    val spanned = cum
      .withColumn("__before", before)
      .withColumn("bin_id", explode(sequence(div(before), div(last))))
    val segStart = greatest(col("__before"), col("bin_id") * L)
    val segEnd = least(col("__before") + col("__n"), (col("bin_id") + 1) * L)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("bin_id").orderBy(col("__seg_start"))
    spanned
      .withColumn("__seg_start", segStart)
      .select(col("bin_id"),
        col(s"`$idCol`"),
        (col(s"`$startCol`").cast("long") + col("__seg_start") - col("__before"))
          .as("token_start"),
        (segEnd - col("__seg_start")).as("token_len"),
        col("__seg_start"))
      .withColumn("seq", row_number().over(win).cast("long"))
      .drop("__seg_start")
  }

  /** The per-shard fold of [[binSegments]]' arithmetic: walk the
    * group's chunks in (id, start) order from the carried offset,
    * emitting one segment per touched bin and threading the open bin's
    * segment count so `seq` numbering continues across invocations. */
  private def packGroup(seqLen: Long)(shard: String, rows: Iterator[PackChunk],
      state: GroupState[PackState]): Iterator[PackSegment] = {
    val st = state.getOption.getOrElse(PackState(0L, -1L, 0L))
    var offset = st.offset
    var openBin = st.openBin
    var openSegs = st.openSegs
    val out = scala.collection.mutable.ArrayBuffer.empty[PackSegment]
    // iterator order is not guaranteed: sort this invocation's chunks.
    // On a stream this materializes one micro-batch's shard (bounded by
    // trigger size); in batch mode it is the whole shard — callers
    // packing a full corpus in batch should prefer binSegments' prefix-
    // sum spine and use this operator as its streaming twin.
    rows.toArray.sortBy(c => (c.id, c.start)).foreach { c =>
      if (c.n > 0) {
        val before = offset
        var b = before / seqLen
        val bEnd = (before + c.n - 1) / seqLen
        while (b <= bEnd) {
          val segStart = math.max(before, b * seqLen)
          val segEnd = math.min(before + c.n, (b + 1) * seqLen)
          val seq = if (b == openBin) openSegs + 1 else 1L
          out += PackSegment(shard, b, seq, c.id,
            c.start + segStart - before, segEnd - segStart)
          openBin = b
          openSegs = seq
          b += 1
        }
        offset += c.n
      }
    }
    state.update(PackState(offset, openBin, openSegs))
    out.iterator
  }

  /** Streaming form of [[binSegments]], sharded: within each value of
    * `shardCol` (e.g. language, or a shard key sized to taste), chunks
    * are packed into `seqLen`-token bins by a RUNNING per-shard offset
    * carried in `flatMapGroupsWithState` — the last batch-only stage of
    * the corpus pipeline made incremental. Bin ids and `seq` numbering
    * are per shard; output matches [[binSegments]] run on each shard's
    * chunks independently (for a constant shard the two are identical,
    * which is the oracle pin).
    *
    * Ordering contract: chunks must arrive in (id, start) order WITHIN
    * each shard across micro-batches (each invocation sorts only its
    * own batch) — the natural order of an upstream chunker reading an
    * ordered document stream. In batch mode each shard is one
    * invocation, so the sort is global per shard and the contract holds
    * vacuously.
    *
    * Scale shape: state is O(1) per shard (offset + open-bin counter);
    * shards process in parallel across the cluster; no global order, no
    * global shuffle — a single total order over 100 TB is exactly the
    * bottleneck per-shard packing exists to avoid. */
  def streamingBinSegments(chunks: DataFrame, shardCol: String, idCol: String,
      startCol: String, nTokCol: String, seqLen: Int = 512): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    implicit val chunkEnc = Encoders.product[PackChunk]
    implicit val stateEnc = Encoders.product[PackState]
    implicit val segEnc = Encoders.product[PackSegment]
    chunks
      .select(col(s"`$shardCol`").cast("string").as("shard"),
        col(s"`$idCol`").cast("long").as("id"),
        col(s"`$startCol`").cast("long").as("start"),
        col(s"`$nTokCol`").cast("long").as("n"))
      .as[PackChunk]
      .groupByKey(_.shard)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        packGroup(seqLen.toLong))
      .select(col("shard").as(shardCol), col("bin_id"), col("seq"),
        col("id").as(idCol), col("token_start"), col("token_len"))
  }
}
