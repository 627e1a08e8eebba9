package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — learns the
  * merge table that [[VocabTokenCounter]]-style tokenizers consume.
  * The canonical tokenizer-training job over a corpus.
  *
  * The weighted formulation: the corpus is reduced ONCE to (distinct
  * word, count) — corpus size matters only in that first aggregation;
  * every round then works on the vocabulary-sized frame. Each round:
  *  1. adjacent-piece pair counts — one explode + partially-aggregated
  *     groupBy over the vocab frame, counts weighted by word frequency;
  *  2. the argmax merge on the driver (count desc, then (left, right)
  *     lexicographic — deterministic ties), a one-row collect;
  *  3. the merge applied map-side: a greedy LEFT-TO-RIGHT fold over
  *     each word's piece array (the standard BPE application — a
  *     just-merged piece cannot chain into the same merge), then the
  *     state checkpoint-rotated so round lineage never stacks.
  *
  * Rounds are inherently sequential (round r's counts depend on merge
  * r−1) — like the connected-components loop, the driver holds only
  * O(1) per round (the argmax row), never data.
  *
  * Training stops early when no pair reaches `minFreq` (standard). */
object BpeTrainer {

  /** The engine's canonical word stream (the t3/t14 splitter contract,
    * native one-pass form — TokenArraySpec pins ≡ the regex split). */
  private[graft] def words(textCol: Column): Column =
    graft.functions.TokenArray(textCol)

  /** One greedy left-to-right application of merge (l, r): fold pieces,
    * replacing a trailing `l` by `lr` when `r` arrives. */
  private[text] def applyMerge(pieces: Column, l: String, r: String): Column =
    aggregate(pieces, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learned merges in order: (rank starting at 1, left, right,
    * weighted adjacent-pair frequency at merge time). */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, "need at least one merge")
    val sc = df.sparkSession.sparkContext
    val rot = new graft.ops.CheckpointRotation(sc)
    var state = rot.rotate(df
      .select(explode(words(col(s"`$textCol`"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("n"),
        transform(sequence(lit(1), length(col("w"))),
          i => substr(col("w"), i, lit(1))).as("p")))
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var continue = true
    while (continue && rank <= numMerges) {
      val best = state
        .filter(size(col("p")) >= 2)
        .select(col("n"), explode(transform(sequence(lit(1), size(col("p")) - 1),
          i => struct(element_at(col("p"), i).as("l"),
            element_at(col("p"), i + 1).as("r")))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("n").as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      best.headOption.filter(_.getAs[Long]("c") >= minFreq) match {
        case Some(row) =>
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          out += ((rank, l, r, c))
          state = rot.rotate(state.select(col("n"),
            applyMerge(col("p"), l, r).as("p")))
          rank += 1
        case None => continue = false
      }
    }
    rot.release()
    out.result()
  }
}

/** [[TokenCounter]] over a LEARNED merge table — the consumer side of
  * [[BpeTrainer]], closing the train → tokenize loop: each word starts
  * as characters and the merges apply once each in rank order (the
  * simple sequential variant — identical to training-time tokenization
  * on the training corpus; a priority-queue inference can differ on
  * novel words where a late merge re-creates an early merge's
  * adjacency, which this engine trades for cross-engine determinism).
  *
  * The hot path is the native [[graft.functions.BpeMergeCounts]] — one
  * heap-driven pass per word that only pays for merges whose sides the
  * word contains, so a 30k-merge production vocabulary costs about the
  * same as the gate's 12. The Column-expression fold
  * ([[referenceCount]], |merges| interpreted array folds per word) is
  * retained as the reference form: BpeSpec pins native ≡ fold
  * bit-identical, and the t25 oracle replays the fold's semantics as
  * unrolled CTEs. */
final case class BpeTokenCounter(merges: Seq[(String, String)]) extends TokenCounter {
  import org.apache.spark.sql.functions._

  private[text] def piecesOf(word: Column): Column = {
    val chars = transform(sequence(lit(1), length(word)),
      i => substr(word, i, lit(1)))
    merges.foldLeft(chars) { case (p, (l, r)) =>
      BpeTrainer.applyMerge(p, l, r)
    }
  }

  /** Per-word piece counts of a WORD ARRAY column, native pass. */
  def pieceCounts(wordsArr: Column): Column =
    graft.functions.BpeMergeCounts(wordsArr, merges)

  def count(text: Column): Column = {
    val toks = graft.functions.TokenArray(text)
    coalesce(aggregate(pieceCounts(toks), lit(0L), (acc, c) => acc + c),
      lit(0L))
  }

  /** The interpreted reference form of [[count]] (spec anchor only —
    * O(|merges|) folds per word, a cliff at real vocab sizes). */
  def referenceCount(text: Column): Column = {
    val toks = filter(split(lower(text), "[^a-zà-ÿ0-9]+"), w => w =!= "")
    coalesce(aggregate(toks, lit(0L),
      (acc, w) => acc + size(piecesOf(w)).cast("long")), lit(0L))
  }
}
