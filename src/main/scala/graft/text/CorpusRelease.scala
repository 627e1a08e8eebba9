package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corpus RELEASE sink — the last step of the crawl→corpus
  * pipeline: write the curated/packed corpus in the layout a training
  * job actually consumes, deterministically.
  *
  *  - Hive-partitioned by release dimensions (default split/lang — the
  *    t16 assignment and the language column), so a trainer reads one
  *    directory per (split, language) and partition PRUNING serves
  *    "train only on en-train" without scanning the rest.
  *  - Files size-bounded via `maxRecordsPerFile` — shard-sized outputs
  *    instead of one giant file per partition; at 100 TB the writer
  *    task count (one per shuffle partition × bounded file splits)
  *    keeps shards in the low-GB range a data loader streams well.
  *  - Rows sorted within files by the pack order (default bin_id) so
  *    consecutive training sequences are physically contiguous — a
  *    sequential read replays the t9/t10 packing without a shuffle on
  *    the trainer side.
  *
  * The reference has no release step (it evaluates in place); this is
  * the "corpus as an artifact" face the 100 TB mandate needs.
  */
object CorpusRelease {

  /** Write `corpus` under `path` and return the release manifest (one
    * row per partition directory: row count plus any requested summed
    * columns, e.g. token counts) — the sidecar a release consumer
    * checks before training. The manifest is computed from the written
    * files, not the input frame, so it certifies what is actually on
    * disk. */
  def write(corpus: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("split", "lang"),
      sortCols: Seq[String] = Seq("bin_id"),
      sumCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    require(partitionCols.nonEmpty, "a release needs partition dimensions")
    val orderCols = (partitionCols ++ sortCols).map(c => col(s"`$c`"))
    corpus
      // RANGE partition on (dims, pack order), with an explicit count:
      // a hash repartition on the dims alone would leave only
      // #distinct(dims) writer tasks active (≈4 for split×lang — a
      // single-digit-parallelism write at 100 TB), while the range
      // layout spreads each dimension's rows over many tasks that each
      // still write into only one or two directories (contiguous
      // ranges), keeping both the writer parallelism and the
      // few-files-per-task property. Explicit count for the same
      // reason as Scale.prefixSums: REPARTITION_BY_COL may be
      // AQE-coalesced to one partition on small byte estimates.
      .repartitionByRange(
        corpus.sparkSession.sessionState.conf.numShufflePartitions,
        orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    manifest(corpus.sparkSession, path, partitionCols, sumCols)
  }

  /** APPEND a new dump to an existing release layout — the incremental
    * form of [[write]], closing the d13/d17/s10 incremental loop at
    * the release sink: only the dump's own (split, lang) partitions
    * are touched (new shard files appended into their directories;
    * every other partition's files are left byte-identical on disk —
    * at 100 TB an incremental dump must never rewrite the corpus), and
    * the returned manifest delta is computed from DISK for exactly the
    * touched partitions via a partition-PRUNED read (the scan never
    * visits an untouched directory). Fold the delta into the stored
    * release manifest with [[foldManifest]]; l6's [[releaseDiff]] is
    * the content-grain audit of the same append.
    *
    * Same determinism contract as [[write]]: range layout on
    * (dims, pack order), sorted shards, size-bounded files — so within
    * the new shards the pack-order contiguity holds exactly as in a
    * full release (SinksSpec pins incremental ≡ full re-release on the
    * row multiset and the folded manifest). */
  def appendDump(dump: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("split", "lang"),
      sortCols: Seq[String] = Seq("bin_id"),
      sumCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    require(partitionCols.nonEmpty, "a release needs partition dimensions")
    val orderCols = (partitionCols ++ sortCols).map(c => col(s"`$c`"))
    dump
      .repartitionByRange(
        dump.sparkSession.sessionState.conf.numShufflePartitions,
        orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    // fresh per-partition totals for ONLY the touched partitions:
    // touched-dimension tuples are control-plane sized by construction
    // (distinct partition values, not documents), and the disjunction
    // of equality conjuncts prunes the read down to their directories
    val touched = dump.select(partitionCols.map(c => col(s"`$c`")): _*)
      .distinct().collect()
    val pred = touched.map { row =>
      partitionCols.zipWithIndex.map { case (c, i) =>
        if (row.isNullAt(i)) col(s"`$c`").isNull
        else col(s"`$c`") === lit(row.get(i))
      }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val spark = dump.sparkSession
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(s"`$c`")).as(s"sum_$c"))
    spark.read.parquet(path)
      .filter(pred)
      .groupBy(partitionCols.map(c => col(s"`$c`")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(partitionCols.map(c => col(s"`$c`")): _*)
  }

  /** Fold an [[appendDump]] manifest delta into the stored release
    * manifest: touched partitions take their fresh on-disk totals,
    * untouched rows carry over — exact incremental maintenance
    * (control-plane frames, one anti-join + union). Null-SAFE keys:
    * [[appendDump]] supports null partition values (its touched
    * predicate does), so the anti-join must too — a plain column
    * equality would leave the stale (dim, null) row beside the fresh
    * one. */
  def foldManifest(stored: DataFrame, delta: DataFrame,
      partitionCols: Seq[String] = Seq("split", "lang")): DataFrame = {
    val keys = delta.select(partitionCols.map(c => col(s"`$c`")): _*)
    val cond = partitionCols
      .map(c => stored(c) <=> keys(c))
      .reduce(_ && _)
    stored.join(keys, cond, "left_anti")
      .unionByName(delta)
      .orderBy(partitionCols.map(c => col(s"`$c`")): _*)
  }

  /** Release-to-release diff — the audit step of the incremental-dump
    * story (d13 probes new content against the corpus, d17 folds its
    * components, s10 its PQ codes; this reports what a new RELEASE
    * actually changed): documents keyed by CONTENT (md5 of the text, so
    * re-crawled copies with new ids don't read as churn), classified
    * added / removed / retained, rolled up per `dimCol` with document
    * and token mass. One full-outer join of two distinct-hash frames +
    * one small agg — linear, shuffle on the 16-byte hash key, no text
    * ever joined.
    *
    * Within-release duplicate content collapses to one row per hash
    * (releases are deduped by contract; the collapse makes the diff
    * insensitive to residual copies), representative = min(dim) for
    * determinism. `tokensCol` must be precomputed (any integer token
    * count — the engine's [[TextAnalysis.tokenCount]] composes). */
  def releaseDiff(old: DataFrame, nw: DataFrame, textCol: String,
      dimCol: String, tokensCol: String): DataFrame = {
    def byHash(df: DataFrame) =
      df.groupBy(md5(col(s"`$textCol`")).as("__h"))
        .agg(min(col(s"`$dimCol`")).as(dimCol),
          min(col(s"`$tokensCol`")).as("__t"))
    // presence flags, NOT dim-column nullity: a hash whose dim value is
    // itself NULL must still classify by which side it appears on
    val o = byHash(old).withColumn("__po", lit(true))
    val n = byHash(nw).withColumn("__pn", lit(true))
    o.withColumnRenamed(dimCol, "__do").withColumnRenamed("__t", "__to")
      .join(n.withColumnRenamed(dimCol, "__dn").withColumnRenamed("__t", "__tn"),
        Seq("__h"), "full_outer")
      .select(
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .otherwise("retained").as("status"),
        when(col("__pn").isNotNull, col("__dn")).otherwise(col("__do"))
          .as(dimCol),
        when(col("__pn").isNotNull, col("__tn")).otherwise(col("__to"))
          .as("__t"))
      .groupBy("status", dimCol)
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("n_tokens"))
  }

  /** Manifest of an existing release: per partition directory, the row
    * count and the sums of `sumCols` — read back from disk. */
  def manifest(spark: SparkSession, path: String,
      partitionCols: Seq[String], sumCols: Seq[String] = Nil): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(s"`$c`")).as(s"sum_$c"))
    spark.read.parquet(path)
      .groupBy(partitionCols.map(c => col(s"`$c`")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(partitionCols.map(c => col(s"`$c`")): _*)
  }
}
