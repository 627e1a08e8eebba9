package graft.streaming

import graft.rules.{RuleSpec, ViolationScanner}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Streaming data-quality operators (SURVEY.md §7.1 item 11 — the
  * reference has no streaming; its dBoost "stream" is a Python
  * generator with no window/watermark semantics,
  * profiling/dBoost/dboost/utils/read.py:8-47. Structured Streaming is
  * the natural Spark extension).
  *
  * Three shapes:
  *  - windowed profile stats: event-time tumbling windows + watermark →
  *    append-mode aggregation (drift monitoring);
  *  - violation scan: stateless map-side rule evaluation — scalar rules
  *    compile to per-row predicates, so the SAME compiled rules run
  *    identically on batch and stream;
  *  - running per-key stats via mapGroupsWithState (incremental
  *    trained-threshold updates).
  *
  * Every transform here accepts batch OR streaming frames: the plan is
  * identical, only the sink differs.
  */
object StreamingQuality {

  /** Tumbling-window per-type stats with watermark. Works unchanged on
    * a batch frame (window() is an ordinary grouping expression).
    * Decimal-exact mean: deterministic under any partitioning AND
    * incremental-merge-safe for streaming partial aggregates. */
  def windowedStats(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val v = col(s"`$valueCol`").cast(DoubleType)
    withWm
      .groupBy(window(col(s"`$tsCol`"), windowLen).as("w"), col(s"`$typeCol`").as("key"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(v.isNull, 1L)), lit(0L)).as("n_null"),
        (sum(v.cast(DecimalType(30, 6))).cast(DoubleType) / count(v)).as("mean"),
        min(v).as("min"), max(v).as("max"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("key"), col("n"), col("n_null"), col("mean"), col("min"), col("max"))
  }

  /** Per-key session-window stats (gap-merged event-time sessions —
    * the Structured Streaming `session_window`, which is an ordinary
    * grouping expression in batch too). A session spans consecutive
    * events whose gaps stay under `gap`; its end is last event + gap.
    * State is bounded by the watermark in streaming mode. */
  def sessionStats(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val v = col(s"`$valueCol`").cast(DoubleType)
    withWm
      .groupBy(session_window(col(s"`$tsCol`"), gap).as("w"),
        col(s"`$keyCol`").as("key"))
      .agg(
        count(lit(1)).as("n"),
        (sum(v.cast(DecimalType(30, 6))).cast(DoubleType) / count(v)).as("mean"))
      .select(col("key"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n"), col("mean"))
  }

  /** Windowed drift alarm: per event-time window, the rate of values
    * outside a batch-trained [lo, hi] band and an alarm flag when the
    * rate exceeds `alarmRate` — the numeric-drift face of the
    * generate-on-history, monitor-on-stream loop (bands from
    * [[graft.rules.TrainedRules.percentileBands]], two collected
    * doubles of control plane). The per-row flag is stateless; the
    * windowed aggregate is watermark-bounded in streaming mode. */
  def driftAlarm(events: DataFrame, tsCol: String, valueCol: String,
      lo: Double, hi: Double, windowLen: String = "1 hour",
      alarmRate: Double = 0.15, watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val v = col(s"`$valueCol`").cast(DoubleType)
    withWm
      .groupBy(window(col(s"`$tsCol`"), windowLen).as("w"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(v < lo || v > hi, 1L)), lit(0L)).as("n_out"))
      .withColumn("out_rate",
        col("n_out").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("alarm", col("out_rate") > lit(alarmRate))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n"), col("n_out"), col("out_rate"), col("alarm"))
  }

  /** Stateless streaming violation scan: only scalar rules (relational
    * rules need bounded input — run those on completed windows
    * instead). The compiled predicate bundle is the batch scanner's. */
  def violations(stream: DataFrame, table: String, rules: Seq[RuleSpec],
      keyCol: String): DataFrame = {
    val relational = rules.filterNot(r =>
      ViolationScanner.scalarRule(r))
    require(relational.isEmpty,
      s"streaming scan is stateless; relational rules not allowed: ${relational.map(_.name)}")
    ViolationScanner.scan(stream, table, rules, keyCol)
  }

  /** Portable content key for payload-identity dedup: md5 over the
    * payload columns, each length-prefixed (`<len>:<value>` with -1
    * for NULL) so the encoding is injective — a bare separator join
    * would collide ("x|y"+"z" vs "x"+"y|z") and silently drop distinct
    * payloads. Values go through their decimal-string casts —
    * engine-reproducible, unlike JVM hashes. */
  def contentKey(cols: Column*): Column = {
    val enc = cols.map { c =>
      val s = c.cast("string")
      concat(coalesce(length(s), lit(-1)).cast("string"), lit(":"),
        coalesce(s, lit("")))
    }
    md5(concat(enc: _*))
  }

  /** Streaming exact dedup, first-seen-wins: the LLM-ingest shape
    * "drop payloads we already accepted". Keeps the first row seen per
    * content key; `dropDuplicatesWithinWatermark` lets the watermark
    * EVICT each key's state once it ages past the horizon — a plain
    * dropDuplicates(key) never evicts (the event-time column is not
    * part of the key), so its state grows with every distinct payload
    * forever. The trade: duplicates separated by more than the
    * watermark horizon are re-admitted — the standard streaming-dedup
    * contract. Works on batch frames too (state-free distinct-by-key,
    * row choice arbitrary — use [[firstSeenSummary]] when the kept row
    * must be deterministic). */
  def firstSeenDedup(events: DataFrame, tsCol: String, key: Column,
      watermark: String = "2 hours"): DataFrame = {
    val keyed = events.withColumn("content_key", key)
    if (keyed.isStreaming)
      keyed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("content_key")
    else keyed.dropDuplicates("content_key")
  }

  /** Deterministic batch twin of [[firstSeenDedup]] — what an
    * event-time-ordered stream converges to: per content key, the
    * event with the smallest (ts, id) plus the group size. One
    * groupBy, map-side combinable (min of a struct), no window. */
  def firstSeenSummary(events: DataFrame, tsCol: String, idCol: String,
      key: Column): DataFrame =
    events.groupBy(key.as("content_key"))
      .agg(min(struct(col(s"`$tsCol`").as("ts"), col(s"`$idCol`").as("id")))
          .as("first"),
        count(lit(1)).as("n_events"))
      .select(col("content_key"),
        date_format(col("first.ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        col("first.id").as("first_event_id"),
        col("n_events"))

  /** One (band, bucket) collision against an earlier-seen doc. */
  final case class BucketEvidence(id: Long, band: Int, bucket: String,
    first_id: Long)
  /** Input row / per-bucket state for [[firstSeenBucketEvidence]] —
    * public because encoder-generated code instantiates them. */
  final case class BucketRow(id: Long, band: Int, bucket: String)
  final case class BucketSeen(firstId: Long)

  /** Streaming MinHash-LSH near-dedup evidence: for every incoming
    * doc's LSH bucket (from [[graft.dedup.Dedup.inlineLshBuckets]] —
    * stateless, so the whole chain runs in append mode), emit a row iff
    * an EARLIER doc already claimed that bucket — the "is this new page
    * a near-dup of anything we already accepted?" probe of a crawl
    * ingest loop, the streaming form of d4's candidate join. Downstream
    * a doc is a near-dup candidate iff it has any evidence row
    * (aggregate per id, or verify by true Jaccard as in d4).
    *
    * State: one Long (first doc id) per distinct bucket —
    * O(#distinct buckets) ≤ O(#docs × bands), the same cardinality the
    * batch join shuffles; production streams bound it with a TTL
    * (re-admitting dups older than the horizon, the standard streaming
    * dedup trade, cf. [[firstSeenDedup]]).
    *
    * Ordering contract (as [[graft.text.Packing.streamingBinSegments]]):
    * ids arrive in increasing order per bucket across micro-batches;
    * each invocation sorts its own batch, so in batch mode (one
    * invocation per bucket) the sort is global and the output equals
    * the window formulation `min(id) OVER (PARTITION BY band, bucket
    * ORDER BY id ROWS UNBOUNDED PRECEDING EXCLUDING CURRENT)` — the
    * oracle pin. */
  def firstSeenBucketEvidence(buckets: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.OutputMode
    implicit val rowEnc = Encoders.product[BucketRow]
    implicit val evEnc = Encoders.product[BucketEvidence]
    implicit val stEnc = Encoders.product[BucketSeen]
    implicit val keyEnc = Encoders.STRING
    buckets
      .select(col("id").cast("long").as("id"),
        col("band").cast("int").as("band"),
        col("bucket").cast("string").as("bucket"))
      .as[BucketRow]
      .groupByKey(r => s"${r.band}:${r.bucket}")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[BucketRow], state: GroupState[BucketSeen]) =>
          val sorted = rows.toSeq.sortBy(_.id)
          var first = state.getOption.map(_.firstId)
          val out = sorted.flatMap { r =>
            val ev = first.collect {
              case f if f < r.id => BucketEvidence(r.id, r.band, r.bucket, f)
            }
            if (first.forall(_ > r.id)) first = Some(r.id)
            ev
          }
          first.foreach(f => state.update(BucketSeen(f)))
          out.iterator
      }
      .toDF()
  }

  /** Running stats state per key. */
  final case class RunningStats(key: String, n: Long, sum: Double,
      min: Double, max: Double) {
    def mean: Double = if (n == 0) Double.NaN else sum / n
  }

  /** Incrementally-updated per-key stats via mapGroupsWithState —
    * the streaming form of trained-threshold refresh (A18): state is
    * O(#keys), the per-batch work is map-side. */
  def runningStats(events: Dataset[(String, Double)]): Dataset[RunningStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[RunningStats, RunningStats](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[RunningStats]) =>
          val prev = state.getOption.getOrElse(
            RunningStats(key, 0L, 0.0, Double.MaxValue, Double.MinValue))
          val next = rows.foldLeft(prev) { case (s, (_, v)) =>
            RunningStats(key, s.n + 1, s.sum + v, math.min(s.min, v), math.max(s.max, v))
          }
          state.update(next)
          next
      }
  }
}
