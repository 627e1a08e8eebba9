package graft.queries

import graft.Tables
import graft.streaming.StreamingQuality
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate query for the streaming module: the SAME windowed
  * aggregation runs here in batch mode (window() is an ordinary
  * grouping expression), so the DuckDB oracle checks the streaming
  * plan's logic end to end. */
object StreamQueries {

  def windowedStats(spark: SparkSession, dir: String): DataFrame =
    StreamingQuality.windowedStats(Tables.loadEvents(spark, dir),
        "ts", "event_type", "value", windowLen = "1 hour")
      .withColumn("mean", round(col("mean"), 6))
      .orderBy("window_start", "key")

  /** Tumbling 1-hour windows are epoch-aligned — identical to
    * date_trunc('hour') on UTC timestamps. */
  val windowedStatsSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type AS key, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value), 6) AS mean,
      |  MIN(value) AS min, MAX(value) AS max
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    StreamingQuality.sessionStats(Tables.loadEvents(spark, dir),
        "ts", "user_id", "value", gap = "30 minutes")
      .withColumn("mean", round(col("mean"), 6))
      .orderBy("key", "session_start")

  /** Gaps-and-islands mirror of session_window: a session breaks when
    * the gap to the previous event is >= the window gap (Spark's
    * session interval is half-open [first, last+gap)); session end is
    * last event + gap. */
  val sessionStatsSql: String =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT user_id AS key,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |  COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value), 6) AS mean
      |FROM s GROUP BY user_id, sid
      |ORDER BY key, session_start""".stripMargin

  /** Batch twin of the streaming first-seen dedup: the deterministic
    * summary (first event per content key) the converged stream
    * produces; the streaming dropDuplicates path is spec-driven. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    StreamingQuality.firstSeenSummary(ev, "ts", "event_id",
        StreamingQuality.contentKey(col("user_id"), col("event_type")))
      .orderBy("content_key")
  }

  /** content key mirror: each component length-prefixed, -1 for NULL
    * (StreamingQuality.contentKey's injective encoding). */
  private def encSql(e: String) =
    s"(CAST(COALESCE(LENGTH(CAST($e AS VARCHAR)), -1) AS VARCHAR) || ':' || " +
      s"COALESCE(CAST($e AS VARCHAR), ''))"

  val streamDedupSql: String =
    s"""WITH h AS (
      |  SELECT md5(${encSql("user_id")} || ${encSql("event_type")}) AS content_key,
      |    ts, event_id
      |  FROM events),
      |r AS (
      |  SELECT content_key, ts, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY content_key ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY content_key) AS n_events
      |  FROM h)
      |SELECT content_key, strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
      |  event_id AS first_event_id, n_events
      |FROM r WHERE rn = 1 ORDER BY content_key""".stripMargin

  // ---- w4: streaming decontamination (batch twin) ------------------------

  /** Batch twin of the stream-safe contamination evidence: the same
    * stateless operator (per-row distinct shingles → stream-static
    * equi-join against the eval grams) run on the documents table; the
    * streaming spec pins the append-mode run to these exact rows. Eval
    * set and gram size mirror d8 (every 10th doc, 5-grams). */
  def streamDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val evalGrams = graft.dedup.Dedup.wordShingles(
        docs.filter(col("doc_id") % 10 === 0), "text", "doc_id", 5)
      .select(col("shingle")).distinct()
    graft.dedup.Decontamination.contaminationEvidence(
        docs, evalGrams, "text", "doc_id", n = 5)
      .orderBy("id", "shingle")
  }

  private val WS5 = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"

  val streamDecontaminationSql: String =
    s"""WITH g0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len($WS5) - 3, 1)),
       |    i -> $WS5[i] || ' ' || $WS5[i+1] || ' ' || $WS5[i+2] || ' ' || $WS5[i+3] || ' ' || $WS5[i+4])) AS g
       |  FROM documents WHERE len($WS5) >= 5),
       |grams AS (SELECT DISTINCT doc_id, g FROM g0),
       |eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
       |SELECT doc_id AS id, g AS shingle
       |FROM grams JOIN eval_grams USING (g)
       |ORDER BY id, shingle""".stripMargin

  // ---- w5: streaming weighted sampling (batch twin) ----------------------

  /** Batch twin of stream-side weighted sampling: a STATIC per-language
    * probability table (derived deterministically from the language
    * string, so the oracle can rebuild it) broadcast-joined to the
    * corpus, keep iff the 60-bit md5 key clears the threshold —
    * [[graft.text.Sampling.weightedSample]] verbatim, which is
    * stateless and therefore runs unchanged on a stream (the spec runs
    * this exact operator in append mode). */
  def streamWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val probs = docs.select(col("lang")).distinct()
      .withColumn("p",
        (pmod(length(col("lang")).cast("long") * lit(37L), lit(50L)) + lit(25L))
          .cast("double") / lit(100.0))
    graft.text.Sampling.weightedSample(docs, "lang", "doc_id", probs)
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")
  }

  val streamWeightedSampleSql: String =
    """WITH probs AS (
      |  SELECT DISTINCT lang,
      |    CAST(FLOOR(LEAST(CAST((LENGTH(lang) * 37) % 50 + 25 AS DOUBLE) / 100.0, 1.0)
      |      * 1152921504606846976.0) AS BIGINT) AS thr
      |  FROM documents)
      |SELECT d.lang, d.doc_id
      |FROM documents d JOIN probs p ON d.lang = p.lang
      |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT < p.thr
      |ORDER BY d.lang, d.doc_id""".stripMargin

  // ---- w6: streaming sequence packing ------------------------------------

  /** The STREAMING packer run in batch mode (state starts empty, one
    * group invocation per shard — the identical code path the append-
    * mode stream executes): documents chunked per t7's parameters, then
    * packed into 256-token bins per LANGUAGE shard by the stateful
    * running-offset fold. Hash-oracled against the per-shard prefix-sum
    * mirror, so the driver gate certifies the streaming operator's
    * arithmetic itself; StreamingSpec additionally pins the multi-
    * micro-batch append-mode run to these exact rows. */
  def streamPacked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val chunks = graft.text.Chunking.tokenChunks(
        docs, "doc_id", "text", window = 32, step = 24)
      .join(docs.select("doc_id", "lang"), "doc_id")
    graft.text.Packing.streamingBinSegments(
        chunks, "lang", "doc_id", "token_start", "n_tokens", seqLen = 256)
      .orderBy("lang", "bin_id", "seq")
  }

  val streamPackedSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS t FROM documents),
      |starts AS (
      |  SELECT doc_id, lang, t, unnest(range(0, len(t), 24)) AS token_start
      |  FROM toks WHERE len(t) > 0),
      |chunks AS (
      |  SELECT doc_id, lang, CAST(token_start AS BIGINT) AS token_start,
      |    CAST(len(t[token_start + 1 : token_start + 32]) AS BIGINT) AS n_tokens
      |  FROM starts),
      |c2 AS (
      |  SELECT doc_id, lang, token_start, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id, token_start
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS before
      |  FROM chunks WHERE n_tokens > 0),
      |segs AS (
      |  SELECT lang, doc_id, token_start, n_tokens, before,
      |    unnest(generate_series(
      |      CAST((before - before % 256) / 256 AS BIGINT),
      |      CAST(((before + n_tokens - 1) - (before + n_tokens - 1) % 256) / 256 AS BIGINT)))
      |      AS bin_id
      |  FROM c2)
      |SELECT lang, bin_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY lang, bin_id
      |    ORDER BY GREATEST(before, bin_id * 256)) AS BIGINT) AS seq,
      |  doc_id,
      |  token_start + GREATEST(before, bin_id * 256) - before AS token_start,
      |  LEAST(before + n_tokens, (bin_id + 1) * 256)
      |    - GREATEST(before, bin_id * 256) AS token_len
      |FROM segs ORDER BY lang, bin_id, seq""".stripMargin

  // ---- w8: windowed drift alarm against trained bands --------------------

  /** Percentile bands trained on the event history (the r6 exact
    * kernel), then the hourly out-of-band rate with an alarm threshold
    * — numeric drift monitoring as the streaming twin of trained-rule
    * detection. The right-skewed synthetic values put every window's
    * baseline near 10%; hours where the heavy tail clusters cross the
    * 12% alarm line. */
  def streamDriftAlarm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val b = graft.rules.TrainedRules.percentileBands(ev, Seq("value"))
      .collect().head
    StreamingQuality.driftAlarm(ev, "ts", "value",
        b.getAs[Double]("p05"), b.getAs[Double]("p95"), alarmRate = 0.12)
      .withColumn("out_rate", round(col("out_rate"), 6))
      .orderBy("window_start")
  }

  val streamDriftAlarmSql: String =
    """WITH b AS (
      |  SELECT quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
      |  FROM events),
      |agg AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |    COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_out
      |  FROM events, b GROUP BY 1)
      |SELECT window_start, n, n_out,
      |  ROUND(CAST(n_out AS DOUBLE) / CAST(n AS DOUBLE), 6) AS out_rate,
      |  CAST(n_out AS DOUBLE) / CAST(n AS DOUBLE) > 0.12 AS alarm
      |FROM agg ORDER BY window_start""".stripMargin

  // ---- w7: batch-trained rules enforced on the stream --------------------

  /** The generate-on-history, enforce-on-stream loop closed end to end:
    * the r14 source blocklist is trained on the batch corpus
    * (control-plane rules), then applied by the STATELESS streaming
    * violation scanner — run here in batch mode, the identical code
    * path an append-mode stream executes (StreamingSpec pins the
    * multi-micro-batch run to these rows). Output is the Violation
    * layout for exactly the documents of blocked sources. */
  def streamSourceGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val stats = graft.rules.CorpusRules.sourceStats(docs, "source", "text",
      minAvgQuality = 0.91, maxShortFrac = 0.45)
    val rules = graft.rules.CorpusRules.blocklistRules(stats)
    graft.streaming.StreamingQuality.violations(docs, "documents", rules, "doc_id")
      .select("column", "row_id", "value", "rule", "severity")
      .orderBy("row_id", "rule")
  }

  val streamSourceGateSql: String =
    s"""WITH q AS (
       |  SELECT source, CAST(${CorpusQueries.qualityE4ExprSql} AS BIGINT) AS e4,
       |    LENGTH(text) AS len
       |  FROM documents),
       |blocked AS (
       |  SELECT source FROM q GROUP BY source
       |  HAVING CAST(SUM(e4) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 10000.0)
       |           < CAST(0.91 AS DOUBLE)
       |     OR CAST(SUM(CASE WHEN len < 200 THEN 1 ELSE 0 END) AS DOUBLE)
       |          / CAST(COUNT(*) AS DOUBLE) > CAST(0.45 AS DOUBLE))
       |SELECT 'source_block(' || b.source || ')' AS "column",
       |  d.doc_id AS row_id,
       |  '`source` <> ''' || b.source || '''' AS value,
       |  'cross_field(source_block(' || b.source || '))' AS rule,
       |  'error' AS severity
       |FROM documents d JOIN blocked b ON d.source = b.source
       |ORDER BY row_id, rule""".stripMargin

  // ---- w9: streaming near-dedup (LSH first-seen bucket evidence) ---------

  /** The d4 candidate probe as a RUNNING STREAM: per-row LSH buckets
    * (zero exchanges, legal in append mode) feed the stateful
    * first-seen-bucket stage; an emitted row means "this doc collides
    * with an earlier doc's bucket" — the crawl-ingest near-dup gate.
    * Run here in batch mode, where the operator's per-bucket sort makes
    * it exactly the window formulation the oracle replays; the
    * streaming spec pins the multi-micro-batch run to the same rows. */
  def streamNearDupEvidence(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    StreamingQuality.firstSeenBucketEvidence(
        graft.dedup.Dedup.inlineLshBuckets(docs, "text", "doc_id",
          shingleSize = 3, numPerms = 16, rowsPerBand = 4))
      .orderBy("id", "band")
  }

  private val WS3 =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"

  val streamNearDupEvidenceSql: String = {
    val perms = (0 until 16).map { p =>
      val a = 2 * (p + 1) + 1
      val b = (7919L * (p + 1)) % graft.dedup.Dedup.P
      s"SELECT doc_id AS id, $p AS perm_id, MIN(($a * h + $b) % ${graft.dedup.Dedup.P}) AS min_hash FROM hashes GROUP BY doc_id"
    }.mkString("\nUNION ALL\n")
    s"""WITH g0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len($WS3) - 1, 1)),
       |    i -> $WS3[i] || ' ' || $WS3[i+1] || ' ' || $WS3[i+2])) AS g
       |  FROM documents WHERE len($WS3) >= 3),
       |grams AS (SELECT DISTINCT doc_id, g FROM g0),
       |hashes AS (SELECT doc_id,
       |  (('0x' || substr(md5(g), 1, 15))::UBIGINT % 1073741824)::BIGINT AS h
       |  FROM grams),
       |sigs AS ($perms),
       |bands AS (
       |  SELECT id, perm_id // 4 AS band,
       |    md5(string_agg(min_hash::VARCHAR, ',' ORDER BY perm_id)) AS bucket
       |  FROM sigs GROUP BY id, perm_id // 4),
       |w AS (
       |  SELECT id, band, bucket,
       |    MIN(id) OVER (PARTITION BY band, bucket ORDER BY id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_id
       |  FROM bands)
       |SELECT id, band, bucket, first_id FROM w
       |WHERE first_id IS NOT NULL
       |ORDER BY id, band""".stripMargin
  }

  /** w10: LIVE profile state — the mergeable value histogram
    * ([[graft.profile.Profiler.incrementState]], p11's state)
    * maintained as a streaming aggregation: the long-format explode is
    * stateless and the (table, column, value) count is a standard
    * update-mode stateful agg, so the lake profile stays current on
    * the ingest stream with no batch re-profile (StreamingSpec pins
    * stream ≡ batch). Batch twin here for the oracle. */
  def streamProfileState(spark: SparkSession, dir: String): DataFrame =
    graft.profile.Profiler.incrementState(
        Seq("documents" -> Tables.load(spark, dir, "documents")))
      .orderBy("column", "value")

  val streamProfileStateSql: String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val lf = cols.map(c =>
      s"""SELECT '$c' AS "column", CAST($c AS VARCHAR) AS value FROM documents""")
      .mkString("\nUNION ALL\n")
    s"""WITH lf AS ($lf)
       |SELECT 'documents' AS "table", "column", value, COUNT(*) AS cnt
       |FROM lf GROUP BY 1, 2, 3 ORDER BY 2, 3""".stripMargin
  }

  // ---- w11: streaming boilerplate-line filter (batch twin) ---------------

  /** Batch twin of the stream-side line filter: a batch pass trains the
    * duplicate-line table (lines occurring ≥ 2 times in the planted
    * corpus — [[graft.dedup.Dedup.knownDupLines]]), and the filter
    * emits (doc, pos, line) evidence for every incoming line found in
    * it ([[graft.dedup.Dedup.lineFilterEvidence]] — a stateless
    * explode + stream-static equi-join, so the spec runs this exact
    * operator in append mode). The d14 line planting. */
  private val W11Nav =
    "repeated boilerplate navigation line planted on every fourth page"

  def streamLineFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val planted = docs.select(col("doc_id"),
      concat(
        substring(col("text"), 1, 60), lit("\n"),
        substring(col("text"), 61, 60), lit("\n"),
        when(col("doc_id") % 4 === 0, lit(W11Nav))
          .otherwise(substring(col("text"), 121, 60))).as("text"))
    val known = graft.dedup.Dedup.knownDupLines(planted, "text")
    graft.dedup.Dedup.lineFilterEvidence(planted, known, "text", "doc_id")
      .select(col("id").as("doc_id"), col("pos"), col("line"))
      .orderBy("doc_id", "pos")
  }

  val streamLineFilterSql: String =
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    substr(text, 1, 60) || chr(10) || substr(text, 61, 60) || chr(10) ||
       |    CASE WHEN doc_id % 4 = 0
       |      THEN '$W11Nav'
       |      ELSE substr(text, 121, 60) END AS text
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, lines[i] AS line
       |  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines,
       |          unnest(range(1, len(string_split(text, chr(10))) + 1)) AS i
       |        FROM planted)),
       |known AS (SELECT line FROM occ GROUP BY line HAVING COUNT(*) >= 2)
       |SELECT doc_id, pos, line
       |FROM occ JOIN known USING (line)
       |ORDER BY doc_id, pos""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w11_stream_line_filter" -> (streamLineFilter _),
    "w10_stream_profile" -> (streamProfileState _),
    "w7_stream_source_gate" -> (streamSourceGate _),
    "w8_stream_drift_alarm" -> (streamDriftAlarm _),
    "w1_windowed_stats" -> (windowedStats _),
    "w2_session_stats" -> (sessionStats _),
    "w3_stream_dedup" -> (streamDedup _),
    "w4_stream_decontamination" -> (streamDecontamination _),
    "w5_stream_weighted_sample" -> (streamWeightedSample _),
    "w6_stream_packed" -> (streamPacked _),
    "w9_stream_neardup" -> (streamNearDupEvidence _))

  def oracleSql: Map[String, String] = Map(
    "w11_stream_line_filter" -> streamLineFilterSql,
    "w10_stream_profile" -> streamProfileStateSql,
    "w7_stream_source_gate" -> streamSourceGateSql,
    "w8_stream_drift_alarm" -> streamDriftAlarmSql,
    "w1_windowed_stats" -> windowedStatsSql,
    "w2_session_stats" -> sessionStatsSql,
    "w3_stream_dedup" -> streamDedupSql,
    "w4_stream_decontamination" -> streamDecontaminationSql,
    "w5_stream_weighted_sample" -> streamWeightedSampleSql,
    "w6_stream_packed" -> streamPackedSql,
    "w9_stream_neardup" -> streamNearDupEvidenceSql)
}
