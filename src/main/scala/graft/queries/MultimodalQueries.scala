package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate query for the multimodal metadata path: stub
  * features are md5-derived, so DuckDB reproduces them exactly over the
  * same UTF-8 bytes. */
object MultimodalQueries {

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(
        Multimodal.asMediaTable(Tables.load(spark, dir, "documents"),
          "doc_id", "text"))
      .orderBy("id")

  val mediaFeaturesSql: String =
    """SELECT doc_id AS id,
      |  octet_length(encode(text))::BIGINT AS n_bytes,
      |  md5(text) AS checksum,
      |  (1 + ('0x' || substr(md5(text), 1, 15))::UBIGINT % 1024)::INT AS width,
      |  (1 + (('0x' || substr(md5(text), 1, 15))::UBIGINT // 1024) % 1024)::INT AS height,
      |  (1 + ('0x' || substr(md5(text), 1, 15))::UBIGINT % 3)::INT AS n_channels
      |FROM documents ORDER BY id""".stripMargin

  // ---- mm2: perceptual dHash image near-duplicates ----------------------

  /** documents-as-media ∪ shifted copy → every "image" has one planted
    * exact duplicate; the dHash pipeline (grayscale decode at the
    * mapPartitions boundary → 64-bit difference hash → banded Hamming
    * join) must recover exactly those pairs at distance 0 (chained-md5
    * stub grids make chance collisions within distance 3 vanishing). */
  def imageDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaTable(Tables.load(spark, dir, "documents"),
      "doc_id", "text").select(col("id"), col("media"))
    val doubled = media.unionByName(
      media.select((col("id") + 1000000).as("id"), col("media")))
    Multimodal.dhashPairs(
        Multimodal.dhashFeatures(doubled, Multimodal.StubGrayscaleDecoder),
        maxDistance = 3)
      .orderBy("ida", "idb")
  }

  /** Mirror of StubGrayscaleDecoder + dhash64 + the banded Hamming
    * join: 5 chained md5 hex blocks → 72-byte grid → 64 adjacent-pixel
    * comparisons → unsigned HUGEINT signature → signed two's-complement
    * BIGINT for xor/bit_count (the simhash oracle's device). */
  val imageDupPairsSql: String = {
    def g(i: Int) = s"('0x' || substr(hexs, ${2 * i + 1}, 2))::INT"
    val sig = (for (r <- 0 until 8; c <- 0 until 8) yield
      s"CASE WHEN ${g(r * 9 + c)} > ${g(r * 9 + c + 1)} THEN ${java.math.BigInteger.ONE.shiftLeft(r * 8 + c)}::HUGEINT ELSE 0::HUGEINT END")
      .mkString(" + ")
    val bandStructs = (0 until 4).map(b =>
      s"SELECT id, ssig, $b AS band, ((usig // ${1L << (b * 16)}) % 65536)::BIGINT AS key FROM sigs2")
      .mkString("\nUNION ALL\n")
    s"""WITH doubled AS (
       |  SELECT doc_id AS id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
       |chain AS (
       |  SELECT id, md5(text) AS h1 FROM doubled),
       |chain2 AS (
       |  SELECT id, h1, md5(h1) AS h2, md5(md5(h1)) AS h3,
       |    md5(md5(md5(h1))) AS h4, md5(md5(md5(md5(h1)))) AS h5
       |  FROM chain),
       |grids AS (SELECT id, h1 || h2 || h3 || h4 || h5 AS hexs FROM chain2),
       |sigs AS (SELECT id, ($sig) AS usig FROM grids),
       |sigs2 AS (SELECT id, usig,
       |  (CASE WHEN usig >= 9223372036854775808::HUGEINT
       |        THEN usig - 18446744073709551616::HUGEINT ELSE usig END)::BIGINT AS ssig
       |  FROM sigs),
       |banded AS ($bandStructs)
       |SELECT DISTINCT a.id AS ida, b.id AS idb,
       |  bit_count(xor(a.ssig, b.ssig)) AS hamming
       |FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
       |WHERE a.id < b.id AND bit_count(xor(a.ssig, b.ssig)) <= 3
       |ORDER BY ida, idb""".stripMargin
  }

  // ---- mm3: video frame sampling ----------------------------------------

  private val StrideMs = 2000L

  /** documents-as-videos → probe typed metadata (duration, fps) →
    * sample one frame per 2 s of wall clock → per-video rollup
    * (metadata carried through, frame count, last sampled ts, min
    * frame key). The rollup keeps gate output O(#videos) while still
    * pinning every sampled timestamp and frame key through the
    * count/max/min triple. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val video = Multimodal.asVideoTable(
      Tables.load(spark, dir, "documents"), "doc_id", "text")
    Multimodal.sampleFrameTimes(video, StrideMs)
      .groupBy("id")
      .agg(max(col("duration_ms")).as("duration_ms"),
        max(col("fps")).as("fps"),
        count(lit(1)).as("n_frames"),
        max(col("ts_ms")).as("last_ts_ms"),
        min(col("frame_key")).as("frame_digest"))
      .orderBy("id")
  }

  val frameSampleSql: String =
    s"""WITH meta AS (
       |  SELECT doc_id AS id, md5(text) AS csum,
       |    1000 + (octet_length(encode(text)) * 977) % 60000 AS duration_ms,
       |    (24 + (('0x' || substr(md5(text), 1, 15))::UBIGINT % 2) * 6)::BIGINT AS fps
       |  FROM documents),
       |frames AS (
       |  SELECT id, csum, duration_ms, fps,
       |    unnest(range(0, duration_ms, $StrideMs)) AS ts_ms
       |  FROM meta)
       |SELECT id, MAX(duration_ms)::BIGINT AS duration_ms, MAX(fps) AS fps,
       |  COUNT(*)::BIGINT AS n_frames, MAX(ts_ms)::BIGINT AS last_ts_ms,
       |  MIN(md5(csum || ':' || ts_ms::VARCHAR)) AS frame_digest
       |FROM frames GROUP BY id ORDER BY id""".stripMargin

  // ---- mm4: audio probing ------------------------------------------------

  /** documents-as-audio → typed probe metadata (rate/channels/duration/
    * loudness bucket) at the same decode boundary as mm1-mm3; the gate
    * checks the codegen'd metadata path, the spec pins the
    * mapPartitions decode path to it bit-for-bit. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioFeatures(
        Multimodal.asMediaTable(Tables.load(spark, dir, "documents"),
          "doc_id", "text"))
      .orderBy("id")

  val audioFeaturesSql: String =
    """SELECT doc_id AS id,
      |  octet_length(encode(text))::BIGINT AS n_bytes,
      |  md5(text) AS checksum,
      |  (CASE ('0x' || substr(md5(text), 1, 15))::UBIGINT % 4
      |     WHEN 0 THEN 16000 WHEN 1 THEN 22050 WHEN 2 THEN 44100
      |     ELSE 48000 END)::BIGINT AS sample_rate,
      |  (1 + (('0x' || substr(md5(text), 1, 15))::UBIGINT // 4) % 2)::BIGINT AS n_channels,
      |  (500 + (octet_length(encode(text)) * 977) % 120000)::BIGINT AS duration_ms,
      |  ((('0x' || substr(md5(text), 1, 15))::UBIGINT // 8) % 10)::BIGINT AS loudness_bucket
      |FROM documents ORDER BY id""".stripMargin

  // ---- mm5: audio fingerprint near-dups ----------------------------------

  /** documents-as-audio ∪ exact copies: every blob meets its bit-
    * identical twin at Hamming 0; the banded join must recover exactly
    * those plus whatever incidental near-collisions the corpus holds. */
  def audioDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaTable(Tables.load(spark, dir, "documents"),
      "doc_id", "text").select(col("id"), col("media"))
    val doubled = media.unionByName(
      media.select((col("id") + 1000000).as("id"), col("media")))
    Multimodal.audioFingerprintPairs(
        Multimodal.audioFingerprintFeatures(doubled,
          Multimodal.StubAudioEnergyDecoder),
        maxDistance = 3)
      .orderBy("ida", "idb")
  }

  /** Mirror of StubAudioEnergyDecoder + audioFingerprint64 + the banded
    * Hamming join: 5 chained md5 hex blocks → 65 window energies → 64
    * rise/fall delta bits → banded 16-bit keys (the mm2/simhash oracle
    * device, 1-D). */
  val audioDupPairsSql: String = {
    def e(i: Int) = s"('0x' || substr(hexs, ${2 * i + 1}, 2))::INT"
    val sig = (0 until 64).map(w =>
      s"CASE WHEN ${e(w)} > ${e(w + 1)} THEN ${java.math.BigInteger.ONE.shiftLeft(w)}::HUGEINT ELSE 0::HUGEINT END")
      .mkString(" + ")
    val bandStructs = (0 until 4).map(b =>
      s"SELECT id, ssig, $b AS band, ((usig // ${1L << (b * 16)}) % 65536)::BIGINT AS key FROM sigs2")
      .mkString("\nUNION ALL\n")
    s"""WITH doubled AS (
       |  SELECT doc_id AS id, text FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
       |chain AS (
       |  SELECT id, md5(text) AS h1 FROM doubled),
       |chain2 AS (
       |  SELECT id, h1, md5(h1) AS h2, md5(md5(h1)) AS h3,
       |    md5(md5(md5(h1))) AS h4, md5(md5(md5(md5(h1)))) AS h5
       |  FROM chain),
       |seqs AS (SELECT id, h1 || h2 || h3 || h4 || h5 AS hexs FROM chain2),
       |sigs AS (SELECT id, ($sig) AS usig FROM seqs),
       |sigs2 AS (SELECT id, usig,
       |  (CASE WHEN usig >= 9223372036854775808::HUGEINT
       |        THEN usig - 18446744073709551616::HUGEINT ELSE usig END)::BIGINT AS ssig
       |  FROM sigs),
       |banded AS ($bandStructs)
       |SELECT DISTINCT a.id AS ida, b.id AS idb,
       |  bit_count(xor(a.ssig, b.ssig)) AS hamming
       |FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
       |WHERE a.id < b.id AND bit_count(xor(a.ssig, b.ssig)) <= 3
       |ORDER BY ida, idb""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_features" -> (mediaFeatures _),
    "mm2_image_dup_pairs" -> (imageDupPairs _),
    "mm3_frame_sample" -> (frameSample _),
    "mm4_audio_features" -> (audioFeatures _),
    "mm5_audio_dup_pairs" -> (audioDupPairs _))

  def oracleSql: Map[String, String] = Map(
    "mm1_media_features" -> mediaFeaturesSql,
    "mm2_image_dup_pairs" -> imageDupPairsSql,
    "mm3_frame_sample" -> frameSampleSql,
    "mm4_audio_features" -> audioFeaturesSql,
    "mm5_audio_dup_pairs" -> audioDupPairsSql)
}
