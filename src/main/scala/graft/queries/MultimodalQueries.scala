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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_features" -> (mediaFeatures _))

  def oracleSql: Map[String, String] = Map(
    "mm1_media_features" -> mediaFeaturesSql)
}
