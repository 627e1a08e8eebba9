package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Pins the fused positioned-gram kernel ([[graft.functions.PosShingles]])
  * bit-identical to the higher-order Column reference
  * ([[Dedup.posShinglesReference]]) — positions, order, duplicates. */
class PosShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("kernel matches the reference, positions and duplicates included") {
    val cases = Seq(
      Seq("a", "b", "c", "d", "e"),
      Seq("a", "b", "a", "b", "a", "b"),
      Seq("x"),
      Seq.empty[String],
      Seq("über", "東京", "naïve", "東京", "über"),
      (1 to 30).map(i => s"w${i % 4}"))
    val df = cases.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "__ws")
    for (k <- Seq(1, 2, 3, 10)) {
      val kernel = df.select(col("id"),
          graft.functions.PosShingles(col("__ws"), k).as("g"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getString(1)))).toMap
      val ref = df.select(col("id"),
          Dedup.posShinglesReference(col("__ws"), k).as("g"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getString(1)))).toMap
      assert(kernel == ref, s"k=$k")
    }
  }
}
