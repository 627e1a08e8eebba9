package graft

import graft.text.{Chunking, Sampling}
import org.apache.spark.sql.functions._

/** Specs for the corpus-preparation operators: token-window chunking
  * and deterministic quota sampling. */
class CorpusOpsSpec extends SparkSpec {

  test("token chunks cover every token with the declared overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
      (2L, "one two three"),                           // shorter than window
      (3L, ""),                                        // empty: no chunks
      (4L, "   "))                                     // whitespace only
      .toDF("doc_id", "text")
    val out = Chunking.tokenChunks(docs, "doc_id", "text",
        window = 32, step = 24)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("token_start"),
        r.getAs[Int]("n_tokens"), r.getAs[String]("chunk")))

    // doc 1: starts 0,24,48,72,96 — full windows except the tail
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq === Seq(0, 24, 48, 72, 96))
    assert(d1.map(_._3).toSeq === Seq(32, 32, 32, 28, 4))
    assert(d1.head._4.startsWith("w1 w2 ") && d1.head._4.endsWith(" w32"))
    assert(d1.last._4 === "w97 w98 w99 w100")
    // consecutive chunks overlap by window - step = 8 tokens
    assert(d1(0)._4.split(" ").takeRight(8).toSeq ===
      d1(1)._4.split(" ").take(8).toSeq)

    // short doc: one truncated chunk; empty docs: none
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0, 3, "one two three")))
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
  }

  test("quota sample is exact, deterministic, and capped per group") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (if (i % 5 == 0) "de" else "en", i))
      .toDF("lang", "doc_id")
    val out = Sampling.quotaSample(docs, "lang", "doc_id", quota = 30)
    val byLang = out.collect().groupBy(_.getAs[String]("lang"))
    assert(byLang("en").length === 30 && byLang("de").length === 30)
    assert(byLang.values.forall(_.map(_.getAs[Int]("sample_rank")).sorted.toSeq
      == (1 to 30)))

    // the salted two-phase result equals the plain single-window reference
    val win = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val reference = docs.withColumn("sample_rank", row_number().over(win))
      .filter(col("sample_rank") <= 30)
    val got = out.select("lang", "doc_id", "sample_rank").collect().toSet
    val want = reference.select("lang", "doc_id", "sample_rank").collect().toSet
    assert(got === want)

    // a group smaller than the quota is taken whole
    val tiny = Seq(("fr", 1L), ("fr", 2L)).toDF("lang", "doc_id")
    assert(Sampling.quotaSample(tiny, "lang", "doc_id", quota = 30)
      .count() === 2L)
  }
}
