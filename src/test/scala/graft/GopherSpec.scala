package graft

import graft.text.Cleaning
import org.apache.spark.sql.functions._

/** Pins [[Cleaning.gopherRules]] (Rae et al. 2021 A1.1, integer form)
  * against hand-computed rule outcomes per failure mode, and the
  * stateless stage through an append-mode MemoryStream run.
  */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  private val passText = ("the quick brown fox jumps over lazy dogs " +
    "and that mix of words keeps going on with more body text ") * 3

  private val corpus = Seq(
    (0L, passText),                                     // passes all
    (1L, "too short of the and"),                       // r_words
    (2L, passText + " " + ("zzzzzzzzzzzzzzzzzzzzzzzz " * 40)), // r_meanlen
    (3L, passText + (" ###" * 10)),                     // r_symbol
    (4L, "- one\n- two\n- three\n- " + passText),       // r_bullet
    (5L, "a...\nb...\nc...\n" + passText),              // r_ellipsis
    (6L, passText + (" 123456" * 40)),                  // r_alpha
    (7L, passText.replace("the ", "xe ").replace("of ", "fo ")
      .replace("and ", "dna ").replace("that ", "thon ")
      .replace("with ", "wi ")))                        // r_stop

  test("each rule bites for its crafted failure mode only") {
    val out = Cleaning.gopherRules(corpus.toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val ruleIdx = Map("r_words" -> 1L, "r_meanlen" -> 2L,
      "r_symbol" -> 3L, "r_bullet" -> 4L, "r_ellipsis" -> 5L,
      "r_alpha" -> 6L, "r_stop" -> 7L)
    assert(out(0L).getAs[Boolean]("kept"), "doc 0 must pass all rules")
    ruleIdx.foreach { case (rule, id) =>
      assert(!out(id).getAs[Boolean](rule), s"doc $id must fail $rule")
      assert(!out(id).getAs[Boolean]("kept"))
      // and doc 0 passes that rule
      assert(out(0L).getAs[Boolean](rule), s"doc 0 must pass $rule")
    }
  }

  test("integer thresholds match the cross-multiplied spec") {
    // 52 words, 205 chars: 3·52 = 156 ≤ 205 ≤ 520 — inside both bounds
    val b1 = ("abcd " * 50).trim + " of the"
    // 50 words incl. two stops, one ellipsis and 5 hashes on 52 words:
    // 10·(5+1)=60 > 52 → symbol rule fails
    val b2 = ("abc " * 50).trim + " of the ##### ..."
    val out = Cleaning.gopherRules(
        Seq((0L, b1), (1L, b2)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("r_meanlen") &&
      out(0L).getAs[Boolean]("r_words") && out(0L).getAs[Boolean]("kept"))
    assert(!out(1L).getAs[Boolean]("r_symbol"))
  }

  test("stateless stage streams append-mode, stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def stage(df: org.apache.spark.sql.DataFrame) =
      Cleaning.gopherRules(df, "text", "doc_id")
    val batch = stage(corpus.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, String)]
    val q = stage(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("t35_stream")
      .outputMode("append").start()
    try {
      input.addData(corpus.take(4): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(4): _*)
      q.processAllAvailable()
      assert(spark.table("t35_stream").collect().map(_.toSeq).toSet
        === batch)
    } finally q.stop()
  }
}
