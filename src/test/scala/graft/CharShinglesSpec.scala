package graft

import org.apache.spark.sql.functions._

/** Pins the fused char-trigram kernel ([[graft.functions.CharShingles]])
  * bit-identical to the higher-order Column reference
  * ([[graft.text.TextAnalysis.charTrigramsReference]]) — order included
  * (array_distinct keeps first occurrence), code-point slicing included
  * (substr counts characters, not bytes). */
class CharShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("kernel matches the reference on ascii, unicode, short, repetitive") {
    val cases = Seq(
      "abcdef",
      "aaaaaaa",                    // one distinct trigram
      "ab",                         // shorter than k
      "",
      "abc",                        // exactly k
      "日本語のテキストです日本語", // multi-byte code points
      "naïve café naïve café",
      "mixed 日本 ascii 日本 mixed")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "__t")
    val kernel = df.select(col("id"),
        graft.functions.CharShingles(col("__t"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val ref = df.select(col("id"),
        graft.text.TextAnalysis.charTrigramsReference(col("__t")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(kernel == ref)
    assert(kernel(0L) == Seq("abc", "bcd", "cde", "def"))
    assert(kernel(1L) == Seq("aaa"))
    assert(kernel(2L).isEmpty)
  }

  test("trigramFamiliarity is unchanged through the kernel") {
    val docs = Seq((1L, "The quick brown fox."), (2L, "ab"),
      (3L, "The quick brown fox again.")).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis
      .trigramFamiliarity(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    // doc 2 has no trigrams; docs 1 and 3 share most trigrams
    assert(got.exists(t => t._1 == 2L && t._2 == 0L && t._3.isEmpty))
    assert(got.forall(t => t._1 == 2L || t._2 > 0L))
  }
}
