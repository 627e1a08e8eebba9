package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins the native [[graft.functions.RepetitionStats]] kernel
  * bit-identical to the Column reference form
  * ([[TextAnalysis.inlineDupTrigramFracReference]]) — the zip-sliced
  * trigram build + sorted run-length fold it replaces — and both to
  * the grouped t13 metric's dup_trigram_frac. */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",                                      // empty
    "one two",                               // < 3 tokens → 0.0
    "a b c",                                 // exactly one trigram
    "a b c a b c a b c",                     // heavy repetition
    "x y z x y z w",                         // partial repeats
    "the the the the the",                   // one repeated token
    "Hello, World! Hello, WORLD! hello world", // case folding + punct
    "naïve café naïve café naïve café",      // à-ÿ range tokens
    "ün÷deux ün÷deux ün÷deux",               // U+00F7 is IN the à-ÿ class
    "日本語 テスト 日本語 テスト 日本語 テスト", // CJK: no [a-zà-ÿ0-9] runs → 0 tokens
    "mix 日本 mix 日本 mix 日本 mix",          // CJK separators between latin tokens
    "tab\tand\nnewline  spaced   out tab\tand\nnewline",
    "1 2 3 1 2 3 1 2 3",                     // digit tokens
    "àÿ àÿ àÿ end", // boundary code points
    "solo"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("native ≡ Column reference on adversarial strings") {
    val df = adversarial.toDF("id", "text")
    val rows = df.select(col("id"),
      TextAnalysis.inlineDupTrigramFrac("text").as("native"),
      TextAnalysis.inlineDupTrigramFracReference("text").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"id=${r.getLong(0)}: native ${r.getDouble(1)} != ref ${r.getDouble(2)}")
    }
  }

  test("native ≡ Column reference ≡ grouped t13 metric on the gate corpus") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val inline = docs.select(col("doc_id"),
      TextAnalysis.inlineDupTrigramFrac("text").as("native"),
      TextAnalysis.inlineDupTrigramFracReference("text").as("ref"))
    inline.collect().foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"doc ${r.getLong(0)}")
    }
    val grouped = TextAnalysis.repetitionMetrics(docs, "text", "doc_id")
      .select(col("id"), col("dup_trigram_frac"))
    val joined = inline.join(grouped, col("doc_id") === col("id"))
      .select("doc_id", "native", "dup_trigram_frac").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"doc ${r.getLong(0)}: native ${r.getDouble(1)} != grouped ${r.getDouble(2)}")
    }
  }

  test("null input stays null") {
    val df = Seq((1L, null: String), (2L, "a b c a b c")).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.inlineDupTrigramFrac("text").as("f")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L).isEmpty && out(2L).isDefined)
  }
}
