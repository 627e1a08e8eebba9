package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Pins the fused native gram kernel ([[graft.functions.WordShingles]])
  * bit-identical to the original higher-order Column formulation
  * ([[Dedup.wordShinglesReference]]) — order included, since
  * array_distinct keeps first occurrence. */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def both(words: Seq[Seq[String]], k: Int) = {
    val df = words.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "__ws")
    val kernel = df.select(col("id"),
        graft.functions.WordShingles(col("__ws"), k).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val ref = df.select(col("id"),
        Dedup.wordShinglesReference(col("__ws"), k).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    (kernel, ref)
  }

  test("kernel matches reference on typical, duplicate-heavy, unicode arrays") {
      val cases = Seq(
        Seq("a", "b", "c", "d"),
        Seq("a", "b", "a", "b", "a", "b"),          // duplicate grams
        Seq("a"),                                    // fewer than k
        Seq.empty[String],
        Seq("x", "y"),                               // exactly k-1
        Seq("x", "y", "z"),                          // exactly k
        Seq("über", "maß", "東京", "naïve", "東京", "über", "maß"),
        Seq("one", "", "two", "", "one", "", "two"), // empty words
        (1 to 40).map(i => s"w${i % 7}")             // long, cyclic
      )
      for (k <- Seq(1, 2, 3, 5)) {
        val (kernel, ref) = both(cases, k)
        assert(kernel == ref, s"k=$k")
      }
    }

  test("kernel handles empty words exactly as the filter(length > 0) guard") {
      // two empty words join to " " (length 1) — the reference KEEPS it;
      // only a k=1 gram of one empty word is droppable. The kernel must
      // reproduce both behaviors exactly.
      val (kernel, ref) = both(Seq(Seq("", "", ""), Seq("", "a", "")), 2)
      assert(kernel == ref)
      assert(kernel(0L) == Seq(" "))
      val (kernel1, ref1) = both(Seq(Seq("", "a", "")), 1)
      assert(kernel1 == ref1)
      assert(kernel1(0L) == Seq("a"))
    }

  test("kernel agrees with reference through the full wordShingles operator") {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog the quick brown"),
        (2L, "short"),
        (3L, ""),
        (4L, "a b a b a b a b")).toDF("doc_id", "text")
      val got = Dedup.wordShingles(docs, "text", "doc_id", 3)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val ws = graft.functions.TokenArray.asciiTokens(col("text"))
      val want = docs.select(col("doc_id").as("id"),
          explode(Dedup.wordShinglesReference(ws, 3)).as("shingle"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want && got.nonEmpty)
    }
}
