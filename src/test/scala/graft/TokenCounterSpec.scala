package graft

import graft.text.{VocabTokenCounter, WhitespaceTokenCounter}
import org.apache.spark.sql.functions._

/** Pins the greedy longest-match subword walk to hand-derived piece
  * counts, and the trait contract both counters share. */
class TokenCounterSpec extends SparkSpec {
  import spark.implicits._

  private def pieces(words: String*): Map[String, Long] =
    words.toSeq.toDF("text")
      .select(col("text"), VocabTokenCounter.count(col("text")).as("n"))
      .as[(String, Long)].collect().toMap

  test("greedy longest-prefix walk matches hand-derived counts") {
    // starting = st|ar|t|ing, statement = st|at|e|ment, the = the,
    // xyz = x|y|z (single-char fallback), ingest = ing|est
    assert(pieces("starting", "statement", "the", "xyz", "ingest") ==
      Map("starting" -> 4L, "statement" -> 4L, "the" -> 1L,
        "xyz" -> 3L, "ingest" -> 2L))
  }

  test("native piece_counts equals the Column-expression reference walk") {
    // the byte loop must reproduce the interpreted substr walk on
    // adversarial words: piece-dense, fallback-only, multi-byte code
    // points between and inside candidate windows, vocab words
    // themselves, and the empty string
    val words = Seq("", "a", "tion", "mention", "alignment", "théâtre",
      "über", "inginging", "xyzzy", "estland", "ererer", "àà", "naïve",
      "t1on", "the", "and", "statement", "café", "ststst") ++
      graft.text.VocabTokenCounter.Vocab
    val df = words.toDF("w").select(col("w"),
      graft.functions.PieceCounts(array(col("w"))).getItem(0).as("fast"),
      graft.text.VocabTokenCounter.piecesOf(col("w")).as("ref"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("fast") == r.getAs[Long]("ref"),
        s"walk mismatch for '${r.getString(0)}'")
    }
  }

  test("BPE training learns the classic merge sequence with deterministic ties") {
    import org.apache.spark.sql.functions.col
    // the Sennrich corpus shape: low×5 lower×2 newest×6 widest×3.
    // Hand derivation: (e,s)=9 ties (s,t)=9 → lexicographic (e,s) first;
    // then (es,t)=9; then (l,o)=7 ties (o,w)=7 → (l,o); then (lo,w)=7.
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest widest widest widest"))
      .toDF("doc_id", "text")
    val merges = graft.text.BpeTrainer.trainMerges(docs, "text", numMerges = 4)
    assert(merges == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L), (4, "lo", "w", 7L)))
    // early stop below minFreq: a corpus of unique characters has no
    // pair reaching 2
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(graft.text.BpeTrainer.trainMerges(tiny, "text", numMerges = 5,
      minFreq = 2L).isEmpty)
    // repeat runs pair left-to-right, and a merged piece can't chain
    val run = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val m = graft.text.BpeTrainer.trainMerges(run, "text", numMerges = 2)
    // "a a a a": 3 adjacent (a,a) pairs × 3 words = 9 counted; the fold
    // merges (a1,a2)(a3,a4) → "aa aa"; round 2 merges (aa,aa)
    assert(m == Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("BpeTokenCounter tokenizes with the learned merges (train-use loop)") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest widest widest widest"))
      .toDF("doc_id", "text")
    val merges = graft.text.BpeTrainer.trainMerges(docs, "text", numMerges = 4)
      .map(m => (m._2, m._3))
    val counter = graft.text.BpeTokenCounter(merges)
    // with merges (e,s)(es,t)(l,o)(lo,w): low → low (1 piece),
    // lower → low|e|r (3), newest → n|e|w|est (4)
    val got = Seq("low lower newest", "", "zzz")
      .toDF("text").select(counter.count(col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(8L, 0L, 3L))
  }

  test("t25 encode shape: early-stopped merge table and wordless docs") {
    import org.apache.spark.sql.functions.col
    // training early-stops at 0 merges (all pairs below minFreq) —
    // encoding must fall back to character grain, and a doc with no
    // words must report 0/0 (the oracle's LEFT JOIN coalesce path)
    val docs = Seq((1L, "ab cd"), (2L, "!!!")).toDF("doc_id", "text")
    val merges = graft.text.BpeTrainer.trainMerges(docs, "text",
      numMerges = 12).map(m => (m._2, m._3))
    assert(merges.isEmpty)
    val counter = graft.text.BpeTokenCounter(merges)
    val got = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.text.BpeTrainer.words(col("text"))).cast("long").as("n_words"),
        counter.count(col("text")).as("n_pieces"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 4L), (2L, 0L, 0L)))
  }

  test("longest match wins over shorter prefixes") {
    // "tion" must match the 4-char piece, not th|i|on or t|i|on
    assert(pieces("tion") == Map("tion" -> 1L))
    // "ermine": er|m|in|e — "er" beats nothing longer, fallback m/e
    assert(pieces("ermine") == Map("ermine" -> 4L))
  }

  test("multi-word text sums per-word pieces; case and splitter match t3") {
    // "The Starting" → the|st|ar|t|ing after lowercasing = 1 + 4
    assert(pieces("The Starting") == Map("The Starting" -> 5L))
    // empty and non-letter-only strings count 0 words
    assert(pieces("", "!!!") == Map("" -> 0L, "!!!" -> 0L))
  }

  test("whitespace counter equals the t3 token contract") {
    val got = Seq("a b  c", "", "one", "é è deux").toDF("text")
      .select(WhitespaceTokenCounter.count(col("text")))
      .as[Long].collect().toSeq
    assert(got == Seq(3L, 0L, 1L, 3L))
  }

  test("split assignment is exhaustive, deterministic, and ~fractional") {
    import org.apache.spark.sql.functions._
    val ids = (1L to 2000L).toDF("id")
    val fr = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val got = graft.text.Sampling.splitAssign(ids, "id", fr)
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(got.keySet == Set("train", "val", "test")) // exhaustive
    assert(got.values.sum == 2000L)
    // md5 is uniform: each split within ±30% of its expectation
    fr.foreach { case (name, f) =>
      val expect = 2000.0 * f
      assert(math.abs(got(name) - expect) < 0.3 * expect + 10,
        s"$name: ${got(name)} vs ~$expect")
    }
    // deterministic: re-running assigns identically
    val a = graft.text.Sampling.splitAssign(ids, "id", fr)
      .as[(Long, String)].collect().toMap
    val b = graft.text.Sampling.splitAssign(ids, "id", fr)
      .as[(Long, String)].collect().toMap
    assert(a == b)
    // map-side only
    val plan = graft.text.Sampling.splitAssign(ids, "id", fr)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("piece-grain chunking matches hand-derived spans") {
    // "the xy ing": pieces the=1, xy=2 (no 'xy' piece → char fallback),
    // ing=1 → prefix cumb=[0,1,3], total 4. window=3, step=2 →
    // starts 0 and 2:
    //   start 0: pieces [0,2] → covering words 1..2 ("the xy")
    //   start 2: n=min(3,2)=2, pieces [2,3] → words 2..3 ("xy ing")
    val out = graft.text.Chunking.pieceChunks(
        Seq((1L, "the xy ing"), (2L, ""), (3L, "!!!")).toDF("doc_id", "text"),
        "doc_id", "text", window = 3, step = 2)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    assert(out === Set(
      (1L, 0L, 3L, 0L, 2L, "the xy"),
      (1L, 2L, 2L, 1L, 2L, "xy ing")))
    // map-side only: no shuffle in the plan
    val plan = graft.text.Chunking.pieceChunks(
        Seq((1L, "the xy ing")).toDF("doc_id", "text"),
        "doc_id", "text", 3, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("piece count is always between word count and char count") {
    val docs = Tables.load(spark, sf, "documents").limit(100)
    val bad = docs.select(
        WhitespaceTokenCounter.count(col("text")).as("nw"),
        VocabTokenCounter.count(col("text")).as("np"),
        length(col("text")).cast("long").as("nc"))
      .filter(col("np") < col("nw") || col("np") > col("nc"))
      .count()
    assert(bad == 0L)
  }
}
