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

  test("sequence packing fills bins in order and matches the window reference") {
    import spark.implicits._
    // hand-checkable: 10-token chunks into 25-token bins — the third
    // chunk starts at offset 20 and straddles into bin 1
    val small = Seq((1L, 0, 10), (1L, 24, 10), (2L, 0, 10), (2L, 24, 10))
      .toDF("doc_id", "token_start", "n_tokens")
    val got = graft.text.Packing
      .packChunks(small, "doc_id", "token_start", "n_tokens", seqLen = 25)
      .orderBy("doc_id", "token_start")
      .collect().map(r => (r.getAs[Long]("bin_id"), r.getAs[Long]("bin_offset")))
    assert(got.toSeq === Seq((0L, 0L), (0L, 10L), (0L, 20L), (1L, 5L)))

    // distributed prefix-sum assignment == single global window reference
    val many = (1L to 500L).map(i => (i, 0, (i % 37 + 1).toInt))
      .toDF("doc_id", "token_start", "n_tokens")
    val packed = graft.text.Packing
      .packChunks(many, "doc_id", "token_start", "n_tokens", seqLen = 64)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("doc_id", "token_start")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = many
      .withColumn("before", sum(col("n_tokens").cast("long")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("token_start"), col("n_tokens"),
        ((col("before") - pmod(col("before"), lit(64L))) / 64).cast("long").as("bin_id"),
        pmod(col("before"), lit(64L)).as("bin_offset"))
    assert(packed.collect().toSet === ref.collect().toSet)
    // every offset stays inside the bin
    assert(packed.filter(col("bin_offset") >= 64 || col("bin_offset") < 0).count() === 0L)
  }

  test("bin segments cover every bin exactly and split straddlers") {
    import spark.implicits._
    // chunk stream (doc, start, n): doc2 straddles bins 0→1, doc3 1→2
    val chunks = Seq((1L, 0, 7), (2L, 0, 8), (3L, 5, 12))
      .toDF("doc_id", "token_start", "n_tokens")
    val segs = graft.text.Packing
      .binSegments(chunks, "doc_id", "token_start", "n_tokens", seqLen = 10)
      .select("bin_id", "seq", "doc_id", "token_start", "token_len")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(segs == Set(
      (0L, 1L, 1L, 0L, 7L),   // doc1 [0,7)
      (0L, 2L, 2L, 0L, 3L),   // doc2 head [7,10)
      (1L, 1L, 2L, 3L, 5L),   // doc2 tail [10,15): token_start 0+3
      (1L, 2L, 3L, 5L, 5L),   // doc3 head [15,20): keeps its own start 5
      (2L, 1L, 3L, 10L, 7L))) // doc3 tail [20,27)
    // invariant: every bin except the last sums to seqLen, and segments
    // are contiguous in seq order
    val byBin = segs.groupBy(_._1)
    val lastBin = byBin.keys.max
    byBin.foreach { case (bin, ss) =>
      val total = ss.toSeq.map(_._5).sum
      if (bin != lastBin) assert(total == 10L, s"bin $bin covers $total")
      assert(ss.toSeq.sortBy(_._2).map(_._2) == (1 to ss.size).map(_.toLong))
    }
    // zero-token chunks contribute nothing
    val withEmpty = chunks.union(Seq((9L, 0, 0)).toDF("doc_id", "token_start", "n_tokens"))
    assert(graft.text.Packing
      .binSegments(withEmpty, "doc_id", "token_start", "n_tokens", seqLen = 10)
      .filter(col("doc_id") === 9L).count() == 0L)
  }

  test("weighted sample matches an independently computed hash threshold") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (if (i <= 300) "en" else "de", i))
      .toDF("lang", "doc_id")
    val probs = Seq(("en", 0.25), ("de", 1.0)).toDF("lang", "p")
    val out = graft.text.Sampling.weightedSample(docs, "lang", "doc_id", probs)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    // independent reference: 60-bit md5 prefix vs floor(p * 2^60)
    def h60(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = (1L to 400L).flatMap { i =>
      val (lang, p) = if (i <= 300) ("en", 0.25) else ("de", 1.0)
      if (h60(i) < math.floor(p * math.pow(2, 60)).toLong) Some((lang, i)) else None
    }.toSet
    assert(out == want)
    // p = 1 keeps the whole group
    assert(out.count(_._1 == "de") == 100)
    // p = 0.25 keeps roughly a quarter (uniform hash, 300 draws)
    val kept = out.count(_._1 == "en")
    assert(kept > 45 && kept < 105, s"en kept $kept of 300 at p=0.25")
  }

  test("temperature sample keeps the smallest group whole, downsamples by sqrt") {
    import spark.implicits._
    // en:3600, de:400 → p_en = sqrt(400/3600) = 1/3, p_de = 1
    val docs = (1L to 4000L).map(i => (if (i <= 3600) "en" else "de", i))
      .toDF("lang", "doc_id")
    val out = graft.text.Sampling.temperatureSample(docs, "lang", "doc_id")
    val byLang = out.select("lang", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang("de") == 400, "smallest group must be kept whole")
    val en = byLang("en")
    assert(en > 1000 && en < 1400, s"en kept $en of 3600 at p=1/3")
    // deterministic: a second run selects the identical set
    val again = graft.text.Sampling.temperatureSample(docs, "lang", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("decontamination flags exactly the docs sharing eval n-grams") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely unrelated sentence about spark engines here"),
      (3L, "we saw the quick brown fox jumps too")
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "quick brown fox jumps over cliffs")).toDF("doc_id", "text")
    val flagged = graft.dedup.Decontamination
      .contaminatedDocs(corpus, eval_, "text", "doc_id", n = 4)
      .as[(Long, Long)].collect().toMap
    // doc1 shares "quick brown fox jumps" and "brown fox jumps over";
    // doc3 shares only "quick brown fox jumps"; doc2 shares nothing
    assert(flagged == Map(1L -> 2L, 3L -> 1L))
    val kept = graft.dedup.Decontamination
      .decontaminate(corpus, eval_, "text", "doc_id", n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("redaction scrubs planted PII and leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org or call 12345678 now"),
      (2L, "nothing sensitive here, just 12345 short"),
      (3L, "two mails a@b.co c@d.io and refs 999999 0000001")
    ).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.redact(docs, "text", "doc_id")
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((1, 1, "mail me at <EMAIL> or call <NUM> now")))
    assert(out(2L) == ((0, 0, "nothing sensitive here, just 12345 short")))
    assert(out(3L) == ((2, 2, "two mails <EMAIL> <EMAIL> and refs <NUM> <NUM>")))
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

  test("sampling strategy surface matches the underlying operators") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (if (i % 3 == 0) "de" else "en", i))
      .toDF("lang", "doc_id")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    // quota: same rows as quotaSample, input schema (no rank column)
    val q = Sampling.sample(docs, "lang", "doc_id", Sampling.Quota(20))
    assert(q.columns.toSeq === Seq("lang", "doc_id"))
    assert(ids(q) === ids(Sampling.quotaSample(docs, "lang", "doc_id", 20)))
    // probability: same rows as weightedSample
    val probs = Seq(("en", 0.4), ("de", 0.8)).toDF("lang", "p")
    assert(ids(Sampling.sample(docs, "lang", "doc_id", Sampling.Probability(probs)))
      === ids(Sampling.weightedSample(docs, "lang", "doc_id", probs)))
    // temperature: same rows as temperatureSample
    assert(ids(Sampling.sample(docs, "lang", "doc_id", Sampling.Temperature))
      === ids(Sampling.temperatureSample(docs, "lang", "doc_id")))
  }

  test("budget select takes best-score docs until the token budget, in order") {
    import spark.implicits._
    // scores descending 5..1, 10 tokens each; total 50, budget 0.5 → 25:
    // takes score 5 (cum 10) and score 4 (cum 20); score 3 would hit 30 > 25
    val docs = Seq((1L, 10L, 3L), (2L, 10L, 5L), (3L, 10L, 1L),
      (4L, 10L, 4L), (5L, 10L, 2L)).toDF("id", "n_tok", "score")
    val got = graft.text.Sampling.budgetSelect(docs, "id", "n_tok", "score", 0.5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 10L, 10L), (4L, 10L, 20L)))
    // ties broken by id ascending: equal scores, budget covers 2 of 3
    val tied = Seq((7L, 10L, 9L), (5L, 10L, 9L), (9L, 10L, 9L))
      .toDF("id", "n_tok", "score")
    val gotTied = graft.text.Sampling.budgetSelect(tied, "id", "n_tok", "score", 0.67)
      .as[(Long, Long, Long)].collect().toSet
    assert(gotTied == Set((5L, 10L, 10L), (7L, 10L, 20L)))
    // fraction 1.0 keeps everything
    assert(graft.text.Sampling.budgetSelect(docs, "id", "n_tok", "score", 1.0)
      .count() == 5L)
  }

  test("repetition metrics match hand-computed fractions") {
    import spark.implicits._
    val docs = Seq(
      // 6 words: "a" ×4 → top_word 4/6; bigrams (a a)(a b)(b a)(a a)(a c)
      // → top_bigram 2/5; trigrams (a a b)(a b a)(b a a)(a a c) all
      // distinct → dup 0/4
      (1L, "a a b a a c"),
      // pure repetition: every gram identical
      (2L, "x x x x"),
      (3L, "unique words only here"),
      (4L, ""),       // no tokens → 0.0 everywhere
      (5L, "solo"))   // one word: no bigrams/trigrams → 0.0 for those
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis
      .repetitionMetrics(docs, "text", "doc_id")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("top_word_frac"),
          r.getAs[Double]("top_bigram_frac"),
          r.getAs[Double]("dup_trigram_frac"))))
      .toMap
    assert(got(1L) === ((4.0 / 6, 2.0 / 5, 0.0)))
    // doc 2: words x×4 → 1.0; bigrams "x x"×3 → 1.0; trigrams "x x x"×2
    // → duplicated 2/2 = 1.0
    assert(got(2L) === ((1.0, 1.0, 1.0)))
    assert(got(3L) === ((0.25, 1.0 / 3, 0.0)))
    assert(got(4L) === ((0.0, 0.0, 0.0)))
    assert(got(5L) === ((1.0, 0.0, 0.0)))
  }

  test("cross-split familiarity separates in-distribution from OOD docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "train", "alpha beta gamma delta"),
      (2L, "train", "alpha beta epsilon zeta"),
      (3L, "val", "alpha beta gamma"),        // fully covered by train
      (4L, "val", "totally novel words here"), // zero train coverage
      (5L, "test", "alpha beta unseen pair"),  // partial
      (6L, "val", "solo")                      // <2 tokens: absent
    ).toDF("doc_id", "split", "text")
    val got = graft.text.TextAnalysis.crossSplitFamiliarity(
        docs, "text", "doc_id", "split")
      .select("id", "n_bigrams", "n_seen", "train_mass")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 3: bigrams {alpha beta, beta gamma}; both in train ("alpha
    // beta" appears in BOTH train docs → tdf 2, "beta gamma" in one)
    assert(got(3L) === ((3L, 2L, 2L, 3L)))
    assert(got(4L) === ((4L, 3L, 0L, 0L)))
    assert(got(5L) === ((5L, 3L, 1L, 2L)))
    assert(!got.contains(6L) && !got.contains(1L) && !got.contains(2L))
  }

  test("tfidf keywords rank rare terms above common ones, k-capped") {
    import spark.implicits._
    // "shared" appears in all 3 docs (df=3); each doc has one private
    // term (df=1). tf·N/df: private 1·3/1 = 3 > shared 1·3/3 = 1.
    val docs = Seq(
      (1L, "shared alpha"),
      (2L, "shared beta beta"),
      (3L, "shared gamma")).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.tfidfKeywords(docs, "text", "doc_id", k = 1)
      .select("id", "word", "score_e6", "kw_rank")
      .as[(Long, String, Long, Int)].collect().toSet
    // doc 2's beta: tf=2 → score 2·3/1 = 6
    assert(got == Set((1L, "alpha", 3000000L, 1),
      (2L, "beta", 6000000L, 1), (3L, "gamma", 3000000L, 1)))
    // k=2 brings in the shared term at rank 2 everywhere
    val k2 = graft.text.TextAnalysis.tfidfKeywords(docs, "text", "doc_id", k = 2)
    assert(k2.filter(col("word") === "shared" && col("kw_rank") === 2)
      .count() == 3L)
  }

  test("line dedup: first occurrence survives corpus-wide, later ones drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique opening line\nshared boilerplate nav\nanother line"),
      (2L, "shared boilerplate nav\nown content here"),
      // intra-doc repeat: second copy is removed from the SAME doc
      (3L, "repeat me\nrepeat me")).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.lineDedup(docs, "text", "doc_id")
      .select("id", "n_lines", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((3L, 0L,
      "unique opening line\nshared boilerplate nav\nanother line")))
    assert(got(2L) === ((2L, 1L, "own content here")))
    assert(got(3L) === ((2L, 1L, "repeat me")))
  }

  test("c4 clean: line rules, phrase/brace/min-lines doc rules") {
    import spark.implicits._
    val good = "this first line has plenty of words inside." + "\n" +
      "the second line also carries enough words here!"
    val docs = Seq(
      (1L, good), // 2 kept lines → kept
      (2L, good + "\nno terminal punctuation on this long enough line"),
      (3L, good + "\ntiny line."), // < 5 words → line drops, doc still kept
      (4L, "only one surviving line is not enough today."), // < 2 kept
      (5L, good + "\nsome Lorem Ipsum filler."), // phrase → dropped
      (6L, good + "\ncode { block }")) // brace → dropped
      .toDF("doc_id", "text")
    val got = graft.text.Cleaning.c4Clean(docs, "text", "doc_id")
      .select("id", "n_kept", "kept")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((2L, true)))
    assert(got(2L) === ((2L, true))) // extra line just drops
    assert(got(3L) === ((2L, true)))
    assert(got(4L) === ((1L, false)))
    assert(got(5L) === ((2L, false)))
    assert(got(6L) === ((2L, false)))
  }

  test("hashed weights keep target-only buckets (the curated-target deployment)") {
    import spark.implicits._
    // target is NOT a subset of raw: its signature bigram "gold gold"
    // never occurs in raw, yet must carry the largest positive weight
    val raw = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val tgt = Seq((10L, "gold gold")).toDF("doc_id", "text")
    val w = graft.text.Importance.hashedWeights(raw, tgt, "text", "doc_id",
        n = 2, buckets = 64)
      .as[(Long, Long)].collect().toMap
    // NT=1, NR=2: "gold gold" bucket → 1·2 − 0·1 = 2; raw buckets → −1
    assert(w.values.toSeq.sorted == Seq(-1L, -1L, 2L))
    // scoring a NOVEL doc containing the target gram sees the weight
    val weights = graft.text.Importance.hashedWeights(raw, tgt, "text",
      "doc_id", n = 2, buckets = 64)
    val scored = graft.text.Importance.scoreWithWeights(
        Seq((99L, "gold gold")).toDF("doc_id", "text"), weights,
        "text", "doc_id", n = 2, buckets = 64)
      .as[(Long, Long, Long)].collect().head
    assert(scored === ((99L, 1L, 2L)))
  }

  test("dsir importance: target-overrepresented grams score positive") {
    import spark.implicits._
    // raw = {d1 "a b", d2 "c d"}; target = {d1} → gram "a b" has
    // nt=1, nr=1; totals NT=1, NR=2 → w("a b") = 1·2 − 1·1 = 1;
    // w("c d") = 0·2 − 1·1 = −1. Short doc (one word) scores 0/0.
    val raw = Seq((1L, "a b"), (2L, "c d"), (3L, "x")).toDF("doc_id", "text")
    val tgt = raw.filter(col("doc_id") === 1L)
    val got = graft.text.Importance.importanceScores(raw, tgt, "text", "doc_id")
      .select("id", "n_grams", "score")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L), (2L, 1L, -1L), (3L, 0L, 0L)))
  }
}
