package graft

import graft.text.{ScriptText, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the script-aware text plane: tokenization across scripts, the
  * per-script census, the script-gated language ID, and — the point of
  * the module — that non-Latin documents which are INVISIBLE to the
  * Latin plane (zero tokens, quality ≈ 0, zero shingles) are fully
  * visible to the script plane. */
class ScriptTextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("script tokens: CJK chars are single tokens, other scripts split on letter runs") {
    val toks = Seq("один два 一二三 three, naïve!").toDF("t")
      .select(expr("1"), ScriptText.tokenCount("t"))
    assert(one[Long](Seq("один два 一二三 three, naïve!").toDF("t")
      .select(ScriptText.tokenCount("t"))) == 7L) // один, два, 一, 二, 三, three, naïve
    val arr = Seq("Привет мир 水火木 mixed42 case").toDF("t")
      .select(ScriptText.tokenCount("t"))
    assert(one[Long](arr) == 7L) // привет, мир, 水, 火, 木, mixed42, case
  }

  test("per-script census counts code points by Unicode script") {
    val df = Seq("abc一二三 Привет ابت αβ 42!").toDF("t")
    val r = df.select(
      ScriptText.nLatin($"t"), ScriptText.nCjk($"t"),
      ScriptText.nCyrillic($"t"), ScriptText.nArabic($"t"),
      ScriptText.nGreek($"t"), ScriptText.nLetters($"t")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 3L, 6L, 3L, 2L, 17L)))
  }

  test("dominant script and script-gated langId") {
    val rows = Seq(
      ("一二三四五 six", "cjk", "zh"),
      ("Привет это мир hello", "cyrillic", "ru"),
      ("ابتثج hello", "arabic", "ar"),
      ("αβγδε yes", "greek", "el"),
      ("the cat and the dog is here for all of us", "latin", "en"),
      ("12345 .,!", "none", "unknown")).toDF("t", "escript", "elang")
    val bad = rows.select(
        ScriptText.dominantScript($"t").as("s"), $"escript",
        ScriptText.langId("t").as("l"), $"elang")
      .filter($"s" =!= $"escript" || $"l" =!= $"elang").collect()
    assert(bad.isEmpty, bad.mkString(";"))
  }

  test("CJK text invisible to the Latin plane is visible to the script plane") {
    val zh = ("一二三四五六七八九十" * 40) + "。" // 400 CJK chars, no Latin
    val df = Seq((1L, zh)).toDF("doc_id", "text")
    // Latin plane: zero tokens, zero shingles, quality collapses
    assert(one[Long](df.select(TextAnalysis.tokenCount("text"))) == 0L)
    assert(graft.dedup.Dedup.wordShingles(df, "text", "doc_id", 3).count() == 0L)
    // script plane: every char a token, shingles exist, quality scores
    assert(one[Long](df.select(ScriptText.tokenCount("text"))) == 400L)
    assert(ScriptText.shingles(df, "text", "doc_id", 3).count() > 0L)
    val qLat = one[Double](df.select(TextAnalysis.qualityScore("text")))
    val qScr = one[Double](df.select(ScriptText.qualityScore("text")))
    // Latin plane: alpha and word-length terms collapse to 0 (only the
    // script-neutral length/punct/digit terms survive → exactly 0.5)
    assert(qLat <= 0.5, s"latin-plane quality unexpectedly high: $qLat")
    assert(qScr > 0.7, s"script-plane quality unexpectedly low: $qScr")
  }

  test("script shingles feed the unchanged pair machinery (jaccard on CJK)") {
    val a = "一二三四五六七八九十百千万上下左右中大小"
    val b = a.substring(0, 16) // 80% prefix
    val df = Seq((1L, a), (2L, b), (3L, "水火木金土水火木金土水火木金土水火木金土"))
      .toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.jaccardPairs(
      ScriptText.shingles(df, "text", "doc_id", 3), threshold = 0.5, 1000)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
  }

  test("decontamination: the Latin probe is blind to non-Latin leakage; " +
      "the script probe sees every script") {
    import graft.dedup.Decontamination
    // one contaminated doc per script: the doc IS (a superset of) the
    // eval text, so every gram of the eval doc leaks
    val zh = "一二三四五六七八九十百千万上下左右中大小明月日水火木" * 3
    val ru = "привет это мир и все хорошо сегодня здесь опять снова " * 3
    val en = "the quick brown fox jumps over the lazy dog again today " * 3
    val corpus = Seq((1L, en + "tail"), (2L, zh + "。"), (3L, ru + "да"),
      (4L, "clean unrelated words nothing shared here at all nine ten"))
      .toDF("doc_id", "text")
    val eval_ = Seq((100L, en), (101L, zh), (102L, ru)).toDF("doc_id", "text")
    val latin = Decontamination.contaminatedDocs(
      corpus, eval_, "text", "doc_id", n = 5).select("id")
      .as[Long].collect().toSet
    val script = Decontamination.contaminatedDocsScript(
      corpus, eval_, "text", "doc_id", n = 5).select("id")
      .as[Long].collect().toSet
    // Latin plane: the zh doc yields ZERO grams (invisible); the ru doc
    // also (cyrillic outside [a-z0-9]) — only the en leak is caught
    assert(latin == Set(1L), s"latin probe saw: $latin")
    // script plane: every leaked doc flagged, the clean one not
    assert(script == Set(1L, 2L, 3L), s"script probe saw: $script")
  }

  test("Latin-only text: script plane agrees with the Latin plane's counts") {
    val docs = Tables.load(spark, sf, "documents").filter(col("lang") === "en")
    // testdata text is pure ASCII: the script tokenizer must reproduce
    // the Latin tokenizer's counts exactly on it
    val diff = docs.select(
        TextAnalysis.tokenCount("text").as("a"),
        ScriptText.tokenCount("text").as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff == 0L)
  }
}
