package graft

import graft.text.ScriptText
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin of the native script-plane kernels
  * ([[graft.functions.ScriptTokens]], [[graft.functions.ScriptStats]])
  * against their builtin-regex ground truth on arbitrary well-formed
  * mixed-script strings — code points drawn to stress every
  * classification boundary: all five tracked scripts, astral Han
  * (genuine surrogate pairs inside the CJK class), full-case mappings,
  * combining marks, Unicode numbers beyond Nd, and plain ASCII. */
class ScriptKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val interesting: Gen[String] = Gen.oneOf(
    Gen.alphaChar.map(_.toString), Gen.numChar.map(_.toString),
    Gen.oneOf(' ', '\t', '\n', ',', '.', '-', '!', '~').map(_.toString),
    // the à-ÿ band and its neighbors; full-case-mapping chars
    Gen.choose(0xdf.toChar, 0x101.toChar).map(_.toString),
    Gen.oneOf("İ", "K", "Ÿ", "ß"),
    // the five tracked scripts (letters)
    Gen.oneOf("一", "万", "テ", "ひ", "ж", "Щ", "α", "Ω", "ا", "ض"),
    // combining mark (Inherited), Devanagari (letter, untracked
    // script), Roman numeral Ⅻ (Nl), superscript ² (No), Arabic-Indic
    // digit ٤ (Nd non-ASCII)
    Gen.oneOf("̇", "न", "Ⅻ", "²", "٤"),
    // astral: Han U+20000 (CJK class via surrogate pair) and emoji
    Gen.oneOf("𠀀", "😀"))

  private val genText: Gen[String] = Gen.chooseNum(0, 60).flatMap { n =>
    Gen.listOfN(n, interesting).map(_.mkString)
  }

  private lazy val df = {
    val texts = Gen.listOfN(400, genText)
      .apply(Gen.Parameters.default, Seed(20260815L)).getOrElse(Nil)
    assert(texts.nonEmpty)
    assert(texts.exists(_.contains("𠀀")), "astral Han must appear")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("native script tokenizer == regex formulation on mixed-script strings") {
    val bad = df.select($"id", $"text",
        ScriptText.tokens($"text").as("nat"),
        ScriptText.tokensRegex($"text").as("re"))
      .filter($"nat" =!= $"re").collect()
    assert(bad.isEmpty,
      bad.take(3).map(r => s"<${r.getString(1)}>: ${r.getSeq[String](2)} vs " +
        s"${r.getSeq[String](3)}").mkString("; "))
  }

  test("native script stats == regex censuses on mixed-script strings") {
    import graft.functions.ScriptStats
    val s = ScriptStats($"text")
    def re(clazz: String) = ScriptText.census($"text", clazz)
    val checks = Seq(
      (element_at(s, ScriptStats.Len), length($"text").cast("long")),
      (element_at(s, ScriptStats.Letters), re("\\p{L}")),
      (element_at(s, ScriptStats.Digits), re("0-9")),
      (element_at(s, ScriptStats.Punct), re("\\p{Punct}")),
      (element_at(s, ScriptStats.NTokens),
        size(ScriptText.tokensRegex($"text")).cast("long")),
      (element_at(s, ScriptStats.Arabic), re("\\p{IsArabic}")),
      (element_at(s, ScriptStats.Cjk), re(ScriptText.CjkClassJava)),
      (element_at(s, ScriptStats.Cyrillic), re("\\p{IsCyrillic}")),
      (element_at(s, ScriptStats.Greek), re("\\p{IsGreek}")),
      (element_at(s, ScriptStats.Latin), re("\\p{IsLatin}")))
    val badIdx = df.select($"text",
        ScriptText.dominantScript($"text").as("n"),
        ScriptText.dominantScriptRegex($"text").as("r"))
      .filter($"n" =!= $"r").collect()
    assert(badIdx.isEmpty, badIdx.take(3).mkString("; "))
    val cond = checks.map { case (n, r) => n =!= r }.reduce(_ || _)
    val bad = df.select($"text" +: checks.zipWithIndex.flatMap {
        case ((n, r), i) => Seq(n.as(s"n$i"), r.as(s"r$i")) }: _*)
      .filter(cond).collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }
}
