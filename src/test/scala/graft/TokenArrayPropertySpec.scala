package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin of [[graft.functions.TokenArray]] against the regex
  * contract on ARBITRARY well-formed strings — code points drawn to
  * stress every classification boundary (ASCII classes, the à-ÿ range
  * edges, just-outside neighbors U+00DF/U+0100, full-case-mapping
  * characters, multi-byte separators). */
class TokenArrayPropertySpec extends SparkSpec {
  import spark.implicits._

  private val interesting: Gen[Char] = Gen.oneOf(
    Gen.alphaLowerChar, Gen.alphaUpperChar, Gen.numChar,
    Gen.oneOf(' ', '\t', '\n', ',', '.', '-', '_', '!', '~'),
    Gen.choose(0xdf.toChar, 0x101.toChar),   // ß, à-ÿ, Ā/ā neighbors
    Gen.oneOf('İ', 'K', 'Ÿ'), // İ, K (Kelvin), Ÿ
    Gen.oneOf('̇', '一', 'テ', 'ж'), // combining dot, CJK, kana, cyrillic
    Gen.choose(0x1f600.toChar, 0x1f600.toChar)) // surrogate-pair seed (emoji low half alone is invalid — paired below)

  private val genText: Gen[String] = Gen.chooseNum(0, 60).flatMap { n =>
    Gen.listOfN(n, interesting).map { cs =>
      // repair any lone surrogates so the string is well-formed UTF-16
      val sb = new StringBuilder
      cs.foreach { c =>
        if (Character.isSurrogate(c)) sb.append("😀") else sb.append(c)
      }
      sb.toString
    }
  }

  test("native tokenizer == regex split on arbitrary well-formed strings") {
    val texts = Gen.listOfN(400, genText)
      .apply(Gen.Parameters.default, Seed(20260815L)).getOrElse(Nil)
    assert(texts.nonEmpty)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val accented = filter(split(lower($"text"), "[^a-zà-ÿ0-9]+"),
      w => w =!= "")
    val ascii = filter(split(lower($"text"), "[^a-z0-9]+"), w => w =!= "")
    val bad = df.select($"id", $"text",
        graft.functions.TokenArray($"text").as("na"), accented.as("ra"),
        graft.functions.TokenArray.asciiTokens($"text").as("ns"),
        ascii.as("rs"))
      .filter($"na" =!= $"ra" || $"ns" =!= $"rs")
      .collect()
    assert(bad.isEmpty,
      bad.take(3).map(r => s"${r.getString(1)}: ${r.getSeq[String](2)} vs " +
        s"${r.getSeq[String](3)} / ${r.getSeq[String](4)} vs ${r.getSeq[String](5)}")
        .mkString("; "))
  }
}
