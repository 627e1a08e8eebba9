package graft

import graft.text.LanguageModel
import org.apache.spark.sql.functions._

/** Pins the native [[graft.functions.LmScore]] kernel bit-identical to
  * the Column reference form
  * ([[LanguageModel.nllColumnsReference]]) — the aggregate-HOF fold
  * with per-gram md5 buckets and CASE ladders it replaces. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",
    "solo",
    "two words",
    "the quick brown fox jumps over the lazy dog",
    "repeat repeat repeat repeat",
    "MiXeD CaSe ToKeNs AND digits 123 456",
    "punct,separated;tokens!here?end",
    "naïve café déjà vu",                  // à-ÿ letters are SEPARATORS in [a-z0-9]
    "日本語 テスト mixed 日本 words",        // CJK separators between ascii tokens
    "Kelvin İstanbul",           // K→k, İ→i+U+0307 full-case mappings
    "tab\tand\nnewline  spaced   out",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "0 1 00 01 987654321 a1b2c3",
    "ün÷deux trois",                        // 2-byte separators inside runs
    "ends with separator...",
    "...starts with separator"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("native kernel == Column reference fold, bit for bit") {
    val df = adversarial.toDF("id", "text")
    // a model trained on part of the same corpus, so seen/unseen
    // bigrams, seen/unseen prefixes, and collisions all occur
    val (c2, c1) = LanguageModel.hashedCounts(
      df.filter($"id" % 2 === 0), "text", b2 = 32, b1 = 16)
    val (d2, d1) = LanguageModel.denseCounts(c2, c1, 32, 16)
    val (nN, nS) = LanguageModel.nllColumns(d2, d1, 32, 16, "text")
    val (rN, rS) = LanguageModel.nllColumnsReference(d2, d1, 32, 16, "text")
    val bad = df.select($"id", nN.as("nn"), nS.as("ns"),
        rN.as("rn"), rS.as("rs"))
      .filter($"nn" =!= $"rn" || $"ns" =!= $"rs")
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("native kernel handles degenerate models (all-zero counts)") {
    val df = adversarial.toDF("id", "text")
    val (nN, nS) = LanguageModel.nllColumns(
      Seq.fill(8)(0L), Seq.fill(4)(0L), 8, 4, "text")
    val (rN, rS) = LanguageModel.nllColumnsReference(
      Seq.fill(8)(0L), Seq.fill(4)(0L), 8, 4, "text")
    val rows = df.select(nN.as("nn"), nS.as("ns"), rN.as("rn"), rS.as("rs"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3))
    }
    // every gram of an untrained model costs the same smoothed floor
    val perGram = rows.filter(_.getLong(0) > 0).map(r =>
      (r.getLong(1), r.getLong(0)))
    assert(perGram.nonEmpty)
    val costs = perGram.map { case (s, n) => s.toDouble / n }.distinct
    assert(costs.length == 1)
  }

  test("incremental hashed-LM maintenance is exact: fold of per-dump " +
      "counts == training on the union") {
    val df = adversarial.toDF("id", "text")
    val oldDump = df.filter($"id" < 8)
    val newDump = df.filter($"id" >= 8)
    val (uc2, uc1) = LanguageModel.hashedCounts(df, "text", 32, 16)
    val (oc2, oc1) = LanguageModel.hashedCounts(oldDump, "text", 32, 16)
    val (nc2, nc1) = LanguageModel.hashedCounts(newDump, "text", 32, 16)
    val f2 = LanguageModel.foldHashedCounts(oc2, nc2, "__c2")
    val f1 = LanguageModel.foldHashedCounts(oc1, nc1, "__c1")
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(f2) == m(uc2))
    assert(m(f1) == m(uc1))
    // and the deployed scorer built from the folded counts is the
    // union-trained scorer, bit for bit
    val (du2, du1) = LanguageModel.denseCounts(uc2, uc1, 32, 16)
    val (df2, df1) = LanguageModel.denseCounts(f2, f1, 32, 16)
    assert(du2 == df2 && du1 == df1)
  }

  test("native kernel == Column reference on a 300-string random corpus " +
      "(ScalaCheck, every classification boundary)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val atom: Gen[String] = Gen.oneOf(
      Gen.alphaLowerChar.map(_.toString), Gen.alphaUpperChar.map(_.toString),
      Gen.numChar.map(_.toString),
      Gen.oneOf(' ', '\t', '\n', ',', '.', '-').map(_.toString),
      Gen.choose(0xdf.toChar, 0x101.toChar).map(_.toString),
      Gen.oneOf("İ", "K", "Ÿ", "̇", "一", "テ", "😀"))
    val genText = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, atom).map(_.mkString))
    val texts = Gen.listOfN(300, genText)
      .apply(Gen.Parameters.default, Seed(97L)).getOrElse(Nil)
    assert(texts.nonEmpty)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val (c2, c1) = LanguageModel.hashedCounts(
      df.filter($"id" % 3 === 0), "text", b2 = 16, b1 = 8)
    val (d2, d1) = LanguageModel.denseCounts(c2, c1, 16, 8)
    val (nN, nS) = LanguageModel.nllColumns(d2, d1, 16, 8, "text")
    val (rN, rS) = LanguageModel.nllColumnsReference(d2, d1, 16, 8, "text")
    val bad = df.select($"id", nN.as("nn"), nS.as("ns"),
        rN.as("rn"), rS.as("rs"))
      .filter($"nn" =!= $"rn" || $"ns" =!= $"rs").collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("size contract: dense arrays must match the bucket counts") {
    intercept[IllegalArgumentException] {
      LanguageModel.nllColumns(Seq(0L), Seq(0L), 8, 4, "text")
    }
  }
}
