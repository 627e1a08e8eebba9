package graft

import org.apache.spark.sql.functions._

/** Pins the native [[graft.functions.TokenArray]] tokenizer
  * bit-identical to the engine's regex contracts —
  * `filter(split(lower(text), "[^a-zà-ÿ0-9]+"), _ != "")` and the
  * ASCII `[^a-z0-9]+` class — which every text/dedup operator now
  * routes through. */
class TokenArraySpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",
    "   ",
    "solo",
    "Two Words",
    "the quick brown fox jumps over the lazy dog",
    "punct,separated;tokens!here?end",
    "naïve café déjà vu ün÷deux",       // à-ÿ inside words; ÷ (U+00F7) IS in the à-ÿ range
    "àÿ boundary ßharp",                // range endpoints + ß (U+00DF, OUTSIDE à-ÿ)
    "日本語 テスト mixed 日本 words",     // 3-byte separators
    "emoji 😀 separ😀ated",              // 4-byte separators
    "Kelvin İstanbul Ÿield",            // K→k, İ→i+̇ , Ÿ→ÿ full-case mappings
    "tab\tand\nnewline  spaced   out",
    "0 1 00 01 987654321 a1b2c3",
    "ends with dots...",
    "...starts with dots",
    "ÀÉÎÕÜ upper accents lowercase into the range",
    "a",
    "à",
    "1"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("native tokenizer == regex split, both classes, bit for bit") {
    val df = adversarial.toDF("id", "text")
    val accented = filter(split(lower($"text"), "[^a-zà-ÿ0-9]+"),
      w => w =!= "")
    val ascii = filter(split(lower($"text"), "[^a-z0-9]+"), w => w =!= "")
    val bad = df.select($"id",
        graft.functions.TokenArray($"text").as("na"),
        accented.as("ra"),
        graft.functions.TokenArray.asciiTokens($"text").as("ns"),
        ascii.as("rs"))
      .filter($"na" =!= $"ra" || $"ns" =!= $"rs")
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("tokenizes the corpus identically (spot check at sf0.001)") {
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.filter(
      graft.functions.TokenArray($"text") =!=
        filter(split(lower($"text"), "[^a-zà-ÿ0-9]+"), w => w =!= ""))
      .count()
    assert(n == 0L)
  }
}
