package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins [[graft.functions.QualityStats]] bit-identical to the regex
  * formulation it fuses (the t2/t3/t21 oracles then pin the same
  * semantics cross-engine against DuckDB). */
class QualityStatsSpec extends SparkSpec {
  import spark.implicits._

  // the regex formulation QualityStats replaced, term by term
  private def regexStats(c: org.apache.spark.sql.Column) = Seq(
    length(c).cast(LongType),
    length(regexp_replace(c, "[^A-Za-zà-ÿ]", "")).cast(LongType),
    length(regexp_replace(c, "[^0-9]", "")).cast(LongType),
    length(regexp_replace(c, "[^\\p{Punct}]", "")).cast(LongType),
    size(filter(split(lower(c), "[^a-zà-ÿ0-9]+"), w => w =!= ""))
      .cast(LongType))

  private val tricky = Seq(
    "hello world 123", "", "   ", "a", "ALLCAPS", "déjà vu façade",
    "À-to-ÿ range edge: À Þ ß à ÿ × ÷", // ×(U+D7) ÷(U+F7) in/out of à-ÿ
    "Ÿ uppercase lowers into range", "İstanbul dotted I expands",
    "!@#$%^&*()_+ only punct", "12 34 56", "tabs\tand\nnewlines",
    "mixed αβγ greek λόγος", "emoji 🎉 four-byte", "ﬀ ligature",
    "trailing separator!", "!leading", "double  space", "ñÑ úÚ",
    "a1b2c3", "ÀÈÌÒÙ all upper accents")

  test("fused stats equal the regex formulation on every component") {
    val df = tricky.toDF("t")
    val fused = df.select(graft.functions.QualityStats(col("t")).as("qs"))
      .collect().map(_.getSeq[Long](0))
    val rx = df.select(array(regexStats(col("t")): _*).as("qs"))
      .collect().map(_.getSeq[Long](0))
    tricky.indices.foreach { i =>
      assert(fused(i) == rx(i), s"mismatch on '${tricky(i)}'")
    }
  }

  test("null stays null; score and tokenCount agree with the old forms") {
    val df = Seq(Some("some text here"), None).toDF("t")
    val out = df.select(graft.functions.QualityStats(col("t")).as("qs"))
      .collect()
    assert(out(1).isNullAt(0))
    // tokenCount == size of the words array the shingles use
    val docs = tricky.filter(_.nonEmpty).toDF("t")
    val cmp = docs.select(
      graft.text.TextAnalysis.tokenCount("t").as("fused"),
      size(filter(split(lower(col("t")), "[^a-zà-ÿ0-9]+"), w => w =!= ""))
        .cast(LongType).as("rx"))
      .collect()
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("malformed UTF-8 (dangling lead byte) does not crash") {
    // parquet binary is NOT validated UTF-8: a truncated multi-byte
    // sequence at the end of the buffer must classify as one
    // non-alpha char, never read past the array
    import org.apache.spark.unsafe.types.UTF8String
    for (bad <- Seq(Array[Byte]('a', 'b', 0xc3.toByte),
        Array[Byte](0xc3.toByte), Array[Byte]('1', 0xdf.toByte))) {
      val stats = graft.functions.QualityStats.statsOf(
        UTF8String.fromBytes(bad))
      assert(stats.length == 5) // no ArrayIndexOutOfBoundsException
    }
  }

  test("interpreted eval matches codegen") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString(
      "Déjà! 42 ÷ 6 — λ test İ")
    val direct = graft.functions.QualityStats.statsOf(s).toSeq
    val viaPlan = Seq("Déjà! 42 ÷ 6 — λ test İ").toDF("t")
      .select(graft.functions.QualityStats(col("t")))
      .collect().head.getSeq[Long](0)
    assert(direct == viaPlan)
  }
}
