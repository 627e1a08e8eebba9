package graft

import graft.text.{QualityDistill, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins the distilled-quality-classifier training to a plain-Scala
  * reference of the same arithmetic (bit-identical weights — the
  * distributed integer-gradient + driver-double-update contract) and
  * its fit to actually improving on the zero model. */
class QualityDistillSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "The quick brown fox jumps over the lazy dog near the river bank today.",
    "aaa!!! ### $$$ %%% ^^^ &&& *** ((( ))) !!!",
    "1234567890 9876543210 1111111111 2222222222",
    "A sensible paragraph of English prose, with punctuation, numbers like 3, and length enough to score well on the composite heuristic used as the seed label." * 3,
    "short",
    "",
    "Ein vernünftiger deutscher Absatz mit ausreichend Länge und wenig Interpunktion für einen guten Wert.",
    "x" * 30000,
    "words words words words words words words words words words words",
    "Mixed 123 content!! with?? some,, punctuation;; and DIGITS 456 789."
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def df = docs.toDF("doc_id", "text")

  test("train ≡ plain-Scala reference GD, bit-identical weights") {
    val w = QualityDistill.train(df, "text", TextAnalysis.qualityE4("text"))
    // collect the SAME quantized features + label the library trains on
    val feats = df.select(
      QualityDistill.features("text").zipWithIndex
        .map { case (f, j) => f.as(s"f$j") } :+
        TextAnalysis.qualityE4("text").as("y"): _*)
      .collect().map(r => (Array.tabulate(6)(j => r.getLong(j)), r.getLong(6)))
    var ref = Array.fill(6)(0.0)
    val n = feats.length.toLong
    for (_ <- 1 to 8) {
      val g = Array.fill(6)(0L)
      feats.foreach { case (f, y) =>
        val p = (0 until 6).map(j => f(j).toDouble / 10000d * ref(j))
          .reduceLeft(_ + _)
        val r = math.floor((y.toDouble / 10000d - p) * 1000000d + 0.5d).toLong
        (0 until 6).foreach(j => g(j) += f(j) * r)
      }
      ref = Array.tabulate(6)(j =>
        ref(j) + 0.5 * (g(j).toDouble / (n.toDouble * 1.0e10)))
    }
    assert(w.toSeq == ref.toSeq,
      s"library ${w.toSeq} != reference ${ref.toSeq}")
  }

  test("training improves on the zero model (distillation actually fits)") {
    val w = QualityDistill.train(df, "text", TextAnalysis.qualityE4("text"))
    val err = df.select(
      abs(TextAnalysis.qualityE4("text").cast("double") / 10000d -
        QualityDistill.score("text", w)).as("e"),
      (TextAnalysis.qualityE4("text").cast("double") / 10000d).as("z"))
      .agg(avg("e"), avg("z")).head()
    val (fitted, zero) = (err.getDouble(0), err.getDouble(1))
    // the zero model's error is the mean label itself; the fit must
    // beat it clearly (this corpus: well under half)
    assert(fitted < zero * 0.5, s"fitted $fitted vs zero-model $zero")
  }

  test("deterministic across runs and independent of partitioning") {
    val w1 = QualityDistill.train(df, "text", TextAnalysis.qualityE4("text"))
    val w2 = QualityDistill.train(df.repartition(7), "text",
      TextAnalysis.qualityE4("text"))
    assert(w1.toSeq == w2.toSeq)
  }

  test("empty corpus fails loudly") {
    intercept[IllegalArgumentException] {
      QualityDistill.train(df.filter(col("doc_id") < 0), "text",
        TextAnalysis.qualityE4("text"))
    }
  }

  test("scorer output matches score_e6 quantization of the Column form") {
    val w = QualityDistill.train(df, "text", TextAnalysis.qualityE4("text"))
    val out = df.select(col("doc_id"),
      floor(QualityDistill.score("text", w) * 1000000d + 0.5d)
        .cast(LongType).as("s")).collect()
    assert(out.forall(r => math.abs(r.getLong(1)) < 2000000L),
      "scores should stay near the [0, 10^6] label band")
  }
}
