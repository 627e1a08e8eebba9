package graft

import graft.sim.DomainMix
import graft.text.LanguageModel
import org.apache.spark.sql.functions._

/** Pins [[DomainMix.lossReweight]] — the DoReMi-gesture mixture: the
  * hard domain is upweighted, the exp2 ladder arithmetic matches a
  * driver recompute, the cap binds, and unscorable domains carry the
  * base weight.
  */
class DomainReweightSpec extends SparkSpec {
  import spark.implicits._

  private val F = LanguageModel.F

  test("hard domain upweighted; exp2 matches the documented form; caps") {
    val easy = "the cat sat on the mat and the cat ran off home again"
    val corpus = Seq(
      (0L, easy, "ref"), (1L, easy + " " + easy, "ref"),
      (2L, "the cat sat on the mat", "easy"),
      (3L, "the cat ran off home", "easy"),
      (4L, "zq xv wk jj qqq zzz vvv kkk xxx www", "hard"),
      (5L, "jj qq zz xx vv ww kk", "hard"),
      (6L, "中文 字符", "cjk"))
    val docs = corpus.toDF("doc_id", "text", "source")
    val out = DomainMix.lossReweight(docs,
        docs.filter(col("source") === "ref"), "text", "doc_id", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // hard domain: unseen bigrams → max excess → capped weight 16·2F-ish
    val (_, _, _, exHard, wHard, shHard) = out("hard")
    val (_, _, _, exEasy, wEasy, shEasy) = out("easy")
    assert(exHard > exEasy)
    assert(wHard > wEasy && shHard > shEasy)
    // exp2 form: weight = 2^e · (F + frac)
    Seq("ref", "easy", "hard").foreach { d =>
      val ex = out(d)._4
      val e = ex / F
      assert(out(d)._5 === (1L << e) * (F + (ex - e * F)), d)
    }
    // cap: excess never exceeds 4·F, weight never exceeds 16·(2F−1)
    assert(exHard <= 4L * F && wHard <= 16L * (2L * F - 1L))
    // unscorable domain (no ASCII grams): unscorable key, base weight
    val cjk = out("cjk")
    assert(cjk._3 === LanguageModel.UnscorableKey)
    assert(cjk._4 === 0L && cjk._5 === F)
    // shares sum to ≤ 2^20 (floor division) and within 4 of it
    val shareSum = out.values.map(_._6).sum
    assert(shareSum <= 1048576L && shareSum >= 1048576L - 4L)
    graft.ops.StagePersists.release(spark)
  }

  test("mixtureRates: hottest domain keeps all; gate streams append-mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "the cat sat on the mat and ran off home", "ref"),
      (1L, "the cat sat on the mat", "easy"),
      (2L, "zq xv wk jj qqq zzz vvv kkk", "hard"))
    val docs = corpus.toDF("doc_id", "text", "source")
    val mix = DomainMix.lossReweight(docs,
      docs.filter(col("source") === "ref"), "text", "doc_id", "source")
    val rates = DomainMix.mixtureRates(mix)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hottest (hard) domain: threshold exactly 2^60
    assert(rates("hard") === (1L << 60))
    assert(rates.values.forall(t => t > 0L && t <= (1L << 60)))
    assert(rates("easy") < rates("hard"))
    // the deployed gate is a broadcast stream-static join + filter:
    // append-mode legal, stream == batch
    val ratesDf = DomainMix.mixtureRates(mix)
      .withColumnRenamed("domain", "source").localCheckpoint()
    def stage(df: org.apache.spark.sql.DataFrame) =
      df.join(broadcast(ratesDf), Seq("source"))
        .select(col("doc_id"), col("source"),
          (graft.dedup.Dedup.md5Long(col("doc_id").cast("string")) <
            col("rate_thr")).as("kept"))
    val batch = stage(docs).collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, String, String)]
    val q = stage(input.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("w19_stream")
      .outputMode("append").start()
    try {
      input.addData(corpus: _*)
      q.processAllAvailable()
      assert(spark.table("w19_stream").collect().map(_.toSeq).toSet
        === batch)
    } finally q.stop()
    graft.ops.StagePersists.release(spark)
  }
}
