package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disposable stage profiler for w15 (test scope): times each gate
  * stage separately to localize codegen blowups / hot spots. */
object W15Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[w15probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    // control plane piece by piece (mirrors w15Control)
    val base0 = StreamQueries.w15Base(docs)
    val corpus = base0.filter(col("doc_id") % 3 === 0)
    val hashes0 = t("c_hashes")(
      corpus.select(md5(col("text2")).as("__h")).distinct().localCheckpoint(true))
    val refBuckets0 = t("c_refb")(corpus
      .select(explode(graft.functions.LshBands(
        graft.text.ScriptText.tokens(col("text2")), 5, 16, 4)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .distinct().localCheckpoint(true))
    val (cc2, cc1) = graft.text.ScriptLm.hashedCounts(corpus, "text2",
      TextQueries.SLmB2, TextQueries.SLmB1)
    val lm0 = t("c_dense")(graft.text.ScriptLm.denseCounts(cc2, cc1,
      TextQueries.SLmB2, TextQueries.SLmB1))
    val cuts0 = t("c_cuts")(graft.text.ScriptLm.percentileCuts(
        graft.text.ScriptLm.score(corpus, cc2, cc1, TextQueries.SLmB2,
          TextQueries.SLmB1, "text2", "doc_id"),
        TextQueries.SLmKeepNum, TextQueries.SLmKeepDen)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1))
    val gated0 = StreamQueries.w15Gated(StreamQueries.w15Planted(docs),
      hashes0, refBuckets0, lm0, cuts0)
    val counts0 = gated0.groupBy("script").agg(count(lit(1)).as("__n"))
    t("c_probs")(counts0.crossJoin(broadcast(counts0.agg(min("__n").as("__nmin"))))
      .select(col("script"),
        sqrt(col("__nmin").cast("double") / col("__n").cast("double")).as("p"))
      .localCheckpoint(true))
    if (args.length > 1) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val counts1 = StreamQueries.w15Gated(StreamQueries.w15Planted(docs),
          hashes0, refBuckets0, lm0, cuts0)
        .groupBy("script").agg(count(lit(1)).as("__n"))
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        org.apache.spark.sql.execution.debug.codegenString(
          counts1.queryExecution.executedPlan).getBytes)
      println(s"[w15probe] codegen dumped to ${args(1)}")
      spark.stop(); return
    }
    val (hashes, refBuckets, lm, cuts, probs) =
      t("control")(StreamQueries.w15Control(spark, dir))
    val planted = StreamQueries.w15Planted(docs)
    import graft.text.{ScriptLm, ScriptText}
    val fresh = planted.withColumn("__h", md5(col("text2")))
      .join(broadcast(hashes), Seq("__h"), "left_anti")
      .drop("__h").persist()
    t("exact_probe")(fresh.count())
    val withBands = fresh.withColumn("__bb",
      graft.functions.LshBands(ScriptText.tokens(col("text2")), 5, 16, 4))
    val probed = (0 until 4).foldLeft(withBands) { (df, k) =>
      val ref = refBuckets.filter(col("band") === k)
        .select(col("bucket").as(s"__r$k"))
      df.join(broadcast(ref),
        try_element_at(col("__bb"), lit(k + 1)).getField("bucket") === col(s"__r$k"),
        "left_outer")
    }
    val survivors = probed
      .filter((0 until 4).map(k => col(s"__r$k").isNull).reduce(_ && _))
      .select(col("doc_id"), col("text2")).persist()
    t("band_probe")(survivors.count())
    val scripted = survivors
      .withColumn("script", ScriptText.dominantScript(col("text2")))
      .filter(ScriptText.qualityE4("text2") >=
        when(col("script") === "cjk", CorpusQueries.L7QCjk)
          .otherwise(CorpusQueries.L7QOther)).persist()
    t("quality_gate")(scripted.count())
    val stats = graft.functions.ScriptLmScore(
      ScriptText.tokens(col("text2")), ScriptLm.scriptIndex(col("script")),
      lm._1, lm._2, TextQueries.SLmB2, TextQueries.SLmB1)
    val kept = scripted.withColumn("__st", stats)
      .filter(ScriptLm.gateKept(col("script"), element_at(col("__st"), 1),
        element_at(col("__st"), 2), cuts))
      .select("doc_id", "script", "text2").persist()
    t("lm_gate")(kept.count())
    val sampled = graft.text.Sampling.weightedSample(kept, "script", "doc_id", probs)
    val chunks = graft.text.Chunking.tokenChunks(sampled, "doc_id", "text2",
      window = 32, step = 24, keep = Seq("script"),
      tokenizer = graft.text.ScriptText.tokens)
    val out = graft.text.Packing.streamingBinSegments(chunks, "script", "doc_id",
      "token_start", "n_tokens", seqLen = 512)
    t("sample_chunk_pack")(out.count())
    spark.stop()
  }
}
