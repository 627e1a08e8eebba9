package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Components, Dedup}
import graft.text.{Chunking, Packing, Sampling, ScriptLm, ScriptText}

/** Disposable stage profiler for l7_multilingual_pipeline (test
  * scope): materializes each stage separately and prints the delta,
  * to find where the 70s+ sf0.1 wall-clock goes. */
object L7Probe {
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
      println(f"[l7probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val base = TextQueries.Scripts
      .derived(graft.Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("text2"))
    val doubled = base
      .unionByName(base.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text2")))
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          substring(col("text2"), lit(1),
            floor(length(col("text2")) * 0.8).cast("int")).as("text2")))
    val exact = Dedup.dropExactDuplicates(doubled, "text2", "doc_id")
      .persist()
    t("exact_dedup")(exact.count())

    val shingles = ScriptText.shingles(exact, "text2", "doc_id", 5).persist()
    t("script_shingles")(shingles.count())
    val pairs = Dedup.jaccardPairs(shingles, threshold = 0.5,
      maxDocFreq = 400L).select(col("ida"), col("idb")).persist()
    t("jaccard_pairs")(pairs.count())
    val labels = Components.connectedComponents(pairs, "ida", "idb")._1
      .persist()
    t("connected_components")(labels.count())
    val scored = exact.select(col("doc_id").as("id"),
      ScriptText.qualityE4("text2").as("q")).persist()
    t("quality_scored")(scored.count())
    val nonBest = Components.keepBest(labels, scored, "id", "component_id", "q")
      .filter(!col("keep")).select(col("id").as("doc_id"))
    val canon = exact.join(nonBest, Seq("doc_id"), "left_anti")
    val withScript = canon.withColumn("script",
      ScriptText.dominantScript(col("text2")))
    val qual = withScript.filter(ScriptText.qualityE4("text2") >=
      when(col("script") === "cjk", CorpusQueries.L7QCjk)
        .otherwise(CorpusQueries.L7QOther)).persist()
    t("quality_gate")(qual.count())

    val ref = qual.filter(col("doc_id") % 3 === 0).select("doc_id", "text2")
    val (c2, c1) = ScriptLm.hashedCounts(ref, "text2",
      TextQueries.SLmB2, TextQueries.SLmB1)
    t("lm_counts")(c2.count() + c1.count())
    val lmScored = ScriptLm.score(qual.select("doc_id", "text2"),
      c2, c1, TextQueries.SLmB2, TextQueries.SLmB1, "text2", "doc_id")
      .persist()
    t("lm_score")(lmScored.count())
    val cuts = ScriptLm.percentileCuts(lmScored,
      TextQueries.SLmKeepNum, TextQueries.SLmKeepDen)
    val lmKept = lmScored.join(broadcast(cuts), Seq("script"), "left_outer")
      .filter(when(!col("lm_scorable"), lit(true))
        .otherwise(graft.text.LanguageModel.avgKey(
          col("nll_fp"), col("n_grams")) <= col("cut")))
      .select(col("id").as("doc_id"), col("script"))
    val kept = qual.select("doc_id", "text2").join(lmKept, Seq("doc_id"))
      .persist()
    t("lm_gate")(kept.count())
    val sampled = Sampling.temperatureSample(kept, "script", "doc_id")
    val out = Packing.binSegments(
        Chunking.tokenChunks(sampled, "doc_id", "text2", window = 32,
          step = 24, keep = Nil, tokenizer = ScriptText.tokens),
        "doc_id", "token_start", "n_tokens", seqLen = 512)
      .orderBy("bin_id", "seq")
    t("sample_chunk_pack")(out.count())
    spark.stop()
  }
}
