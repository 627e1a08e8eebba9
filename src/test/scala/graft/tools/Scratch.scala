package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.dedup.{Components, Decontamination, Dedup}
import graft.text.{Chunking, Packing, Sampling, TextAnalysis}
import graft.queries.{DedupQueries, TextQueries}

/** Disposable experiment harness (test scope, rewritten per experiment).
  * Current experiment: stage-level wall breakdown of l3 at sf0.1. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warm
    graft.SparkEntry.queries("l3_curated_pipeline")(spark, "/root/testdata/sf0.001").count()
    graft.ops.StagePersists.release(spark); spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    val raw = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val blocked = t("0 blocklist") {
      val b = graft.rules.CorpusRules.sourceStats(raw, "source", "text",
          minAvgQuality = 0.91, maxShortFrac = 0.45)
        .filter(col("blocked")).select("source")
      b.count(); b
    }
    val docs = raw.join(broadcast(blocked), Seq("source"), "left_anti")
      .select(col("doc_id"), col("lang"), col("text"))
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("text")))
    val exact = t("1 exact") {
      val e = graft.ops.StagePersists.track(
        Dedup.dropExactDuplicates(doubled, "text", "doc_id"))
      e.count(); e
    }
    val pairs = t("2 minhash pairs") {
      val p = Dedup.minhashNearDuplicates(exact, "text", "doc_id",
          shingleSize = 3, numPerms = DedupQueries.NumPerms, rowsPerBand = 4,
          threshold = 0.8)
        .select(col("ida"), col("idb"))
      p.count(); p
    }
    val labels = t("3 components") {
      val l = Components.connectedComponents(pairs, "ida", "idb")._1
      l.count(); l
    }
    val canon = t("4 keep-best") {
      val scored = exact.select(col("doc_id").as("id"),
        TextQueries.round4(TextAnalysis.qualityScore("text")).as("q"))
      val nonBest = Components.keepBest(labels, scored, "id", "component_id", "q")
        .filter(!col("keep")).select(col("id").as("doc_id"))
      val c = exact.join(nonBest, Seq("doc_id"), "left_anti")
      c.count(); c
    }
    val decon = t("5 decontaminate") {
      val evalSet = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
      val d = graft.ops.StagePersists.track(
        Decontamination.decontaminate(canon, evalSet, "text", "doc_id", n = 5))
      d.count(); d
    }
    val kept = t("6 quality gate") {
      val rep = TextAnalysis.repetitionMetrics(decon, "text", "doc_id")
        .select(col("id").as("doc_id"), col("dup_trigram_frac"))
      val k = graft.ops.StagePersists.track(decon.join(rep, Seq("doc_id"))
        .filter(TextQueries.round4(TextAnalysis.qualityScore("text")) >= 0.9 &&
          TextQueries.round4(col("dup_trigram_frac")) < 0.3)
        .select(col("doc_id"), col("lang"), col("text")))
      k.count(); k
    }
    t("7 sample+chunk+pack") {
      val sampled = Sampling.temperatureSample(kept, "lang", "doc_id")
      Packing.binSegments(
        Chunking.tokenChunks(sampled, "doc_id", "text", window = 32, step = 24),
        "doc_id", "token_start", "n_tokens", seqLen = 512).count()
    }
    spark.stop()
  }
}
