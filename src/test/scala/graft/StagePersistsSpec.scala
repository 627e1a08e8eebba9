package graft

import graft.ops.StagePersists
import graft.text.TextAnalysis

class StagePersistsSpec extends SparkSpec {
  import spark.implicits._

  test("release() returns session persist state to baseline") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with many unusual trigrams here"),
      (4L, "zz")).toDF("doc_id", "text")

    // two operators that persist through the registry
    val fam = TextAnalysis.trigramFamiliarity(docs, "text", "doc_id")
    assert(fam.count() == 4)
    val pairs = graft.dedup.Dedup.minhashNearDuplicates(
      docs, "text", "doc_id", shingleSize = 3, numPerms = 8,
      rowsPerBand = 4, threshold = 0.5)
    assert(pairs.count() >= 1)

    assert(StagePersists.trackedCount(spark) >= 2,
      "operator persists were not registered")
    StagePersists.release(spark)
    assert(StagePersists.trackedCount(spark) == 0)
    // only non-registry state (the operator's localCheckpoint of a tiny
    // bucket frame) may remain persisted; the corpus-sized PLAIN stage
    // persists must all be gone
    val plainPersists = spark.sparkContext.getPersistentRDDs.values
      .count(!_.isCheckpointed)
    assert(plainPersists == 0,
      s"$plainPersists plain persists survived StagePersists.release")
    // released frames recompute correctly after release
    assert(fam.count() == 4)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }

  test("corpus pipeline stage persists are registered and releasable") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = StagePersists.trackedCount(spark)
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.CorpusQueries.corpusPipeline(spark, sf)
    assert(out.count() > 0)
    assert(StagePersists.trackedCount(spark) > before,
      "corpusPipeline stage boundaries were not registered")
    StagePersists.release(spark)
    assert(StagePersists.trackedCount(spark) == 0)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }
}
