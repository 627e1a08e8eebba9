package graft

import graft.dedup.Dedup
import graft.ops.StagePersists
import org.apache.spark.sql.functions._

/** Pins the d21 recall-curve machinery: captured ⊆ truth, identical
  * Jaccard on both paths, certain capture at j = 1, and the bucket
  * arithmetic at representation edges. */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  test("exact duplicates are captured with certainty (bucket 10)") {
    // 20 docs in 10 identical pairs (j = 1.0) plus 20 distinct docs
    val words = (1 to 40).map(i => s"u$i")
    val docs = (0 until 10).flatMap { g =>
      val t = words.drop(g).take(25).mkString(" ")
      Seq((g * 2L, t), (g * 2L + 1L, t))
    } ++ (100L until 120L).map(i =>
      (i, (1 to 25).map(j => s"z${i}_$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val sh = StagePersists.track(
      Dedup.wordShingles(df, "text", "doc_id", 3))
    val truth = Dedup.jaccardPairs(sh, 0.4, 100000)
      .as[(Long, Long, Long, Double)].collect()
    val captured = Dedup.minhashNearDuplicates(df, "text", "doc_id",
        3, 16, 4, threshold = 0.4)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val ones = truth.filter(_._4 == 1.0).map(t => (t._1, t._2))
    assert(ones.length == 10)
    assert(ones.forall(captured.contains),
      "identical signatures must collide in every band")
    // captured ⊆ truth at the same threshold
    val truthSet = truth.map(t => (t._1, t._2)).toSet
    assert(captured.subsetOf(truthSet))
  }

  test("bucket arithmetic: floor(j*10) on IEEE products is stable") {
    // floor is applied to the IEEE product, identically in both
    // engines. The multiply ROUNDS: double(0.7) sits below 0.7 but
    // 0.7*10 rounds back to exactly 7.0 — deciles from rational
    // Jaccards land on the intuitive bucket, and whatever they land
    // on, DuckDB lands on the same (same double division, same
    // multiply, same floor)
    assert(math.floor(0.7 * 10) == 7.0)
    assert(math.floor((7.0 / 10.0) * 10) == 7.0)
    assert(math.floor(0.5 * 10) == 5.0)
    assert(math.floor(1.0 * 10) == 10.0)
  }
}
