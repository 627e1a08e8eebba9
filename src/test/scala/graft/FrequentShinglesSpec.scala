package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Pins [[Dedup.frequentShingles]]' bucket-pruned two-pass heavy
  * hitters EXACT against the naive groupBy-HAVING — including under
  * heavy bucket collision (buckets = 4), where the prune keeps
  * passengers that the final df check must drop. */
class FrequentShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "all rights reserved contact us today"
  private val docs = (1L to 20L).map { i =>
    val body = s"unique body $i with some distinct words number $i here"
    // boilerplate on every even doc; a rarer phrase on multiples of 5
    val extra = (if (i % 2 == 0) " " + boiler else "") +
      (if (i % 5 == 0) " subscribe to our newsletter now" else "")
    (i, body + extra)
  }.toDF("doc_id", "text")

  private def naive(k: Int, minDf: Long) =
    Dedup.wordShingles(docs, "text", "doc_id", k)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("bucket-pruned result == naive groupBy-HAVING (default buckets)") {
    val got = Dedup.frequentShingles(docs, "text", "doc_id", k = 5, minDf = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == naive(5, 3L))
    assert(got.nonEmpty && got.keys.exists(_.contains("rights reserved")))
  }

  test("exact under heavy bucket collision (buckets = 4)") {
    // nearly every gram shares a bucket with a frequent one, so the
    // prune passes almost everything — the final df check must still
    // produce the exact table
    val got = Dedup.frequentShingles(docs, "text", "doc_id",
        k = 5, minDf = 3L, buckets = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == naive(5, 3L))
  }

  test("plan shape: the candidate prune reaches the exact pass as a " +
      "broadcast join (the distinct-gram space must not shuffle whole)") {
    val plan = Dedup.frequentShingles(docs, "text", "doc_id",
        k = 5, minDf = 3L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast candidate filter in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("no candidate bucket clears the threshold -> empty, not an error") {
    val out = Dedup.frequentShingles(docs, "text", "doc_id",
      k = 5, minDf = 1000L)
    assert(out.count() == 0L)
  }
}
