package graft

import graft.text.Sampling
import org.apache.spark.sql.functions._

/** Pins [[Sampling.shuffleShards]] — the deterministic training-order
  * shuffle: reproducibility, per-shard sequence contiguity, hash
  * balance, and that a new seed actually re-deals the epoch. */
class ShuffleShardsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 400L).map(i => Tuple1(i)).toDF("doc_id")

  test("same seed → byte-identical assignment and order") {
    val a = Sampling.shuffleShards(docs, "doc_id", 8, "s1")
      .select("doc_id", "shard", "seq").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val b = Sampling.shuffleShards(docs, "doc_id", 8, "s1")
      .select("doc_id", "shard", "seq").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("seq is contiguous 1..n within every shard") {
    val rows = Sampling.shuffleShards(docs, "doc_id", 8, "s1")
      .select("shard", "seq").as[(Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, ss) =>
      assert(ss.map(_._2).sorted.toSeq == (1L to ss.length).toSeq)
    }
  }

  test("hash balance: no shard more than 2× the fair share at n=400") {
    val sizes = Sampling.shuffleShards(docs, "doc_id", 8, "s1")
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(sizes.size == 8)
    assert(sizes.values.max <= 2L * 400L / 8L)
    assert(sizes.values.min >= 400L / 8L / 2L)
  }

  test("a different seed re-deals both shard and order") {
    val a = Sampling.shuffleShards(docs, "doc_id", 8, "s1")
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val b = Sampling.shuffleShards(docs, "doc_id", 8, "s2")
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val moved = a.keys.count(k => a(k) != b(k))
    // expected fraction moved = 7/8; anything above half proves the
    // re-deal without flaking on the tail
    assert(moved > 200)
  }

  test("order within a shard is the (key, id) order, not id order") {
    val rows = Sampling.shuffleShards(docs, "doc_id", 4, "s1")
      .filter(col("shard") === 0L)
      .orderBy("seq")
      .select("doc_id").as[Long].collect()
    assert(rows.length > 10 && rows.toSeq != rows.sorted.toSeq)
  }
}
