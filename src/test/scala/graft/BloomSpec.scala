package graft

import graft.dedup.BloomDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins for the Bloom-filter dedup plane: deployed column probe ≡ join
  * probe, exact incremental fold, the deterministic false-positive
  * path on an undersized filter, zero false negatives by construction,
  * and append-mode streamability of the probe.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val corpusRows = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "pack my box with five dozen liquor jugs"),
    (2L, "sphinx of black quartz judge my vow"),
    (3L, "how vexingly quick daft zebras jump"))
  private val batchRows = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"), // revisit of 0
    (11L, "sphinx of black quartz judge my vow"),         // revisit of 2
    (12L, "a genuinely new document about nothing"),
    (13L, "another unseen string of words entirely"),
    (14L, ""))

  test("deployed bitmap probe ≡ join probe, and no false negatives") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    for ((m, k) <- Seq((1 << 12, 5), (64, 3))) {
      val bits = BloomDedup.setBits(corpus, "text", m, k)
      val bm = BloomDedup.bitmap(bits, m)
      val viaColumn = batch
        .select($"doc_id", BloomDedup.probeColumn($"text", bm, m, k).as("hit"))
        .as[(Long, Boolean)].collect().toMap
      val viaJoin = BloomDedup.probeJoin(batch, bits, "text", "doc_id", m, k)
        .as[(Long, Boolean)].collect().toMap
      assert(viaColumn === viaJoin, s"column vs join probe at m=$m k=$k")
      // Bloom filters never miss a true member
      assert(viaColumn(10L) && viaColumn(11L), s"false negative at m=$m k=$k")
    }
  }

  test("an undersized filter false-positives deterministically") {
    val corpus = (0L until 64L).map(i => (i, s"corpus document number $i"))
      .toDF("doc_id", "text")
    val m = 32; val k = 2 // 64 docs into 32 bits: nearly every bit set
    val bm = BloomDedup.bitmap(BloomDedup.setBits(corpus, "text", m, k), m)
    val fresh = (0L until 32L).map(i => (i, s"unseen probe text $i"))
      .toDF("doc_id", "text")
    val once = fresh
      .select($"doc_id", BloomDedup.probeColumn($"text", bm, m, k).as("hit"))
      .as[(Long, Boolean)].collect().toSet
    assert(once.exists(_._2), "a saturated filter must produce false positives")
    val again = fresh
      .select($"doc_id", BloomDedup.probeColumn($"text", bm, m, k).as("hit"))
      .as[(Long, Boolean)].collect().toSet
    assert(once === again, "false positives must replay deterministically")
  }

  test("the FP-rate certificate predicts the measured rate's decade") {
    val n = 200; val m = 4096; val k = 3
    val corpus = (0L until n.toLong).map(i => (i, s"member document $i"))
      .toDF("doc_id", "text")
    val bm = BloomDedup.bitmap(BloomDedup.setBits(corpus, "text", m, k), m)
    val probes = 5000
    val fresh = (0L until probes.toLong).map(i => (i, s"non-member probe $i"))
      .toDF("doc_id", "text")
    val hits = fresh
      .select(BloomDedup.probeColumn($"text", bm, m, k).as("hit"))
      .filter($"hit").count()
    val bound = BloomDedup.expectedFpRate(n.toLong, m, k)
    val measured = hits.toDouble / probes
    // deterministic md5 positions: the measured rate is a fixed number;
    // the certificate must place it within its decade
    assert(measured <= bound * 3 && measured >= bound / 5,
      s"measured FP rate $measured vs certificate $bound")
  }

  test("foldBits(old, new) ≡ a full rebuild over the concatenated corpus") {
    val old = corpusRows.toDF("doc_id", "text")
    val fresh = batchRows.toDF("doc_id", "text")
    val m = 1 << 10; val k = 4
    val folded = BloomDedup.foldBits(
        BloomDedup.setBits(old, "text", m, k),
        BloomDedup.setBits(fresh, "text", m, k))
      .as[Long].collect().toSet
    val rebuilt = BloomDedup.setBits(old.unionByName(fresh), "text", m, k)
      .as[Long].collect().toSet
    assert(folded === rebuilt)
  }

  test("the bitmap probe streams in append mode and matches the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = corpusRows.toDF("doc_id", "text")
    val m = 1 << 12; val k = 5
    val bm = BloomDedup.bitmap(BloomDedup.setBits(corpus, "text", m, k), m)
    val batch = batchRows.toDF("doc_id", "text")
      .select($"doc_id", BloomDedup.probeColumn($"text", bm, m, k).as("hit"))
      .as[(Long, Boolean)].collect().toSet
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .select($"doc_id", BloomDedup.probeColumn($"text", bm, m, k).as("hit"))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").start() // pure per-row columns: stateless
    try {
      input.addData(batchRows.take(2): _*)
      q.processAllAvailable()
      input.addData(batchRows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("bloom_stream")
        .as[(Long, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
