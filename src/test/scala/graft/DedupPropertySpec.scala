package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Structural laws of the dedup operators over generated corpora.
  * Generators are driven with fixed seeds (no scalatestplus bridge in
  * the offline cache) — failures reproduce exactly. */
class DedupPropertySpec extends SparkSpec {

  private val wordGen: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] =
    Gen.listOfN(n, docGen)(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("exact dup groups partition the corpus; survivors are minimal ids") {
    import spark.implicits._
    (1L to 3L).foreach { seed =>
      val docs = corpus(seed, 60).toDF("doc_id", "text")
      val total = docs.count()
      val groups = Dedup.exactDuplicateGroups(docs, "text", "doc_id").collect()
      val deduped = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      val distinctTexts = docs.select("text").distinct().count()
      // every doc is either in a >1 group or a singleton
      val inGroups = groups.map(_.getAs[Long]("n_docs")).sum
      val singletons = distinctTexts - groups.length
      assert(inGroups + singletons === total)
      assert(deduped.count() === distinctTexts)
      // survivor of each group is its smallest id
      groups.foreach { g =>
        val canonical = g.getAs[Long]("canonical_id")
        assert(deduped.filter(col("doc_id") === canonical).count() === 1L)
      }
      // idempotent
      assert(Dedup.dropExactDuplicates(deduped, "text", "doc_id").count()
        === distinctTexts)
    }
  }

  test("jaccard pairs are ordered, bounded, and 1.0 exactly for clones") {
    import spark.implicits._
    val docs = (corpus(7L, 30) :+ (1000L, corpus(7L, 30).head._2)).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(docs, "text", "doc_id", 2)
    val pairs = Dedup.jaccardPairs(sh, threshold = 0.0).collect()
    pairs.foreach { p =>
      assert(p.getAs[Long]("ida") < p.getAs[Long]("idb"))
      val j = p.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
    val clone = pairs.find(p => p.getAs[Long]("ida") === 0L &&
      p.getAs[Long]("idb") === 1000L).get
    assert(clone.getAs[Double]("jaccard") === 1.0)
  }

  test("simhash is invariant to word order and repetition") {
    import spark.implicits._
    val base = "kappa alpha beta gamma delta"
    val docs = Seq(
      (1L, base),
      (2L, "delta gamma beta alpha kappa"),          // permuted
      (3L, "kappa alpha beta gamma delta delta beta") // repeated words
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) === sigs(3L))
  }

  test("identical shingle sets give identical minhash signatures; lsh finds them") {
    import spark.implicits._
    val docs = (corpus(11L, 20) ++ Seq((500L, corpus(11L, 20)(3)._2)))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 2, numPerms = 16, rowsPerBand = 4, threshold = 0.99)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    assert(pairs.contains((3L, 500L))) // the planted clone always collides
  }
}
