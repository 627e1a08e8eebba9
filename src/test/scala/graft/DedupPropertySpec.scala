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

  test("containment laws: bounded, subset ⇒ 1.0, symmetric common with jaccard") {
    import spark.implicits._
    (13L to 15L).foreach { seed =>
      val docs = corpus(seed, 40).toDF("doc_id", "text")
      val sh = Dedup.wordShingles(docs, "text", "doc_id", 2)
      val cont = Dedup.containmentPairs(sh, threshold = 0.0).collect()
      cont.foreach { p =>
        assert(p.getAs[Long]("ida") < p.getAs[Long]("idb"))
        val ab = p.getAs[Double]("containment_ab")
        val ba = p.getAs[Double]("containment_ba")
        assert(ab > 0.0 && ab <= 1.0 && ba > 0.0 && ba <= 1.0)
        // jaccard derives from the same counts: j ≤ min(ab, ba)
        val common = p.getAs[Long]("common").toDouble
        val sza = common / ab; val szb = common / ba
        val j = common / (sza + szb - common)
        assert(j <= math.min(ab, ba) + 1e-12)
      }
    }
  }

  test("line dedup conservation: kept + removed = lines; each distinct line kept once") {
    import spark.implicits._
    val lineGen = Gen.chooseNum(1, 4)
      .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val docLines = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, lineGen))
    (21L to 23L).foreach { seed =>
      val docs = Gen.listOfN(30, docLines)(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
        .toDF("doc_id", "text")
      val out = Dedup.lineDedup(docs, "text", "doc_id").collect()
      val keptLines = out.flatMap { r =>
        val ct = r.getAs[String]("clean_text")
        assert(r.getAs[Long]("n_removed") +
          (if (ct.isEmpty) 0 else ct.split("\n", -1).length) ===
          r.getAs[Long]("n_lines"))
        if (ct.isEmpty) Array.empty[String] else ct.split("\n", -1)
      }
      // corpus-wide: every distinct input line survives EXACTLY once
      val inputLines = Gen.listOfN(30, docLines)(Gen.Parameters.default, Seed(seed)).get
        .flatten.toSet
      assert(keptLines.length === keptLines.toSet.size)
      assert(keptLines.toSet === inputLines)
      graft.ops.StagePersists.release(spark)
    }
  }

  test("c4 clean laws: surviving lines satisfy the line rules; page rules gate kept") {
    import spark.implicits._
    val lineGen = for {
      n <- Gen.chooseNum(1, 8)
      ws <- Gen.listOfN(n, wordGen)
      term <- Gen.oneOf(".", "!", "?", "\"", "", " ")
    } yield ws.mkString(" ") + term
    val docGen2 = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, lineGen))
      .map(_.mkString("\n"))
    (31L to 33L).foreach { seed =>
      val docs = Gen.listOfN(40, docGen2)(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.text.Cleaning.c4Clean(docs, "text", "doc_id",
        minLineWords = 5, minKeptLines = 2).collect()
      out.foreach { r =>
        val clean = r.getAs[String]("clean_text")
        val nKept = r.getAs[Long]("n_kept")
        assert(nKept <= r.getAs[Long]("n_lines"))
        if (clean.nonEmpty) {
          val ls = clean.split("\n", -1)
          assert(ls.length === nKept)
          ls.foreach { l =>
            assert(l.split("[^a-z0-9]+").count(_.nonEmpty) >= 5, s"'$l'")
            assert(Seq(".", "!", "?", "\"").exists(l.endsWith), s"'$l'")
          }
        } else assert(nKept === 0L)
        // no page-rule plants in this generator: kept ⟺ enough lines
        assert(r.getAs[Boolean]("kept") === (nKept >= 2))
      }
    }
  }

  test("cover rewrite law: n_removed + surviving tokens = n_tokens (random windows)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(99)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val k = 1 + rnd.nextInt(math.min(n, 8))
      val toks = Array.tabulate(n)(i => s"t$i")
      val starts = (0 to n - k).filter(_ => rnd.nextBoolean())
      // brute force: covered = union of [s, s+k-1]
      val covered = starts.flatMap(s => s until s + k).toSet
      val expectClean = toks.zipWithIndex.filterNot(t => covered(t._2))
        .map(_._1).mkString(" ")
      val row = graft.functions.CoverRewrite.rewriteOf(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(rnd.shuffle(starts).toArray[Any]), k)
      assert(row.getLong(0) === covered.size.toLong)
      assert(row.getUTF8String(1).toString === expectClean)
    }
  }
}
