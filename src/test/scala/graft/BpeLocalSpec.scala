package graft

import graft.text.BpeTrainer

/** Pins the driver-local BPE merge loop ([[BpeTrainer.trainMergesLocal]],
  * the production-vocabulary path) bit-identical to the distributed
  * round-per-merge formulation ([[BpeTrainer.trainMerges]], the oracle's
  * semantics), and rehearses it at a production merge count where the
  * distributed loop's O(merges) job chains would be a wall-clock cliff.
  */
class BpeLocalSpec extends SparkSpec {
  import spark.implicits._

  test("driver-local merge loop equals the distributed rounds on the gate corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dist = BpeTrainer.trainMerges(docs, "text", numMerges = 12)
    val local = BpeTrainer.trainMergesLocal(docs, "text", numMerges = 12)
    assert(local == dist)
  }

  test("equality on adversarial vocabularies: overlap runs, l=r chains, pair re-creation, early stop") {
    // aaaa: overlapping (a,a) counts every adjacency but greedy merges
    // disjoint leftmost pairs; ababab: merged piece re-creating the
    // selected pair's left side in later rounds; unique chars: minFreq
    // early stop; lexicographic tie races.
    val corpora = Seq(
      Seq("aaaa aaaa aa", "aaa b aaa"),
      Seq("ababab ababab", "abab ab", "ba ba"),
      Seq("xy yz zx", "qw er ty"),
      Seq("low low low low low lower lower",
        "newest newest newest newest newest newest widest widest widest"),
      Seq("ee ee ee e", "eee eee", "ff ee ff ee"))
    corpora.zipWithIndex.foreach { case (texts, i) =>
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val dist = BpeTrainer.trainMerges(df, "text", numMerges = 8)
      val local = BpeTrainer.trainMergesLocal(df, "text", numMerges = 8)
      assert(local == dist, s"corpus $i diverged: local=$local dist=$dist")
    }
  }

  test("flat-scan merge application equals the fold on crafted piece arrays") {
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val cases = Seq(
      (Array("a", "a", "a"), "a", "a"),
      (Array("a", "a", "a", "a"), "a", "a"),
      (Array("aa", "a", "a"), "aa", "a"),
      (Array("a", "b", "a", "b", "a"), "a", "b"),
      (Array("x", "a", "b", "b", "a", "b"), "a", "b"),
      (Array("q"), "a", "b"),
      (Array[String](), "a", "b"))
    cases.foreach { case (p, l, r) =>
      val viaFold = Seq(Tuple1(p.toSeq)).toDF("p")
        .select(BpeTrainer.applyMerge(col("p"), l, r).as("m"))
        .collect().head.getSeq[String](0)
      assert(BpeTrainer.applyMergeLocal(p, l, r).toSeq == viaFold,
        s"scan vs fold diverged on ${p.toSeq} merge ($l,$r)")
    }
  }

  test("production-merge-count rehearsal: 5000 merges run as one job chain, seconds not hours") {
    // A synthetic weighted vocabulary big enough that 5000 distributed
    // rounds would be ~20k sequential Spark jobs. The local loop is one
    // collect + a heap walk; the assertion is the wall-clock ENVELOPE
    // (generous: CI noise), the real pin is that it finishes at all in
    // test time. Deterministic vocab: product-code-like words whose
    // pair space stays rich for thousands of merges.
    val rng = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    val vocab = (0 until 30000).map { i =>
      val len = 4 + rng.nextInt(10)
      val w = (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString
      (w, 1L + rng.nextInt(50).toLong)
    }.distinctBy(_._1) // a true vocabulary: one count per WORD (plain
    // .distinct on the tuples would keep birthday-collision words twice
    // with different counts)
    val t0 = System.nanoTime()
    val merges = BpeTrainer.mergeLoop(vocab, numMerges = 5000, minFreq = 2L)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"5000-merge loop over ${vocab.size} words: $secs%.1fs, " +
      s"${merges.size} merges learned")
    assert(merges.size > 1000, "the pair space should sustain >1000 merges")
    assert(secs < 120.0, f"driver-local loop too slow: $secs%.1fs")
    // ranks are 1..n contiguous and frequencies respect the argmax
    // invariant within the loop's own output (non-strict: counts can
    // rise when merges re-create pairs, but each selected count must
    // clear minFreq)
    assert(merges.map(_._1) == (1 to merges.size))
    assert(merges.forall(_._4 >= 2L))
  }
}
