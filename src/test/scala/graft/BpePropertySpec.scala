package graft

import graft.text.BpeTrainer
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck fuzz of the driver-local lazy-deletion-heap merge loop
  * against the distributed argmax rounds (the round-10 verdict's
  * stretch ask): random small corpora drawn from a TINY alphabet so
  * pair counts collide constantly — maximal pressure on the
  * (count desc, then (l, r) lexicographic) tie-break, overlap
  * counting, pair re-creation, and the minFreq early stop, beyond the
  * hand-picked BpeLocalSpec vocabularies. */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  // 3-letter alphabet + the à-ÿ boundary char: short words collide on
  // pairs by construction, and 2-byte UTF-8 pieces exercise the
  // UTF-16-order == UTF-8-binary-order tie-break argument
  private val word: Gen[String] = Gen.chooseNum(1, 6).flatMap { n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'é')).map(_.mkString)
  }
  private val corpus: Gen[Seq[String]] = Gen.chooseNum(1, 12).flatMap { d =>
    Gen.listOfN(d, Gen.chooseNum(1, 8).flatMap(w => Gen.listOfN(w, word)
      .map(_.mkString(" "))))
  }

  test("fuzz: local lazy-deletion heap == distributed argmax rounds") {
    val corpora = Gen.listOfN(40, corpus)
      .apply(Gen.Parameters.default, Seed(20260815L)).getOrElse(Nil)
    assert(corpora.size == 40)
    corpora.zipWithIndex.foreach { case (texts, i) =>
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val dist = BpeTrainer.trainMerges(df, "text", numMerges = 10)
      val local = BpeTrainer.trainMergesLocal(df, "text", numMerges = 10)
      assert(local == dist,
        s"corpus $i diverged on ${texts.mkString(" | ")}:\n" +
          s"  local=$local\n  dist=$dist")
    }
  }

  test("fuzz: minFreq variation keeps the early-stop aligned") {
    val corpora = Gen.listOfN(10, corpus)
      .apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    corpora.zipWithIndex.foreach { case (texts, i) =>
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      Seq(1L, 3L).foreach { mf =>
        val dist = BpeTrainer.trainMerges(df, "text", numMerges = 6,
          minFreq = mf)
        val local = BpeTrainer.trainMergesLocal(df, "text", numMerges = 6,
          minFreq = mf)
        assert(local == dist, s"corpus $i minFreq=$mf diverged")
      }
    }
  }
}
