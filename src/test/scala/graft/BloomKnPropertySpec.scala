package graft

import graft.dedup.BloomDedup
import graft.text.LanguageModel
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Structural laws of the round-11-continuation operators over
  * generated corpora — the DedupPropertySpec discipline (fixed seeds,
  * no scalatestplus bridge in the offline cache):
  *  - Bloom filters NEVER false-negative, for any corpus/probe pair
  *    and any geometry; the deployed column probe ≡ the join probe;
  *    fold ≡ rebuild.
  *  - The Kneser–Ney kernel ≡ the join form ≡ a driver recompute of
  *    the documented two-floor spec, over random corpora (exercising
  *    seen/discounted, unseen-continuation, and unseen-prefix paths
  *    wholesale rather than by hand-picked cases).
  */
class BloomKnPropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen: Gen[String] =
    Gen.oneOf("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] =
    Gen.listOfN(n, docGen)(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("bloom: no false negatives, column == join, fold == rebuild (random corpora)") {
    (1L to 3L).foreach { seed =>
      val members = corpus(seed, 40)
      val probes = corpus(seed + 100, 40) ++ members.take(10)
        .map { case (id, t) => (id + 1000L, t) }
      val mDf = members.toDF("doc_id", "text")
      val pDf = probes.toDF("doc_id", "text")
      for ((m, k) <- Seq((256, 4), (32, 2))) {
        val bits = BloomDedup.setBits(mDf, "text", m, k)
        val bm = BloomDedup.bitmap(bits, m)
        val viaCol = pDf.select($"doc_id",
            BloomDedup.probeColumn($"text", bm, m, k).as("hit"))
          .as[(Long, Boolean)].collect().toMap
        val viaJoin = BloomDedup.probeJoin(pDf, bits, "text", "doc_id", m, k)
          .as[(Long, Boolean)].collect().toMap
        assert(viaCol === viaJoin, s"seed=$seed m=$m k=$k")
        // membership implies a hit — no false negatives, ever
        val memberTexts = members.map(_._2).toSet
        probes.filter(p => memberTexts(p._2)).foreach { p =>
          assert(viaCol(p._1), s"false negative at seed=$seed m=$m k=$k: $p")
        }
        // fold == rebuild
        val half = members.size / 2
        val folded = BloomDedup.foldBits(
            BloomDedup.setBits(members.take(half).toDF("doc_id", "text"),
              "text", m, k),
            BloomDedup.setBits(members.drop(half).toDF("doc_id", "text"),
              "text", m, k))
          .as[Long].collect().toSet
        assert(folded === bits.as[Long].collect().toSet, s"seed=$seed m=$m")
      }
    }
  }

  // the KneserNeySpec driver recompute, factored over arbitrary inputs
  private def md5Long(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def grams(t: String): Seq[(String, String)] = {
    val w = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    w.zip(w.drop(1))
  }
  private def nll(q: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
    31L * 65536L - e * 65536L - (q * 65536L) / (1L << e)
  }

  test("kneser-ney: kernel == join form == driver recompute (random corpora)") {
    val P = LanguageModel.PScale
    val (b2, b1) = (32, 16) // tiny buckets force heavy collisions
    (1L to 3L).foreach { seed =>
      val ref = corpus(seed, 25)
      val docs = corpus(seed + 50, 25)
      val refGrams = ref.flatMap(r => grams(r._2))
      if (refGrams.nonEmpty) {
        val c2 = refGrams.groupBy { case (a, b) => md5Long(s"$a $b") % b2 }
          .view.mapValues(_.size.toLong).toMap
        val c1 = refGrams.groupBy { case (a, _) => md5Long(a) % b1 }
          .view.mapValues(_.size.toLong).toMap
        val types = refGrams.map { case (a, b) =>
          (md5Long(a) % b1, md5Long(b) % b1) }.toSet
        val n1 = types.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val cont = types.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val tn = types.size.toLong
        def q(a: String, b: String): Long = {
          val kc2 = c2.getOrElse(md5Long(s"$a $b") % b2, 0L)
          val kc1 = c1.getOrElse(md5Long(a) % b1, 0L)
          val kn1 = n1.getOrElse(md5Long(a) % b1, 0L)
          val kco = cont.getOrElse(md5Long(b) % b1, 0L)
          val raw =
            if (kc1 > 0L) math.max(kc2 * 4 - 3, 0L) * P / (kc1 * 4) +
              (kn1 * 3 * P / (kc1 * 4)) * kco / tn
            else kco * P / tn
          math.min(math.max(raw, 1L), P)
        }
        val want = docs.map { case (id, t) =>
          val gs = grams(t)
          (id, gs.size.toLong, gs.map { case (a, b) => nll(q(a, b)) }.sum)
        }.toSet
        val lm = LanguageModel
        val (sc2, sc1, scont, stot) =
          lm.knHashedCounts(ref.toDF("doc_id", "text"), "text", b2, b1)
        val joined = lm.knScore(docs.toDF("doc_id", "text"), sc2, sc1,
            scont, stot, b2, b1, "text", "doc_id")
          .as[(Long, Long, Long)].collect().toSet
        val (d2, dc1, dn1, dco, t) = lm.knDenseCounts(sc2, sc1, scont,
          stot, b2, b1)
        val (n, s) = lm.knNllColumns(d2, dc1, dn1, dco, t, b2, b1, "text")
        val kernel = docs.toDF("doc_id", "text")
          .select($"doc_id", n.as("n"), s.as("s"))
          .as[(Long, Long, Long)].collect().toSet
        assert(joined === want, s"join vs recompute, seed=$seed")
        assert(kernel === want, s"kernel vs recompute, seed=$seed")
        graft.ops.StagePersists.release(spark)
      }
    }
  }
}
