package graft

import graft.dedup.Dedup
import graft.text.{Importance, Sampling}
import org.apache.spark.sql.functions._

/** Contract-violation tripwires added in round 9: each test feeds an
  * input that previously corrupted results SILENTLY (wrapped Long
  * arithmetic, corrupted composite order keys, inflated overlap
  * counts) and asserts the operator now fails LOUDLY with an
  * actionable message — and that well-formed inputs are untouched. */
class GuardrailsSpec extends SparkSpec {
  import spark.implicits._

  private def messageChain(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("DSIR importanceScores refuses gram totals past the Long-exact envelope") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon zeta"))
      .toDF("doc_id", "text")
    // the real bound (⌊√2⁶³⌋ grams) cannot be materialized in a test;
    // the bound is injectable precisely so the guard itself is testable
    val ex = intercept[Exception] {
      Importance.importanceScores(docs, docs.filter($"doc_id" === 1L),
        "text", "doc_id", n = 2, maxSafeTotal = 2L).collect()
    }
    assert(messageChain(ex).contains("Long-exact envelope"))
    graft.ops.StagePersists.release(spark)
  }

  test("DSIR hashedWeights refuses gram totals past the envelope; scoreWithWeights guards |w|·grams") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon zeta"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Importance.hashedWeights(docs, docs.filter($"doc_id" === 1L),
        "text", "doc_id", n = 2, buckets = 64, maxSafeTotal = 2L).collect()
    }
    assert(messageChain(ex).contains("Long-exact envelope"))
    // driver-side sum-envelope guard: a weight table whose magnitudes
    // could overflow a maxDocGrams-gram document's score sum is refused
    val hugeW = Seq((0L, Long.MaxValue / 4), (1L, -3L)).toDF("bucket", "weight")
    val ex2 = intercept[IllegalArgumentException] {
      Importance.scoreWithWeights(docs, hugeW, "text", "doc_id",
        n = 2, buckets = 64, maxDocGrams = 8L)
    }
    assert(ex2.getMessage.contains("overflow the Long score sum"))
    // ...and sane weights still score (the t24 path)
    val w = Importance.hashedWeights(docs, docs.filter($"doc_id" === 1L),
      "text", "doc_id", n = 2, buckets = 64)
    val scored = Importance.scoreWithWeights(docs, w, "text", "doc_id",
      n = 2, buckets = 64).collect()
    assert(scored.length == 2)
    graft.ops.StagePersists.release(spark)
  }

  test("budgetSelect enforces the composite order-key contract per row") {
    // id past 10¹² would collide score strata in id − score·10¹²
    val badId = Seq((2_000_000_000_000L, 10L, 5L)).toDF("id", "n_tokens", "score")
    val ex = intercept[Exception] {
      Sampling.budgetSelect(badId, "id", "n_tokens", "score", 1.0).collect()
    }
    assert(messageChain(ex).contains("budgetSelect order-key contract"))
    // raw (un-fixed-point) importance-scale scores are refused too
    val badScore = Seq((1L, 10L, 123_456_789_012L)).toDF("id", "n_tokens", "score")
    val ex2 = intercept[Exception] {
      Sampling.budgetSelect(badScore, "id", "n_tokens", "score", 1.0).collect()
    }
    assert(messageChain(ex2).contains("budgetSelect order-key contract"))
    // contract-clean inputs select as before
    val ok = Seq((1L, 10L, 9999L), (2L, 10L, 1L)).toDF("id", "n_tokens", "score")
    val sel = Sampling.budgetSelect(ok, "id", "n_tokens", "score", 0.5)
      .collect().map(_.getLong(0))
    assert(sel.toSeq == Seq(1L))
  }

  test("wordShingles duplicate-id tripwire fires under -Dgraft.debug.uniqueIds") {
    val dup = Seq((1L, "a b c d e"), (1L, "f g h i j"), (2L, "k l m n o"))
      .toDF("doc_id", "text")
    // silent today without the flag (documented contract)…
    assert(Dedup.wordShingles(dup, "text", "doc_id", 4).count() > 0)
    // …loud with it
    sys.props("graft.debug.uniqueIds") = "true"
    try {
      val ex = intercept[Exception] {
        Dedup.wordShingles(dup, "text", "doc_id", 4).collect()
      }
      assert(messageChain(ex).contains("one-row-per-id contract"))
      // unique ids pass through identically under the flag
      val uniq = Seq((1L, "a b c d e"), (2L, "k l m n o")).toDF("doc_id", "text")
      val flagged = Dedup.wordShingles(uniq, "text", "doc_id", 4)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      sys.props.remove("graft.debug.uniqueIds")
      val plain = Dedup.wordShingles(uniq, "text", "doc_id", 4)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(flagged == plain)
    } finally sys.props.remove("graft.debug.uniqueIds")
  }
}
