package graft

import graft.text.Bm25
import org.apache.spark.sql.functions._

/** Pins the native [[graft.functions.Bm25Score]] kernel — the deployed
  * per-row retrieval gate — against (a) the join-form
  * [[Bm25.score]] argmax per document, (b) a from-scratch driver
  * recompute of the documented spec, and (c) its own append-mode
  * MemoryStream run (pure per-row columns, stateless).
  */
class Bm25ScoreSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick red fox runs past the sleeping dog"),
    (2L, "a slow green turtle crawls under the old fence"),
    (3L, "quick quick quick fox fox brown"),
    (4L, "entirely unrelated words about cooking pasta tonight"),
    (5L, "Fox! QUICK-brown; foxé café 中文 dog"),
    (6L, ""),
    (7L, "zz qq vv nothing shared at all"))

  private val queryRows = Seq(
    (10L, "quick"), (10L, "fox"), (10L, "brown"),
    (20L, "turtle"), (20L, "fence"),
    (30L, "dog"))

  test("kernel best == join-form argmax per document (ties to smaller id)") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = queryRows.toDF("query_id", "term")
    val model = Bm25.denseModel(docs, queries, "text", "doc_id")
    val stats = graft.functions.Bm25Score(col("text"), model)
    val kernel = docs.select(col("doc_id"),
        element_at(stats, 1).as("q"), element_at(stats, 2).as("s"),
        element_at(stats, 3).as("dl"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // join-form argmax, positive scores only, tie to the smaller id —
    // the w18 oracle convention
    val joined = Bm25.score(docs, queries, "text", "doc_id")
      .filter(col("score_fp") > 0L)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._2)
      .map { case (doc, rs) =>
        val best = rs.map(r => (-r._3, r._1)).min
        doc -> ((best._2, -best._1))
      }
    // join form excludes the self pair (none here: query ids disjoint
    // from doc ids) and omits no-match docs; kernel reports (-1, 0)
    corpus.foreach { case (id, _) =>
      assert(kernel(id) === joined.getOrElse(id, (-1L, 0L)), s"doc $id")
    }
    // tie case: docs 6 and 7 match nothing
    assert(kernel(6L) === ((-1L, 0L)) && kernel(7L) === ((-1L, 0L)))
    graft.ops.StagePersists.release(spark)
  }

  test("kernel == driver recompute of the documented spec, incl. dl") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = queryRows.toDF("query_id", "term")
    val model = Bm25.denseModel(docs, queries, "text", "doc_id")
    val stats = graft.functions.Bm25Score(col("text"), model)
    val got = docs.select(col("doc_id"), element_at(stats, 1),
        element_at(stats, 2), element_at(stats, 3))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // recompute: same tokenizer class ([a-z0-9] runs of lowercased)
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val S = Bm25.S
    val F = graft.text.LanguageModel.F
    val P = graft.text.LanguageModel.PScale
    val tf = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val n = corpus.size.toLong
    val avgdl = math.max(1L, tf.values.map(_.size.toLong).sum / n)
    val dfm = queryRows.map(_._2).distinct.map { t =>
      t -> tf.values.count(_.contains(t)).toLong
    }.toMap
    def idf(t: String): Long = {
      val q = math.min(math.max((2L * n + 2L) * F / (2L * dfm(t) + 1L),
        1L), P)
      val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
      e * F + (q * F) / (1L << e) - 17L * F
    }
    corpus.foreach { case (id, _) =>
      val ws = tf(id)
      val dl = ws.size.toLong
      val rel = dl * S / avgdl
      val scores = queryRows.groupBy(_._1).map { case (qid, ts) =>
        qid -> ts.map(_._2).distinct.map { t =>
          val c = ws.count(_ == t).toLong
          if (c == 0L) 0L
          else idf(t) *
            (c * 44L * S * S / (c * 20L * S + 6L * S + 18L * rel))
        }.sum
      }.filter(_._2 > 0L)
      val want =
        if (scores.isEmpty) (-1L, 0L, dl)
        else {
          val best = scores.toSeq.map { case (q, s) => (-s, q) }.min
          (best._2, -best._1, dl)
        }
      assert(got(id) === want, s"doc $id")
    }
    graft.ops.StagePersists.release(spark)
  }

  test("deployed stage streams append-mode, stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text")
    val queries = queryRows.toDF("query_id", "term")
    val model = Bm25.denseModel(docs, queries, "text", "doc_id")
    def stage(df: org.apache.spark.sql.DataFrame) = {
      val stats = graft.functions.Bm25Score(col("text"), model)
      df.select(col("doc_id"), element_at(stats, 1).as("best_query_id"),
        element_at(stats, 2).as("best_score_fp"))
    }
    val batch = stage(docs).as[(Long, Long, Long)].collect().toSet
    val input = MemoryStream[(Long, String)]
    val q = stage(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("w18_stream")
      .outputMode("append").start() // pure per-row kernel: stateless
    try {
      input.addData(corpus.take(3): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("w18_stream")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
    graft.ops.StagePersists.release(spark)
  }
}
