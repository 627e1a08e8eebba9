package graft

import graft.sim.HybridRetrieval
import org.apache.spark.sql.functions._

/** Pins [[HybridRetrieval.hybridTopK]]: the dense re-rank reorders the
  * lexical shortlist, missing-vector candidates sink via the −1
  * sentinel keeping lexical order among themselves, and the embedding
  * joins broadcast the shortlist (never the corpus).
  */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta common words here"),
    (1L, "alpha beta unrelated filler filler filler"),
    (2L, "alpha gamma delta beta near match text"),
    (3L, "alpha something else entirely different"))
  // query 10 = {alpha, beta, gamma}; vectors make doc 2 the semantic
  // winner even where lexical scores say otherwise
  private val emb = Seq(
    (10L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal: cosine 0
    (2L, Array(1.0f, 0.1f, 0.0f)))   // near-parallel: cosine ~1
  // docs 0 and 3 have NO vectors

  test("dense re-rank on top of the lexical shortlist; sentinel sinks") {
    val queries = Seq((10L, "alpha"), (10L, "beta"), (10L, "gamma"))
      .toDF("query_id", "term")
    val out = HybridRetrieval.hybridTopK(docs.toDF("doc_id", "text"),
        queries, emb.toDF("vec_id", "embedding"), "text", "doc_id",
        "vec_id", "embedding", shortlist = 10, k = 10)
      .orderBy("rk")
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getInt(4)))
    // embedded docs rank above vector-less ones; doc 2 (cosine ~1)
    // beats doc 1 (cosine 0)
    val order = out.map(_._1).toSeq
    assert(order.take(2) === Seq(2L, 1L), order.toString)
    // vector-less docs carry the sentinel and keep lexical order
    val sunk = out.filter(_._2 == -1.0).map(_._1).toSeq
    assert(sunk.toSet === Set(0L, 3L))
    assert(sunk === Seq(0L, 3L)) // lexical: doc 0 (3 terms) > doc 3 (1)
    graft.ops.StagePersists.release(spark)
  }

  test("plan: embedding joins broadcast the shortlist side") {
    val queries = Seq((10L, "alpha")).toDF("query_id", "term")
    val plan = HybridRetrieval.hybridTopK(docs.toDF("doc_id", "text"),
        queries, emb.toDF("vec_id", "embedding"), "text", "doc_id",
        "vec_id", "embedding", 10, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    graft.ops.StagePersists.release(spark)
  }
}
