package graft.sim

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid lexical-then-semantic retrieval — the modern two-stage
  * retrieval stack (BM25 candidate generation, dense re-rank; the
  * [[Similarity.pqRerankTopK]] relationship with the lexical index as
  * stage 1): each query's [[graft.text.Bm25]] champion shortlist is
  * re-ranked by embedding cosine between the query's document vector
  * and the candidate's, rounded to 4 decimals before ranking (the s1
  * cross-engine determinism contract). Documents without a vector —
  * routine at 100 TB, where embedding coverage lags the crawl — sink
  * below every embedded candidate via a −1 sentinel, their relative
  * order still fixed by (lexical score desc, doc_id).
  *
  * Scale shape: the shortlist frame is (queries × shortlist) rows —
  * eval-set sized — so BOTH embedding joins broadcast IT against the
  * corpus-sized embeddings table (plan: two BroadcastHashJoins with
  * the shortlist on the build side), and the final ranking is the
  * salted top-k. The dense pass costs |shortlist| dot products per
  * query, never a corpus scan.
  */
object HybridRetrieval {

  def hybridTopK(docs: DataFrame, queries: DataFrame, emb: DataFrame,
      textCol: String, idCol: String, vecIdCol: String, vecCol: String,
      shortlist: Int, k: Int,
      post: Option[DataFrame] = None): DataFrame = {
    val short = graft.text.Bm25
      .topK(docs, queries, textCol, idCol, shortlist, post)
      .drop("rk")
    val qv = emb.select(col(s"`$vecIdCol`").as("query_id"),
      col(s"`$vecCol`").as("__qv"))
    val dv = emb.select(col(s"`$vecIdCol`").as("doc_id"),
      col(s"`$vecCol`").as("__dv"))
    val reranked = short
      .join(qv, Seq("query_id"), "left")
      .join(dv, Seq("doc_id"), "left")
      .select(col("query_id"), col("doc_id"), col("score_fp"),
        when(col("__qv").isNotNull && col("__dv").isNotNull,
            round(Similarity.cosine(col("__qv"), col("__dv")), 4))
          .otherwise(lit(-1.0)).as("rerank"))
    graft.ops.Scale.saltedTopK(reranked, Seq(col("query_id")),
      Seq(col("rerank").desc, col("score_fp").desc, col("doc_id")),
      k, col("doc_id"), "rk")
  }
}
