package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** IVF ANN specs: exactness when probing all lists, decent recall when
  * probing a fraction. */
class IvfSpec extends SparkSpec {

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet

  test("nprobe = nlist reproduces exact brute-force top-k") {
    val emb = Tables.load(spark, sf, "embeddings").limit(200)
      .localCheckpoint()
    val exact = topkSet(Similarity.cosineTopK(emb, emb, "vec_id", "embedding", k = 5))
    val ivf = topkSet(Similarity.ivfCosineTopK(emb, "vec_id", "embedding",
      k = 5, nlist = 4, nprobe = 4))
    assert(ivf === exact)
  }

  test("fractional probing keeps good recall at a fraction of the work") {
    val emb = Tables.load(spark, sf, "embeddings").localCheckpoint()
    val exact = topkSet(Similarity.cosineTopK(emb, emb, "vec_id", "embedding", k = 10))
    val ivf = topkSet(Similarity.ivfCosineTopK(emb, "vec_id", "embedding",
      k = 10, nlist = 8, nprobe = 3))
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall > 0.5, s"recall@10 = $recall")
  }
}
