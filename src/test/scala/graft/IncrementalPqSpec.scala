package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** Pins the incremental PQ index (s10): maintaining the code table
  * across dumps — encode only the new batch — yields byte-identical
  * state and probe results to re-encoding the whole corpus. */
class IncrementalPqSpec extends SparkSpec {
  import spark.implicits._

  private val cbs = Similarity.pqCodebooks(m = 8, ksub = 16, dsub = 8)

  test("upsert of a new dump equals a full re-encode of the grown corpus") {
    val emb = Tables.load(spark, sf, "embeddings")
    val old = emb.filter(pmod($"vec_id", lit(4)) =!= 0)
    val batch = emb.filter(pmod($"vec_id", lit(4)) === 0)
    val stored = Similarity.pqCodesTable(old, "vec_id", "embedding", cbs)
    val incremental = Similarity
      .pqCodesUpsert(stored, batch, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    val full = Similarity.pqCodesTable(emb, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(incremental == full)
    assert(full.nonEmpty)
  }

  test("probing stored codes equals probing a freshly encoded corpus") {
    val emb = Tables.load(spark, sf, "embeddings")
    val old = emb.filter(pmod($"vec_id", lit(4)) =!= 0)
    val batch = emb.filter(pmod($"vec_id", lit(4)) === 0 && $"vec_id" < 40)
    val viaStored = Similarity.pqProbeStored(
        Similarity.pqCodesTable(old, "vec_id", "embedding", cbs),
        batch, "vec_id", "embedding", k = 5, cbs)
      .as[(Long, Long, Double, Long)].collect().toSet
    // the "rebuild everything" baseline: re-encode the old corpus from
    // raw vectors on every probe — what the incremental path avoids
    val reEncoded = Similarity.pqCodesTable(
      old.select($"vec_id", $"embedding"), "vec_id", "embedding", cbs)
      .localCheckpoint(true)
    val viaRebuild = Similarity.pqProbeStored(reEncoded, batch,
        "vec_id", "embedding", k = 5, cbs)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaStored == viaRebuild)
    assert(viaStored.nonEmpty)
    // neighbors come only from the stored corpus; queries only from the
    // new dump
    assert(viaStored.forall { case (q, n, _, _) => q % 4 == 0 && n % 4 != 0 })
  }
}
