package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing specs: the mapPartitions decode path must
  * reproduce the codegen'd metadata path bit-for-bit, and batching
  * must respect the batch size. */
class MultimodalSpec extends SparkSpec {

  test("decode path equals metadata path") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val viaColumns = Multimodal.mediaFeatures(media)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val viaDecoder = Multimodal.decodeFeatures(media, Multimodal.StubDecoder,
        batchSize = 7)
      .collect().map(f => f.id ->
        (f.n_bytes, f.checksum, f.width, f.height, f.n_channels)).toMap
    assert(viaDecoder === viaColumns)
    assert(viaDecoder.size === 50)
  }

  test("decoder sees bounded batches") {
    val docs = Tables.load(spark, sf, "documents").limit(20).coalesce(1)
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    MultimodalSpec.batchSizes.clear()
    // single partition, batchSize 8, 20 rows → batches of 8, 8, 4
    assert(Multimodal.decodeFeatures(media, MultimodalSpec.SpyDecoder,
      batchSize = 8).count() === 20)
    val observed = MultimodalSpec.batchSizes
      .toArray(Array.empty[Integer]).map(_.toInt).sorted
    assert(observed === Array(4, 8, 8))
  }
}

/** JVM-static spy state: the decoder closure is serialized per task, so
  * a queue captured in the closure would land in a deserialized copy —
  * a static object is shared in local mode. */
object MultimodalSpec {
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  object SpyDecoder extends Multimodal.MediaDecoder {
    def decodeBatch(ids: Seq[Long], blobs: Seq[Array[Byte]]) = {
      batchSizes.add(ids.size)
      Multimodal.StubDecoder.decodeBatch(ids, blobs)
    }
  }
}
