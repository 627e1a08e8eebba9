package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Pins [[Multimodal.videoDupPairs]]: re-encodes and segment-aligned
  * trims are found, edits lose only the tail, and the boilerplate df
  * cap drops segments shared corpus-wide.
  */
class VideoDupSpec extends SparkSpec {
  import spark.implicits._

  private val W = 8
  private def seg(c: Char, n: Int) = c.toString * (W * n)

  test("re-upload shapes found; edits and boilerplate are not pairs") {
    val base = seg('a', 1) + seg('b', 1) + seg('c', 1) + seg('d', 1)
    val docs = Seq(
      (0L, base),                        // original (4 segments)
      (1L, base),                        // re-encode: full match
      (2L, base.take(W * 3)),            // aligned trim: containment 1
      (3L, seg('a', 1) + seg('x', 1) + seg('y', 1) + seg('z', 1)),
      // ^ edit after segment 1: shares only 1/4 → no pair
      (4L, seg('q', 4)),                 // unrelated
      (5L, seg('q', 4)))                 // its re-encode
    val media = Multimodal.asMediaTable(docs.toDF("doc_id", "text"),
      "doc_id", "text")
    val pairs = Multimodal.videoDupPairs(media, window = W, num = 9,
        den = 10, dfCap = 50)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(pairs === Set((0L, 1L), (0L, 2L), (1L, 2L), (4L, 5L)))
    graft.ops.StagePersists.release(spark)
  }

  test("the df cap drops corpus-wide boilerplate segments") {
    // every doc shares the same intro segment; cap 3 < 7 docs drops it
    // from pairing (sizes stay pre-cap, the d2 convention), so only
    // the planted re-encode pair clears 9/10 of its 10 segments
    def segStr(s: String) = (s * W).take(W)
    val intro = segStr("i")
    def body(i: Int) = (0 until 9).map(j => segStr(s"x$i$j")).mkString
    val docs = (0 to 5).map(i => (i.toLong, intro + body(i))) ++
      Seq((6L, intro + body(0)))  // re-encode of doc 0's content
    val media = Multimodal.asMediaTable(docs.toDF("doc_id", "text"),
      "doc_id", "text")
    val pairs = Multimodal.videoDupPairs(media, window = W, num = 9,
        den = 10, dfCap = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(pairs === Set((0L, 6L)))
    graft.ops.StagePersists.release(spark)
  }

  test("decode path == column path (the VideoHashDecoder boundary)") {
    val docs = Seq((0L, seg('a', 1) + seg('b', 1) + "tail"),
      (1L, seg('b', 2)), (2L, ""))
    val media = Multimodal.asMediaTable(docs.toDF("doc_id", "text"),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().sorted.toSeq
    // the stub decoder replays the fixed-offset md5 hashes bit-exactly,
    // so a real decoder integrates behind the same (id, fhash) schema
    assert(rows(Multimodal.decodeFrameWindowHashes(media, W,
        Multimodal.StubVideoHashDecoder)) ===
      rows(Multimodal.frameWindowHashes(media, W)))
    graft.ops.StagePersists.release(spark)
  }
}
