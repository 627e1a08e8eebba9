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

  test("audio decode path equals metadata path") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val viaColumns = Multimodal.audioFeatures(media)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val viaDecoder = Multimodal.decodeAudioFeatures(media,
        Multimodal.StubAudioDecoder, batchSize = 7)
      .collect().map(f => f.id ->
        (f.n_bytes, f.checksum, f.sample_rate, f.n_channels,
          f.duration_ms, f.loudness_bucket)).toMap
    assert(viaDecoder === viaColumns)
    assert(viaDecoder.size === 50)
    // only the four standard rates, channels in {1,2}, buckets in 0..9
    viaDecoder.values.foreach { case (_, _, rate, ch, dur, loud) =>
      assert(Set(16000L, 22050L, 44100L, 48000L)(rate))
      assert(ch == 1L || ch == 2L)
      assert(dur >= 500L && dur < 120500L)
      assert(loud >= 0L && loud <= 9L)
    }
  }

  test("audio metadata path is map-side only (no exchange, no blob output)") {
    // synthetic input: Tables.load may legitimately rebalance its scan
    import spark.implicits._
    val docs = Seq((1L, "some audio bytes"), (2L, "more")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val feats = Multimodal.audioFeatures(media)
    assert(!feats.columns.contains("media"))
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"audio probe should be a pure map over the scan:\n$plan")
  }

  test("dhash64 pins the difference-hash bit layout") {
    // each row ascending 0..8 → every adjacent comparison false → 0
    val inc = Array.tabulate(72)(i => i % 9)
    assert(Multimodal.dhash64(inc) == 0L)
    // each row descending → all 64 bits set (signed -1)
    val dec = Array.tabulate(72)(i => 9 - (i % 9))
    assert(Multimodal.dhash64(dec) == -1L)
    // bumping grid[r][0] by 2 flips exactly bit r·8 (no neighbors move)
    val one = inc.clone(); one(3 * 9) += 2
    assert(Multimodal.dhash64(one) == (1L << 24))
  }

  test("dhash pairs recover exactly the pairs within the distance bound") {
    import spark.implicits._
    val media = (1L to 5L).map(i => (i, Array[Byte]())).toDF("id", "media")
    val hashes = Multimodal.dhashFeatures(media, MultimodalSpec.LadderDecoder)
    val got = Multimodal.dhashPairs(hashes, maxDistance = 3)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for (i <- 1L to 5L; j <- i + 1 to 5L if j - i <= 3)
      yield (i, j, (j - i).toInt)).toSet
    assert(got == want) // (1,5) at distance 4 must be absent
  }

  test("audio fingerprint: delta coding, bounded Hamming under jitter") {
    import spark.implicits._
    // delta bit layout: energies [0,1,0,1,...] → every rise sets a bit
    val rising = Array.tabulate(65)(i => i)
    assert(Multimodal.audioFingerprint64(rising) == 0L) // never energy(w) > energy(w+1)
    val falling = Array.tabulate(65)(i => 65 - i)
    assert(Multimodal.audioFingerprint64(falling) == -1L) // all 64 bits
    // one window perturbed flips at most its two adjacent delta bits
    val jittered = rising.clone(); jittered(30) = 100
    val d = java.lang.Long.bitCount(
      Multimodal.audioFingerprint64(rising) ^ Multimodal.audioFingerprint64(jittered))
    assert(d <= 2 && d >= 1)
    // identical blobs → identical fingerprints → Hamming-0 pair found
    val media = Seq((1L, "same clip".getBytes("UTF-8")),
      (2L, "same clip".getBytes("UTF-8")),
      (3L, "other clip".getBytes("UTF-8"))).toDF("id", "media")
    val fps = Multimodal.audioFingerprintFeatures(media,
      Multimodal.StubAudioEnergyDecoder)
    val pairs = Multimodal.audioFingerprintPairs(fps, maxDistance = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("stub grayscale decoder is deterministic and planted dups hash equal") {
    import spark.implicits._
    val media = Seq((1L, "same text"), (2L, "same text"), (3L, "different"))
      .toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("media"))
    val h = Multimodal.dhashFeatures(media, Multimodal.StubGrayscaleDecoder)
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L) && h(1L) != h(3L))
    val pairs = Multimodal.dhashPairs(
      Multimodal.dhashFeatures(media, Multimodal.StubGrayscaleDecoder))
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  test("frame sampling covers [0, duration) on the stride grid") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val video = Multimodal.asVideoTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrameTimes(video, strideMs = 2000L)
      .select("id", "ts_ms", "frame_idx", "duration_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byId = frames.groupBy(_._1)
    val durs = video.select("id", "duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet === durs.keySet) // every video sampled (duration >= 1000)
    byId.foreach { case (id, fs) =>
      val ts = fs.map(_._2).sorted
      assert(ts.head == 0L && ts.last < durs(id))
      assert(ts === (0 until fs.length).map(_ * 2000L))
      fs.foreach { case (_, t, idx, d) =>
        assert(idx == t / 2000L && d == durs(id))
      }
    }
  }

  test("frame decode path equals the metadata frame keys") {
    val docs = Tables.load(spark, sf, "documents").limit(30)
    val video = Multimodal.asVideoTable(docs, "doc_id", "text")
    val meta = Multimodal.sampleFrameTimes(video, 2000L)
      .select("id", "ts_ms", "frame_key").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val decoded = Multimodal.decodeSampledFrames(video, 2000L,
        Multimodal.StubFrameDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(decoded === meta)
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

  /** Synthetic thumbnail with the first `k` rows' leading comparison
    * flipped: dHash has exactly bits {0*8, 1*8, ..., (k-1)*8} set, so
    * two grids at k=i and k=j are Hamming distance |i-j| apart (nested
    * bit sets) -- a fully controlled distance ladder. */
  def gridK(k: Int): Array[Int] = {
    val g = Array.tabulate(72)(i => i % 9)
    (0 until k).foreach(r => g(r * 9) += 2)
    g
  }

  object LadderDecoder extends Multimodal.GrayscaleDecoder {
    def decodeGrayscaleBatch(ids: Seq[Long],
        blobs: Seq[Array[Byte]]): Seq[(Long, Array[Int])] =
      ids.map(id => (id, gridK((id - 1).toInt)))
  }
}
