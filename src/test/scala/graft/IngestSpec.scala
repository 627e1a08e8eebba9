package graft

import graft.queries.IngestQueries
import org.apache.spark.sql.functions._

/** The composed incremental dump-ingest loop (l8) on a hand-built
  * corpus: every stage-bite contract pinned in-engine, plus the
  * composed RELEASE extension of SinksSpec — the loop's kept dump
  * appended into the stored release layout, folded manifest ≡ a full
  * re-release (evicted stored docs stay on disk and are masked by the
  * membership map at read time — the same tombstone-free convention
  * as the folded BM25 index).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  // 12+ distinct words per text so every doc shingles (n = 3) and the
  // minhash candidates fire; digit-heavy originals so the alpha-only
  // revision provably scores HIGHER t2 quality (digit ratio drops).
  private def words(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}x$i").mkString(" ")
  private val longBody =
    "the curated corpus keeps growing with every single crawl " +
      "and the pipeline must fold each new dump into stored state " +
      "without ever re scanning what it already holds 11 22 33 44 55 66"

  private lazy val corpus = Seq(
    (2L, "en", s"alpha doc one ${words(1, 12)}"),
    (4L, "en", s"alpha doc two ${words(2, 12)}"),
    (6L, "de", longBody), // near-dup partner + revision target
    (8L, "de", s"gamma doc vier ${words(4, 12)}")
  ).toDF("doc_id", "lang", "text")

  private lazy val dumpRaw = Seq(
    // fresh doc
    (11L, "en", s"fresh dump doc ${words(9, 12)}"),
    // within-dump exact dup pair (stage 1 drops 2000011)
    (2000011L, "en", s"fresh dump doc ${words(9, 12)}"),
    // exact revisit of corpus doc 2 (stage 2: Bloom hit + confirm drop)
    (1000002L, "en", s"alpha doc one ${words(1, 12)}"),
    // REVISED re-crawl of corpus doc 6: same body, alpha-only suffix
    // replacing nothing — near-dup (jaccard >> 0.5) with strictly
    // higher quality (digit tail diluted by added alpha words)
    (3000006L, "de", longBody +
      " revised edition with improved prose quality and careful wording")
  ).toDF("doc_id", "lang", "text")

  private lazy val s = IngestQueries.ingest(corpus, dumpRaw)

  test("l8 stage bites: within-dump dedup, Bloom+confirm, near-dup fold, keep-best eviction") {
    assert(s.dumpRaw.count() == 4L)
    val d1Ids = s.d1.select("doc_id").as[Long].collect().toSet
    assert(d1Ids == Set(11L, 1000002L, 3000006L),
      "within-dump exact dedup keeps the min-id copy")
    // Bloom prefilter flags the revisit; confirm keeps everything else
    val hits = s.probed.filter(col("bloom_hit"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits.contains(1000002L), "revisit must Bloom-hit")
    val d2Ids = s.d2.select("doc_id").as[Long].collect().toSet
    assert(d2Ids == Set(11L, 3000006L),
      "confirmed revisit dropped, fresh + revised kept")
    // the revision pairs with its stored source and joins its component
    val kbRows = s.kb.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(kbRows.contains(6L) && kbRows.contains(3000006L))
    assert(kbRows(6L)._1 == kbRows(3000006L)._1,
      "revision folds into the stored component")
    // keep-best: the alpha-heavier revision scores strictly higher
    val q = s.lake.filter(col("doc_id").isin(6L, 3000006L))
      .select(col("doc_id"),
        graft.text.TextAnalysis.qualityE4("text").as("q"))
      .as[(Long, Long)].collect().toMap
    assert(q(3000006L) > q(6L), s"revision must out-score the original: $q")
    assert(!kbRows(6L)._2 && kbRows(3000006L)._2,
      "keep-best evicts the stored copy for the better re-crawl")
    val keptIds = s.kept.select("doc_id").as[Long].collect().toSet
    assert(keptIds == Set(2L, 4L, 8L, 11L, 3000006L))
  }

  test("l8 folded BM25 state and profile state equal a full rebuild over the lake") {
    val bm = graft.text.Bm25
    val full = bm.buildState(s.lake, "text", "doc_id")
    def dfMap(st: bm.State) = st.dfreq.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfMap(s.bmState) == dfMap(full))
    val sums = s.bmState.sums.collect()(0)
    val fullSums = full.sums.collect()(0)
    assert((sums.getLong(0), sums.getLong(1)) ==
      (fullSums.getLong(0), fullSums.getLong(1)))
    // profile fold: row_count over both columns == |lake|
    val n = s.lake.count()
    val prows = s.prof.select("column", "row_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prows == Map("lang" -> n, "text" -> n))
  }

  test("composed release: appendDump of the loop's kept dump folds to the full manifest") {
    import graft.text.CorpusRelease
    val tok = graft.text.TextAnalysis.tokenCount("text")
    // the stored release = the pre-dump corpus; the dump's KEPT docs
    // append; evicted stored docs stay on disk (masked by the
    // membership map downstream, never rewritten at 100 TB)
    val old = corpus.select(col("doc_id"), col("lang"), tok.as("n_tokens"))
    val keptDump = s.kept.join(s.d2.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), tok.as("n_tokens"))
    val dirInc = java.nio.file.Files.createTempDirectory("graft_l8_inc").toFile
    val dirFull = java.nio.file.Files.createTempDirectory("graft_l8_full").toFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    try {
      val stored = CorpusRelease.write(old, dirInc.getAbsolutePath,
          partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
          sumCols = Seq("n_tokens"))
        .collect().toSeq
      val delta = CorpusRelease.appendDump(keptDump, dirInc.getAbsolutePath,
        partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
        sumCols = Seq("n_tokens"))
      val folded = CorpusRelease.foldManifest(
          spark.createDataFrame(spark.sparkContext.parallelize(stored),
            delta.schema), delta, partitionCols = Seq("lang"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      CorpusRelease.write(old.unionByName(keptDump), dirFull.getAbsolutePath,
        partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
        sumCols = Seq("n_tokens"))
      val full = CorpusRelease.manifest(spark, dirFull.getAbsolutePath,
          Seq("lang"), Seq("n_tokens"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(folded == full,
        "incrementally folded manifest must equal the full re-release")
      // row multiset equal too
      def rows(p: String) = spark.read.parquet(p)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(rows(dirInc.getAbsolutePath) == rows(dirFull.getAbsolutePath))
    } finally { rm(dirInc); rm(dirFull) }
  }
}
