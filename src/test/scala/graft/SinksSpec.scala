package graft

import graft.ingest.Ingest
import graft.profile.Profiler
import graft.rules._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Store/sink round trips (S5 profile store, S7 error sink) and the
  * malformed-row filter (P12). */
class SinksSpec extends SparkSpec {

  test("corpus release: partition layout, shard bound, pack-order files, manifest") {
    import spark.implicits._
    val corpus = (1 to 600).map { i =>
      (i.toLong, if (i % 3 == 0) "val" else "train",
        if (i % 2 == 0) "en" else "de", (i % 40).toLong, i.toLong * 3)
    }.toDF("doc_id", "split", "lang", "bin_id", "n_tokens")
    val dir = java.nio.file.Files.createTempDirectory("graft_release").toFile
    try {
      val man = graft.text.CorpusRelease.write(corpus, dir.getAbsolutePath,
        sumCols = Seq("n_tokens"), maxRecordsPerFile = 50L)
      // 4 partition dirs with exact counts and token sums
      val rows = man.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
      assert(rows.keySet == Set(("train", "en"), ("train", "de"),
        ("val", "en"), ("val", "de")))
      assert(rows.values.map(_._1).sum == 600L)
      assert(rows.values.map(_._2).sum == (1 to 600).map(_.toLong * 3).sum)
      // hive layout on disk; shards bounded at 50 records → >1 file per
      // 200-row partition
      val trainEn = new java.io.File(dir, "split=train/lang=en")
      assert(trainEn.isDirectory, "expected hive-partitioned layout")
      assert(trainEn.listFiles().count(_.getName.endsWith(".parquet")) > 1,
        "maxRecordsPerFile must split shards")
      // pack order inside each file: bin_id non-decreasing
      trainEn.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val bins = spark.read.parquet(f.getAbsolutePath)
          .select("bin_id").collect().map(_.getLong(0))
        assert(bins.toSeq == bins.toSeq.sorted, s"unsorted shard ${f.getName}")
      }
      // round trip preserves every row
      val back = spark.read.parquet(dir.getAbsolutePath)
      assert(back.count() == 600L)
      assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
        (1L to 600L).toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("incremental release: append touches only the dump's partitions; " +
      "folded manifest and rows equal a full re-release") {
    import spark.implicits._
    def mk(ids: Range, split: Int => String, lang: Int => String) =
      ids.map(i => (i.toLong, split(i), lang(i), (i % 40).toLong,
        i.toLong * 3)).toDF("doc_id", "split", "lang", "bin_id", "n_tokens")
    // old release: train/val × en; the dump touches (train, en) and
    // brings a brand-new (train, de) partition — (val, en) is untouched
    val old = mk(1 to 300, i => if (i % 3 == 0) "val" else "train", _ => "en")
    val dump = mk(301 to 500, _ => "train",
      i => if (i % 2 == 0) "en" else "de")
    val dirInc = java.nio.file.Files.createTempDirectory("graft_inc").toFile
    val dirFull = java.nio.file.Files.createTempDirectory("graft_full").toFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    try {
      val stored = graft.text.CorpusRelease.write(old, dirInc.getAbsolutePath,
        sumCols = Seq("n_tokens"), maxRecordsPerFile = 50L)
        .collect().toSeq // freeze: the fold must use the STORED manifest
      val untouchedDir = new java.io.File(dirInc, "split=val/lang=en")
      val before = untouchedDir.listFiles().map(f =>
        f.getName -> f.lastModified()).toMap
      val delta = graft.text.CorpusRelease.appendDump(dump,
        dirInc.getAbsolutePath, sumCols = Seq("n_tokens"),
        maxRecordsPerFile = 50L)
      // untouched partition: exactly the same files, byte-for-byte ages
      val after = untouchedDir.listFiles().map(f =>
        f.getName -> f.lastModified()).toMap
      assert(after == before, "append must not touch (val, en)")
      // the delta covers exactly the dump's partitions, with on-disk
      // totals (old + new rows for the shared (train, en) partition)
      val deltaMap = delta.collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(deltaMap.keySet == Set(("train", "en"), ("train", "de")))
      // folded manifest == the manifest of a full re-release
      val folded = graft.text.CorpusRelease.foldManifest(
          spark.createDataFrame(spark.sparkContext.parallelize(stored),
            delta.schema), delta)
        .collect().map(r =>
          (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      graft.text.CorpusRelease.write(old.unionByName(dump),
        dirFull.getAbsolutePath, sumCols = Seq("n_tokens"),
        maxRecordsPerFile = 50L)
      val full = graft.text.CorpusRelease.manifest(spark,
          dirFull.getAbsolutePath, Seq("split", "lang"), Seq("n_tokens"))
        .collect().map(r =>
          (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(folded == full)
      // row multiset equal between incremental layout and full re-release
      def rows(p: String) = spark.read.parquet(p)
        .select("doc_id", "split", "lang", "bin_id", "n_tokens")
        .as[(Long, String, String, Long, Long)].collect().sorted.toSeq
      assert(rows(dirInc.getAbsolutePath) == rows(dirFull.getAbsolutePath))
    } finally { rm(dirInc); rm(dirFull) }
  }

  test("foldManifest replaces touched rows null-safely") {
    import spark.implicits._
    val stored = Seq(("train", "en", 10L, 30L), ("train", null, 5L, 15L),
      ("val", "en", 4L, 12L)).toDF("split", "lang", "n_rows", "sum_n_tokens")
    val delta = Seq(("train", null, 9L, 27L))
      .toDF("split", "lang", "n_rows", "sum_n_tokens")
    val folded = graft.text.CorpusRelease.foldManifest(stored, delta)
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getLong(2))).toSet
    // the stale (train, null) row must be REPLACED, not duplicated
    assert(folded == Set(("train", Some("en"), 10L),
      ("train", None, 9L), ("val", Some("en"), 4L)))
  }

  test("S5: typed profiles round-trip through parquet") {
    val profiles = Profiler.profileTyped(
      Tables.load(spark, sf, "customer"), "customer")
    val dir = Files.createTempDirectory("graft-profiles").toString
    profiles.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    import spark.implicits._
    val reread = back.as[graft.model.ColumnProfile].collect()
      .sortBy(_.column)
    val orig = profiles.collect().sortBy(_.column)
    // string compare: NaN != NaN would fail case-class equality on the
    // quartile fields of non-numeric columns
    assert(reread.toSeq.map(_.toString) === orig.toSeq.map(_.toString))
  }

  test("S7: violations round-trip through the CSV sink") {
    val o = Tables.load(spark, sf, "orders")
    val violations = ViolationScanner.scan(o, "orders",
      Seq(RangeRule("o_totalprice", 2000.0, 450000.0)), "o_orderkey")
    val dir = Files.createTempDirectory("graft-errors").toString
    violations.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === violations.count())
    val cells = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("row_id").cast("long"), col("column")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cells(back) === cells(violations))
  }

  test("P12: malformed CSV rows are dropped") {
    val f = Files.createTempFile("graft-ragged", ".csv")
    // row 3 is short of the 3-column header — malformed (Spark CSV
    // truncates EXTRA tokens silently; missing tokens are the
    // droppable class, matching dBoost's wrong-arity discard)
    Files.writeString(f,
      "a,b,c\n1,x,y\n2,p,q\n3,x\n4,m,n\n")
    val strict = Ingest.readCsvDropMalformed(spark, f.toString)
    val ids = strict.select("a").collect().map(_.getString(0)).toSet
    assert(ids.contains("1") && ids.contains("2"))
    assert(!ids.contains("3")) // malformed row dropped
  }
}
