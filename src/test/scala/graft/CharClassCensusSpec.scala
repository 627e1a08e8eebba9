package graft

import graft.functions.CharClassCensus
import graft.profile.{Profiler, ProfilerConfig}
import org.apache.spark.sql.functions._

/** The fused census Expression must be bit-identical to the regex
  * formulation — interpreted AND codegen paths. */
class CharClassCensusSpec extends SparkSpec {

  private val samples = Seq(
    "Hello, World! 42", "", "   ", "tabs\tand\nnewlines",
    "ünïcödé mixé", "日本語テキスト", "emoji 😀 pair",
    "a1!@# Z9~`", "punct-only:;'\"[]{}")

  test("census equals the regex class counts on tricky strings") {
    import spark.implicits._
    val df = samples.toDF("s")
    def regexCnt(re: String) = length(regexp_replace(col("s"), re, "")).cast("long")
    val rows = df.select(
      CharClassCensus(col("s")).as("census"),
      regexCnt("[^A-Za-z]").as("alpha"), regexCnt("[^0-9]").as("digit"),
      regexCnt("[^\\p{Punct}]").as("punct"), regexCnt("[^\\s]").as("space"),
      (length(col("s")) - regexCnt("[^A-Za-z]") - regexCnt("[^0-9]") -
        regexCnt("[^\\p{Punct}]") - regexCnt("[^\\s]")).cast("long").as("misc"))
      .collect()
    rows.foreach { r =>
      val census = r.getSeq[Long](0)
      assert(census === Seq(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)), s"mismatch for census=$census row=$r")
    }
  }

  test("census participates in whole-stage codegen") {
    // parquet-backed (a literal Seq constant-folds to LocalTableScan)
    val df = Tables.load(spark, sf, "documents")
      .select(CharClassCensus(col("text")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [char_class_census"), plan)
    assert(df.count() > 0) // and the generated code actually runs
  }

  test("char_class_census is SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, sf, "documents").limit(5)
      .createOrReplaceTempView("census_docs")
    val rows = spark.sql(
      "SELECT char_class_census(text) AS c, length(text) AS n FROM census_docs")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0).sum === r.getInt(1).toLong))
  }

  test("fused and regex profiler paths agree on real data") {
    val docs = Tables.load(spark, sf, "documents")
    val censusCols = Seq("table", "column", "alpha_chars", "digit_chars",
      "punct_chars", "space_chars", "misc_chars")
    val fused = Profiler.profile(docs, "d",
      ProfilerConfig(features = Set.empty, fusedCensus = true))
      .select(censusCols.head, censusCols.tail: _*).collect().toSeq
    val regex = Profiler.profile(docs, "d",
      ProfilerConfig(features = Set.empty, fusedCensus = false))
      .select(censusCols.head, censusCols.tail: _*).collect().toSeq
    assert(fused.map(_.toSeq).sortBy(_.toString) ===
      regex.map(_.toSeq).sortBy(_.toString))
  }
}
