package graft

import graft.profile.Profiler
import org.apache.spark.sql.functions._

/** The fused pattern-generalize Expression must be byte-identical to
  * the three-regexp_replace formulation — including non-ASCII
  * pass-through and Java-regex `\s` (ASCII-only) semantics. */
class PatternGeneralizeSpec extends SparkSpec {

  private val samples = Seq(
    "Hello, World! 42", "", "   ", "tabs\tand\nnewlines",
    "ünïcödé 42 mixé", "日本語 123 テキスト", "emoji 😀 42",
    "a1!@# Z9~`", "2020-01-15T10:30:00", "+1 (555) 123-4567",
    "no break space", // unicode spaces are NOT Java-regex \s
    "\f vertical")

  test("fused pattern equals the regex formulation byte for byte") {
    import spark.implicits._
    val rows = samples.toDF("s").select(
      Profiler.patternOf(col("s")).as("fused"),
      Profiler.patternOfRegex(col("s")).as("regex")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("fused pattern matches regex formulation on random strings") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val alphabet = "aZ09 \t\n.,;-_ü日😀 "
    val rand = Seq.fill(2000)(
      Seq.fill(rng.nextInt(30))(alphabet(rng.nextInt(alphabet.length))).mkString)
    val bad = rand.toDF("s")
      .select(Profiler.patternOf(col("s")).as("a"),
        Profiler.patternOfRegex(col("s")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(bad.count() == 0, bad.take(5).mkString("; "))
  }

  test("pattern_generalize is codegen'd and SQL-callable") {
    graft.functions.GraftFunctions.register(spark)
    val df = Tables.load(spark, sf, "documents")
      .select(Profiler.patternOf(col("text")).as("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [pattern_generalize"), plan)
    Tables.load(spark, sf, "nation").limit(3)
      .createOrReplaceTempView("pg_probe")
    assert(spark.sql(
      """SELECT pattern_generalize(n_name) AS a,
        |  regexp_replace(regexp_replace(regexp_replace(n_name,
        |    '[0-9]', '9'), '[A-Za-z]', 'A'), '\\s', ' ') AS b
        |FROM pg_probe""".stripMargin)
      .collect().forall(r => r.getString(0) == r.getString(1)))
  }
}
