package graft

import graft.profile.{Profiler, ProfilerConfig}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based profiler invariants (SURVEY.md §5: "property-based
  * tests (ScalaCheck) for profiler invariants"). Generated tables of
  * arbitrary strings/nulls must always satisfy the structural laws.
  * Generators are driven directly with fixed seeds (no scalatestplus
  * bridge in the offline cache) — failures reproduce exactly. */
class ProfilerPropertySpec extends SparkSpec {

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""), Gen.const("   "),
    Gen.alphaNumStr.map(_.take(20)),
    Gen.choose(-1e6, 1e6).map(_.toString),
    Gen.oneOf("yes", "no", "2024-01-01", "x y z", "!@#", "ünïcödé"),
    Gen.asciiPrintableStr.map(_.take(30)))

  private val tableGen: Gen[List[(String, String)]] =
    Gen.listOfN(40, Gen.zip(cellGen, cellGen))

  test("profile invariants hold on arbitrary string tables") {
    (1 to 12).map(i => tableGen(Gen.Parameters.default, Seed(i.toLong)).get)
      .foreach { rows =>
      import spark.implicits._
      val df = rows.toDF("a", "b")
      val profiles = Profiler.profile(df, "t",
        ProfilerConfig(features = Set("mode", "pattern"))).collect()
      assert(profiles.length === 2)
      profiles.foreach { p =>
        val rowCount = p.getAs[Long]("row_count")
        val nullCount = p.getAs[Long]("null_count")
        val nullRatio = p.getAs[Double]("null_ratio")
        val distinct = p.getAs[Long]("distinct_count")
        val uniqueRatio = p.getAs[Double]("unique_ratio")
        val minLen = p.getAs[Long]("min_len")
        val maxLen = p.getAs[Long]("max_len")
        val avgLen = p.getAs[Double]("avg_len")
        assert(rowCount === rows.length.toLong)
        assert(nullCount >= 0 && nullCount <= rowCount)
        assert(nullRatio >= 0.0 && nullRatio <= 1.0)
        assert(math.abs(nullRatio - nullCount.toDouble / rowCount) < 1e-12)
        // distinct counts PRESENT values only
        assert(distinct >= 0 && distinct <= rowCount - nullCount)
        assert(uniqueRatio >= 0.0 && uniqueRatio <= 1.0)
        assert(minLen <= maxLen)
        if (nullCount < rowCount) {
          assert(avgLen >= minLen - 1e-9 && avgLen <= maxLen + 1e-9)
        }
        // census totals: class counts are non-negative and each ratio
        // feature stays in [0,1]
        Seq("alpha_chars", "digit_chars", "punct_chars", "space_chars",
          "misc_chars").foreach(c => assert(p.getAs[Long](c) >= 0L, c))
        Seq("ratio_int", "ratio_float", "ratio_bool", "ratio_date",
          "mode_ratio", "dominant_pattern_ratio").foreach { c =>
          val v = p.getAs[Double](c)
          assert(v >= 0.0 && v <= 1.0 + 1e-12, s"$c = $v")
        }
      }
    }
  }
}
