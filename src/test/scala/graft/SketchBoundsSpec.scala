package graft

import graft.profile.SketchBounds
import org.apache.spark.sql.functions._

class SketchBoundsSpec extends SparkSpec {
  import spark.implicits._

  test("percentile rank certificate holds on smooth, skewed, and spiked data") {
    val rng = new scala.util.Random(3)
    val rows = Seq.tabulate(20000) { i =>
      (rng.nextGaussian() * 10, math.exp(rng.nextGaussian() * 3),
        if (i % 2 == 0) 7.0 else rng.nextDouble())
    }
    val df = rows.toDF("gauss", "heavy", "spike")
    val out = SketchBounds.percentileRankCheck(df,
      Seq("gauss", "heavy", "spike"),
      Seq("q1" -> 0.25, "med" -> 0.5, "q3" -> 0.75)).collect()
    assert(out.length == 9)
    out.foreach(r => assert(r.getAs[Boolean]("ok"),
      s"${r.getAs[String]("column")}/${r.getAs[String]("metric")} violated the GK bound"))
  }

  test("distinct certificate holds at 4 sigma and FAILS at 0 sigma") {
    val df = (1L to 50000L).map(i => (i, i % 5)).toDF("hi_card", "lo_card")
    val ok = SketchBounds.distinctCheck(df, Seq("hi_card", "lo_card")).collect()
    ok.foreach(r => assert(r.getAs[Boolean]("ok"), r.getAs[String]("column")))
    // zero tolerance must flip the high-cardinality row to false —
    // proving the certificate CAN fail (HLL is never exact at 50k)
    val strict = SketchBounds.distinctCheck(df, Seq("hi_card"),
      sigmas = 0.0, slack = 0).collect()
    assert(!strict.head.getAs[Boolean]("ok"),
      "0-sigma distinct check unexpectedly passed — the certificate cannot fail")
  }
}
