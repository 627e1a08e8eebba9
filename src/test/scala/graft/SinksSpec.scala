package graft

import graft.ingest.Ingest
import graft.profile.Profiler
import graft.rules._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Store/sink round trips (S5 profile store, S7 error sink) and the
  * malformed-row filter (P12). */
class SinksSpec extends SparkSpec {

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
