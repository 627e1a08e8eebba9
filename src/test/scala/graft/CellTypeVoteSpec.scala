package graft

import graft.functions.CellTypeVote
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The fused type-vote Expression must agree with the six rlike
  * formulations — including Java's trailing-line-terminator `$`
  * semantics — on both interpreted and codegen paths. */
class CellTypeVoteSpec extends SparkSpec {

  private val res = Seq(
    ("int", "^[+-]?\\d+$", CellTypeVote.IntBit),
    ("float", "^[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$", CellTypeVote.FloatBit),
    ("bool", "^(?i)(true|false|yes|no|t|f|y|n)$", CellTypeVote.BoolBit),
    ("date", "^\\d{4}-\\d{2}-\\d{2}([ T].*)?$", CellTypeVote.DateBit),
    ("numcell", "^[+-]?\\d+(\\.\\d+)?$", CellTypeVote.NumCellBit),
    ("alphacell", "^[A-Za-z ]+$", CellTypeVote.AlphaCellBit))

  private val samples = Seq(
    "", " ", "42", "+42", "-4.2", ".5", "5.", "1e9", "-1.5E-3", "4.2.1",
    "true", "False", "YES", "n", "T", "maybe", "truth",
    "2024-01-02", "2024-01-02 10:00", "2024-01-02Textra", "2024-1-02",
    "123\n", "123\r\n", "123\r", "12\n3", "true\n", "2024-01-02 a\nb",
    "2024-01-02 ünïcödé", "abc def", "abc1", "ABC", "+", "-", ".", "e5",
    "\n", "123", "123 ", "123 ", "123")

  private def sparkAgrees(values: Seq[String]): Unit = {
    import spark.implicits._
    val df = values.toDF("s")
    val cols = col("s") +: CellTypeVote(col("s")).as("vote") +:
      res.map { case (name, re, _) => col("s").rlike(re).as(name) }
    df.select(cols: _*).collect().foreach { r =>
      val vote = r.getLong(1)
      res.zipWithIndex.foreach { case ((name, _, bit), i) =>
        val regex = r.getBoolean(2 + i)
        val fused = (vote & bit) != 0
        assert(fused === regex,
          s"$name mismatch on ${r.getString(0).map(_.toInt.toHexString)}: " +
            s"fused=$fused regex=$regex")
      }
    }
  }

  test("vote equals the rlike cascade on curated tricky strings") {
    sparkAgrees(samples)
  }

  test("vote equals the rlike cascade on generated strings") {
    val charGen = Gen.frequency(
      (6, Gen.oneOf("0123456789+-.eE TtrueFalsyn-: \n\r".toSeq)),
      (2, Gen.alphaNumChar),
      (1, Gen.oneOf('', ' ', ' ', 'ü', '日')))
    val strGen = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    // fixed-seed generator drive (no scalatestplus bridge offline)
    val batch = (1 to 400).flatMap(i => strGen(Gen.Parameters.default, Seed(i.toLong)))
    sparkAgrees(batch)
  }

  test("vote participates in whole-stage codegen") {
    val df = Tables.load(spark, sf, "documents")
      .select(CellTypeVote(col("text")).as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cell_type_vote"), plan)
  }
}
