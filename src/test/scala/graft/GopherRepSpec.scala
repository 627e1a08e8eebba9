package graft

import graft.text.Cleaning
import org.apache.spark.sql.functions._

/** Pins [[graft.functions.GopherRepStats]] (the fused t39 kernel)
  * bit-identical to the join-machinery reference form, on hand-built
  * repetition shapes, adversarial inputs, and the planted testdata
  * corpus; plus spot value checks of the A1.2 semantics. */
class GopherRepSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[(Long, String)]) = {
    val df = rows.toDF("doc_id", "text")
    val cols = Seq("id", "n_lines", "dup_line_frac", "dup_line_char_frac",
      "n_paras", "dup_para_frac", "dup_para_char_frac") ++
      (2 to 4).map(n => s"top_${n}gram_char_frac") ++
      (5 to 10).map(n => s"dup_${n}gram_char_frac") :+ "rep_keep"
    def canon(r: org.apache.spark.sql.DataFrame) =
      r.select(cols.head, cols.tail: _*).collect()
        .map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    (canon(Cleaning.gopherRepetition(df, "text", "doc_id")),
      canon(Cleaning.gopherRepetitionReference(df, "text", "doc_id")))
  }

  test("kernel == reference on hand shapes and adversarial inputs") {
    val rows = Seq(
      1L -> "plain prose with no repetition at all here today",
      2L -> "dup line\ndup line\nother line",                // dup lines
      3L -> "para one text\n\npara one text\n\npara two",    // dup paras
      4L -> ("ab cd " * 11 + "ab cd"),                       // top-2gram spike
      5L -> "zq wq yq xq vq zq wq yq xq vq zq wq yq xq vq",  // dup 5-grams
      6L -> "",                                              // empty
      7L -> "§§§ †† ——",                                     // no tokens
      8L -> "one",                                           // 1 token
      9L -> "a\n\n\nb\nc\n\nd",                              // ragged seps
      10L -> "Éé àà Éé àà mixed Case TEXT Éé àà")            // accents/case
    val (k, r) = both(rows)
    assert(k.toSeq === r.toSeq)
  }

  test("kernel == reference on the planted t39 corpus (testdata)") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        expr(graft.queries.TextQueries.t39DeriveSql).as("text"))
      .limit(200)
    val rows = docs.as[(Long, String)].collect().toSeq
    val (k, r) = both(rows)
    assert(k.toSeq === r.toSeq)
  }

  test("A1.2 semantics spot checks") {
    val one = Cleaning.gopherRepetition(
        Seq((1L, "x y\nx y\nz w q")).toDF("doc_id", "text"), "text", "doc_id")
      .collect()(0)
    // lines: "x y" twice + "z w q" -> dup_line_frac 2/3, chars 3+3+5=11,
    // dup chars 6 -> 0.5455 (4dp)
    assert(one.getAs[Long]("n_lines") == 3L)
    assert(one.getAs[Double]("dup_line_frac") == 0.6667)
    assert(one.getAs[Double]("dup_line_char_frac") == 0.5455)
    // top 2-gram: "x y" count 2 (ties none), len 3, text len 13 -> 0.4615
    assert(one.getAs[Double]("top_2gram_char_frac") == 0.4615)
    assert(!one.getAs[Boolean]("rep_keep"))
  }
}
