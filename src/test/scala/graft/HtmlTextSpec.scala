package graft

import graft.text.HtmlText
import org.apache.spark.sql.functions._

/** t37 HTML → text extraction: per-rule pins on hand-built pages. */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String) =
    HtmlText.extract(Seq((1L, html)).toDF("id", "html"), "html", "id")
      .collect()(0)

  test("script/style stripped, block tags break lines, prose kept in order") {
    val r = one("<html><head><style>body { x: 1 }</style>" +
      "<script>var a = 2;</script></head><body>" +
      "<p>the first paragraph is long enough to keep for sure.</p>" +
      "<p>and the second paragraph also reads like prose text.</p>" +
      "</body></html>")
    assert(r.getAs[Int]("n_kept") == 2)
    assert(r.getAs[String]("text") ==
      "the first paragraph is long enough to keep for sure.\n" +
        "and the second paragraph also reads like prose text.")
    assert(!r.getAs[String]("text").contains("var a"))
  }

  test("nav bar fails minWords; link-dense promo fails the density rule only") {
    val r = one("<div><a href=\"/\">home</a> <a href=\"/b\">about</a></div>" +
      "<div>grab the deal <a href=\"/x\">click this long anchor</a> " +
      "<a href=\"/y\">and this other anchor too</a></div>" +
      "<p>the real content of the page stays here as prose.</p>")
    assert(r.getAs[Int]("n_blocks") == 3)
    assert(r.getAs[Int]("n_kept") == 1)
    assert(r.getAs[Int]("n_link_dropped") == 1)
    assert(r.getAs[String]("text").startsWith("the real content"))
  }

  test("stopword-free boilerplate drops; long stopword-free lists survive via longWords") {
    val foot = "<div>copyright 2026 example site rights reserved</div>"
    val list = "<li>" + (1 to 16).map(i => s"item$i").mkString(" ") + "</li>"
    val r = one(foot + list)
    // the footer has >= 5 words but no stopword and < 15 words -> drop;
    // the 16-word list passes the longWords branch
    assert(r.getAs[Int]("n_kept") == 1)
    assert(r.getAs[String]("text").startsWith("item1"))
  }

  test("empty page and tag-only page extract to empty text") {
    val r = one("<html><body><div><b></b></div></body></html>")
    assert(r.getAs[Int]("n_kept") == 0)
    assert(r.getAs[String]("text") == "")
  }
}
