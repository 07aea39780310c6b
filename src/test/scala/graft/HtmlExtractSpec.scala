package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract

/** HtmlExtract: whole-page stripping and block-level link-density
  * boilerplate removal. */
class HtmlExtractSpec extends GraftSuite {
  import spark.implicits._

  test("stripMarkup: scripts (with bare <), styles, comments, entities") {
    val html = "<html><body><script>if (a < b) { f(); }</script>" +
      "<p>Hello &amp; welcome</p><!-- note --><style>.x { }</style>" +
      "</body></html>"
    val out = Seq(html).toDF("html")
      .select(HtmlExtract.stripMarkup(col("html"))).as[String].head()
    assert(out == "Hello & welcome")
  }

  test("double-escaped entity decodes one level only") {
    val out = Seq("<p>&amp;lt;tag&amp;gt;</p>").toDF("html")
      .select(HtmlExtract.stripMarkup(col("html"))).as[String].head()
    assert(out == "&lt;tag&gt;")
  }

  test("link-heavy blocks drop, prose survives in document order") {
    val html = "<div><a href='x'>Nav</a> <a href='y'>Bar</a></div>" +
      "<p>real content here</p><p>second &amp; final</p>" +
      "<div><a href='t'>T</a><a href='p'>P</a> c</div>"
    val out = HtmlExtract.extractMainContent(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
    val r = out.select("n_blocks", "n_kept", "content").head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getString(2) == "real content here second & final")
  }

  test("all-boilerplate page yields zero kept blocks and empty content") {
    val html = "<div><a href='a'>Only</a><a href='b'>Links</a></div>"
    val r = HtmlExtract.extractMainContent(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .select("n_kept", "content").head()
    assert(r.getLong(0) == 0 && r.getString(1) == "")
  }

  test("density threshold is a pure integer cross-multiply (num/den dial)") {
    // one block: anchors 4 chars of 12 visible => density 1/3 exactly:
    // kept at 1/3, dropped at 1/4.
    val html = "<p><a href='x'>link</a> and puff</p>"
    val base = Seq((1L, html)).toDF("doc_id", "html")
    assert(HtmlExtract.extractMainContent(base, "doc_id", "html", 1, 3)
      .head().getAs[Long]("n_kept") == 1)
    assert(HtmlExtract.extractMainContent(base, "doc_id", "html", 1, 4)
      .head().getAs[Long]("n_kept") == 0)
  }
}
