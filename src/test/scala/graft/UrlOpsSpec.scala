package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, UrlOps}

class UrlOpsSpec extends GraftSuite {
  import spark.implicits._

  private def norm(url: String): (String, String) = {
    val r = Seq(Tuple1(url)).toDF("url")
      .select(UrlOps.normalizeUrl(col("url")),
        UrlOps.registeredDomain(col("url"))).collect()(0)
    (r.getString(0), r.getString(1))
  }

  test("normalizeUrl canonicalizes case, port, www, params, fragment") {
    assert(norm("HTTPS://WWW.ExAmple.COM:443/A/b?utm_source=x&id=7&fbclid=z#top")
      == ("https://example.com/A/b?id=7", "example.com"))
    // empty path -> '/', query fully scrubbed -> no '?'
    assert(norm("http://user:pw@News.Site.net:8080?utm_campaign=c&gclid=1")
      == ("http://news.site.net/", "site.net"))
    // params kept in original order; %-escapes and path case untouched
    assert(norm("https://a.b.co/X%20y?q=1&utm_x=2&r=3")
      == ("https://a.b.co/X%20y?q=1&r=3", "b.co"))
    // schemeless junk passes through unchanged
    assert(norm("not a url") == ("not a url", ""))
    // single-label host has no registered domain
    assert(norm("https://localhost:8080/x")._2 == "")
  }

  test("normalized form collapses tracking-param variants to one key") {
    val variants = Seq(
      "https://www.shop.example.com/item/5?id=5&utm_source=mail",
      "HTTPS://shop.example.com:443/item/5?utm_campaign=x&id=5&gclid=g",
      "https://shop.EXAMPLE.com/item/5?id=5#reviews")
    val n = variants.toDF("url")
      .select(UrlOps.normalizeUrl(col("url")).as("n"))
      .distinct().collect()
    assert(n.length == 1 &&
      n(0).getString(0) == "https://shop.example.com/item/5?id=5")
  }

  test("lmPerplexity: repeated corpus phrases score lower NLL than rare ones") {
    val common = (1L to 30L).map(i => (i, "the quick brown fox jumps again"))
    val rare = Seq((99L, "zebra quantum flute harmonica velvet osmosis"))
    val docs = (common ++ rare).toDF("doc_id", "text")
    val out = TextAnalysis.lmPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < out(99L),
      s"common-phrase doc ${out(1L)} should beat one-off doc ${out(99L)}")
    // every doc with >= 3 tokens is scored
    assert(out.size == 31)
  }

  test("vocabCoverage: OOV mass reflects vocabulary membership exactly") {
    // 'alpha'/'beta' dominate; vocabSize=2 makes everything else OOV.
    val docs = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, "alpha gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 4L, 0L), (2L, 3L, 2L), (3L, 4L, 4L)))
  }
}
