package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends GraftSuite {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("token and piece counts") {
    val r = one("the quick brown fox!").select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.pieceCount(col("text")),
      TextAnalysis.meanTokenLength(col("text"))).collect()(0)
    assert(r.getLong(0) == 4)
    assert(r.getLong(1) == 5) // the, quick, brown, fox, !
    assert(math.abs(r.getDouble(2) - 17.0 / 4) < 1e-9)
  }

  test("quality score bounds and monotonicity in length") {
    val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
    val s = docs.select(round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
      .agg(min("q"), max("q")).collect()(0)
    assert(s.getDouble(0) >= 0.0 && s.getDouble(1) <= 1.0)
    val short = one("a b").select(TextAnalysis.qualityScore(col("text"))).collect()(0).getDouble(0)
    val long = one(Seq.fill(200)("word").mkString(" "))
      .select(TextAnalysis.qualityScore(col("text"))).collect()(0).getDouble(0)
    assert(long > short)
  }

  test("language id picks profile with most stopword hits") {
    assert(one("the cat and the dog is happy")
      .select(TextAnalysis.languageId(col("text"))).collect()(0).getString(0) == "en")
    assert(one("el perro y la casa que en los")
      .select(TextAnalysis.languageId(col("text"))).collect()(0).getString(0) == "es")
    assert(one("der hund und die katze ist nicht")
      .select(TextAnalysis.languageId(col("text"))).collect()(0).getString(0) == "de")
    assert(one("xyzzy plugh")
      .select(TextAnalysis.languageId(col("text"))).collect()(0).getString(0) == "und")
  }

  test("languageIdDetail: margins, first-profile ties, mixed-language flag") {
    def detail(t: String) = one(t)
      .select(TextAnalysis.languageIdDetail(col("text")).as("d"))
      .select("d.lang", "d.best_hits", "d.second_hits", "d.margin", "d.is_mixed")
      .collect()(0)
    // Clean English: solid margin, not mixed.
    val en = detail("the cat and the dog is happy to be in a house of it")
    assert(en.getString(0) == "en" && !en.getBoolean(4) && en.getLong(3) >= 2)
    // Genuinely mixed en/es sentence: both profiles hit, margin <= 1.
    val mixed = detail("the gato and of el perro la casa")
    assert(mixed.getBoolean(4), s"expected mixed, got $mixed")
    assert(mixed.getLong(2) > 0 && mixed.getLong(3) <= 1)
    // A tie at the top resolves first-profile-wins (en before es) and is
    // flagged mixed (margin 0).
    val tie = detail("the of el la")
    assert(tie.getString(0) == "en" && tie.getLong(3) == 0 && tie.getBoolean(4))
    // No profile hits: 'und', zero everything, not mixed.
    val und = detail("xyzzy plugh")
    assert(und.getString(0) == "und" && und.getLong(1) == 0 && !und.getBoolean(4))
  }

  test("ngramNovelty: unique text scores 1, twins score 0, overlap exact") {
    import spark.implicits._
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> base,                                  // copied by doc 2
      2L -> base,                                  // exact twin: novelty 0
      3L -> (1 to 12).map(i => s"u$i").mkString(" "), // fully unique
      // 12 tokens sharing a 7-token prefix with doc 3's text? no — share
      // grams with doc 1: first 8 tokens of base + 4 fresh = shared 5-gram
      // window prefix.
      4L -> ((1 to 8).map(i => s"w$i") ++ (1 to 4).map(i => s"x$i")).mkString(" "))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .ngramNovelty(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 12 tokens -> 8 distinct 5-grams per doc.
    assert(out(1L)._1 == 8 && out(2L)._1 == 8 && out(3L)._1 == 8)
    assert(out(1L)._3 == 0.0 && out(2L)._3 == 0.0, "twins have zero novelty")
    assert(out(3L)._3 == 1.0, "fully unique doc has novelty 1")
    // Doc 4: grams starting at positions 1..4 (w1..w8 windows) also occur
    // in docs 1/2; the 4 windows crossing into x* are unique -> 4/8.
    assert(out(4L) == ((8L, 4L, 0.5)), s"got ${out(4L)}")
    // And docs 1/2 lost nothing: doc 4 shares only grams they already
    // share with each other.
    assert(out(1L)._2 == 0)
  }

  test("rolling hash is deterministic and content-sensitive") {
    val h1 = one("hello world").select(TextAnalysis.rollingHash(col("text"))).collect()(0).getLong(0)
    val h2 = one("hello world").select(TextAnalysis.rollingHash(col("text"))).collect()(0).getLong(0)
    val h3 = one("hello worle").select(TextAnalysis.rollingHash(col("text"))).collect()(0).getLong(0)
    assert(h1 == h2 && h1 != h3)
    assert(h1 >= 0 && h1 < 2147483647L)
  }

  test("bottom-k fingerprint: k rows per doc, ascending hashes") {
    val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
    val fp = TextAnalysis.bottomKFingerprint(docs, "doc_id", "text")
    val counts = fp.groupBy("doc_id").count().agg(min("count"), max("count")).collect()(0)
    assert(counts.getLong(0) == 4 && counts.getLong(1) == 4)
    val rows = fp.where(col("doc_id") === 0).orderBy("rnk").collect()
    val hs = rows.map(_.getLong(2))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
  }

  test("near-dup docs share fingerprint hashes") {
    val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
    // doc 8 and 245 are a planted near-dup pair (DedupSpec).
    val fp = TextAnalysis.bottomKFingerprint(docs, "doc_id", "text")
    val a = fp.where("doc_id = 8").collect().map(_.getLong(2)).toSet
    val b = fp.where("doc_id = 245").collect().map(_.getLong(2)).toSet
    assert(a.intersect(b).size >= 2, s"planted pair shares ${a.intersect(b).size}/4")
  }

  test("narrow BottomKHashes fingerprint == explode+window form") {
    val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
    val a = TextAnalysis.bottomKFingerprint(docs, "doc_id", "text")
    val b = TextAnalysis.bottomKFingerprintHof(docs, "doc_id", "text")
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("chunkByTokens: full coverage, exact overlap, short-doc edge cases") {
    import spark.implicits._
    val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
      .select("doc_id", "text")
      .unionAll(Seq((9001L, "one"), (9002L, (1 to 20).map(i => s"t$i").mkString(" ")),
        (9003L, (1 to 21).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"))
    val chunks = graft.operators.TextAnalysis
      .chunkByTokens(docs, "doc_id", "text", 20, 10).collect()
      .groupBy(_.getLong(0))
    val nToks = docs.select(col("doc_id"), size(split(col("text"), " ")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    nToks.foreach { case (id, n) =>
      val cs = chunks(id).sortBy(_.getLong(1))
      // chunk_ids are 0..k-1; starts advance by exactly the stride.
      assert(cs.map(_.getLong(1)).toSeq == cs.indices.map(_.toLong))
      assert(cs.map(_.getLong(2)).toSeq == cs.indices.map(_ * 10L))
      // Full coverage: the last chunk reaches the final token, and no
      // chunk is empty; n_toks matches the reassembled text.
      val last = cs.last
      assert(last.getLong(2) + last.getLong(3) == n, s"doc $id coverage")
      cs.foreach { c =>
        assert(c.getLong(3) >= 1 && c.getLong(3) <= 20)
        assert(c.getString(4).split(" ").length == c.getLong(3))
      }
      // A <= 20-token doc is exactly one chunk; 21 tokens is two.
      if (n <= 20) assert(cs.length == 1)
      if (id == 9003L) assert(cs.length == 2)
      // Interior consecutive chunks overlap by window - stride tokens.
      cs.sliding(2).foreach {
        case Array(a, b) =>
          val aToks = a.getString(4).split(" ")
          val bToks = b.getString(4).split(" ")
          assert(aToks.drop(10).sameElements(bToks.take(aToks.length - 10)),
            s"doc $id: overlap mismatch between ${a.getLong(1)} and ${b.getLong(1)}")
        case _ =>
      }
    }
  }

  test("bm25TopK: scores positive/descending, term presence required") {
    import spark.implicits._
    val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
    val top = graft.operators.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", Seq("spark", "window"), 10).collect()
    assert(top.length == 10)
    val scores = top.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // A doc containing a query term many times outranks one with few: the
    // synthetic heavy doc must land at rank 1.
    val heavy = Seq((9001L, Array.fill(30)("spark").mkString(" ")))
      .toDF("doc_id", "text")
    val top2 = graft.operators.TextAnalysis.bm25TopK(
      docs.select("doc_id", "text").unionAll(heavy),
      "doc_id", "text", Seq("spark"), 3).collect()
    assert(top2.head.getLong(0) == 9001L)
  }

  test("bm25FromPostings == bm25TopK bit-for-bit (index probe = text scan)") {
    val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
    val terms = Seq("spark", "window", "customer")
    val viaScan = graft.operators.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", terms, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val postings = graft.operators.TextAnalysis
      .termPostings(docs, "doc_id", "text")
    val viaIndex = graft.operators.TextAnalysis
      .bm25FromPostings(postings, terms, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaScan == viaIndex)
  }

  test("redactPii removes every planted email/url/phone, counts exact") {
    import spark.implicits._
    val df = Seq(
      ("mail me at bob.smith+x@my-host.org today", 1L, 0L, 0L),
      ("docs at https://ex.com/a?q=1 and http://b.io/z", 0L, 2L, 0L),
      ("call 555-123-4567 x2 but not 55-123-4567", 0L, 0L, 1L),
      ("no pii here", 0L, 0L, 0L))
      .toDF("text", "ne", "nu", "np")
    import graft.operators.TextAnalysis._
    val bad = df.where(
      piiCount(col("text"), EmailRe) =!= col("ne") ||
        piiCount(col("text"), UrlRe) =!= col("nu") ||
        piiCount(col("text"), PhoneRe) =!= col("np") ||
        piiCount(redactPii(col("text")), EmailRe) =!= 0L ||
        piiCount(redactPii(col("text")), UrlRe) =!= 0L ||
        piiCount(redactPii(col("text")), PhoneRe) =!= 0L)
    assert(bad.isEmpty, bad.collect().mkString("; "))
    val red = df.select(redactPii(col("text")).as("r")).collect().map(_.getString(0))
    assert(red(0) == "mail me at <EMAIL> today")
    assert(red(1) == "docs at <URL> and <URL>")
    assert(red(2) == "call <PHONE> x2 but not 55-123-4567")
    assert(red(3) == "no pii here")
  }

  test("perplexityBuckets: tiles near-equal per lang, head more fluent than tail") {
    val docs = Tables.load(spark, SparkTestBase.sf0001, "documents")
    val ppl = TextAnalysis.lmPerplexity(docs, "doc_id", "text", 3)
    val buckets = TextAnalysis.perplexityBuckets(
        docs, "doc_id", "text", "lang").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    // Bucketing partitions the scored doc set exactly.
    assert(buckets.map(_._2._1).sum == ppl.count())
    buckets.groupBy(_._1._1).foreach { case (lang, rows) =>
      val byBucket = rows.map(t => t._1._2 -> t._2).toMap
      // NTILE: tile sizes within 1 of each other.
      val sizes = byBucket.values.map(_._1)
      assert(sizes.max - sizes.min <= 1, s"$lang tile sizes $sizes")
      // Mean NLL must not decrease from head (1) to tail (3).
      val means = (1L to 3L).flatMap(b => byBucket.get(b).map { case (n, nll, g) =>
        nll.toDouble / (g * 1e6) })
      assert(means.sameElements(means.sorted), s"$lang bucket means $means")
    }
  }

  test("codegen CharGrams/WordShingles == interpreted HOF forms") {
    import graft.operators.TextHash
    // Real corpus plus the edge shapes: empty text, shorter-than-n,
    // consecutive/leading/trailing spaces (empty tokens), multi-byte and
    // non-BMP code points (substr is code-point based on both paths).
    val edge = Seq("", "ab", "a b", "a  b ", " x", "héllo wörld",
      "a€😀bcd ef gh ij").toDF("text")
    val corpus = Tables.load(spark, SparkTestBase.sf001, "documents")
      .select("text").limit(300).unionAll(edge)
    val bad = corpus.where(
      TextHash.charGrams(col("text"), 5) =!=
        TextHash.charGramsHof(col("text"), 5) ||
      TextHash.wordShingles(col("text"), 3) =!=
        TextHash.wordShinglesHof(col("text"), 3) ||
      TextAnalysis.rollingHash(col("text")) =!=
        TextAnalysis.rollingHashHof(col("text")))
    assert(bad.isEmpty, bad.collect().mkString("; "))
  }
}
