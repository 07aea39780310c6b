package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

class DecontaminateSpec extends GraftSuite {
  import spark.implicits._

  test("ngram overlap counts and contamination flag") {
    val corpus = Seq(
      (1L, "a b c d e"),        // shares trigrams "a b c","b c d","c d e"
      (2L, "x y z w v"),        // disjoint from eval
      (3L, "a b c q r s")       // shares exactly "a b c" of 4 trigrams
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val r = Decontaminate.ngramOverlap(corpus, eval, "doc_id", "text",
        k = 3, num = 1, den = 2)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3))).toSeq ==
      Seq((1L, 3L, 3L, true),   // 3/3 shared >= 1/2
          (2L, 3L, 0L, false),
          (3L, 4L, 1L, false))) // 1/4 < 1/2
  }

  test("ngramOverlapBloom equals ngramOverlap bit-for-bit on the fixture " +
      "(plan-embedded, forced-broadcast, and undersized-filter paths)") {
    val d = Tables.load(spark, SparkTestBase.sf001, "documents")
    val corpus = d.where(col("doc_id") % 20 =!= 7)
    val eval = d.where(col("doc_id") % 20 === 7)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val exact = canon(Decontaminate.ngramOverlap(
      corpus, eval, "doc_id", "text", k = 5, num = 1, den = 5))
    // Plan-embedded filter (default threshold).
    assert(canon(Decontaminate.ngramOverlapBloom(corpus, eval, "doc_id",
      "text", k = 5, num = 1, den = 5, expectedGrams = 1L << 16)) == exact)
    // Forced broadcast-variable shipping: same rows.
    assert(canon(Decontaminate.ngramOverlapBloom(corpus, eval, "doc_id",
      "text", k = 5, num = 1, den = 5, expectedGrams = 1L << 16,
      bcastThresholdBytes = 0L)) == exact)
    // Undersized filter: the false-positive rate degrades toward 1 but
    // the exact semi-join keeps the RESULT identical — the prefilter is
    // performance-only by construction.
    assert(canon(Decontaminate.ngramOverlapBloom(corpus, eval, "doc_id",
      "text", k = 5, num = 1, den = 5, expectedGrams = 4L)) == exact)
    // Auto sizing (expectedGrams = 0, the default): one eval-gram count
    // picks the capacity — still identical rows.
    assert(canon(Decontaminate.ngramOverlapBloom(corpus, eval, "doc_id",
      "text", k = 5, num = 1, den = 5)) == exact)
  }

  test("ngramOverlapBloom fail-fasts on bad sizing") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Decontaminate.ngramOverlapBloom(df, df, "doc_id", "text",
        expectedGrams = -1L)
    }
    intercept[IllegalArgumentException] {
      Decontaminate.ngramOverlapBloom(df, df, "doc_id", "text", fpp = 1.5)
    }
  }

  test("short docs collapse to whole-text gram; exact eval copy is contaminated") {
    val corpus = Seq((1L, "hi there"), (2L, "totally different")).toDF("doc_id", "text")
    val eval = Seq((9L, "hi there")).toDF("doc_id", "text")
    val r = Decontaminate.ngramOverlap(corpus, eval, "doc_id", "text", 3, 1, 5)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(2) == 1 && r(0).getBoolean(3))
    assert(r(1).getLong(2) == 0 && !r(1).getBoolean(3))
  }

  test("spanOverlap: pasted eval span found at an offset, exact token union") {
    // 20-token doc with the eval's 8-token answer pasted at offset 5.
    val evalAnswer = (100 to 107).map(i => s"e$i").mkString(" ")
    val corpus = Seq(
      (1L, ((0 to 4).map(i => s"c$i") ++ (100 to 107).map(i => s"e$i") ++
        (5 to 11).map(i => s"c$i")).mkString(" ")),
      (2L, (0 to 19).map(i => s"x$i").mkString(" "))) // clean
      .toDF("doc_id", "text")
    val eval = Seq((7L, s"intro words $evalAnswer trailing tail"))
      .toDF("doc_id", "text")
    val got = Decontaminate.spanOverlap(corpus, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // Exactly ONE window of doc 1 (positions 5..12 = the pasted answer)
    // matches; interval union covers the 8 pasted tokens; doc 2 absent.
    assert(got == Map(1L -> (20L, 1L, 8L)), got.toString)
  }

  test("fixture gate shape: every corpus doc present exactly once") {
    val d = Tables.load(spark, SparkTestBase.sf001, "documents")
    val out = Decontaminate.ngramOverlap(
      d.where(col("doc_id") % 20 =!= 7), d.where(col("doc_id") % 20 === 7),
      "doc_id", "text")
    val n = d.where(col("doc_id") % 20 =!= 7).count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
    assert(out.where(col("n_shared") > col("n_grams")).count() == 0)
  }
}
