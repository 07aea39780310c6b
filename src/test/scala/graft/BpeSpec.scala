package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTokenizer

class BpeSpec extends GraftSuite {
  import spark.implicits._

  test("merge table follows exact pair frequencies with greedy overlap") {
    // corpus: 'aaab' x3, 'ab' x2  -> char pairs:
    //   (a,a): 2 per 'aaab' x3 = 6   <- round 1 winner
    //   (a,b): 1 per word x5   = 5
    // after merging (a,a): 'aaab' -> [aa, a, b] (greedy left-to-right,
    // NOT [a, aa, b]); pairs now (aa,a)=3, (a,b)=5 -> round 2 = (a,b).
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainBpeMerges(docs, "text", 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m(0) == ((1L, "a", "a", "aa", 6L)), s"round 1: ${m(0)}")
    assert(m(1) == ((2L, "a", "b", "ab", 5L)), s"round 2: ${m(1)}")
    // round 3: 'aaab' is now [aa, ab] x3 -> (aa, ab)=3 wins
    assert(m(2) == ((3L, "aa", "ab", "aaab", 3L)), s"round 3: ${m(2)}")
  }

  test("ties break by count desc, then left, then right") {
    // (a,b) and (c,d) both occur twice; 'a' < 'c' must win.
    val docs = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainBpeMerges(docs, "text", 1).collect()(0)
    assert(m.getString(1) == "a" && m.getString(2) == "b")
  }

  test("training stops early when no pair repeats") {
    val docs = Seq((1L, "xy qr st")).toDF("doc_id", "text")
    // each pair occurs once -> below the 2 floor -> zero merges
    assert(BpeTokenizer.trainBpeMerges(docs, "text", 5).count() == 0)
  }

  test("tokenizeStats compresses and conserves characters") {
    val d = Tables.load(spark, SparkTestBase.sf0001, "documents")
    val merges = BpeTokenizer.trainBpeMerges(d, "text", 8)
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.length == 8)
    val st = BpeTokenizer.tokenizeStats(d, "doc_id", "text", merges.toSeq)
    st.cache()
    try {
      // pieces never exceed chars; a trained vocab must actually compress
      assert(st.where(col("n_pieces") > col("n_chars")).count() == 0)
      val ratio = st.agg(sum("n_chars").cast("double") /
        sum("n_pieces").cast("double")).collect()(0).getDouble(0)
      assert(ratio > 1.2, s"8 merges should compress > 1.2x, got $ratio")
      // char conservation: concatenating pieces reproduces each word, so
      // per-doc char totals equal the raw word-length totals
      val raw = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
        .groupBy("doc_id").agg(sum(length(col("w"))).as("c"))
      val joined = st.join(raw, "doc_id")
        .where(col("n_chars") =!= col("c")).count()
      assert(joined == 0)
    } finally st.unpersist()
  }
}
