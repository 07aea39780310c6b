package graft

import org.apache.spark.sql.Row

import graft.operators.DataSelection

/**
 * DataSelection.dsirScores: the hashed-ngram importance estimator on
 * constructed corpora where the target/raw likelihood gap is obvious by
 * eye — the cross-engine half (md5 bucket hash + smoothed LMs + exact
 * integer sums in DuckDB) is the text_dsir_scores gate's oracle.
 */
class DataSelectionSpec extends GraftSuite {
  import spark.implicits._

  private def byId(rows: Array[Row]): Map[Long, (Long, Long, Double)] =
    rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("a target-like document outscores an off-target document") {
    // Target speaks only "alpha beta"; raw has a target-like doc (1) and
    // an alien-vocabulary doc (2). DSIR must rank 1 above 2.
    val target = Seq((100L, "alpha beta alpha beta"),
      (101L, "beta alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha"),
      (2L, "gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out = byId(DataSelection.dsirScores(raw, target, "doc_id", "text",
      buckets = 64).collect())
    assert(out(1L)._3 > out(2L)._3,
      s"target-like doc must outscore the alien one: $out")
    // n_feats = unigrams + bigrams = t + (t - 1) = 2t - 1.
    assert(out(1L)._1 == 5L, s"3 tokens -> 5 features: ${out(1L)}")
    assert(out(2L)._1 == 7L)
  }

  test("score is a mean: repeating a document's text does not inflate it") {
    val target = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta"),
      (2L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text")
    val out = byId(DataSelection.dsirScores(raw, target, "doc_id", "text",
      buckets = 64).collect())
    // Not exactly equal (the bigram "beta alpha" only exists in doc 2),
    // but the per-feature MEAN keeps both scores in the same ballpark
    // while the raw scaled SUM of doc 2 is ~3.8x doc 1's — i.e. a
    // sum-scored selector would treat repetition as 4x the evidence.
    assert(math.abs(out(2L)._3 - out(1L)._3) < 0.2,
      s"mean normalization must hold: $out")
    assert(math.abs(out(2L)._2) > 3 * math.abs(out(1L)._2),
      "scaled sums grow with length; the mean divides it back out")
  }

  test("deterministic: same inputs give identical boards") {
    val target = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq((1L, "alpha gamma"), (2L, "beta beta"))
      .toDF("doc_id", "text")
    val a = DataSelection.dsirScores(raw, target, "doc_id", "text", 32)
      .collect().sortBy(_.getLong(0)).toSeq
    val b = DataSelection.dsirScores(raw, target, "doc_id", "text", 32)
      .collect().sortBy(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("empty target degrades to the uniform prior without crashing") {
    val target = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = DataSelection.dsirScores(raw, target, "doc_id", "text", 16)
      .collect()
    assert(out.length == 1 && !out.head.isNullAt(3))
  }

  test("model merge is lossless: fold over halves equals one pass") {
    val a = Seq((1L, "alpha beta gamma alpha")).toDF("doc_id", "text")
    val b = Seq((2L, "beta beta delta")).toDF("doc_id", "text")
    val merged = DataSelection.mergeCounts(
      DataSelection.bucketCounts(a, "text", 32),
      DataSelection.bucketCounts(b, "text", 32))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val onePass = DataSelection.bucketCounts(a.unionAll(b), "text", 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(merged == onePass)
  }

  test("bucketDivergence: zero on identical corpora, symmetric JS, " +
    "drift strictly positive on disjoint vocabularies") {
    val a = Seq((1L, "alpha beta gamma alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "delta epsilon zeta"), (4L, "epsilon zeta eta"))
      .toDF("doc_id", "text")
    def row(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      DataSelection.bucketDivergence(x, y, "text", 64).collect().head
    val self = row(a, a)
    assert(self.getDouble(2) == 0.0 && self.getDouble(3) == 0.0 &&
      self.getDouble(4) == 0.0, s"identical corpora must diverge 0: $self")
    val ab = row(a, b)
    val ba = row(b, a)
    assert(ab.getDouble(4) > 0.0, s"disjoint vocabularies must drift: $ab")
    assert(ab.getDouble(4) == ba.getDouble(4), "JS is symmetric")
    assert(ab.getDouble(2) == ba.getDouble(3) &&
      ab.getDouble(3) == ba.getDouble(2), "KL swaps under argument swap")
    assert(ab.getLong(0) == 10L && ab.getLong(1) == 10L,
      s"feature totals (2t-1 per doc): $ab")
  }

  test("dsirSelect keeps the ceil(frac*n) top-scored docs, ties to id") {
    val target = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"),
      (4L, "epsilon zeta"), (5L, "alpha gamma")).toDF("doc_id", "text")
    val out = DataSelection.dsirSelect(raw, target, "doc_id", "text",
      0.4, 32).collect().map(r => (r.getLong(0), r.getLong(1)))
    // ceil(0.4*5)=2; docs 1 and 2 are identical target-matches (equal
    // scores) and win, the tie broken by doc_id.
    assert(out.toSet == Set((1L, 1L), (2L, 2L)), s"got ${out.toSeq}")
    intercept[IllegalArgumentException] {
      DataSelection.dsirSelect(raw, target, "doc_id", "text", 0.0)
    }
  }

  test("buckets must be positive") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DataSelection.dsirScores(df, df, "doc_id", "text", 0)
    }
  }
}
