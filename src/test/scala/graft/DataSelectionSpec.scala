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

  test("rank cuts are EXACT integer arithmetic where frac*n is integral " +
    "(the IEEE ceil trap)") {
    // frac = 0.2 over n = 5 docs: frac*n = 1 exactly. An IEEE
    // ceil(0.2_double * 5) that rounded the product up would keep 2
    // docs; the exact-decimal contract (Sketches.ceilRankExact — what
    // the DuckDB oracle's DECIMAL ceil computes) keeps exactly 1.
    val target = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "gamma delta"),
      (4L, "epsilon zeta"), (5L, "eta theta")).toDF("doc_id", "text")
    val out = DataSelection.dsirSelect(raw, target, "doc_id", "text",
      0.2, 32).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L), s"ceil(0.2*5) must keep exactly 1 doc: " +
      s"got ${out.toSeq}")
    // The sketch-threshold twin makes the same exact (1-frac) rank cut:
    // with 5 well-separated scores and frac 0.2, cum >= ceil(0.8*5) = 4
    // lands in doc 2's bucket, so exactly doc 1 clears the cut's upper
    // edge ... unless the rank had rounded to 5. One-bucket tolerance
    // cannot blur this: widthMicros 1 makes every bucket a point.
    val thr = DataSelection.dsirSelectByThreshold(raw, target, "doc_id",
      "text", 0.2, 32, 1L).collect().map(_.getLong(0))
    assert(thr.toSeq == Seq(1L),
      s"threshold cut must keep exactly doc 1: got ${thr.toSeq}")
  }

  test("buckets must be positive") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DataSelection.dsirScores(df, df, "doc_id", "text", 0)
    }
  }

  // ---- dsirSelectByThreshold (the sketch-cut scale form) -------------------

  /** Single-partition shuffles in the plan ABOVE any cache scan — the
    * scale-killer witness. AQE-wrapped plans unwrap to the live plan. */
  private def singlePartitionExchanges(
      df: org.apache.spark.sql.DataFrame): Int = {
    val p0 = df.queryExecution.executedPlan
    val p = p0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 => e
    }.size
  }

  test("threshold cut equals the exact rank cut when scores straddle a " +
    "bucket boundary") {
    // Two target-like docs score high, three alien docs score very low —
    // the 0.6-quantile cut of a width-1000-micros sketch lands between
    // the two score clusters, so the sketch selection must EQUAL the
    // exact-rank top-40%. (The target repeats its vocabulary: with a
    // single "alpha beta" the fixture degenerates — (tc+1)/(rc+1) is
    // exactly 1/2 for BOTH target and alien features, every log-ratio
    // collapses to ln(0.7), and all five docs tie.)
    val target = Seq((0L, "alpha beta alpha beta alpha"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"),
      (4L, "epsilon zeta"), (5L, "eta theta iota")).toDF("doc_id", "text")
    val byThreshold = DataSelection.dsirSelectByThreshold(
        raw, target, "doc_id", "text", 0.4, 32, 1000L)
      .collect().map(_.getLong(0)).toSet
    val exact = DataSelection.dsirSelect(raw, target, "doc_id", "text",
      0.4, 32).collect().map(_.getLong(0)).toSet
    assert(byThreshold == exact && exact == Set(1L, 2L),
      s"sketch cut $byThreshold must match exact $exact")
  }

  test("threshold keep-count is within one sketch bucket of exact and " +
    "never exceeds the exact top fraction") {
    // A smooth score gradient (increasing overlap with the target
    // vocabulary), coarse buckets: the cut bucket's population is the
    // documented slack.
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val target = Seq((0L, words.take(5).mkString(" "))).toDF("doc_id", "text")
    val raw = (1L to 20L).map { i =>
      // doc i speaks a 5-word window starting at i % 6: sliding overlap.
      val w = (0 until 5).map(j => words(((i + j) % 10).toInt))
      (i, w.mkString(" "))
    }.toDF("doc_id", "text")
    for (frac <- Seq(0.25, 0.5); width <- Seq(1000L, 100000L)) {
      val kept = DataSelection.dsirSelectByThreshold(
        raw, target, "doc_id", "text", frac, 32, width)
      val keptIds = kept.collect().map(_.getLong(0)).toSet
      val exact = DataSelection.dsirSelect(raw, target, "doc_id", "text",
          frac, 32).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exactN = exact.size
      assert(keptIds.size <= exactN,
        s"frac=$frac width=$width: sketch must never over-keep " +
          s"(${keptIds.size} > $exactN)")
      // Every kept doc must be inside the exact top set EXTENDED by score
      // ties (equal integer micros can swap across the rank cut).
      val scores = DataSelection.dsirScores(raw, target, "doc_id", "text", 32)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val minExact = exact.keySet.map(scores).min
      keptIds.foreach { id =>
        assert(scores(id) >= minExact,
          s"frac=$frac width=$width: kept doc $id scores ${scores(id)} " +
            s"below the exact cut $minExact")
      }
    }
  }

  test("threshold plan has no window and no single-partition exchange " +
    "above the scored scan; the exact form provably does") {
    val target = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val raw = (1L to 30L).map(i => (i, s"alpha w$i beta")).toDF("doc_id", "text")
    val th = DataSelection.dsirSelectByThreshold(
      raw, target, "doc_id", "text", 0.3, 32, 1000L)
    assert(singlePartitionExchanges(th) == 0,
      "sketch-threshold selection must not funnel scored rows through " +
        s"one task:\n${th.queryExecution.executedPlan}")
    assert(!th.queryExecution.executedPlan.getClass.getName.contains("Window"))
    val exact = DataSelection.dsirSelect(raw, target, "doc_id", "text", 0.3, 32)
    assert(singlePartitionExchanges(exact) >= 1,
      "the exact-rank twin is EXPECTED to carry the global-sort exchange " +
        "(that contrast is the point of the threshold form)")
  }

  test("threshold frac bounds: 0, 1 and out-of-range all fail fast") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    for (bad <- Seq(0.0, 1.0, -0.1, 1.5)) {
      intercept[IllegalArgumentException] {
        DataSelection.dsirSelectByThreshold(df, df, "doc_id", "text", bad)
      }
    }
  }
}
