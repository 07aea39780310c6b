package graft

import org.apache.spark.sql.functions._

import graft.operators.FeatureScaling

/** Hand-checked winsorize / standardize contracts on literal fixtures. */
class FeatureScalingSpec extends GraftSuite {
  import spark.implicits._

  test("nearest-rank bounds and clamping: 1..10 at [0.2, 0.8]") {
    val df = (1 to 10).map(v => ("g", v.toDouble)).toDF("g", "v")
    val out = FeatureScaling.winsorize(df, Seq("g"), "v", 0.2, 0.8)
      .select("v", "value_w", "clipped_lo", "clipped_hi").collect()
      .map(r => r.getDouble(0) ->
        (r.getDouble(1), r.getBoolean(2), r.getBoolean(3))).toMap
    // ceil(0.2*10)=2 -> lo=2.0; ceil(0.8*10)=8 -> hi=8.0.
    assert(out(1.0) == ((2.0, true, false)))
    assert(out(2.0) == ((2.0, false, false)), "the bound itself is not clipped")
    assert(out(5.0) == ((5.0, false, false)))
    assert(out(8.0) == ((8.0, false, false)))
    assert(out(9.0) == ((8.0, false, true)))
    assert(out(10.0) == ((8.0, false, true)))
  }

  test("bounds are tie-stable: duplicated values give the same clamp") {
    val df = Seq(1, 1, 1, 5, 5, 5, 9, 9, 9).map(v => ("g", v.toDouble))
      .toDF("g", "v")
    // Any tie order puts value 1.0 at rank ceil(0.2*9)=2.
    val b = FeatureScaling.nearestRankBounds(df, Seq("g"), "v", Seq(0.2))
      .collect()(0).getDouble(1)
    assert(b == 1.0)
  }

  test("standardize: exact moments, zero-variance and singleton null out") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 4L, 7L), ("b", 5L, 7L), ("c", 6L, 3L))
      .toDF("g", "id", "cents")
    val out = FeatureScaling.standardize(df, Seq("g"), col("cents"))
      .select("id", "z").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // Group a: mean 4, var 4, z = (x-4)/2.
    assert(out(1L) == Some(-1.0) && out(2L) == Some(0.0) &&
      out(3L) == Some(1.0))
    assert(out(4L).isEmpty && out(5L).isEmpty, "zero variance -> null")
    assert(out(6L).isEmpty, "singleton group -> null")
  }

  test("robustStats: median/MAD are exact and outlier-resistant") {
    import spark.implicits._
    val base = Seq.tabulate(9)(i => ("a", (i + 1).toLong * 10)) // 10..90
    val withOutlier = base :+ (("a", 1000000L))
    val clean = graft.operators.FeatureScaling.robustStats(
      base.toDF("g", "v"), Seq("g"), "v").collect()(0)
    // n=9: median = position ceil(4.5)=5 -> 50; deviations sorted
    // (0,10,10,20,20,30,30,40,40) -> position 5 -> 20
    assert(clean.getLong(1) == 9 && clean.getLong(2) == 50L &&
      clean.getLong(3) == 20L, s"clean $clean")
    val dirty = graft.operators.FeatureScaling.robustStats(
      withOutlier.toDF("g", "v"), Seq("g"), "v").collect()(0)
    // one wild value moves the median only one rank (50 stays at
    // position ceil(5)=5) and MAD stays rank-bounded
    assert(dirty.getLong(2) == 50L, s"median moved: $dirty")
    assert(dirty.getLong(3) <= 30L, s"MAD blew up: $dirty")
  }

  test("targetEncode: smoothed, leave-one-out and frequency encodings") {
    // cat a: y = {1, 3} (sum 4), cat b: y = {5}. gn=3, gsum=9, prior=3.
    val df = Seq((1L, "a", 1.0), (2L, "a", 3.0), (3L, "b", 5.0))
      .toDF("id", "cat", "y")
    val out = FeatureScaling.targetEncode(df, "cat", "y", 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          r.getDouble(6)))).toMap
    // enc_smooth(a) = (4 + 3)/(2 + 1), enc_smooth(b) = (5 + 3)/(1 + 1).
    assert(out(1L) == ((2L, 7.0 / 3.0, Some(3.0), 2.0 / 3.0)))
    assert(out(2L) == ((2L, 7.0 / 3.0, Some(2.0), 2.0 / 3.0)),
      "LOO must exclude the row's own target: (4-3+3)/(2-1+1) = 2")
    assert(out(3L) == ((1L, 4.0, None, 1.0 / 3.0)),
      "singleton category: LOO undefined -> null, never a 0-division")
    intercept[IllegalArgumentException](
      FeatureScaling.targetEncode(df, "cat", "y", 0.0))
  }

  test("targetEncode: null categories and null targets have defined behavior") {
    // cat a: y = {1, 3, null}; cat null: y = {5, null}.
    // Observed targets: gtn = 3, gsum = 9, prior = 3; gn = 5 (freq base).
    val df = Seq(
        (1L, Some("a"), Some(1.0)), (2L, Some("a"), Some(3.0)),
        (3L, Some("a"), None), (4L, None, Some(5.0)), (5L, None, None))
      .toDF("id", "cat", "y")
    val out = FeatureScaling.targetEncode(df, "cat", "y", 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          r.getDouble(6)))).toMap
    assert(out.size == 5, "null-category rows must NOT be dropped")
    // cat a: tn_c = 2, sum_c = 4 -> enc_smooth = (4+3)/(2+1) = 7/3;
    // n_c = 3 (freq counts the null-target row), freq = 3/5.
    assert(out(1L) == ((3L, 7.0 / 3.0, Some(3.0), 0.6)))
    assert(out(2L) == ((3L, 7.0 / 3.0, Some(2.0), 0.6)))
    assert(out(3L) == ((3L, 7.0 / 3.0, Some(7.0 / 3.0), 0.6)),
      "null target: nothing to leave out -> enc_loo = enc_smooth")
    // cat null: tn_c = 1, sum_c = 5 -> enc_smooth = (5+3)/(1+1) = 4;
    // row 4 is the single observed target -> LOO undefined (null).
    assert(out(4L) == ((2L, 4.0, None, 0.4)))
    assert(out(5L) == ((2L, 4.0, Some(4.0), 0.4)))
  }

  test("binEquiDepth: exact quartiles on 1..100 cents at width 1") {
    import spark.implicits._
    val df = (1L to 100L).toDF("c")
    val out = FeatureScaling.binEquiDepth(df, col("c"), 4, 1L)
      .groupBy("bin").agg(count(lit(1)).as("n"),
        min("c").as("lo"), max("c").as("hi"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(0L -> ((25L, 1L, 25L)), 1L -> ((25L, 26L, 50L)),
      2L -> ((25L, 51L, 75L)), 3L -> ((25L, 76L, 100L))), s"got $out")
  }

  test("binEquiDepth: identical values collapse to one bin; bins >= 2") {
    import spark.implicits._
    val same = Seq.fill(40)(7L).toDF("c")
    val bins = FeatureScaling.binEquiDepth(same, col("c"), 4, 5L)
      .select("bin").distinct().collect().map(_.getLong(0)).toSeq
    assert(bins == Seq(0L), s"all-identical input is one bin: $bins")
    intercept[IllegalArgumentException] {
      FeatureScaling.binEquiDepth(same, col("c"), 1, 5L)
    }
  }

  test("binEquiDepth: empty input yields zero rows, not empty.reduce") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("c")
    val out = FeatureScaling.binEquiDepth(empty, col("c"), 4, 5L)
    assert(out.columns.contains("bin") && out.count() == 0L)
  }
}
