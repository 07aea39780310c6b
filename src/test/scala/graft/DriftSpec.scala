package graft

import org.apache.spark.sql.functions._

import graft.operators.{Joins, Privacy, TableStats}

/**
 * Distribution-drift diagnostic (PSI + binned KS), its streaming fold,
 * the l-diversity release filter, and the interval-overlap join.
 */
class DriftSpec extends GraftSuite {
  import spark.implicits._
  private val dir = SparkTestBase.sf001

  test("distributionDrift: hand-computed PSI/KS on a tiny example") {
    // edges [5, 10] -> 3 bins. ref [1,1,1,6,6]: (3,2,0); live [1,6,6,6,11]:
    // (1,3,1). Smoothed p=(n+1)/8: psi0 = 0.25·ln2 -> 173287 micro,
    // psi1 = 0.125·ln(4/3) -> 35960, psi2 = 0.125·ln2 -> 86643.
    // CDF gaps (cum·5 cross products / 25): 0.4, 0.2, 0 -> ks 400000.
    val ref = Seq(1.0, 1.0, 1.0, 6.0, 6.0).toDF("v")
    val live = Seq(1.0, 6.0, 6.0, 6.0, 11.0).toDF("v")
    val rows = TableStats.distributionDrift(ref, live, "v", Seq(5.0, 10.0))
      .orderBy("bin")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == Seq(
      (0, 3L, 1L, 173287L, 400000L, 295890L, 400000L),
      (1, 2L, 3L, 35960L, 200000L, 295890L, 400000L),
      (2, 0L, 1L, 86643L, 0L, 295890L, 400000L)))
  }

  test("distributionDrift: identical slices score zero drift") {
    val df = Tables.load(spark, dir, "events").select(col("value").as("v"))
    val out = TableStats.distributionDrift(df, df, "v",
        Seq(5.0, 20.0, 80.0, 320.0))
      .agg(max(abs(col("psi_micro"))), max(col("cdf_gap_micro"))).head()
    assert(out.getLong(0) == 0L && out.getLong(1) == 0L)
  }

  test("streaming drift fold == batch distributionDrift (lossless merge)") {
    val ev = Tables.load(spark, dir, "events")
    def at(d: String) = lit(d).cast("timestamp")
    val cut = at("2024-01-16 00:00:00")
    val ref = ev.where(col("ts") < cut)
    val liveAll = ev.where(col("ts") >= cut)
    val slices = Seq(
      liveAll.where(col("ts") < at("2024-01-23 00:00:00")),
      liveAll.where(col("ts") >= at("2024-01-23 00:00:00")))
    val edges = Seq(5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0)
    val logDir = graft.queries.Staging.batchLog("drift_spec", dir, "b", slices)
    val streamed = graft.streaming.SketchStream.incrementalDriftPsi(
        spark, ref, logDir, slices.head.schema,
        s"${graft.queries.Staging.freshStateRoot("drift_spec")}/state",
        "value", edges)
      .collect().map(_.toSeq).toSet
    val batch = TableStats.distributionDrift(ref, liveAll, "value", edges)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("lDiversify keeps exactly the groups with >= l distinct sensitive values") {
    val df = Seq(
      ("g1", "a", 1), ("g1", "a", 2), ("g1", "a", 3),   // 3 distinct
      ("g2", "a", 1), ("g2", "a", 1), ("g2", "a", 2),   // 2 distinct
      ("g3", "b", 9)                                    // 1 distinct
    ).toDF("qa", "qb", "s")
    val kept = Privacy.lDiversify(df, Seq("qa", "qb"), "s", 3L)
      .select("qa").distinct().as[String].collect().toSet
    assert(kept == Set("g1"))
    // l = 1 keeps everything (no group is empty).
    assert(Privacy.lDiversify(df, Seq("qa", "qb"), "s", 1L).count() ==
      df.count())
  }

  test("intervalOverlapJoin == naive overlap filter, each pair exactly once") {
    // Spans chosen so several pairs share MANY bins (w = 10): the
    // first-shared-bin rule must still emit each exactly once. Includes
    // endpoint touching (closed semantics) and a non-overlap.
    val left = Seq((1L, 0.0, 35.0), (2L, 12.0, 13.0), (3L, 40.0, 40.0),
      (4L, 90.0, 95.0)).toDF("lid", "l_lo", "l_hi")
    val right = Seq((10L, 5.0, 50.0), (11L, 13.0, 29.0), (12L, 35.0, 39.9),
      (13L, 60.0, 70.0)).toDF("rid", "r_lo", "r_hi")
    val got = Joins.intervalOverlapJoin(left, "l_lo", "l_hi",
        right, "r_lo", "r_hi", 10.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val naive = left.crossJoin(right)
      .where(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted, s"got $got vs naive $naive")
    assert(got.size == got.distinct.size, "pair emitted more than once")
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L),
      (2L, 11L), (3L, 10L)))
  }
}
