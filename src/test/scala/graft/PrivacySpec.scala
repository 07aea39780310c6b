package graft

import org.apache.spark.sql.functions._

import graft.operators.{Privacy, VectorOps}

/** DP release + embedding-stats operators (SURVEY §2.5). */
class PrivacySpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, SparkTestBase.sf001, "documents")

  test("dpCounts: exact counts preserved, noise bounded, release deterministic") {
    val audit = Privacy.dpCounts(docs, Seq("lang"), 0.5, 77L, audit = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    val truth = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit.view.mapValues(_._1).toMap == truth)
    assert(audit.values.forall(v => v._2 && v._3), "noise bound / clamp")
    // Retry stability: the SAME noise on re-execution (partition-seeded
    // generator) — a re-released table must not leak via noise averaging.
    val a = Privacy.dpCounts(docs, Seq("lang"), 0.5, 77L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Privacy.dpCounts(docs, Seq("lang"), 0.5, 77L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "release must be deterministic under the seed")
    assert(a != truth, "noise must actually perturb at eps=0.5")
    intercept[IllegalArgumentException](Privacy.dpCounts(docs, Seq("lang"), 0.0, 1L))
  }

  test("kAnonymize: only quasi-identifier groups of size >= k survive") {
    // Groups of size 1, 4, 5, 6 over (qa, qb): at k=5 exactly the last
    // two survive, intact; k=1 keeps everything; k > max drops all.
    val rows = (Seq(("a", "x")) ++ Seq.fill(4)(("b", "x")) ++
      Seq.fill(5)(("b", "y")) ++ Seq.fill(6)(("c", "x")))
      .zipWithIndex.map { case ((qa, qb), i) => (i.toLong, qa, qb) }
    val df = rows.toDF("id", "qa", "qb")
    val kept = Privacy.kAnonymize(df, Seq("qa", "qb"), 5L)
      .select("qa", "qb")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(kept.length == 11)
    assert(kept.toSet == Set(("b", "y"), ("c", "x")))
    assert(Privacy.kAnonymize(df, Seq("qa", "qb"), 1L).count() == 16)
    assert(Privacy.kAnonymize(df, Seq("qa", "qb"), 7L).count() == 0)
    intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq("qa"), 0L))
  }

  test("tCloseness: closed-form ordinal EMD on a hand-computed fixture") {
    // Bins per class: A=[0,0,1], B=[1,1,1], C=[0,1]. Global bin counts
    // (3, 5), n_g=8, m=2. EMD = |cumP - cumQ| summed / (m-1):
    //   A: |2/3 - 3/8| = 7/24, B: |0 - 3/8| = 3/8, C: |1/2 - 3/8| = 1/8.
    val df = (Seq(("A", 0), ("A", 0), ("A", 1)) ++
      Seq(("B", 1), ("B", 1), ("B", 1)) ++ Seq(("C", 0), ("C", 1)))
      .toDF("qa", "bin")
    val out = Privacy.tCloseness(df, Seq("qa"), col("bin"), 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out("A") == ((3L, math.rint(7.0 / 24.0 * 1e9) / 1e9, true)))
    assert(out("B") == ((3L, 0.375, false)),
      "zero-count bin 0 must still shift B's cumulative pmf (dense grid)")
    assert(out("C") == ((2L, 0.125, true)))
    intercept[IllegalArgumentException](
      Privacy.tCloseness(df, Seq("qa"), col("bin"), 0.0))
  }

  test("tCloseness: a single distinct bin gives emd = 0, never NaN") {
    // m = 1 makes the closed form 0/0 — the distributions are trivially
    // identical, so the release must report emd = 0 / t_close = true.
    val df = Seq(("A", 1), ("A", 1), ("B", 1)).toDF("qa", "bin")
    val out = Privacy.tCloseness(df, Seq("qa"), col("bin"), 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out == Map("A" -> ((0.0, true)), "B" -> ((0.0, true))))
  }

  test("dimensionStats: exact fixed-point moments on known vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f)), (2L, Array(0.5f, 4.0f)))
      .toDF("id", "embedding")
    val got = VectorOps.dimensionStats(vecs, "embedding").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val s = 1048576L
    assert(got(0L) == (2L, s + s / 2, s / 2, s))
    assert(got(1L) == (2L, -2 * s + 4 * s, -2 * s, 4 * s))
  }
}
