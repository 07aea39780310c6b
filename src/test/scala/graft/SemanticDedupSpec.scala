package graft

import org.apache.spark.sql.Row

import graft.operators.Dedup

/**
 * Dedup.semanticDedup (SemDeDup): cluster-then-prune semantics on
 * hand-built fixtures where every cosine and assignment is chosen by
 * construction — the cross-engine half (trained k-means + full replay)
 * is the dedup_semantic gate's oracle.
 */
class SemanticDedupSpec extends GraftSuite {
  import spark.implicits._

  // Two orthogonal unit centroids; all fixture vectors live in the
  // plane they span, so assignments and cosines are readable by eye.
  private val cents: Seq[(Long, Array[Float])] = Seq(
    0L -> Array(1f, 0f, 0f, 0f),
    1L -> Array(0f, 1f, 0f, 0f))

  private def df(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("id", "vec")

  private def byId(out: Array[Row]): Map[Long, (Long, Boolean, Option[Long])] =
    out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

  test("keep-lowest-id: dup chains collapse greedily within a cluster") {
    // Cluster 0: id 1 is the axis; id 2 at cos ~0.990 to id 1 (dup of 1);
    // id 3 at cos ~0.900 to id 1 (NOT a dup of 1 at t=0.95) but cos
    // ~0.951 to id 2 — greedy semantics drop 3 via the already-dropped 2.
    // Cluster 1: id 4 alone, kept.
    val emb = df(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0.99f, 0.141f, 0f, 0f),
      3L -> Array(0.9f, 0.4359f, 0f, 0f),
      4L -> Array(0f, 1f, 0f, 0f))
    val out = byId(
      Dedup.semanticDedup(emb, "id", "vec", cents, 0.95).collect())
    assert(out(1L) == ((0L, true, None)), s"got $out")
    assert(out(2L) == ((0L, false, Some(1L))))
    assert(out(3L) == ((0L, false, Some(2L))), "chain: dropped via 2, not 1")
    assert(out(4L) == ((1L, true, None)))
  }

  test("near-identical pair straddling a cluster boundary is NOT compared") {
    // cos(10, 11) ~0.99999 >= 0.95, but 10 assigns to cluster 0 and 11 to
    // cluster 1 — SemDeDup's defining restriction keeps both.
    val emb = df(
      10L -> Array(0.7072f, 0.707f, 0f, 0f),
      11L -> Array(0.707f, 0.7072f, 0f, 0f))
    val out = byId(
      Dedup.semanticDedup(emb, "id", "vec", cents, 0.95).collect())
    assert(out(10L) == ((0L, true, None)), s"got $out")
    assert(out(11L) == ((1L, true, None)))
  }

  test("keepFarthest flips the representative to the centroid-far item") {
    // id 1 IS the centroid (ccos = 1); id 2 sits at ccos ~0.960. They are
    // mutual dups (cos ~0.960 >= 0.95). Paper policy keeps the far one.
    val emb = df(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0.96f, 0.28f, 0f, 0f))
    val near = byId(
      Dedup.semanticDedup(emb, "id", "vec", cents, 0.95).collect())
    assert(near(1L)._2 && !near(2L)._2, s"default keeps the lower id: $near")
    val far = byId(
      Dedup.semanticDedup(emb, "id", "vec", cents, 0.95,
        keepFarthest = true).collect())
    assert(far(2L) == ((0L, true, None)), s"got $far")
    assert(far(1L) == ((0L, false, Some(2L))))
  }

  test("singleton clusters and below-threshold neighbors all survive") {
    val emb = df(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0.6f, 0.8f, 0f, 0f)) // cos(1,2) = 0.6 < 0.95; 2 -> cluster 1
    val out = byId(
      Dedup.semanticDedup(emb, "id", "vec", cents, 0.95).collect())
    assert(out.values.forall(_._2), s"got $out")
  }

  test("empty centroid seq fails fast") {
    val emb = df(1L -> Array(1f, 0f, 0f, 0f))
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(emb, "id", "vec", Nil, 0.9)
    }
  }

  // ---- the auto-k dial (semanticDedupAuto) ---------------------------------

  test("semanticKFor pins the gate fixture resolution and grows as sqrt(n)") {
    // THE GATE CONTRACT: at the sf0.01 fixture (500 embeddings + 20
    // planted copies) the dial must resolve to the fixed gate's k = 16,
    // because dedup_semantic_auto replays dedup_semantic's oracle
    // verbatim. If the driver fixture is ever resized, THIS assertion is
    // what breaks — re-derive the oracle at the new resolution.
    assert(Dedup.semanticKFor(520L) == 16)
    // sqrt growth: 4x the corpus ~ 2x the clusters (rounding slack 1).
    for (n <- Seq(1000L, 10000L, 1000000L)) {
      val k4 = Dedup.semanticKFor(4 * n)
      assert(math.abs(k4 - 2 * Dedup.semanticKFor(n)) <= 1,
        s"k(4n) must be ~2k(n): n=$n k=${Dedup.semanticKFor(n)} k4=$k4")
    }
    assert(Dedup.semanticKFor(0L) == 2 && Dedup.semanticKFor(1L) == 2,
      "degenerate corpora floor at k = 2")
  }

  test("auto equals fixed-k semanticDedup when the dial resolves the same") {
    // 32 vectors near the two axes => semanticKFor(32) = 4; train on the
    // 1-in-4 sample. The auto wrapper must produce the identical board
    // to hand-training at the same k over the same sample.
    val rows = (0L until 32L).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0.01f * i, 0f, 0f)
        else Array(0.01f * i, 1f, 0f, 0f)
      i -> base
    }
    val emb = df(rows: _*)
    assert(Dedup.semanticKFor(32L) == 4)
    val auto = Dedup.semanticDedupAuto(emb, "id", "vec", 0.99, 4, 2)
      .collect().map(_.toSeq).toSet
    val trained = graft.operators.Similarity.trainKMeans(
      emb.where($"id" % 4 === 0), "id", "vec", 4, 4, 2)
    val fixed = Dedup.semanticDedup(emb, "id", "vec", trained, 0.99)
      .collect().map(_.toSeq).toSet
    assert(auto == fixed, "auto-k wrapper must be the fixed path verbatim")
    // nOpt short-circuits the dial's count scan but must resolve the
    // same k (and therefore the same board).
    val autoN = Dedup.semanticDedupAuto(emb, "id", "vec", 0.99, 4, 2,
        nOpt = Some(32L))
      .collect().map(_.toSeq).toSet
    assert(autoN == fixed, "precomputed-count dial must match")
  }

  test("hier assignment wiring: semanticDedup through the two-level " +
    "index at wprobe = all groups equals the flat path bit-for-bit") {
    // 40 vectors, k = 10 trained centroids -> ceil(sqrt(10)) = 4 coarse
    // groups; probing all of them makes the two-level assignment
    // IDENTICAL to flat (HierCentroidsSpec's contract), so the whole
    // dedup board must match row-for-row. This pins semanticDedup's
    // hierWprobe wiring (not just the expression) — the path
    // semanticDedupAuto takes once k >= hierFromK at corpus scale.
    val rnd = new scala.util.Random(19)
    val emb = df((0L until 40L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)): _*)
    val trained = graft.operators.Similarity.trainKMeans(
      emb.where($"id" % 2 === 0), "id", "vec", 10, 8, 2)
    val flat = Dedup.semanticDedup(emb, "id", "vec", trained, 0.8)
      .collect().map(_.toSeq).toSet
    val hier = Dedup.semanticDedup(emb, "id", "vec", trained, 0.8,
        hierWprobe = Some(4))
      .collect().map(_.toSeq).toSet
    assert(hier == flat, "wprobe=all-groups hier board must equal flat")
    // And the auto wrapper actually routes hier once k >= hierFromK:
    // force hierFromK below the resolved k and require the run to
    // still produce a valid board (every row present exactly once).
    val routed = Dedup.semanticDedupAuto(emb, "id", "vec", 0.8, 8, 2,
      nOpt = Some(200L), hierFromK = 2, hierWprobe = 4)
    assert(routed.select("id").distinct().count() == 40L)
  }

  test("approximate hier regime is PINNED on a fixed fixture, not just " +
    "the >= 0.95 agreement floor") {
    // hierWprobe = 2 against ~6 coarse groups — a REAL restriction (the
    // regime semanticDedupAuto enters past hierFromK, where results may
    // leave the flat bit-exact path). The fixture is a driver-seeded
    // Random (not the partition-seeded generator), training and
    // assignment are deterministic, so the approximate board is a fixed
    // function of the code: any drift in the two-level grouping, the
    // coarse selection rule, or the hier-routed training path moves
    // this checksum loudly. Exact-mode escape hatch stays available
    // (hierFromK = Int.MaxValue keeps every path flat).
    val rnd = new scala.util.Random(77)
    val emb = df((0L until 120L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)): _*)
    val board = Dedup.semanticDedupAuto(emb, "id", "vec", 0.8, 8, 2,
        nOpt = Some(2048L), hierFromK = 2, hierWprobe = 2)
      .orderBy("id").collect()
    assert(board.length == 120)
    val checksum = board.map(r => r.getLong(0) * 31L + r.getLong(1) * 7L +
      (if (r.getBoolean(2)) 3L else 0L) +
      (if (r.isNullAt(3)) -1L else r.getLong(3))).sum
    assert(checksum == 275457L,
      s"approximate-path board checksum drifted: got $checksum")
  }
}
