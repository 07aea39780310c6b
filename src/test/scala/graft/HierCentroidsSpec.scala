package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * The two-level (coarse-then-fine) centroid assignment vs the flat
 * NearestCentroids form it dials down from. Contract under test:
 *
 *  - wprobe >= group count  =>  BIT-IDENTICAL to the flat probe (the
 *    selection rule is (neg cosine, cid) GLOBALLY over every scored
 *    candidate, so scoring all of them degenerates to the flat scan) —
 *    on random vectors, exact ties, and a k above the old codegen
 *    ceiling;
 *  - small wprobe on a corpus WITH cluster structure (where the auto-k
 *    family actually operates) agrees with flat assignment at a pinned
 *    floor — the standard IVF approximation dial;
 *  - determinism and fail-fasts mirror the flat form.
 */
class HierCentroidsSpec extends GraftSuite {
  import spark.implicits._

  private def centroids(k: Int, dim: Int,
      seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until k).map(c =>
      (c.toLong * 3 + 1, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  test("wprobe = all groups == flat probe on random vectors " +
    "(k up to 150, nprobe 1 and 3)") {
    val dim = 16
    for (seed <- Seq(11L, 42L); k <- Seq(5, 150)) {
      val cents = centroids(k, dim, seed)
      val allGroups = Similarity.hierGroupsFor(k)
      val vecs = TableGen.table(spark, 300L, seed,
          "id" -> Gen.SeqId, "v" -> Gen.ArrayUnitVector(dim))
        .select(col("id"), col("v").cast("array<float>").as("vec"))
      for (nprobe <- Seq(1, 3)) {
        val got = vecs.select(col("id"),
            Similarity.probeCidsHier(col("vec"), cents, nprobe, allGroups)
              .as("cids"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val want = vecs.select(col("id"),
            Similarity.probeCids(col("vec"), cents, nprobe).as("cids"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(got == want, s"seed=$seed k=$k nprobe=$nprobe: " +
          s"diff=${(got.toSet -- want.toSet).take(3)}")
      }
    }
  }

  test("exact ties fall to the lower cid ACROSS groups; nprobe > k " +
    "truncates") {
    // Two identical centroid vectors under different cids: both group
    // under the lower coarse seed, and the global (neg, cid) rule must
    // order them 3 before 7 exactly like the flat form.
    val cv = Array(1f, 0f)
    val cents = Seq(7L -> cv, 3L -> cv.clone)
    val vecs = Seq((1L, Array(0.5f, 0.5f))).toDF("id", "vec")
    val got = vecs.select(
        Similarity.probeCidsHier(col("vec"), cents, 5, 2))
      .collect().head.getSeq[Long](0)
    assert(got == Seq(3L, 7L), s"got $got")
  }

  test("small wprobe on a CLUSTERED corpus: nprobe=1 assignment agrees " +
    "with flat at >= 0.95") {
    // The regime the dial exists for: clustered embeddings (tight
    // planted clusters, noise 0.5) with k=64 trained centroids. A row's
    // nearest fine centroid almost always lives in one of its 2 best
    // coarse groups; the miss rate is the documented approximation.
    val (k, dim, seed) = (64, 32, 1205L)
    val all = graft.operators.SyntheticEmbeddings
      .clustered(spark, 2048L, 8, dim, seed, 0.5)
      .select(col("id"), col("embedding").as("vec"))
    val cents = Similarity.trainKMeans(
      all.where(col("id") % 4 === 0), "id", "vec", k, dim, 2)
    val flat = Similarity.ivfAssignments(all, "id", "vec", cents)
      .select(col("id"), col("cid"))
    val hier = Similarity.ivfAssignmentsHier(all, "id", "vec", cents, 2)
      .select(col("id"), col("cid"))
    val n = all.count()
    val agree = flat.join(hier, Seq("id", "cid")).count()
    assert(agree.toDouble / n >= 0.95,
      s"hier(wprobe=2) agreement ${agree.toDouble / n} < 0.95 " +
        s"($agree / $n)")
    // Anti-vacuity: the index actually has enough groups that wprobe=2
    // is a real restriction (ceil(sqrt(64)) = 8 groups trained).
    assert(Similarity.hierGroupsFor(k) == 8)
  }

  test("deterministic: two builds of the index probe identically") {
    val cents = centroids(40, 16, 7L)
    val vecs = TableGen.table(spark, 100L, 7L,
        "id" -> Gen.SeqId, "v" -> Gen.ArrayUnitVector(16))
      .select(col("id"), col("v").cast("array<float>").as("vec"))
    val a = vecs.select(col("id"),
      Similarity.probeCidsHier(col("vec"), cents, 2, 3).as("c")).collect()
    val b = vecs.select(col("id"),
      Similarity.probeCidsHier(col("vec"), cents, 2, 3).as("c")).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("zero-norm row vector fails fast with the named error") {
    val cents = Seq(0L -> Array(1f, 0f), 1L -> Array(0f, 1f))
    val vecs = Seq((1L, Array(0f, 0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      vecs.select(Similarity.probeCidsHier(col("vec"), cents, 1, 1))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("zero-norm")),
      s"must fail with the named zero-norm error, got: $e")
  }

  test("zero-norm centroid / empty centroids / bad wprobe fail fast") {
    intercept[IllegalArgumentException] {
      Similarity.probeCidsHier(col("v"), Nil, 1, 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.probeCidsHier(col("v"),
        Seq(0L -> Array(0f, 0f), 1L -> Array(1f, 0f)), 1, 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.probeCidsHier(col("v"), Seq(0L -> Array(1f, 0f)), 1, 0)
    }
  }

  test("trainKMeans through the two-level index at wprobe = all groups " +
    "equals flat training bit-for-bit") {
    // The Lloyd loop's per-round assignment is the last O(k)-per-row
    // call site the two-level index needed to cover. With wprobe =
    // Int.MaxValue every round scores all fine centroids under the same
    // global (neg, cid) rule, so the trained quantizer — ids AND every
    // float of every mean — must equal the flat run's exactly, round for
    // round. (A dropped-empty-cluster divergence in ANY round would
    // cascade into different centroid ids, so equality here pins the
    // whole iteration history, not just the final means.)
    val dim = 16
    val vecs = TableGen.table(spark, 400L, 33L,
        "id" -> Gen.SeqId, "v" -> Gen.ArrayUnitVector(dim))
      .select(col("id"), col("v").cast("array<float>").as("vec"))
    val flat = Similarity.trainKMeans(vecs, "id", "vec", 24, dim, 3)
    val hier = Similarity.trainKMeans(vecs, "id", "vec", 24, dim, 3,
      hierWprobe = Some(Int.MaxValue))
    assert(flat.map(_._1) == hier.map(_._1),
      s"cid sets diverged: ${flat.map(_._1)} vs ${hier.map(_._1)}")
    assert(flat.zip(hier).forall { case ((_, a), (_, b)) =>
      a.sameElements(b)
    }, "trained centroid means must be bit-identical at wprobe=all")
  }

  test("ivfAssignments and ivfPqAssignments hier dials at wprobe = all " +
    "groups equal their flat paths row-for-row") {
    val dim = 16
    val vecs = TableGen.table(spark, 300L, 44L,
        "id" -> Gen.SeqId, "v" -> Gen.ArrayUnitVector(dim))
      .select(col("id"), col("v").cast("array<float>").as("vec"))
    val cents = Similarity.trainKMeans(vecs, "id", "vec", 20, dim, 2)
    val books = Similarity.trainPQ(vecs, "id", "vec", 4, 4, 8, 2)
    val flatIvf = Similarity.ivfAssignments(vecs, "id", "vec", cents)
      .select("cid", "id").collect().map(_.toSeq).toSet
    val hierIvf = Similarity.ivfAssignments(vecs, "id", "vec", cents,
        hierWprobe = Some(Int.MaxValue))
      .select("cid", "id").collect().map(_.toSeq).toSet
    assert(hierIvf == flatIvf, "ivfAssignments hier dial must be " +
      "bit-identical at wprobe=all")
    val flatPq = Similarity.ivfPqAssignments(vecs, "id", "vec", cents,
      books, 4).collect().map(_.toSeq).toSet
    val hierPq = Similarity.ivfPqAssignments(vecs, "id", "vec", cents,
        books, 4, hierWprobe = Some(Int.MaxValue))
      .collect().map(_.toSeq).toSet
    assert(hierPq == flatPq, "ivfPqAssignments hier dial must be " +
      "bit-identical at wprobe=all")
  }
}
