package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * The NearestCentroids loop expression vs its declarative
 * sort_array-of-structs twin (probeCidsDeclarative — the form it
 * replaced, kept as the oracle): same folds, same nan-safe (neg, cid)
 * order, on random vectors, exact ties, NaN keys from a zero vector,
 * and a k above the old codegen ceiling. The 64 KB half of the story
 * (declarative overflows at large k, the loop doesn't) is in
 * CodegenAuditSpec.
 */
class NearestCentroidsSpec extends GraftSuite {
  import spark.implicits._

  private def centroids(k: Int, dim: Int,
      seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until k).map(c =>
      (c.toLong * 3 + 1, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  test("loop expression == declarative twin on random vectors " +
    "(k up to 150, nprobe 1 and 3)") {
    val dim = 16
    for (seed <- Seq(11L, 42L); k <- Seq(5, 150)) {
      val cents = centroids(k, dim, seed)
      val vecs = TableGen.table(spark, 300L, seed,
          "id" -> Gen.SeqId, "v" -> Gen.ArrayUnitVector(dim))
        .select(col("id"), col("v").cast("array<float>").as("vec"))
      for (nprobe <- Seq(1, 3)) {
        val got = vecs.select(col("id"),
            Similarity.probeCids(col("vec"), cents, nprobe).as("cids"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val want = vecs.select(col("id"),
            Similarity.probeCidsDeclarative(col("vec"), cents, nprobe)
              .as("cids"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(got == want, s"seed=$seed k=$k nprobe=$nprobe: " +
          s"diff=${(got.toSet -- want.toSet).take(3)}")
      }
    }
  }

  test("exact ties fall to the lower cid; nprobe > k truncates") {
    val cv = Array(1f, 0f)
    val cents = Seq(7L -> cv, 3L -> cv.clone) // same centroid, two cids
    val vecs = Seq((1L, Array(0.5f, 0.5f))).toDF("id", "vec")
    val got = vecs.select(Similarity.probeCids(col("vec"), cents, 5))
      .collect().head.getSeq[Long](0)
    assert(got == Seq(3L, 7L), s"got $got")
  }

  test("zero-norm vector fails fast with a named error (the declarative " +
    "twin throws an opaque ANSI DIVIDE_BY_ZERO on the same input)") {
    val cents = Seq(0L -> Array(1f, 0f))
    val vecs = Seq((1L, Array(0f, 0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      vecs.select(Similarity.probeCids(col("vec"), cents, 1)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("zero-norm")),
      s"must fail with the named zero-norm error, got: $e")
  }

  test("mismatched centroid dimensions fail fast") {
    val cents = Seq(0L -> Array(1f, 0f), 1L -> Array(1f, 0f, 0f))
    val vecs = Seq((1L, Array(1f, 0f))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Similarity.ivfProbes(vecs, "id", "vec", cents, 1)
    }
    intercept[IllegalArgumentException] {
      vecs.select(Similarity.probeCids(col("vec"), Nil, 1))
    }
  }
}
