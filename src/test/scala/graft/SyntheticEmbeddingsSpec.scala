package graft

import org.apache.spark.sql.functions._

import graft.operators.SyntheticEmbeddings

/** The generator∘ANN composition fixture: planted centroids, Dirichlet
  * mixture, unit-direction noise — the properties the two board gates
  * (gen_synthetic_embeddings, sim_ann_synthetic) rely on. */
class SyntheticEmbeddingsSpec extends GraftSuite {
  import spark.implicits._

  test("centroids are deterministic unit vectors") {
    val a = SyntheticEmbeddings.centroids(4, 16, 7L)
    val b = SyntheticEmbeddings.centroids(4, 16, 7L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-12)
    }
    val other = SyntheticEmbeddings.centroids(4, 16, 8L)
    assert(a.map(_.toSeq).toSeq != other.map(_.toSeq).toSeq)
  }

  test("mixture weights are a probability vector") {
    val w = SyntheticEmbeddings.mixtureWeights(6, 2.0, 7L)
    assert(w.length == 6)
    assert(math.abs(w.sum - 1.0) < 1e-12)
    assert(w.forall(_ > 0.0))
  }

  test("noise 0 plants rows exactly on their centroid (float rounding)") {
    val cents = SyntheticEmbeddings.centroids(3, 8, 11L)
    val c = SyntheticEmbeddings.clustered(spark, 300L, 3, 8, 11L, 0.0)
    val minAlign = SyntheticEmbeddings.centroidAlignment(c, cents)
      .agg(min(col("align"))).collect()(0).getDouble(0)
    assert(minAlign > 1.0 - 1e-6,
      s"noise-free rows must equal their centroid, min align $minAlign")
  }

  test("clusters cover the domain and are long-typed") {
    val c = SyntheticEmbeddings.clustered(spark, 500L, 4, 8, 13L, 0.4)
    assert(c.schema("cluster").dataType.typeName == "long")
    assert(c.schema("embedding").dataType.simpleString == "array<float>")
    val ks = c.select("cluster").distinct().collect().map(_.getLong(0)).sorted
    assert(ks.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("alignment matches the closed form 1/sqrt(1+noise^2)") {
    val noise = 0.6
    val cents = SyntheticEmbeddings.centroids(4, 32, 17L)
    val c = SyntheticEmbeddings.clustered(spark, 4000L, 4, 32, 17L, noise)
    val meanAlign = SyntheticEmbeddings.centroidAlignment(c, cents)
      .agg(avg(col("align"))).collect()(0).getDouble(0)
    // E[cos] = 1/sqrt(1+eps^2) + O(eps^2/dim); ~0.857 at eps=0.6.
    val expected = 1.0 / math.sqrt(1.0 + noise * noise)
    assert(math.abs(meanAlign - expected) < 0.02,
      s"mean alignment $meanAlign vs closed form $expected")
  }

  test("fail-fast on degenerate parameters") {
    intercept[IllegalArgumentException] {
      SyntheticEmbeddings.centroids(1, 8, 7L)
    }
    intercept[IllegalArgumentException] {
      SyntheticEmbeddings.clustered(spark, 10L, 4, 8, 7L, -0.1)
    }
  }
}
