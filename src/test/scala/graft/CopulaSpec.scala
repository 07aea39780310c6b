package graft

import org.apache.spark.sql.functions._

/** TableGen.correlated (Gaussian copula): driver-side Cholesky, input
  * validation, negative correlations, discrete marginals, determinism. */
class CopulaSpec extends GraftSuite {

  test("cholesky factor reconstructs the correlation matrix") {
    val r = Seq(Seq(1.0, 0.6, -0.2), Seq(0.6, 1.0, 0.1), Seq(-0.2, 0.1, 1.0))
    val l = TableGen.cholesky(r)
    for (i <- 0 until 3; j <- 0 until 3) {
      val rec = (0 until 3).map(m => l(i)(m) * l(j)(m)).sum
      assert(math.abs(rec - r(i)(j)) < 1e-12, s"LL^T mismatch at ($i,$j)")
    }
    // strictly lower-triangular output
    assert(l(0)(1) == 0.0 && l(0)(2) == 0.0 && l(1)(2) == 0.0)
  }

  test("non-positive-definite and malformed matrices are rejected") {
    intercept[IllegalArgumentException] { // |r| structure impossible
      TableGen.cholesky(Seq(Seq(1.0, 0.9, -0.9), Seq(0.9, 1.0, 0.9),
        Seq(-0.9, 0.9, 1.0)))
    }
    intercept[IllegalArgumentException] { // asymmetric
      TableGen.correlated(spark, 10L, 1L,
        Seq(Seq(1.0, 0.5), Seq(0.4, 1.0)),
        "a" -> Gen.Float64Normal(0, 1), "b" -> Gen.Float64Normal(0, 1))
    }
    intercept[IllegalArgumentException] { // diagonal != 1
      TableGen.correlated(spark, 10L, 1L,
        Seq(Seq(2.0, 0.5), Seq(0.5, 1.0)),
        "a" -> Gen.Float64Normal(0, 1), "b" -> Gen.Float64Normal(0, 1))
    }
    intercept[IllegalArgumentException] { // no closed-form inverse CDF
      TableGen.correlated(spark, 10L, 1L,
        Seq(Seq(1.0, 0.5), Seq(0.5, 1.0)),
        "a" -> Gen.Float64Normal(0, 1), "b" -> Gen.Choice(Seq("x", "y")))
    }
  }

  test("negative correlation and exponential marginal hold their targets") {
    val df = TableGen.correlated(spark, 50000L, 7L,
      Seq(Seq(1.0, -0.5), Seq(-0.5, 1.0)),
      "a" -> Gen.Float64Normal(0, 1),
      "b" -> Gen.Float64Exponential(2.0))
    val row = df.agg(
      corr(col("a"), col("b")).as("r"),
      avg(col("b")).as("mb"), min(col("b")).as("lo")).head()
    // exp marginal via PHI is monotone in the Gaussian, so the Pearson
    // with the normal keeps the sign and lands near -0.5 * sqrt-ish
    // attenuation; generous band around the Gaussian-space target.
    assert(row.getDouble(0) < -0.35 && row.getDouble(0) > -0.55,
      s"corr(a,b) = ${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 0.5) < 0.02, "Exp(2) mean 1/2")
    assert(row.getDouble(2) > 0.0, "exponential support is positive")
  }

  test("Int64Uniform marginal stays in bounds and tracks the sign") {
    val df = TableGen.correlated(spark, 20000L, 11L,
      Seq(Seq(1.0, 0.8), Seq(0.8, 1.0)),
      "g" -> Gen.Float64Normal(0, 1),
      "k" -> Gen.Int64Uniform(1, 10))
    val row = df.agg(min(col("k")).as("lo"), max(col("k")).as("hi"),
      corr(col("g"), col("k")).as("r")).head()
    assert(row.getLong(0) >= 1L && row.getLong(1) <= 10L)
    assert(row.getDouble(2) > 0.6, s"discretized corr = ${row.getDouble(2)}")
  }

  test("same seed reproduces bit-for-bit; different seed diverges") {
    def build(seed: Long) = TableGen.correlated(spark, 5000L, seed,
      Seq(Seq(1.0, 0.3), Seq(0.3, 1.0)),
      "a" -> Gen.Float64Normal(0, 1), "b" -> Gen.Float64Uniform(0, 1))
    assert(build(5L).exceptAll(build(5L)).count() == 0)
    assert(build(5L).exceptAll(build(6L)).count() > 0)
  }
}
