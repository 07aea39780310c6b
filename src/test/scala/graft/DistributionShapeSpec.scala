package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftRandom

/**
 * Goodness-of-fit checks the reference never had (SURVEY.md §5 notes "no
 * distribution-shape testing"): empirical frequencies vs the theoretical
 * pmf/cdf under a fixed seed, 1M samples each. Tolerances are ~5 sigma of
 * the binomial sampling error, so the tests are deterministic AND would
 * catch a real pmf bug (e.g. a wrong Zipf acceptance bound).
 */
class DistributionShapeSpec extends AnyFunSuite {

  private val N = 1000000

  test("zipf(n=5, s=1) matches the harmonic pmf") {
    val rng = new GraftRandom(1234L, 0)
    val counts = new Array[Int](6)
    (0 until N).foreach(_ => counts(rng.nextZipf(5, 1.0).toInt) += 1)
    val h = (1 to 5).map(1.0 / _).sum
    (1 to 5).foreach { k =>
      val expected = (1.0 / k) / h
      val got = counts(k).toDouble / N
      assert(math.abs(got - expected) < 0.0035,
        s"zipf p($k): got $got expected $expected")
    }
  }

  test("zipf(n=1000, s=1.5) head probability matches") {
    val rng = new GraftRandom(99L, 0)
    var ones = 0
    (0 until N).foreach(_ => if (rng.nextZipf(1000, 1.5) == 1L) ones += 1)
    val h = (1 to 1000).map(k => math.pow(k.toDouble, -1.5)).sum
    val expected = 1.0 / h
    assert(math.abs(ones.toDouble / N - expected) < 0.0035,
      s"zipf(1000,1.5) p(1): got ${ones.toDouble / N} expected $expected")
  }

  test("normal matches the 68-95-99.7 rule") {
    val rng = new GraftRandom(77L, 0)
    var in1 = 0; var in2 = 0; var in3 = 0
    (0 until N).foreach { _ =>
      val x = math.abs(rng.nextGaussian(0.0, 1.0))
      if (x < 1.0) in1 += 1
      if (x < 2.0) in2 += 1
      if (x < 3.0) in3 += 1
    }
    assert(math.abs(in1.toDouble / N - 0.682689) < 0.0035)
    assert(math.abs(in2.toDouble / N - 0.954500) < 0.0025)
    assert(math.abs(in3.toDouble / N - 0.997300) < 0.0010)
  }

  test("uniform long has flat byte buckets") {
    val rng = new GraftRandom(55L, 0)
    val counts = new Array[Int](16)
    (0 until N).foreach { _ =>
      counts((rng.nextLongInclusive(0, 15)).toInt) += 1
    }
    counts.foreach { c =>
      assert(math.abs(c.toDouble / N - 1.0 / 16) < 0.0025, c.toString)
    }
  }

  test("exponential cdf at the median and mean") {
    val rng = new GraftRandom(33L, 0)
    var belowMedian = 0; var belowMean = 0
    val lambda = 2.0
    (0 until N).foreach { _ =>
      val x = rng.nextExponential(lambda)
      if (x < math.log(2.0) / lambda) belowMedian += 1
      if (x < 1.0 / lambda) belowMean += 1
    }
    assert(math.abs(belowMedian.toDouble / N - 0.5) < 0.0035)
    assert(math.abs(belowMean.toDouble / N - (1 - math.exp(-1))) < 0.0035)
  }

  test("poisson(4) pmf at k=0..3") {
    val rng = new GraftRandom(11L, 0)
    val counts = new Array[Int](64)
    (0 until N).foreach { _ =>
      val k = rng.nextPoisson(4.0).toInt
      if (k < 64) counts(k) += 1
    }
    var fact = 1.0
    (0 to 3).foreach { k =>
      if (k > 0) fact *= k
      val expected = math.exp(-4.0) * math.pow(4.0, k) / fact
      assert(math.abs(counts(k).toDouble / N - expected) < 0.0035,
        s"poisson p($k)")
    }
  }

  test("weighted index matches the categorical pmf (chi-square < crit)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val weights = Array(1.0, 4.0, 2.5, 0.5, 2.0)
    val wArr = new GenericArrayData(weights.map(x => x: Any))
    val total = weights.sum
    val rng = new GraftRandom(777L, 0)
    val counts = new Array[Long](weights.length)
    (0 until N).foreach(_ => counts(rng.nextWeightedIndex(wArr)) += 1)
    val chi2 = weights.indices.map { i =>
      val e = N * weights(i) / total
      val d = counts(i) - e
      d * d / e
    }.sum
    // df=4, p=0.999 critical value 18.47 — deterministic under the seed.
    assert(chi2 < 18.47, s"chi-square $chi2 over ${counts.mkString(",")}")
  }

  test("lognormal cdf at the median and quartiles") {
    // X ~ LogNormal(mu, sigma) => P(X < exp(mu + z*sigma)) = Phi(z).
    val rng = new GraftRandom(21L, 0)
    val (mu, sigma) = (0.3, 0.8)
    var belowMedian = 0; var belowQ3 = 0
    val q3 = math.exp(mu + 0.6744898 * sigma) // z for Phi = 0.75
    (0 until N).foreach { _ =>
      val x = rng.nextLogNormal(mu, sigma)
      assert(x > 0.0)
      if (x < math.exp(mu)) belowMedian += 1
      if (x < q3) belowQ3 += 1
    }
    assert(math.abs(belowMedian.toDouble / N - 0.5) < 0.0035)
    assert(math.abs(belowQ3.toDouble / N - 0.75) < 0.0035)
    // sigma = 0 degenerates to the constant exp(mu).
    assert(rng.nextLogNormal(1.5, 0.0) == math.exp(1.5))
  }

  test("weibull cdf at scale and at the median") {
    // F(x) = 1 - exp(-(x/scale)^shape): F(scale) = 1 - 1/e; the median
    // is scale * ln(2)^(1/shape).
    val rng = new GraftRandom(23L, 0)
    val (scale, shape) = (2.0, 1.5)
    var belowScale = 0; var belowMedian = 0
    val med = scale * math.pow(math.log(2.0), 1.0 / shape)
    (0 until N).foreach { _ =>
      val x = rng.nextWeibull(scale, shape)
      assert(x >= 0.0)
      if (x < scale) belowScale += 1
      if (x < med) belowMedian += 1
    }
    assert(math.abs(belowScale.toDouble / N - (1 - math.exp(-1))) < 0.0035)
    assert(math.abs(belowMedian.toDouble / N - 0.5) < 0.0035)
  }

  test("binomial pmf at the mode, both p regimes, and edge cases") {
    val rng = new GraftRandom(27L, 0)
    def pmf(n: Int, p: Double, k: Int): Double = {
      var logc = 0.0
      (1 to k).foreach(i => logc += math.log((n - k + i).toDouble / i))
      math.exp(logc + k * math.log(p) + (n - k) * math.log1p(-p))
    }
    // Direct path (p <= 1/2): B(10, 0.3), pmf at k = 3 (the mode).
    var hits3 = 0
    (0 until N).foreach(_ => if (rng.nextBinomial(10L, 0.3) == 3L) hits3 += 1)
    assert(math.abs(hits3.toDouble / N - pmf(10, 0.3, 3)) < 0.0035)
    // Symmetry path (p > 1/2): B(10, 0.7), pmf at k = 7.
    var hits7 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextBinomial(10L, 0.7)
      assert(x >= 0L && x <= 10L)
      if (x == 7L) hits7 += 1
    }
    assert(math.abs(hits7.toDouble / N - pmf(10, 0.7, 7)) < 0.0035)
    // Edges: p = 0 -> 0, p = 1 -> n, n = 0 -> 0; invalid args fail fast.
    assert(rng.nextBinomial(5L, 0.0) == 0L)
    assert(rng.nextBinomial(5L, 1.0) == 5L)
    assert(rng.nextBinomial(0L, 0.4) == 0L)
    intercept[IllegalArgumentException](rng.nextBinomial(-1L, 0.5))
    intercept[IllegalArgumentException](rng.nextBinomial(5L, 1.5))
    intercept[IllegalArgumentException](rng.nextWeibull(0.0, 1.0))
    intercept[IllegalArgumentException](rng.nextLogNormal(0.0, -0.1))
  }

  test("gamma cdf: Erlang closed form (k >= 1) and ChiSq(1) boost path (k < 1)") {
    // Gamma(3, 2) is Erlang(3, rate 1/2): F(x) = 1 - e^(-x/2) * (1 + x/2
    // + (x/2)^2/2) — exact at any x.
    val rng = new GraftRandom(37L, 0)
    def erlang3(x: Double): Double = {
      val h = x / 2.0
      1.0 - math.exp(-h) * (1.0 + h + h * h / 2.0)
    }
    var below2 = 0; var below6 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextGamma(3.0, 2.0)
      assert(x > 0.0)
      if (x < 2.0) below2 += 1
      if (x < 6.0) below6 += 1
    }
    assert(math.abs(below2.toDouble / N - erlang3(2.0)) < 0.0035)
    assert(math.abs(below6.toDouble / N - erlang3(6.0)) < 0.0035)
    // Gamma(1/2, 2) = ChiSq(1) = Z^2: P(X < 1) = P(|Z| < 1) = 0.682689,
    // P(X < 4) = 0.954500 — the 68-95 rule through the k < 1 boost path.
    var b1 = 0; var b4 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextGamma(0.5, 2.0)
      if (x < 1.0) b1 += 1
      if (x < 4.0) b4 += 1
    }
    assert(math.abs(b1.toDouble / N - 0.682689) < 0.0035)
    assert(math.abs(b4.toDouble / N - 0.954500) < 0.0025)
    intercept[IllegalArgumentException](rng.nextGamma(0.0, 1.0))
    intercept[IllegalArgumentException](rng.nextGamma(1.0, -2.0))
  }

  test("beta(2,5) cdf matches the integer-parameter closed form") {
    // For integer a, b: F(x) = 1 - sum_{k<a} C(a+b-1, k) x^k (1-x)^(a+b-1-k)
    // — at (2,5): F(x) = 1 - (1-x)^6 - 6x(1-x)^5.
    val rng = new GraftRandom(41L, 0)
    def cdf(x: Double): Double =
      1.0 - math.pow(1.0 - x, 6) - 6.0 * x * math.pow(1.0 - x, 5)
    var b02 = 0; var b04 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextBeta(2.0, 5.0)
      assert(x > 0.0 && x < 1.0)
      if (x < 0.2) b02 += 1
      if (x < 0.4) b04 += 1
    }
    assert(math.abs(b02.toDouble / N - cdf(0.2)) < 0.0035)
    assert(math.abs(b04.toDouble / N - cdf(0.4)) < 0.0035)
    intercept[IllegalArgumentException](rng.nextBeta(-1.0, 2.0))
    intercept[IllegalArgumentException](rng.nextBeta(2.0, 0.0))
  }

  test("cauchy cdf at the median and quartiles; student-t(1) IS cauchy") {
    // F(x) = 1/2 + atan((x - median)/scale)/pi: quartiles at median ± scale.
    val rng = new GraftRandom(43L, 0)
    var q1 = 0; var med = 0; var q3 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextCauchy(10.0, 2.0)
      if (x < 8.0) q1 += 1
      if (x < 10.0) med += 1
      if (x < 12.0) q3 += 1
    }
    assert(math.abs(q1.toDouble / N - 0.25) < 0.0035)
    assert(math.abs(med.toDouble / N - 0.5) < 0.0035)
    assert(math.abs(q3.toDouble / N - 0.75) < 0.0035)
    // t(nu=1) is standard Cauchy: P(T < 1) = 0.75.
    var t1 = 0
    (0 until N).foreach(_ => if (rng.nextStudentT(1.0) < 1.0) t1 += 1)
    assert(math.abs(t1.toDouble / N - 0.75) < 0.0035)
    intercept[IllegalArgumentException](rng.nextCauchy(0.0, 0.0))
  }

  test("chi-square(2) is exponential(1/2); student-t(2) has a closed cdf") {
    val rng = new GraftRandom(47L, 0)
    // ChiSq(2): F(x) = 1 - e^(-x/2); median 2 ln 2.
    var bm = 0; var b2 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextChiSquare(2.0)
      assert(x > 0.0)
      if (x < 2.0 * math.log(2.0)) bm += 1
      if (x < 2.0) b2 += 1
    }
    assert(math.abs(bm.toDouble / N - 0.5) < 0.0035)
    assert(math.abs(b2.toDouble / N - (1.0 - math.exp(-1.0))) < 0.0035)
    // t(2): F(x) = 1/2 + x / (2 sqrt(2 + x^2)) — F(1) = 1/2 + 1/(2 sqrt 3).
    var t1 = 0
    (0 until N).foreach(_ => if (rng.nextStudentT(2.0) < 1.0) t1 += 1)
    assert(math.abs(t1.toDouble / N - (0.5 + 1.0 / (2.0 * math.sqrt(3.0))))
      < 0.0035)
    intercept[IllegalArgumentException](rng.nextChiSquare(0.0))
    intercept[IllegalArgumentException](rng.nextStudentT(-1.0))
  }

  test("gumbel cdf: exp(-exp(-(x-mu)/beta)) at the median and at mu") {
    val rng = new GraftRandom(53L, 0)
    // Gumbel(1, 2): F(median) = 1/2 at mu - beta ln ln 2; F(mu) = 1/e.
    val median = 1.0 - 2.0 * math.log(math.log(2.0))
    var bm = 0; var bmu = 0
    (0 until N).foreach { _ =>
      val x = rng.nextGumbel(1.0, 2.0)
      if (x < median) bm += 1
      if (x < 1.0) bmu += 1
    }
    assert(math.abs(bm.toDouble / N - 0.5) < 0.0035)
    assert(math.abs(bmu.toDouble / N - math.exp(-1.0)) < 0.0035)
    intercept[IllegalArgumentException](rng.nextGumbel(0.0, 0.0))
  }

  test("frechet cdf: exp(-(x/s)^-a) at the median and at the scale") {
    val rng = new GraftRandom(59L, 0)
    // Frechet(3, 2): F(median) = 1/2 at 2 (ln 2)^(-1/3); F(scale) = 1/e.
    val median = 2.0 * math.pow(math.log(2.0), -1.0 / 3.0)
    var bm = 0; var bs = 0
    (0 until N).foreach { _ =>
      val x = rng.nextFrechet(3.0, 2.0)
      assert(x > 0.0)
      if (x < median) bm += 1
      if (x < 2.0) bs += 1
    }
    assert(math.abs(bm.toDouble / N - 0.5) < 0.0035)
    assert(math.abs(bs.toDouble / N - math.exp(-1.0)) < 0.0035)
    intercept[IllegalArgumentException](rng.nextFrechet(-3.0, 2.0))
    intercept[IllegalArgumentException](rng.nextFrechet(3.0, 0.0))
  }

  test("fisher F(2,2) has the closed cdf x/(1+x); F(d,d) median is 1") {
    val rng = new GraftRandom(61L, 0)
    // F(2,2): F(x) = x/(1+x) — F(1) = 1/2, F(3) = 3/4.
    var b1 = 0; var b3 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextFisherF(2.0, 2.0)
      assert(x > 0.0)
      if (x < 1.0) b1 += 1
      if (x < 3.0) b3 += 1
    }
    assert(math.abs(b1.toDouble / N - 0.5) < 0.0035)
    assert(math.abs(b3.toDouble / N - 0.75) < 0.0035)
    // Equal dfs are symmetric under X -> 1/X, so the median is exactly 1.
    var m = 0
    (0 until N).foreach(_ => if (rng.nextFisherF(7.0, 7.0) < 1.0) m += 1)
    assert(math.abs(m.toDouble / N - 0.5) < 0.0035)
    intercept[IllegalArgumentException](rng.nextFisherF(0.0, 2.0))
  }

  test("inverse gaussian(2, 6) moments: mean mu, var mu^3/lambda") {
    val rng = new GraftRandom(67L, 0)
    var s = 0.0; var s2 = 0.0
    (0 until N).foreach { _ =>
      val x = rng.nextInverseGaussian(2.0, 6.0)
      assert(x > 0.0)
      s += x; s2 += x * x
    }
    val mean = s / N
    val v = s2 / N - mean * mean
    assert(math.abs(mean - 2.0) < 0.008, s"IG mean: $mean") // se 0.0012, ~7 sigma
    assert(math.abs(v - 4.0 / 3.0) < 0.025, s"IG var: $v") // se var 0.0035
    intercept[IllegalArgumentException](rng.nextInverseGaussian(0.0, 6.0))
    intercept[IllegalArgumentException](rng.nextInverseGaussian(2.0, -1.0))
  }

  test("negative binomial(3, 1/2) pmf: C(k+2,k)/2^(k+3) at k = 0..2") {
    val rng = new GraftRandom(71L, 0)
    val counts = new Array[Int](3)
    (0 until N).foreach { _ =>
      val k = rng.nextNegativeBinomial(3.0, 0.5)
      assert(k >= 0L)
      if (k < 3) counts(k.toInt) += 1
    }
    assert(math.abs(counts(0).toDouble / N - 0.125) < 0.0035)
    assert(math.abs(counts(1).toDouble / N - 0.1875) < 0.0035)
    assert(math.abs(counts(2).toDouble / N - 0.1875) < 0.0035)
    assert(rng.nextNegativeBinomial(5.0, 1.0) == 0L) // p = 1: no failures
    intercept[IllegalArgumentException](rng.nextNegativeBinomial(0.0, 0.5))
    intercept[IllegalArgumentException](rng.nextNegativeBinomial(3.0, 1.5))
  }

  test("triangular(0, 10, 2) cdf: x^2/20 below the mode, 1-(10-x)^2/80 above") {
    val rng = new GraftRandom(73L, 0)
    var b2 = 0; var b5 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextTriangular(0.0, 10.0, 2.0)
      assert(x >= 0.0 && x <= 10.0)
      if (x < 2.0) b2 += 1
      if (x < 5.0) b5 += 1
    }
    assert(math.abs(b2.toDouble / N - 0.2) < 0.0035) // F(mode) = fc
    assert(math.abs(b5.toDouble / N - 0.6875) < 0.0035)
    intercept[IllegalArgumentException](rng.nextTriangular(1.0, 1.0, 1.0))
    intercept[IllegalArgumentException](rng.nextTriangular(0.0, 10.0, 11.0))
  }

  test("hypergeometric(10, 4, 5) exact pmf; degenerate urns are deterministic") {
    val rng = new GraftRandom(79L, 0)
    // P(X = k) = C(4,k) C(6,5-k)/C(10,5), C(10,5) = 252.
    val pmf = Array(6.0, 60.0, 120.0, 60.0, 6.0).map(_ / 252.0)
    val counts = new Array[Int](5)
    (0 until N).foreach { _ =>
      val k = rng.nextHypergeometric(10L, 4L, 5L)
      assert(k >= 0L && k <= 4L)
      counts(k.toInt) += 1
    }
    (0 to 4).foreach { k =>
      assert(math.abs(counts(k).toDouble / N - pmf(k)) < 0.0035,
        s"hypergeometric p($k)")
    }
    assert(rng.nextHypergeometric(7L, 7L, 3L) == 3L) // all successes
    assert(rng.nextHypergeometric(7L, 0L, 3L) == 0L) // no successes
    assert(rng.nextHypergeometric(7L, 4L, 7L) == 4L) // exhaustive draw
    intercept[IllegalArgumentException](rng.nextHypergeometric(5L, 6L, 2L))
    intercept[IllegalArgumentException](rng.nextHypergeometric(5L, 2L, 6L))
  }

  test("skew normal: alpha 0 is normal; alpha -> inf is half-normal; mean closed form") {
    val rng = new GraftRandom(83L, 0)
    // alpha = 0 degenerates to N(0, 1): 68% within 1 sigma.
    var in1 = 0
    (0 until N).foreach { _ =>
      if (math.abs(rng.nextSkewNormal(0.0, 1.0, 0.0)) < 1.0) in1 += 1
    }
    assert(math.abs(in1.toDouble / N - 0.682689) < 0.0035)
    // alpha = 1e9: delta ~ 1, so X ~ |Z|: P(X < 1) = 0.682689.
    var h1 = 0
    (0 until N).foreach { _ =>
      val x = rng.nextSkewNormal(0.0, 1.0, 1e9)
      assert(x > -1e-6)
      if (x < 1.0) h1 += 1
    }
    assert(math.abs(h1.toDouble / N - 0.682689) < 0.0035)
    // alpha = 4: mean = delta sqrt(2/pi), delta = 4/sqrt(17).
    var s = 0.0
    (0 until N).foreach(_ => s += rng.nextSkewNormal(0.0, 1.0, 4.0))
    val expectedMean = (4.0 / math.sqrt(17.0)) * math.sqrt(2.0 / math.Pi)
    assert(math.abs(s / N - expectedMean) < 0.004) // se 0.00063, ~6 sigma
    intercept[IllegalArgumentException](rng.nextSkewNormal(0.0, 0.0, 1.0))
  }

  test("zeta(3) pmf: k^-3/zeta(3) at k = 1..3") {
    val rng = new GraftRandom(89L, 0)
    val zeta3 = 1.2020569031595943
    val counts = new Array[Int](4)
    (0 until N).foreach { _ =>
      val k = rng.nextZeta(3.0)
      assert(k >= 1L)
      if (k < 4) counts(k.toInt) += 1
    }
    (1 to 3).foreach { k =>
      val expected = math.pow(k.toDouble, -3.0) / zeta3
      assert(math.abs(counts(k).toDouble / N - expected) < 0.0035,
        s"zeta p($k): got ${counts(k).toDouble / N} expected $expected")
    }
    intercept[IllegalArgumentException](rng.nextZeta(1.0))
  }

  test("pert: symmetric case has median at the mode; mean is (min+4m+max)/6") {
    val rng = new GraftRandom(41L, 0)
    // PERT(0, 1, 0.5) is Beta(3, 3): median = mean = 0.5.
    var below = 0; var s = 0.0
    (0 until N).foreach { _ =>
      val x = rng.nextPert(0.0, 1.0, 0.5)
      assert(x >= 0.0 && x <= 1.0)
      if (x < 0.5) below += 1
      s += x
    }
    assert(math.abs(below.toDouble / N - 0.5) < 0.0035)
    assert(math.abs(s / N - 0.5) < 0.002) // se 0.00019, ~10 sigma
    // Asymmetric PERT(2, 10, 4): mean = (2 + 16 + 10)/6.
    var s2 = 0.0
    (0 until N).foreach(_ => s2 += rng.nextPert(2.0, 10.0, 4.0))
    assert(math.abs(s2 / N - 28.0 / 6.0) < 0.015) // se 0.0014, ~10 sigma
    intercept[IllegalArgumentException](rng.nextPert(0.0, 1.0, 0.0))
    intercept[IllegalArgumentException](rng.nextPert(0.0, 1.0, 1.0))
    intercept[IllegalArgumentException](rng.nextPert(1.0, 0.0, 0.5))
  }

  test("dirichlet(2,3,5): rows sum to 1; Beta(a_i, a_0-a_i) marginal moments") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rng = new GraftRandom(43L, 0)
    val alphas = new GenericArrayData(Array(2.0, 3.0, 5.0))
    val n = 200000
    val sums = new Array[Double](3)
    val sqs = new Array[Double](3)
    (0 until n).foreach { _ =>
      val v = rng.nextDirichlet(alphas)
      var total = 0.0
      (0 until 3).foreach { i =>
        val x = v.getDouble(i)
        assert(x > 0.0 && x < 1.0)
        total += x
        sums(i) += x
        sqs(i) += x * x
      }
      assert(math.abs(total - 1.0) < 1e-9)
    }
    // Marginal means alpha_i/10; marginal vars a_i(10-a_i)/(100*11).
    val wantMean = Array(0.2, 0.3, 0.5)
    val wantVar = Array(2.0 * 8, 3.0 * 7, 5.0 * 5).map(_ / 1100.0)
    (0 until 3).foreach { i =>
      val m = sums(i) / n
      assert(math.abs(m - wantMean(i)) < 0.003, s"dirichlet mean $i: $m")
      val v = sqs(i) / n - m * m
      assert(math.abs(v - wantVar(i)) < 0.001, s"dirichlet var $i: $v")
    }
    intercept[IllegalArgumentException](
      rng.nextDirichlet(new GenericArrayData(Array(2.0))))
    intercept[IllegalArgumentException](
      rng.nextDirichlet(new GenericArrayData(Array(2.0, 0.0))))
    intercept[IllegalArgumentException](
      rng.nextDirichlet(new GenericArrayData(Array(2.0, -1.0, 3.0))))
  }

  test("unit vector: norm 1; S^2 z-coordinate is uniform; dim 1 is a sign") {
    val rng = new GraftRandom(47L, 0)
    // Archimedes: on S^2 each coordinate is uniform on [-1, 1].
    var zAbove = 0
    val n = 500000
    (0 until n).foreach { _ =>
      val v = rng.nextUnitVector(3)
      val norm2 = (0 until 3).map(i => v.getDouble(i)).map(x => x * x).sum
      assert(math.abs(norm2 - 1.0) < 1e-9)
      if (v.getDouble(2) > 0.5) zAbove += 1
    }
    assert(math.abs(zAbove.toDouble / n - 0.25) < 0.0035)
    (0 until 100).foreach { _ =>
      val v = rng.nextUnitVector(1)
      assert(math.abs(math.abs(v.getDouble(0)) - 1.0) < 1e-12)
    }
    intercept[IllegalArgumentException](rng.nextUnitVector(0))
    intercept[IllegalArgumentException](rng.nextUnitVector((1 << 20) + 1))
  }

  test("unit ball: radius^dim is uniform (P(r < t) = t^dim); norm <= 1") {
    val rng = new GraftRandom(53L, 0)
    var below = 0
    val n = 500000
    (0 until n).foreach { _ =>
      val v = rng.nextUnitBall(3)
      val r = math.sqrt((0 until 3).map(i => v.getDouble(i)).map(x => x * x).sum)
      assert(r <= 1.0 + 1e-12)
      if (r < 0.5) below += 1
    }
    assert(math.abs(below.toDouble / n - 0.125) < 0.0035)
  }

  test("normal inverse gaussian: symmetric beta=0 is centered; moments match") {
    val rng = new GraftRandom(59L, 0)
    // NIG(alpha 3, beta 1): gamma = sqrt(8); mean = beta/gamma,
    // var = alpha^2/gamma^3.
    val gamma = math.sqrt(8.0)
    var s = 0.0; var sq = 0.0
    (0 until N).foreach { _ =>
      val x = rng.nextNormalInverseGaussian(3.0, 1.0)
      s += x; sq += x * x
    }
    val mean = s / N
    assert(math.abs(mean - 1.0 / gamma) < 0.006) // se 0.00063, ~10 sigma
    assert(math.abs((sq / N - mean * mean) - 9.0 / math.pow(gamma, 3)) < 0.008)
    // beta = 0 is symmetric around 0: P(X < 0) = 1/2.
    var neg = 0
    (0 until N).foreach { _ =>
      if (rng.nextNormalInverseGaussian(2.0, 0.0) < 0.0) neg += 1
    }
    assert(math.abs(neg.toDouble / N - 0.5) < 0.0035)
    intercept[IllegalArgumentException](rng.nextNormalInverseGaussian(0.0, 0.0))
    intercept[IllegalArgumentException](rng.nextNormalInverseGaussian(2.0, 2.0))
    intercept[IllegalArgumentException](rng.nextNormalInverseGaussian(2.0, -2.5))
  }

  test("uuid stream has version/variant bits fixed and no short-range repeats") {
    val rng = new GraftRandom(31L, 0)
    val seen = new java.util.HashSet[String]
    (0 until 100000).foreach { _ =>
      val u = rng.nextUuidString()
      assert(u.charAt(14) == '4', s"version nibble: $u")
      assert("89ab".indexOf(u.charAt(19)) >= 0, s"variant bits: $u")
      assert(seen.add(u), s"repeat within 100k draws: $u")
    }
  }
}
