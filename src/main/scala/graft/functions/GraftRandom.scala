package graft.functions

/**
 * Per-partition pseudo-random generator backing the `randgen_*` expression
 * family.
 *
 * The reference operator (`/root/reference/src/randgen/int64_uniform.rs:98`)
 * uses an *unseeded* thread-local RNG; on Spark, task retries and speculative
 * execution re-run partitions, so an unseeded generator would make retried
 * partitions produce different data mid-query. We therefore adopt the
 * `rand(seed)` convention: a per-(expression, partition) seed, mixed through
 * SplitMix64 so adjacent (seed, partition) pairs decorrelate, driving an
 * xorshift64* core. Both algorithms are public domain (Vigna, "An
 * experimental exploration of Marsaglia's xorshift generators", 2016; Steele
 * et al., "Fast splittable pseudorandom number generators", OOPSLA 2014).
 *
 * Must be a top-level public class: whole-stage codegen instantiates it by
 * fully-qualified name inside generated Java.
 */
object GraftRandom {
  /** SplitMix64 golden-ratio increment. */
  final val Golden = 0x9E3779B97F4A7C15L

  /** SplitMix64 finalizer (Steele et al., OOPSLA 2014) — the ONE shared
    * bit-mixing step behind expression seeding, `fuzz.QueryFuzz` query
    * generation, and `operators.TextGen` walk streams. */
  def mix64(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

final class GraftRandom(seed: Long, partitionIndex: Int) {

  private[this] var state: Long = {
    // SplitMix64 finalizer over the combined seed; guarantees a well-mixed,
    // non-zero xorshift state even for seed = partition = 0.
    val z = GraftRandom.mix64(
      seed + GraftRandom.Golden * (partitionIndex + 1).toLong)
    if (z == 0L) GraftRandom.Golden else z
  }

  /** One cached spare for the Marsaglia polar gaussian. */
  private[this] var haveSpareGaussian: Boolean = false
  private[this] var spareGaussian: Double = 0.0

  def nextLong(): Long = {
    var x = state
    x ^= x >>> 12
    x ^= x << 25
    x ^= x >>> 27
    state = x
    x * 0x2545F4914F6CDD1DL
  }

  /** Uniform double in [0, 1) with 53 bits of mantissa. */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16

  /**
   * Discrete uniform on the inclusive range [lo, hi] — the reference
   * contract (`int64_uniform.rs:99` uses `Uniform::new_inclusive`).
   * Unbiased via the power-of-two-mask / rejection scheme (same algorithm
   * as `java.util.random.RandomSupport.boundedNextLong`). Fails fast on
   * lo > hi, matching the reference's panic (`int64_uniform.rs:99` unwrap).
   */
  def nextLongInclusive(lo: Long, hi: Long): Long = {
    if (lo > hi) {
      throw new IllegalArgumentException(
        s"randgen uniform: min ($lo) must be <= max ($hi)")
    }
    val width = hi - lo + 1 // == 0 or negative iff span >= 2^63 (overflow)
    if (width <= 0L) {
      // Span covers at least half the u64 space: rejection acceptance >= 1/2.
      var r = nextLong()
      while (r < lo || r > hi) r = nextLong()
      r
    } else if ((width & (width - 1)) == 0L) {
      lo + (nextLong() & (width - 1))
    } else {
      var u = nextLong() >>> 1
      var r = u % width
      while (u + (width - 1) - r < 0L) { u = nextLong() >>> 1; r = u % width }
      lo + r
    }
  }

  /** Continuous uniform on [lo, hi). */
  def nextDoubleUniform(lo: Double, hi: Double): Double =
    lo + nextDouble() * (hi - lo)

  /** Standard normal via Marsaglia polar, scaled to (mean, std). */
  def nextGaussian(mean: Double, std: Double): Double = {
    if (haveSpareGaussian) {
      haveSpareGaussian = false
      mean + std * spareGaussian
    } else {
      var x = 0.0; var y = 0.0; var s = 0.0
      do {
        x = 2.0 * nextDouble() - 1.0
        y = 2.0 * nextDouble() - 1.0
        s = x * x + y * y
      } while (s >= 1.0 || s == 0.0)
      val scale = math.sqrt(-2.0 * math.log(s) / s)
      spareGaussian = y * scale
      haveSpareGaussian = true
      mean + std * (x * scale)
    }
  }

  /** Correlated standard-normal PAIR [z1, z2] with corr(z1, z2) = rho,
    * via the Cholesky factor of the 2x2 correlation matrix:
    * z2 = rho*z1 + sqrt(1 - rho^2)*w. The multivariate member of the
    * generator family — callers scale/shift each margin with plain
    * column arithmetic (mu + sigma * z), so one expression covers every
    * (mu1, s1, mu2, s2, rho) parameterization. */
  def nextGaussianPair(rho: Double): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (java.lang.Double.isNaN(rho) || rho < -1.0 || rho > 1.0) {
      throw new IllegalArgumentException(
        s"randgen normal pair: rho ($rho) must be in [-1, 1]")
    }
    val z1 = nextGaussian(0.0, 1.0)
    val w = nextGaussian(0.0, 1.0)
    val z2 = rho * z1 + math.sqrt(1.0 - rho * rho) * w
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(z1, z2))
  }

  /** Exponential with rate lambda, via inversion. log1p keeps precision. */
  def nextExponential(lambda: Double): Double = {
    if (lambda <= 0.0) {
      throw new IllegalArgumentException(
        s"randgen exponential: lambda ($lambda) must be > 0")
    }
    -math.log1p(-nextDouble()) / lambda
  }

  /** Bernoulli trial with success probability p in [0, 1]. */
  def nextBernoulli(p: Double): Boolean = {
    if (p < 0.0 || p > 1.0) {
      throw new IllegalArgumentException(
        s"randgen bernoulli: p ($p) must be in [0, 1]")
    }
    nextDouble() < p
  }

  /**
   * Zipf-distributed rank in [1, n] with exponent s > 0, via
   * rejection-inversion (W. Hormann, G. Derflinger, "Rejection-inversion to
   * generate variates from monotone discrete distributions", ACM TOMACS
   * 1996 — the algorithm behind Apache Commons RNG's Zipf sampler and
   * rand_distr's, which is what the reference's planned `*_zipf` generators
   * would have used via `rand_distr`, `/root/reference/Cargo.toml:15`).
   */
  def nextZipf(n: Long, exponent: Double): Long = {
    if (n < 1L || exponent <= 0.0) {
      throw new IllegalArgumentException(
        s"randgen zipf: need n >= 1 (got $n) and s > 0 (got $exponent)")
    }
    if (n == 1L) return 1L
    // H(x) = integral of x^-s; h(x) = x^-s.
    val hIntegralX1 = hIntegral(1.5, exponent) - 1.0
    val hIntegralN = hIntegral(n + 0.5, exponent)
    val shift = 2.0 -
      hIntegralInverse(hIntegral(2.5, exponent) - hPoint(2.0, exponent), exponent)
    while (true) {
      val u = hIntegralN + nextDouble() * (hIntegralX1 - hIntegralN)
      val x = hIntegralInverse(u, exponent)
      var k = math.round(x)
      if (k < 1L) k = 1L else if (k > n) k = n
      if (k - x <= shift) return k
      if (u >= hIntegral(k + 0.5, exponent) - hPoint(k.toDouble, exponent)) return k
    }
    1L // unreachable
  }

  // H(x) = (x^(1-s) - 1)/(1-s), with the s==1 log(x) limit (expm1/log1p
  // keep precision near s=1).
  private[this] def hIntegral(x: Double, s: Double): Double = {
    val logX = math.log(x)
    helper2((1.0 - s) * logX) * logX
  }

  private[this] def hPoint(x: Double, s: Double): Double =
    math.exp(-s * math.log(x))

  private[this] def hIntegralInverse(u: Double, s: Double): Double = {
    var t = u * (1.0 - s)
    if (t < -1.0) t = -1.0
    math.exp(helper1(t) * u)
  }

  // helper1(t) = log1p(t)/t, continuous at 0.
  private[this] def helper1(t: Double): Double =
    if (math.abs(t) > 1e-8) math.log1p(t) / t else 1.0 - t / 2.0 + t * t / 3.0

  // helper2(t) = expm1(t)/t, continuous at 0.
  private[this] def helper2(t: Double): Double =
    if (math.abs(t) > 1e-8) math.expm1(t) / t else 1.0 + t / 2.0 * (1.0 + t / 3.0)

  /** Poisson via Knuth's product method — exact; O(lambda) per draw, so
    * intended for lambda up to a few hundred (document-length scale). */
  def nextPoisson(lambda: Double): Long = {
    if (lambda <= 0.0) {
      throw new IllegalArgumentException(
        s"randgen poisson: lambda ($lambda) must be > 0")
    }
    val l = math.exp(-lambda)
    var k = 0L
    var p = 1.0
    do { k += 1; p *= nextDouble() } while (p > l)
    k - 1
  }

  /** Geometric: number of failures before first success, p in (0, 1]. */
  def nextGeometric(p: Double): Long = {
    if (p <= 0.0 || p > 1.0) {
      throw new IllegalArgumentException(
        s"randgen geometric: p ($p) must be in (0, 1]")
    }
    if (p == 1.0) 0L
    else math.floor(math.log1p(-nextDouble()) / math.log1p(-p)).toLong
  }

  /** Pareto (type I): scale * u^(-1/shape), support [scale, inf). */
  def nextPareto(scale: Double, shape: Double): Double = {
    if (scale <= 0.0 || shape <= 0.0) {
      throw new IllegalArgumentException(
        s"randgen pareto: scale ($scale) and shape ($shape) must be > 0")
    }
    scale * math.pow(1.0 - nextDouble(), -1.0 / shape)
  }

  /** Laplace(mu, b) via inverse CDF. */
  def nextLaplace(mu: Double, b: Double): Double = {
    if (b <= 0.0) {
      throw new IllegalArgumentException(
        s"randgen laplace: b ($b) must be > 0")
    }
    val u = nextDouble() - 0.5
    mu - b * math.signum(u) * math.log1p(-2.0 * math.abs(u))
  }

  /** Log-normal: exp(Normal(mu, sigma)) — the multiplicative-size
    * distribution (file sizes, document lengths, session durations).
    * sigma = 0 degenerates to the constant exp(mu), matching
    * `rand_distr::LogNormal`'s contract (the reference's planned samplers
    * come from that crate, `/root/reference/Cargo.toml:15`). */
  def nextLogNormal(mu: Double, sigma: Double): Double = {
    if (sigma < 0.0 || java.lang.Double.isNaN(sigma)) {
      throw new IllegalArgumentException(
        s"randgen lognormal: sigma ($sigma) must be >= 0")
    }
    math.exp(nextGaussian(mu, sigma))
  }

  /** Weibull(scale λ, shape k) via inversion: λ * (-ln(1-u))^(1/k).
    * k < 1 models burn-in failure rates, k = 1 is exponential, k > 1
    * wear-out — the lifetime/latency-tail distribution. */
  def nextWeibull(scale: Double, shape: Double): Double = {
    if (scale <= 0.0 || shape <= 0.0) {
      throw new IllegalArgumentException(
        s"randgen weibull: scale ($scale) and shape ($shape) must be > 0")
    }
    scale * math.pow(-math.log1p(-nextDouble()), 1.0 / shape)
  }

  /**
   * Binomial(n, p): successes in n trials. Exact sampling by counting
   * geometric skips between successes — expected O(n·min(p, 1-p) + 1)
   * draws, so n can be large when p is moderate (the regime synthetic
   * event counts live in); p > 1/2 uses the n - Binomial(n, 1-p)
   * symmetry to keep the loop short.
   */
  def nextBinomial(n: Long, p: Double): Long = {
    if (n < 0L || p < 0.0 || p > 1.0 || java.lang.Double.isNaN(p)) {
      throw new IllegalArgumentException(
        s"randgen binomial: need n >= 0 (got $n) and p in [0, 1] (got $p)")
    }
    if (n == 0L || p == 0.0) return 0L
    if (p == 1.0) return n
    val flip = p > 0.5
    val q = if (flip) 1.0 - p else p
    val logq = math.log1p(-q) // < 0
    var pos = 0L // trials consumed
    var count = 0L
    var more = true
    while (more) {
      // failures before the next success ~ Geometric(q)
      val s = math.log1p(-nextDouble()) / logq
      // next success would land at trial pos + floor(s) + 1: done iff > n
      if (java.lang.Double.isNaN(s) || s >= (n - pos).toDouble) more = false
      else {
        pos += math.floor(s).toLong + 1L
        count += 1L
      }
    }
    if (flip) n - count else count
  }

  /** Gamma(shape k, scale θ) via Marsaglia–Tsang (2000) squeeze-rejection
    * for k >= 1 (d = k - 1/3, c = 1/sqrt(9d); accept d·v·θ) — expected
    * ~1.05 (normal, uniform) draw pairs per sample, flat in k. k < 1 uses
    * the standard boost Gamma(k) = Gamma(k+1) · U^(1/k). The shape/rate
    * workhorse behind [[nextBeta]] / [[nextChiSquare]] / [[nextStudentT]]
    * — the tail of the reference's `rand_distr 0.5.1` dependency surface
    * (/root/reference/Cargo.toml:15). */
  def nextGamma(shape: Double, scale: Double): Double = {
    if (shape <= 0.0 || scale <= 0.0 ||
        java.lang.Double.isNaN(shape) || java.lang.Double.isNaN(scale)) {
      throw new IllegalArgumentException(
        s"randgen gamma: shape ($shape) and scale ($scale) must be > 0")
    }
    if (shape < 1.0) {
      val g = nextGamma(shape + 1.0, scale)
      g * math.pow(nextDouble(), 1.0 / shape)
    } else {
      val d = shape - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * d)
      var result = -1.0
      while (result < 0.0) {
        val x = nextGaussian(0.0, 1.0)
        val t = 1.0 + c * x
        if (t > 0.0) {
          val v = t * t * t
          val u = nextDouble()
          val x2 = x * x
          // Squeeze first (cheap), exact log test on the rare miss.
          if (u < 1.0 - 0.0331 * x2 * x2 ||
              math.log(u) < 0.5 * x2 + d * (1.0 - v + math.log(v)))
            result = d * v * scale
        }
      }
      result
    }
  }

  /** Beta(a, b) as X/(X+Y) with X ~ Gamma(a,1), Y ~ Gamma(b,1) — exact,
    * support (0, 1). */
  def nextBeta(a: Double, b: Double): Double = {
    if (a <= 0.0 || b <= 0.0 ||
        java.lang.Double.isNaN(a) || java.lang.Double.isNaN(b)) {
      throw new IllegalArgumentException(
        s"randgen beta: a ($a) and b ($b) must be > 0")
    }
    val x = nextGamma(a, 1.0)
    val y = nextGamma(b, 1.0)
    x / (x + y)
  }

  /** Cauchy(median, scale) by inversion: median + scale·tan(π(u − ½)).
    * No finite moments — assert on quantiles, never on means. */
  def nextCauchy(median: Double, scale: Double): Double = {
    if (scale <= 0.0 || java.lang.Double.isNaN(scale)) {
      throw new IllegalArgumentException(
        s"randgen cauchy: scale ($scale) must be > 0")
    }
    median + scale * math.tan(math.Pi * (nextDouble() - 0.5))
  }

  /** Chi-square(df) = Gamma(df/2, 2) — df > 0 (non-integer allowed, as in
    * `rand_distr::ChiSquared`). */
  def nextChiSquare(df: Double): Double = {
    if (df <= 0.0 || java.lang.Double.isNaN(df)) {
      throw new IllegalArgumentException(
        s"randgen chisquare: df ($df) must be > 0")
    }
    nextGamma(df / 2.0, 2.0)
  }

  /** Student-t(ν) = Z / sqrt(ChiSq(ν)/ν) — the heavy-tailed symmetric
    * noise model; ν > 0, draws one normal then one chi-square. */
  def nextStudentT(nu: Double): Double = {
    if (nu <= 0.0 || java.lang.Double.isNaN(nu)) {
      throw new IllegalArgumentException(
        s"randgen student_t: nu ($nu) must be > 0")
    }
    val z = nextGaussian(0.0, 1.0)
    z / math.sqrt(nextChiSquare(nu) / nu)
  }

  /** Standard exponential draw guaranteed strictly positive (rejects the
    * u = 0 lattice point, probability 2^-53 per draw) — the building
    * block for the extreme-value samplers below, whose log/pow transforms
    * would map 0 to an infinity. */
  private[this] def nextExpPositive(): Double = {
    var e = 0.0
    while (e <= 0.0) e = -math.log1p(-nextDouble())
    e
  }

  /** Gumbel(mu, beta) by inversion: mu - beta*ln(E), E ~ Exp(1) — the
    * max-extreme-value law (block maxima of latencies, flood levels).
    * Matches `rand_distr::Gumbel(location, scale)`. */
  def nextGumbel(mu: Double, beta: Double): Double = {
    if (beta <= 0.0 || java.lang.Double.isNaN(beta)) {
      throw new IllegalArgumentException(
        s"randgen gumbel: beta ($beta) must be > 0")
    }
    mu - beta * math.log(nextExpPositive())
  }

  /** Frechet(shape alpha, scale s) by inversion: s * E^(-1/alpha),
    * E ~ Exp(1) — the heavy-tailed max-extreme-value law; moments exist
    * only below alpha (mean needs alpha > 1, variance alpha > 2).
    * `rand_distr::Frechet`'s location parameter is an additive shift —
    * apply it in SQL (`loc + randgen_float64_frechet(...)`). */
  def nextFrechet(shape: Double, scale: Double): Double = {
    if (shape <= 0.0 || scale <= 0.0 ||
        java.lang.Double.isNaN(shape) || java.lang.Double.isNaN(scale)) {
      throw new IllegalArgumentException(
        s"randgen frechet: shape ($shape) and scale ($scale) must be > 0")
    }
    scale * math.pow(nextExpPositive(), -1.0 / shape)
  }

  /** Fisher F(d1, d2) = (ChiSq(d1)/d1)/(ChiSq(d2)/d2) — the
    * variance-ratio law (ANOVA statistics under H0); mean d2/(d2-2) for
    * d2 > 2. Matches `rand_distr::FisherF`. */
  def nextFisherF(d1: Double, d2: Double): Double = {
    if (d1 <= 0.0 || d2 <= 0.0 ||
        java.lang.Double.isNaN(d1) || java.lang.Double.isNaN(d2)) {
      throw new IllegalArgumentException(
        s"randgen fisher_f: d1 ($d1) and d2 ($d2) must be > 0")
    }
    (nextChiSquare(d1) / d1) / (nextChiSquare(d2) / d2)
  }

  /** Inverse Gaussian / Wald(mu, lambda) via the Michael–Schucany–Haas
    * (1976) one-normal transform: first-passage times of drifted Brownian
    * motion (service-time models); mean mu, variance mu^3/lambda. */
  def nextInverseGaussian(mu: Double, lambda: Double): Double = {
    if (mu <= 0.0 || lambda <= 0.0 ||
        java.lang.Double.isNaN(mu) || java.lang.Double.isNaN(lambda)) {
      throw new IllegalArgumentException(
        s"randgen inverse_gaussian: mu ($mu) and lambda ($lambda) must be > 0")
    }
    val nu = nextGaussian(0.0, 1.0)
    val y = nu * nu
    val x = mu + (mu * mu * y) / (2.0 * lambda) -
      (mu / (2.0 * lambda)) * math.sqrt(4.0 * mu * lambda * y + mu * mu * y * y)
    if (nextDouble() <= mu / (mu + x)) x else (mu * mu) / x
  }

  /** Negative binomial(r, p): failures before the r-th success, exact via
    * the Gamma–Poisson mixture Poisson(Gamma(r, (1-p)/p)) — so r may be
    * real-valued (Polya), exactly as in `rand_distr::NegativeBinomial`.
    * Mean r(1-p)/p, variance r(1-p)/p^2 (overdispersed counts: tokens per
    * user, retries per request). */
  def nextNegativeBinomial(r: Double, p: Double): Long = {
    if (r <= 0.0 || p <= 0.0 || p > 1.0 ||
        java.lang.Double.isNaN(r) || java.lang.Double.isNaN(p)) {
      throw new IllegalArgumentException(
        s"randgen negative_binomial: need r > 0 (got $r) and p in (0, 1] (got $p)")
    }
    if (p == 1.0) return 0L
    val lambda = nextGamma(r, (1.0 - p) / p)
    if (lambda == 0.0) 0L else nextPoisson(lambda)
  }

  /** Triangular(min, max, mode) by inversion — the bounded three-point
    * estimate (PERT-style durations). Requires min < max and
    * mode in [min, max]; matches `rand_distr::Triangular`. */
  def nextTriangular(min: Double, max: Double, mode: Double): Double = {
    if (!(min < max) || !(mode >= min) || !(mode <= max)) {
      throw new IllegalArgumentException(
        s"randgen triangular: need min < max and mode in [min, max] " +
          s"(got min=$min, max=$max, mode=$mode)")
    }
    val u = nextDouble()
    val fc = (mode - min) / (max - min)
    if (u < fc) min + math.sqrt(u * (max - min) * (mode - min))
    else max - math.sqrt((1.0 - u) * (max - min) * (max - mode))
  }

  /** Hypergeometric(nTotal, kSuccess, nDraws): successes in nDraws draws
    * WITHOUT replacement from nTotal items of which kSuccess are
    * successes. Exact sequential sampling — one uniform per draw, O(nDraws)
    * (the without-replacement regime synthetic QA/dedup fixtures live in;
    * for survey-scale nDraws the Binomial approximation is the 100 TB
    * path). Matches `rand_distr::Hypergeometric`'s (N, K, n). */
  def nextHypergeometric(nTotal: Long, kSuccess: Long, nDraws: Long): Long = {
    if (nTotal < 0L || kSuccess < 0L || kSuccess > nTotal ||
        nDraws < 0L || nDraws > nTotal) {
      throw new IllegalArgumentException(
        s"randgen hypergeometric: need 0 <= kSuccess <= nTotal and " +
          s"0 <= nDraws <= nTotal (got N=$nTotal, K=$kSuccess, n=$nDraws)")
    }
    var remaining = nTotal
    var good = kSuccess
    var draws = nDraws
    var count = 0L
    while (draws > 0L && good > 0L && good < remaining) {
      if (nextDouble() * remaining < good) { count += 1L; good -= 1L }
      remaining -= 1L
      draws -= 1L
    }
    // Degenerate tail: urn is all-successes (or all-failures) — the
    // remaining draws are deterministic.
    if (good >= remaining) count + draws else count
  }

  /** Skew-normal(location, scale, alpha) via Azzalini's representation:
    * Z = delta*|U0| + sqrt(1-delta^2)*V with delta = alpha/sqrt(1+alpha^2)
    * and U0, V independent standard normals. alpha = 0 is the normal;
    * mean = loc + scale*delta*sqrt(2/pi). Matches `rand_distr::SkewNormal`. */
  def nextSkewNormal(location: Double, scale: Double, alpha: Double): Double = {
    if (scale <= 0.0 || java.lang.Double.isNaN(scale) ||
        java.lang.Double.isNaN(alpha)) {
      throw new IllegalArgumentException(
        s"randgen skew_normal: scale ($scale) must be > 0")
    }
    val delta = alpha / math.sqrt(1.0 + alpha * alpha)
    val u0 = nextGaussian(0.0, 1.0)
    val v = nextGaussian(0.0, 1.0)
    location + scale * (delta * math.abs(u0) +
      math.sqrt(1.0 - delta * delta) * v)
  }

  /** Zeta(s), s > 1: unbounded power-law ranks, P(X = k) = k^-s / zeta(s)
    * — the infinite-support sibling of [[nextZipf]] (vocabulary ranks,
    * city sizes). Devroye's two-uniform rejection (Non-Uniform Random
    * Variate Generation 1986, X.6.1), the algorithm `rand_distr::Zeta`
    * uses; the expected iteration count is a small constant for s > 1.
    * Draws whose inversion step overflows past 2^62 are rejected
    * (tail mass < 2^-61 at s >= 2). */
  def nextZeta(s: Double): Long = {
    if (s <= 1.0 || java.lang.Double.isNaN(s)) {
      throw new IllegalArgumentException(
        s"randgen zeta: s ($s) must be > 1")
    }
    val b = math.pow(2.0, s - 1.0)
    while (true) {
      val u = nextDouble()
      val v = nextDouble()
      val x = math.floor(math.pow(u, -1.0 / (s - 1.0)))
      if (x >= 1.0 && x <= 4.611686e18) { // reject u = 0 / overflow tail
        val t = math.pow(1.0 + 1.0 / x, s - 1.0)
        if (v * x * (t - 1.0) / (b - 1.0) <= t / b) return x.toLong
      }
    }
    1L // unreachable
  }

  /** PERT(min, max, mode) — the smooth three-point estimate: a Beta with
    * a = 1 + 4(mode-min)/(max-min), b = 1 + 4(max-mode)/(max-min) stretched
    * onto [min, max]; mean is exactly (min + 4·mode + max)/6. The standard
    * shape parameter is fixed at 4, as in `rand_distr::Pert::new`. */
  def nextPert(min: Double, max: Double, mode: Double): Double = {
    if (!(min < max) || !(mode > min) || !(mode < max)) {
      throw new IllegalArgumentException(
        s"randgen pert: need min < mode < max " +
          s"(got min=$min, max=$max, mode=$mode)")
    }
    val range = max - min
    val a = 1.0 + 4.0 * (mode - min) / range
    val b = 1.0 + 4.0 * (max - mode) / range
    min + range * nextBeta(a, b)
  }

  /** Dirichlet(alpha_1..alpha_k): a point on the probability simplex via
    * the classic Gamma normalization — X_i ~ Gamma(alpha_i, 1), result
    * X_i / ΣX_j. Marginals are Beta(alpha_i, alpha_0 - alpha_i); matches
    * `rand_distr::Dirichlet`. Returns a fresh non-null double array (the
    * mixture-weights / topic-proportions synthesizer). */
  def nextDirichlet(
      alphas: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = alphas.numElements()
    if (k < 2) {
      throw new IllegalArgumentException(
        s"randgen dirichlet: need >= 2 concentration parameters (got $k)")
    }
    val out = new Array[Double](k)
    var total = 0.0
    var i = 0
    while (i < k) {
      if (alphas.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"randgen dirichlet: alpha at index $i is null")
      }
      val a = alphas.getDouble(i)
      if (a <= 0.0 || java.lang.Double.isNaN(a)) {
        throw new IllegalArgumentException(
          s"randgen dirichlet: alpha $a at index $i must be > 0")
      }
      val g = nextGamma(a, 1.0)
      out(i) = g
      total += g
      i += 1
    }
    // total == 0 is possible only by underflow at tiny alphas; renormalize
    // to the uniform simplex point rather than emit NaNs.
    if (total <= 0.0) {
      java.util.Arrays.fill(out, 1.0 / k)
    } else {
      i = 0
      while (i < k) { out(i) /= total; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Uniform point on the surface of the unit (dim-1)-sphere in R^dim:
    * dim i.i.d. standard normals normalized to length 1 (Muller 1959) —
    * rotation-invariant by construction. dim = 2 is
    * `rand_distr::UnitCircle`, dim = 3 `rand_distr::UnitSphere`; higher
    * dim is the synthetic-embedding direction sampler. The all-zero draw
    * (probability 0 up to rounding) is rejected and redrawn. */
  def nextUnitVector(dim: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(unitDirection(dim))

  /** Uniform point INSIDE the unit dim-ball: a [[nextUnitVector]] direction
    * scaled by U^(1/dim), the radial CDF inverse of r^dim volume growth.
    * dim = 2 is `rand_distr::UnitDisc`, dim = 3 `rand_distr::UnitBall`. */
  def nextUnitBall(dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val v = unitDirection(dim)
    val r = math.pow(nextDouble(), 1.0 / dim)
    var i = 0
    while (i < dim) { v(i) *= r; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(v)
  }

  /** NormalInverseGaussian(alpha, beta) — the standard (mu = 0, delta = 1)
    * NIG law, matching `rand_distr::NormalInverseGaussian::new(alpha, beta)`:
    * tail heaviness alpha > 0, asymmetry |beta| < alpha. Sampled as the
    * classic normal variance-mean mixture: Z ~ IG(1/gamma, 1) with
    * gamma = sqrt(alpha^2 - beta^2), X = beta*Z + sqrt(Z)*N(0,1) — rides
    * [[nextInverseGaussian]] + [[nextGaussian]]. Mean beta/gamma, variance
    * alpha^2/gamma^3; location/scale shifts (mu, delta) are affine — apply
    * in SQL. */
  def nextNormalInverseGaussian(alpha: Double, beta: Double): Double = {
    if (!(alpha > 0.0) || !(math.abs(beta) < alpha)) {
      throw new IllegalArgumentException(
        s"randgen normal inverse gaussian: need alpha > 0 and |beta| < alpha " +
          s"(got alpha=$alpha, beta=$beta)")
    }
    val gamma = math.sqrt(alpha * alpha - beta * beta)
    val z = nextInverseGaussian(1.0 / gamma, 1.0)
    beta * z + math.sqrt(z) * nextGaussian(0.0, 1.0)
  }

  private[this] def unitDirection(dim: Int): Array[Double] = {
    if (dim < 1 || dim > (1 << 20)) {
      throw new IllegalArgumentException(
        s"randgen unit vector: dim ($dim) must be in [1, 2^20]")
    }
    val v = new Array[Double](dim)
    var norm2 = 0.0
    while (norm2 <= 0.0) { // reject the measure-zero all-zero draw
      var i = 0
      while (i < dim) {
        val g = nextGaussian(0.0, 1.0)
        v(i) = g
        norm2 += g * g
        i += 1
      }
    }
    val inv = 1.0 / math.sqrt(norm2)
    var i = 0
    while (i < dim) { v(i) *= inv; i += 1 }
    v
  }

  private[this] val alphanumChars: Array[Char] =
    ("abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789").toCharArray

  /** RFC 4122 version-4-format UUID string: 122 random bits with the
    * version nibble forced to 4 and the variant bits to 10 — but drawn
    * from this generator's seeded stream, so (unlike java.util.UUID
    * .randomUUID) reproducible per (seed, partition) and retry-stable. */
  def nextUuidString(): String = {
    val hi = (nextLong() & 0xFFFFFFFFFFFF0FFFL) | 0x0000000000004000L
    val lo = (nextLong() & 0x3FFFFFFFFFFFFFFFL) | 0x8000000000000000L
    new java.util.UUID(hi, lo).toString
  }

  /** Index in [0, n) drawn proportionally to non-negative weights with a
    * positive sum (the categorical distribution). O(n) walk per draw —
    * weights arrive as a per-row array, so there is no precomputed alias
    * table to amortize. */
  def nextWeightedIndex(weights: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = weights.numElements()
    var total = 0.0
    var i = 0
    while (i < n) {
      if (weights.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"randgen weighted choice: weight at index $i is null")
      }
      val w = weights.getDouble(i)
      if (w < 0.0 || java.lang.Double.isNaN(w) ||
          java.lang.Double.isInfinite(w)) {
        throw new IllegalArgumentException(
          s"randgen weighted choice: weight $w at index $i must be finite and >= 0")
      }
      total += w
      i += 1
    }
    if (n == 0 || total <= 0.0) {
      throw new IllegalArgumentException(
        s"randgen weighted choice: weights must sum to > 0 (got $total over $n)")
    }
    var u = nextDouble() * total
    i = 0
    while (i < n - 1) {
      u -= weights.getDouble(i)
      if (u < 0.0) return i
      i += 1
    }
    n - 1
  }

  /** Random alphanumeric string with length uniform in [lenLo, lenHi]. */
  def nextAlphanumeric(lenLo: Long, lenHi: Long): String = {
    val len = nextLongInclusive(lenLo, lenHi)
    if (len < 0L || len > Int.MaxValue.toLong) {
      throw new IllegalArgumentException(
        s"randgen string: length $len out of range [0, ${Int.MaxValue}]")
    }
    val sb = new java.lang.StringBuilder(len.toInt)
    var i = 0
    while (i < len) {
      sb.append(alphanumChars(nextLongInclusive(0, alphanumChars.length - 1).toInt))
      i += 1
    }
    sb.toString
  }
}
