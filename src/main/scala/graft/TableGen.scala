package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, exp, expr, floor, least, lit,
  log, pow, tan, to_date, to_timestamp, when}

import graft.functions.RandgenFunctions._

/**
 * Schema-driven random table generation — the reference's stated purpose
 * ("A random data generator for Apache DataFusion",
 * `/root/reference/Cargo.toml:5`) realized as a Spark-native surface: a
 * declarative column-spec ADT composed over `spark.range(n)` so the whole
 * table materializes as ONE narrow codegen'd stage (no shuffle, no driver
 * data, scales linearly with executors at any row count).
 *
 * {{{
 * val df = TableGen.table(spark, rows = 1000000, seed = 42,
 *   "id"    -> Gen.SeqId,
 *   "qty"   -> Gen.Int64Uniform(1, 50),
 *   "price" -> Gen.Float64Normal(100.0, 15.0),
 *   "flag"  -> Gen.Choice(Seq("A", "B", "C")))
 * }}}
 */
sealed trait Gen

object Gen {
  /** The underlying `range` id — a unique sequential row id. */
  case object SeqId extends Gen
  case class Int64Uniform(min: Long, max: Long) extends Gen
  case class Float64Uniform(lo: Double, hi: Double) extends Gen
  case class Float64Normal(mean: Double, std: Double) extends Gen
  case class Float64Exponential(lambda: Double) extends Gen
  case class Int64Zipf(n: Long, s: Double) extends Gen
  case class BoolBernoulli(p: Double) extends Gen
  case class StringAlphanum(minLen: Long, maxLen: Long) extends Gen
  /** Dates as `yyyy-MM-dd` strings, inclusive. */
  case class DateUniform(start: String, end: String) extends Gen
  /** Timestamps as `yyyy-MM-dd HH:mm:ss` strings, inclusive, UTC session. */
  case class TimestampUniform(start: String, end: String) extends Gen
  case class Int64Poisson(lambda: Double) extends Gen
  case class Int64Geometric(p: Double) extends Gen
  case class Float64Pareto(scale: Double, shape: Double) extends Gen
  case class Float64Laplace(mu: Double, b: Double) extends Gen
  case class Float64Lognormal(mu: Double, sigma: Double) extends Gen
  case class Float64Weibull(scale: Double, shape: Double) extends Gen
  case class Int64Binomial(n: Long, p: Double) extends Gen
  case class Float64Gamma(shape: Double, scale: Double) extends Gen
  case class Float64Beta(a: Double, b: Double) extends Gen
  case class Float64Cauchy(median: Double, scale: Double) extends Gen
  case class Float64ChiSquare(df: Double) extends Gen
  case class Float64StudentT(nu: Double) extends Gen
  /** Uniform pick from a literal value list (strings/numbers). */
  case class Choice(values: Seq[Any]) extends Gen
  /** Weighted pick: values(i) with probability weights(i)/sum(weights). */
  case class ChoiceWeighted(values: Seq[Any], weights: Seq[Double]) extends Gen
  /** RFC 4122 v4-format UUID strings (seeded, reproducible). */
  case object Uuid extends Gen
  /** Uniform direction on the unit (dim−1)-sphere as ARRAY<DOUBLE> — the
    * spec-level door to synthetic embedding columns (see also
    * [[graft.operators.SyntheticEmbeddings]] for planted-cluster corpora). */
  case class ArrayUnitVector(dim: Int) extends Gen
  /** One Dirichlet(alphas) draw per row (a point on the simplex) as
    * ARRAY<DOUBLE> — per-row mixture weights / topic proportions. */
  case class ArrayDirichlet(alphas: Seq[Double]) extends Gen
  /** Null injection: `inner`'s value, replaced by NULL with probability
    * pNull — the realistic-messy-data knob every synthetic schema needs. */
  case class Nullable(inner: Gen, pNull: Double) extends Gen
  /** Escape hatch: any Spark SQL expression over previous columns. */
  case class SqlExpr(sql: String) extends Gen
}

object TableGen {

  /**
   * Builds a `rows`-row DataFrame with one column per spec, reproducible
   * under `seed` (each column gets a decorrelated derived seed; each
   * partition a decorrelated stream — safe under task retry).
   *
   * `numPartitions <= 0` keeps `range`'s default parallelism. At cluster
   * scale, pass explicit partitions so each task generates a bounded slice.
   */
  def table(spark: SparkSession, rows: Long, seed: Long,
      cols: (String, Gen)*): DataFrame =
    table(spark, rows, seed, 0, cols: _*)

  def table(spark: SparkSession, rows: Long, seed: Long, numPartitions: Int,
      cols: (String, Gen)*): DataFrame = {
    val base =
      if (numPartitions > 0) spark.range(0, rows, 1, numPartitions)
      else spark.range(0, rows)
    cols.zipWithIndex.foldLeft(base.toDF()) {
      case (df, ((name, gen), i)) =>
        df.withColumn(name, column(gen, seed + 0x9E37L * (i + 1)))
    }.select(cols.map { case (n, _) => col(n) }: _*)
  }

  /**
   * Relational child-table generation — the piece that turns single-table
   * specs into a full referentially-intact synthetic SCHEMA (orders →
   * lineitems, users → events): each parent row draws a fan-out count
   * from `fanout` (Poisson/Zipf/geometric — the realistic fan-out
   * shapes), explodes into that many child rows CARRYING the parent's
   * `keyCols` (so every child FK resolves by construction — no
   * post-hoc integrity repair), and generates the child columns from
   * `cols` exactly like [[table]]. `__seq` (0-based child index within
   * its parent) is in scope for `Gen.SqlExpr` specs, e.g. a TPC-H-style
   * line number `SqlExpr("__seq + 1")`.
   *
   * Scale shape: one narrow stage over the parent — fan-out draw,
   * sequence explode, child generators; no shuffle, no driver data. A
   * zero fan-out parent contributes no children (the `when` guard —
   * Spark's `sequence(0, -1)` would descend, not empty out).
   */
  def childTable(parent: DataFrame, keyCols: Seq[String], fanout: Gen,
      seed: Long, cols: (String, Gen)*): DataFrame = {
    require(keyCols.nonEmpty, "childTable: at least one parent key column")
    val fan = column(fanout, seed ^ 0x9E3779B97F4A7C15L).cast("long")
    val exploded = parent
      .withColumn("__fan", fan)
      .select(keyCols.map(col) :+
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.when(col("__fan") > 0,
            org.apache.spark.sql.functions.sequence(
              lit(0L), col("__fan") - 1))
            .otherwise(lit(Array.empty[Long]))).as("__seq"): _*)
    cols.zipWithIndex.foldLeft(exploded) {
      case (df, ((name, gen), i)) =>
        df.withColumn(name, column(gen, seed + 0x9E37L * (i + 1)))
    }.select((keyCols :+ "__seq").map(col) ++
      cols.map { case (n, _) => col(n) }: _*)
  }

  /**
   * Gaussian-copula correlated column generation — the realistic-schema
   * knob [[table]] lacks: real tables have price ~ quantity ~ segment
   * DEPENDENCE, and a fuzz corpus without it never exercises
   * correlation-sensitive paths (join selectivity estimates, multi-column
   * stats, stratified samplers). `corr` is the target k×k correlation
   * matrix; each row draws k iid standard normals (decorrelated seeded
   * streams), the driver-side Cholesky factor correlates them, and each
   * marginal is applied by its closed-form inverse CDF through Φ (the
   * Gaussian copula). Rank (Spearman) correlation between any two
   * continuous columns is then (6/π)·asin(r/2) regardless of marginals;
   * normal/lognormal marginals skip Φ entirely (y is used directly, so
   * normal-normal pairs hit Pearson r exactly).
   *
   * Scale shape: identical to [[table]] — ONE narrow codegen'd stage
   * over `spark.range`, no shuffle, no driver data; the Cholesky factor
   * is k×k driver math baked into the expressions as literals.
   *
   * Supported marginals: Float64{Normal, Lognormal, Uniform, Exponential,
   * Pareto, Weibull, Laplace, Cauchy} and Int64Uniform. Anything without
   * a closed-form inverse CDF is rejected fail-fast.
   */
  def correlated(spark: SparkSession, rows: Long, seed: Long,
      corr: Seq[Seq[Double]], cols: (String, Gen)*): DataFrame =
    correlated(spark, rows, seed, 0, corr, cols: _*)

  def correlated(spark: SparkSession, rows: Long, seed: Long,
      numPartitions: Int, corr: Seq[Seq[Double]],
      cols: (String, Gen)*): DataFrame = {
    val k = cols.size
    require(k >= 2, "correlated: at least two columns")
    require(cols.forall(!_._1.startsWith("__z")),
      "correlated: column names starting with __z are reserved for the " +
        "internal standard-normal columns (a clash would silently feed a " +
        "marginal OUTPUT back into later columns' correlation)")
    require(corr.size == k && corr.forall(_.size == k),
      s"correlated: corr must be ${k}x$k for $k columns")
    for (i <- 0 until k) {
      require(math.abs(corr(i)(i) - 1.0) < 1e-12,
        s"correlated: corr($i)($i) must be 1.0")
      for (j <- 0 until i)
        require(math.abs(corr(i)(j) - corr(j)(i)) < 1e-12,
          s"correlated: corr must be symmetric at ($i,$j)")
    }
    val L = cholesky(corr)
    val base =
      if (numPartitions > 0) spark.range(0, rows, 1, numPartitions)
      else spark.range(0, rows)
    // Materialize the iid normals as named columns first: the copula
    // re-uses each z_j across every correlated output.
    val withZ = (0 until k).foldLeft(base.toDF()) { (df, j) =>
      df.withColumn(s"__z$j", graft.functions.RandgenFunctions
        .randgen_float64_normal(lit(0.0), lit(1.0), seed + 0x9E37L * (j + 1)))
    }
    val out = cols.zipWithIndex.foldLeft(withZ) {
      case (df, ((name, gen), i)) =>
        val y = (0 to i).map(j => col(s"__z$j") * lit(L(i)(j)))
          .reduce(_ + _)
        df.withColumn(name, copulaMarginal(gen, y))
    }
    out.select(cols.map { case (n, _) => col(n) }: _*)
  }

  /** Driver-side Cholesky of a correlation matrix; fails fast on a
    * non-positive-definite input (|r| too close to 1, or inconsistent
    * triangles). */
  private[graft] def cholesky(r: Seq[Seq[Double]]): Array[Array[Double]] = {
    val k = r.size
    val L = Array.ofDim[Double](k, k)
    for (i <- 0 until k; j <- 0 to i) {
      val s = (0 until j).map(m => L(i)(m) * L(j)(m)).sum
      if (i == j) {
        val d = r(i)(i) - s
        require(d > 1e-12,
          s"correlated: correlation matrix not positive definite (row $i)")
        L(i)(i) = math.sqrt(d)
      } else L(i)(j) = (r(i)(j) - s) / L(j)(j)
    }
    L
  }

  /** Abramowitz–Stegun 7.1.26 erf (|error| < 1.5e-7) over built-in
    * functions only — keeps the whole copula inside codegen. */
  private def erfApprox(x: Column): Column = {
    def pos(ax: Column): Column = {
      val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * ax)
      val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t +
        lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
      lit(1.0) - poly * exp(-(ax * ax))
    }
    when(x >= 0, pos(x)).otherwise(-pos(-x))
  }

  /** Standard normal CDF Φ, clamped away from exact 0/1 so inverse CDFs
    * with log/tan stay finite in the extreme tails. */
  private def phi(y: Column): Column = {
    val u = lit(0.5) * (lit(1.0) + erfApprox(y / lit(math.sqrt(2.0))))
    least(lit(1.0 - 1e-12),
      org.apache.spark.sql.functions.greatest(lit(1e-12), u))
  }

  /** Closed-form inverse-CDF application of `gen` to the correlated
    * standard normal `y` (Gaussian copula). */
  private def copulaMarginal(gen: Gen, y: Column): Column = gen match {
    case Gen.Float64Normal(mean, std) => lit(mean) + lit(std) * y
    case Gen.Float64Lognormal(mu, sigma) => exp(lit(mu) + lit(sigma) * y)
    case other =>
      val u = phi(y)
      other match {
        case Gen.Float64Uniform(lo, hi) => lit(lo) + u * lit(hi - lo)
        case Gen.Float64Exponential(lambda) =>
          -log(lit(1.0) - u) / lit(lambda)
        case Gen.Float64Pareto(scale, shape) =>
          lit(scale) * pow(lit(1.0) - u, lit(-1.0 / shape))
        case Gen.Float64Weibull(scale, shape) =>
          lit(scale) * pow(-log(lit(1.0) - u), lit(1.0 / shape))
        case Gen.Float64Laplace(mu, b) =>
          when(u < 0.5, lit(mu) + lit(b) * log(lit(2.0) * u))
            .otherwise(lit(mu) - lit(b) * log(lit(2.0) * (lit(1.0) - u)))
        case Gen.Float64Cauchy(median, scale) =>
          lit(median) + lit(scale) * tan(lit(math.Pi) * (u - lit(0.5)))
        case Gen.Int64Uniform(lo, hi) =>
          least(lit(hi), lit(lo) +
            floor(u * lit((hi - lo + 1).toDouble)).cast("long"))
        case g => throw new IllegalArgumentException(
          s"correlated: no closed-form inverse CDF for marginal $g")
      }
  }

  /** The generator Column for one spec (usable standalone via withColumn). */
  def column(gen: Gen, seed: Long): Column = gen match {
    case Gen.SeqId => col("id")
    case Gen.Int64Uniform(lo, hi) =>
      randgen_int64_uniform(lit(lo), lit(hi), seed)
    case Gen.Float64Uniform(lo, hi) =>
      randgen_float64_uniform(lit(lo), lit(hi), seed)
    case Gen.Float64Normal(mean, std) =>
      randgen_float64_normal(lit(mean), lit(std), seed)
    case Gen.Float64Exponential(lambda) =>
      randgen_float64_exponential(lit(lambda), seed)
    case Gen.Int64Zipf(n, s) =>
      randgen_int64_zipf(lit(n), lit(s), seed)
    case Gen.BoolBernoulli(p) =>
      randgen_bool_bernoulli(lit(p), seed)
    case Gen.StringAlphanum(lo, hi) =>
      randgen_string_alphanum(lit(lo), lit(hi), seed)
    case Gen.DateUniform(start, end) =>
      randgen_date_uniform(to_date(lit(start)), to_date(lit(end)), seed)
    case Gen.TimestampUniform(start, end) =>
      randgen_timestamp_uniform(
        to_timestamp(lit(start)), to_timestamp(lit(end)), seed)
    case Gen.Int64Poisson(lambda) =>
      randgen_int64_poisson(lit(lambda), seed)
    case Gen.Int64Geometric(p) =>
      randgen_int64_geometric(lit(p), seed)
    case Gen.Float64Pareto(scale, shape) =>
      randgen_float64_pareto(lit(scale), lit(shape), seed)
    case Gen.Float64Laplace(mu, b) =>
      randgen_float64_laplace(lit(mu), lit(b), seed)
    case Gen.Float64Lognormal(mu, sigma) =>
      randgen_float64_lognormal(lit(mu), lit(sigma), seed)
    case Gen.Float64Weibull(scale, shape) =>
      randgen_float64_weibull(lit(scale), lit(shape), seed)
    case Gen.Int64Binomial(n, p) =>
      randgen_int64_binomial(lit(n), lit(p), seed)
    case Gen.Float64Gamma(shape, scale) =>
      randgen_float64_gamma(lit(shape), lit(scale), seed)
    case Gen.Float64Beta(a, b) =>
      randgen_float64_beta(lit(a), lit(b), seed)
    case Gen.Float64Cauchy(median, scale) =>
      randgen_float64_cauchy(lit(median), lit(scale), seed)
    case Gen.Float64ChiSquare(df) =>
      randgen_float64_chisquare(lit(df), seed)
    case Gen.Float64StudentT(nu) =>
      randgen_float64_student_t(lit(nu), seed)
    case Gen.Choice(values) =>
      randgen_choice(
        org.apache.spark.sql.functions.array(values.map(lit): _*), seed)
    case Gen.ChoiceWeighted(values, weights) =>
      randgen_choice_weighted(
        org.apache.spark.sql.functions.array(values.map(lit): _*),
        org.apache.spark.sql.functions.array(weights.map(lit): _*), seed)
    case Gen.Uuid => randgen_uuid(seed)
    case Gen.ArrayUnitVector(dim) =>
      randgen_array_unit_vector(lit(dim), seed)
    case Gen.ArrayDirichlet(alphas) =>
      randgen_array_dirichlet(
        org.apache.spark.sql.functions.array(alphas.map(lit): _*), seed)
    case Gen.Nullable(inner, p) =>
      // The null gate draws from a decorrelated stream so it doesn't
      // perturb the inner generator's sequence.
      org.apache.spark.sql.functions
        .when(randgen_bool_bernoulli(lit(p), seed ^ 0x5DEECE66DL), lit(null))
        .otherwise(column(inner, seed))
    case Gen.SqlExpr(sql) => expr(sql)
  }
}
