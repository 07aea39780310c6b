package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/**
 * Registration + Column API for the `randgen_*` family — the Spark
 * counterpart of the reference's `add_udfs(&mut SessionContext)` entry
 * point (`/root/reference/src/lib.rs:8-10`), which installs every randgen
 * UDF into a session's function registry keyed by name
 * (`/root/reference/src/randgen/int64_uniform.rs:45-47`).
 *
 * Every SQL surface accepts an optional trailing foldable BIGINT seed:
 * `randgen_int64_uniform(min, max)` draws a fresh seed at analysis time
 * (like Spark's `rand()`), `randgen_int64_uniform(min, max, 42)` is
 * reproducible per (seed, partition).
 */
object RandgenFunctions {

  private def freshSeed(): Long = scala.util.Random.nextLong()

  private def seedOf(name: String, e: Expression): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$name: seed argument must be an integer literal, got $other")
  }

  private def arity2(name: String, mk: (Expression, Expression, Long) => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { (args: Seq[Expression]) =>
      args match {
        case Seq(a, b) => mk(a, b, freshSeed())
        case Seq(a, b, s) => mk(a, b, seedOf(name, s))
        case _ => throw new IllegalArgumentException(
          s"$name expects 2 arguments plus an optional seed, got ${args.length}")
      }
    }

  private def arity0(name: String, mk: Long => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { (args: Seq[Expression]) =>
      args match {
        case Seq() => mk(freshSeed())
        case Seq(s) => mk(seedOf(name, s))
        case _ => throw new IllegalArgumentException(
          s"$name expects 0 arguments plus an optional seed, got ${args.length}")
      }
    }

  private def arity1(name: String, mk: (Expression, Long) => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { (args: Seq[Expression]) =>
      args match {
        case Seq(a) => mk(a, freshSeed())
        case Seq(a, s) => mk(a, seedOf(name, s))
        case _ => throw new IllegalArgumentException(
          s"$name expects 1 argument plus an optional seed, got ${args.length}")
      }
    }

  private def arity3(name: String,
      mk: (Expression, Expression, Expression, Long) => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { (args: Seq[Expression]) =>
      args match {
        case Seq(a, b, c) => mk(a, b, c, freshSeed())
        case Seq(a, b, c, s) => mk(a, b, c, seedOf(name, s))
        case _ => throw new IllegalArgumentException(
          s"$name expects 3 arguments plus an optional seed, got ${args.length}")
      }
    }

  /** Name -> expression builder for every generator in the family. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    arity2("randgen_int64_uniform", RandgenInt64Uniform.apply),
    arity2("randgen_float64_uniform", RandgenFloat64Uniform.apply),
    arity2("randgen_float64_normal", RandgenFloat64Normal.apply),
    arity1("randgen_float64_normal_pair", RandgenFloat64NormalPair.apply),
    arity1("randgen_float64_exponential", RandgenFloat64Exponential.apply),
    arity2("randgen_int64_zipf", RandgenInt64Zipf.apply),
    arity1("randgen_bool_bernoulli", RandgenBoolBernoulli.apply),
    arity2("randgen_string_alphanum", RandgenStringAlphanum.apply),
    arity2("randgen_date_uniform", RandgenDateUniform.apply),
    arity2("randgen_timestamp_uniform", RandgenTimestampUniform.apply),
    arity1("randgen_choice", RandgenChoice.apply),
    arity1("randgen_int64_poisson", RandgenInt64Poisson.apply),
    arity1("randgen_int64_geometric", RandgenInt64Geometric.apply),
    arity2("randgen_float64_pareto", RandgenFloat64Pareto.apply),
    arity2("randgen_float64_laplace", RandgenFloat64Laplace.apply),
    arity2("randgen_float64_lognormal", RandgenFloat64Lognormal.apply),
    arity2("randgen_float64_weibull", RandgenFloat64Weibull.apply),
    arity2("randgen_int64_binomial", RandgenInt64Binomial.apply),
    arity2("randgen_float64_gamma", RandgenFloat64Gamma.apply),
    arity2("randgen_float64_beta", RandgenFloat64Beta.apply),
    arity2("randgen_float64_cauchy", RandgenFloat64Cauchy.apply),
    arity1("randgen_float64_chisquare", RandgenFloat64ChiSquare.apply),
    arity1("randgen_float64_student_t", RandgenFloat64StudentT.apply),
    arity0("randgen_uuid", RandgenUuid.apply),
    arity2("randgen_choice_weighted", RandgenChoiceWeighted.apply),
    arity2("randgen_float64_gumbel", RandgenFloat64Gumbel.apply),
    arity2("randgen_float64_frechet", RandgenFloat64Frechet.apply),
    arity2("randgen_float64_fisher_f", RandgenFloat64FisherF.apply),
    arity2("randgen_float64_inverse_gaussian", RandgenFloat64InverseGaussian.apply),
    arity2("randgen_int64_negative_binomial", RandgenInt64NegativeBinomial.apply),
    arity3("randgen_float64_triangular", RandgenFloat64Triangular.apply),
    arity3("randgen_int64_hypergeometric", RandgenInt64Hypergeometric.apply),
    arity3("randgen_float64_skew_normal", RandgenFloat64SkewNormal.apply),
    arity1("randgen_int64_zeta", RandgenInt64Zeta.apply),
    arity3("randgen_float64_pert", RandgenFloat64Pert.apply),
    arity2("randgen_float64_nig", RandgenFloat64Nig.apply),
    arity1("randgen_array_dirichlet", RandgenArrayDirichlet.apply),
    arity1("randgen_array_unit_vector", RandgenArrayUnitVector.apply),
    arity1("randgen_array_unit_ball", RandgenArrayUnitBall.apply),
  )

  /** Installs the whole family as temp functions in `spark`'s session. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = GraftSqlBridge.functionRegistry(spark)
    all.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  // ---- Column API (no registration needed) --------------------------------

  private def col(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(c: Column): Expression = GraftSqlBridge.expression(c)

  def randgen_int64_uniform(min: Column, max: Column): Column =
    col(RandgenInt64Uniform(ex(min), ex(max), freshSeed()))
  def randgen_int64_uniform(min: Column, max: Column, seed: Long): Column =
    col(RandgenInt64Uniform(ex(min), ex(max), seed))

  def randgen_float64_uniform(lo: Column, hi: Column, seed: Long): Column =
    col(RandgenFloat64Uniform(ex(lo), ex(hi), seed))
  def randgen_float64_normal(mean: Column, std: Column, seed: Long): Column =
    col(RandgenFloat64Normal(ex(mean), ex(std), seed))
  def randgen_float64_normal_pair(rho: Column, seed: Long): Column =
    col(RandgenFloat64NormalPair(ex(rho), seed))
  def randgen_float64_exponential(lambda: Column, seed: Long): Column =
    col(RandgenFloat64Exponential(ex(lambda), seed))
  def randgen_int64_zipf(n: Column, s: Column, seed: Long): Column =
    col(RandgenInt64Zipf(ex(n), ex(s), seed))
  def randgen_bool_bernoulli(p: Column, seed: Long): Column =
    col(RandgenBoolBernoulli(ex(p), seed))
  def randgen_string_alphanum(lenMin: Column, lenMax: Column, seed: Long): Column =
    col(RandgenStringAlphanum(ex(lenMin), ex(lenMax), seed))
  def randgen_date_uniform(start: Column, end: Column, seed: Long): Column =
    col(RandgenDateUniform(ex(start), ex(end), seed))
  def randgen_timestamp_uniform(start: Column, end: Column, seed: Long): Column =
    col(RandgenTimestampUniform(ex(start), ex(end), seed))
  def randgen_choice(arr: Column, seed: Long): Column =
    col(RandgenChoice(ex(arr), seed))
  def randgen_int64_poisson(lambda: Column, seed: Long): Column =
    col(RandgenInt64Poisson(ex(lambda), seed))
  def randgen_int64_geometric(p: Column, seed: Long): Column =
    col(RandgenInt64Geometric(ex(p), seed))
  def randgen_float64_pareto(scale: Column, shape: Column, seed: Long): Column =
    col(RandgenFloat64Pareto(ex(scale), ex(shape), seed))
  def randgen_float64_laplace(mu: Column, b: Column, seed: Long): Column =
    col(RandgenFloat64Laplace(ex(mu), ex(b), seed))
  def randgen_float64_lognormal(mu: Column, sigma: Column, seed: Long): Column =
    col(RandgenFloat64Lognormal(ex(mu), ex(sigma), seed))
  def randgen_float64_weibull(scale: Column, shape: Column, seed: Long): Column =
    col(RandgenFloat64Weibull(ex(scale), ex(shape), seed))
  def randgen_int64_binomial(n: Column, p: Column, seed: Long): Column =
    col(RandgenInt64Binomial(ex(n), ex(p), seed))
  def randgen_float64_gamma(shape: Column, scale: Column, seed: Long): Column =
    col(RandgenFloat64Gamma(ex(shape), ex(scale), seed))
  def randgen_float64_beta(a: Column, b: Column, seed: Long): Column =
    col(RandgenFloat64Beta(ex(a), ex(b), seed))
  def randgen_float64_cauchy(median: Column, scale: Column, seed: Long): Column =
    col(RandgenFloat64Cauchy(ex(median), ex(scale), seed))
  def randgen_float64_chisquare(df: Column, seed: Long): Column =
    col(RandgenFloat64ChiSquare(ex(df), seed))
  def randgen_float64_student_t(nu: Column, seed: Long): Column =
    col(RandgenFloat64StudentT(ex(nu), seed))
  def randgen_uuid(seed: Long): Column = col(RandgenUuid(seed))
  def randgen_choice_weighted(arr: Column, weights: Column, seed: Long): Column =
    col(RandgenChoiceWeighted(ex(arr), ex(weights), seed))
  def randgen_float64_gumbel(mu: Column, beta: Column, seed: Long): Column =
    col(RandgenFloat64Gumbel(ex(mu), ex(beta), seed))
  def randgen_float64_frechet(shape: Column, scale: Column, seed: Long): Column =
    col(RandgenFloat64Frechet(ex(shape), ex(scale), seed))
  def randgen_float64_fisher_f(d1: Column, d2: Column, seed: Long): Column =
    col(RandgenFloat64FisherF(ex(d1), ex(d2), seed))
  def randgen_float64_inverse_gaussian(mu: Column, lambda: Column,
      seed: Long): Column =
    col(RandgenFloat64InverseGaussian(ex(mu), ex(lambda), seed))
  def randgen_int64_negative_binomial(r: Column, p: Column, seed: Long): Column =
    col(RandgenInt64NegativeBinomial(ex(r), ex(p), seed))
  def randgen_float64_triangular(min: Column, max: Column, mode: Column,
      seed: Long): Column =
    col(RandgenFloat64Triangular(ex(min), ex(max), ex(mode), seed))
  def randgen_int64_hypergeometric(nTotal: Column, kSuccess: Column,
      nDraws: Column, seed: Long): Column =
    col(RandgenInt64Hypergeometric(ex(nTotal), ex(kSuccess), ex(nDraws), seed))
  def randgen_float64_skew_normal(location: Column, scale: Column,
      alpha: Column, seed: Long): Column =
    col(RandgenFloat64SkewNormal(ex(location), ex(scale), ex(alpha), seed))
  def randgen_int64_zeta(s: Column, seed: Long): Column =
    col(RandgenInt64Zeta(ex(s), seed))
  def randgen_float64_pert(min: Column, max: Column, mode: Column,
      seed: Long): Column =
    col(RandgenFloat64Pert(ex(min), ex(max), ex(mode), seed))
  def randgen_float64_nig(alpha: Column, beta: Column, seed: Long): Column =
    col(RandgenFloat64Nig(ex(alpha), ex(beta), seed))
  def randgen_array_dirichlet(alphas: Column, seed: Long): Column =
    col(RandgenArrayDirichlet(ex(alphas), seed))
  def randgen_array_unit_vector(dim: Column, seed: Long): Column =
    col(RandgenArrayUnitVector(ex(dim), seed))
  def randgen_array_unit_ball(dim: Column, seed: Long): Column =
    col(RandgenArrayUnitBall(ex(dim), seed))
}
