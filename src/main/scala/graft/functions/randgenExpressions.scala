package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * The `randgen_*` generator family: volatile scalar generator expressions,
 * Spark-native.
 *
 * The reference ships one such operator, `randgen_int64_uniform`
 * (`/root/reference/src/randgen/int64_uniform.rs:17-153`), plus an empty
 * `macros.rs` placeholder showing the intent of a `{type}_{distribution}`
 * *family* (`/root/reference/src/randgen/mod.rs:1-2`, SURVEY.md §2.4). We
 * realize the family as a shared [[RandgenExpression]] base trait + one
 * small case class per generator.
 *
 * Design notes (SURVEY.md §1.3, §2.1):
 *  - The reference's 4-way const/array columnar dispatch
 *    (`int64_uniform.rs:68-91`) collapses to a single row-wise expression
 *    under Catalyst; literal vs column arguments need no special casing.
 *  - `Volatility::Volatile` (`int64_uniform.rs:23`) maps to
 *    [[Nondeterministic]] (`deterministic = false`): blocks constant
 *    folding, CSE, and predicate pushdown through the expression.
 *  - Null-in => null-out for every argument shape
 *    (`int64_uniform.rs:95-104,110-111,127-128`): the shared eval/codegen
 *    helpers implement exactly that.
 *  - min > max fails the query (reference panics at
 *    `int64_uniform.rs:99`): [[GraftRandom]] throws.
 *  - Unlike the reference's unseeded RNG (`int64_uniform.rs:98`) we seed
 *    per (expression, partition) so task retries are stable; the SQL
 *    surface accepts an optional trailing seed literal.
 */
trait RandgenExpression extends Expression with Nondeterministic {

  /** Per-expression seed, fixed at analysis time (like Spark's `rand`). */
  def seed: Long

  @transient protected[this] var rng: GraftRandom = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new GraftRandom(seed, partitionIndex)

  override def nullable: Boolean = true

  /** Adds a partition-initialized GraftRandom field to the generated class. */
  protected final def rngTerm(ctx: CodegenContext): String = {
    val cls = classOf[GraftRandom].getName
    val term = ctx.addMutableState(cls, "graftRng")
    ctx.addPartitionInitializationStatement(
      s"$term = new $cls(${seed}L, partitionIndex);")
    term
  }
}

/** Shared shape for two-argument generators: null-safe eval + codegen. */
trait RandgenBinary extends BinaryExpression with RandgenExpression
    with ImplicitCastInputTypes {

  /** Row-level sample from the two non-null argument values. */
  protected def sample(a: Any, b: Any): Any

  /** Java call on the generated rng term, e.g. `nextLongInclusive(a, b)`. */
  protected def sampleCode(term: String, a: String, b: String): String

  override protected def evalInternal(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) null
    else {
      val b = right.eval(input)
      if (b == null) null else sample(a, b)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val term = rngTerm(ctx)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = ${sampleCode(term, a, b)};")
  }
}

/** Shared shape for one-argument generators. */
trait RandgenUnary extends UnaryExpression with RandgenExpression
    with ImplicitCastInputTypes {

  protected def sample(a: Any): Any
  protected def sampleCode(term: String, a: String): String

  override protected def evalInternal(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) null else sample(a)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val term = rngTerm(ctx)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = ${sampleCode(term, a)};")
  }
}

/** Shared shape for three-argument generators. */
trait RandgenTernary extends TernaryExpression with RandgenExpression
    with ImplicitCastInputTypes {

  protected def sample(a: Any, b: Any, c: Any): Any
  protected def sampleCode(term: String, a: String, b: String, c: String): String

  override protected def evalInternal(input: InternalRow): Any = {
    val a = first.eval(input)
    if (a == null) null
    else {
      val b = second.eval(input)
      if (b == null) null
      else {
        val c = third.eval(input)
        if (c == null) null else sample(a, b, c)
      }
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val term = rngTerm(ctx)
    nullSafeCodeGen(ctx, ev,
      (a, b, c) => s"${ev.value} = ${sampleCode(term, a, b, c)};")
  }
}

/**
 * `randgen_int64_uniform(min, max [, seed])` — discrete uniform on the
 * inclusive range [min, max]. The reference's sole operator
 * (`/root/reference/src/randgen/int64_uniform.rs:17-153`).
 */
case class RandgenInt64Uniform(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "randgen_int64_uniform"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextLongInclusive(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextLongInclusive($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_uniform(lo, hi [, seed])` — continuous uniform [lo, hi). */
case class RandgenFloat64Uniform(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_uniform"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextDoubleUniform(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextDoubleUniform($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_normal(mean, std [, seed])` — gaussian. */
case class RandgenFloat64Normal(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_normal"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextGaussian(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextGaussian($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_normal_pair(rho [, seed])` — correlated standard-normal
  * pair `array(z1, z2)` with corr(z1, z2) = rho ∈ [-1, 1] (Cholesky of the
  * 2x2 correlation matrix). Scale/shift the margins in plain SQL
  * (`mu + sigma * z[i]`), so the one expression covers every bivariate
  * parameterization — the family's first MULTIVARIATE generator. */
case class RandgenFloat64NormalPair(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "randgen_float64_normal_pair"
  override protected def sample(a: Any): Any =
    rng.nextGaussianPair(a.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextGaussianPair($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_float64_exponential(lambda [, seed])` — exponential, rate λ > 0. */
case class RandgenFloat64Exponential(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_exponential"
  override protected def sample(a: Any): Any =
    rng.nextExponential(a.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextExponential($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_int64_zipf(n, s [, seed])` — Zipf rank in [1, n], exponent s. */
case class RandgenInt64Zipf(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(LongType, DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "randgen_int64_zipf"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextZipf(a.asInstanceOf[Long], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextZipf($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_bool_bernoulli(p [, seed])` — true with probability p. */
case class RandgenBoolBernoulli(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "randgen_bool_bernoulli"
  override protected def sample(a: Any): Any =
    rng.nextBernoulli(a.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextBernoulli($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * `randgen_string_alphanum(len_min, len_max [, seed])` — random [a-zA-Z0-9]
 * string, length uniform on the inclusive range.
 */
case class RandgenStringAlphanum(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "randgen_string_alphanum"
  override protected def sample(a: Any, b: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      rng.nextAlphanumeric(a.asInstanceOf[Long], b.asInstanceOf[Long]))
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"$t.nextAlphanumeric($a, $b))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/**
 * `randgen_date_uniform(start, end [, seed])` — uniform DATE on the
 * inclusive range (dates are day counts internally, so this is exactly
 * int64_uniform narrowed to int).
 */
case class RandgenDateUniform(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DateType, DateType)
  override def dataType: DataType = DateType
  override def prettyName: String = "randgen_date_uniform"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextLongInclusive(a.asInstanceOf[Int].toLong,
      b.asInstanceOf[Int].toLong).toInt
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"(int) $t.nextLongInclusive((long) $a, (long) $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/**
 * `randgen_timestamp_uniform(start, end [, seed])` — uniform TIMESTAMP on
 * the inclusive range (microsecond precision internally).
 */
case class RandgenTimestampUniform(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(TimestampType, TimestampType)
  override def dataType: DataType = TimestampType
  override def prettyName: String = "randgen_timestamp_uniform"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextLongInclusive(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextLongInclusive($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_int64_poisson(lambda [, seed])` — Poisson counts, λ > 0. */
case class RandgenInt64Poisson(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "randgen_int64_poisson"
  override protected def sample(a: Any): Any =
    rng.nextPoisson(a.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextPoisson($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_int64_geometric(p [, seed])` — failures before first success. */
case class RandgenInt64Geometric(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "randgen_int64_geometric"
  override protected def sample(a: Any): Any =
    rng.nextGeometric(a.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextGeometric($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_float64_pareto(scale, shape [, seed])` — heavy-tailed sizes. */
case class RandgenFloat64Pareto(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_pareto"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextPareto(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextPareto($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_laplace(mu, b [, seed])` — double exponential. */
case class RandgenFloat64Laplace(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_laplace"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextLaplace(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextLaplace($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_lognormal(mu, sigma [, seed])` — exp(Normal(mu, sigma)):
  * multiplicative sizes (file/document lengths, durations). Completes the
  * `rand_distr` trio the reference's dependency exposes but its family
  * lacked (`/root/reference/Cargo.toml:15`). */
case class RandgenFloat64Lognormal(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_lognormal"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextLogNormal(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextLogNormal($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_weibull(scale, shape [, seed])` — lifetime/latency
  * tails; shape 1 degenerates to exponential(1/scale). */
case class RandgenFloat64Weibull(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_weibull"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextWeibull(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextWeibull($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_int64_binomial(n, p [, seed])` — successes in n trials. */
case class RandgenInt64Binomial(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(LongType, DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "randgen_int64_binomial"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextBinomial(a.asInstanceOf[Long], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextBinomial($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_gamma(shape, scale [, seed])` — waiting times, rate
  * priors; Marsaglia–Tsang rejection (see GraftRandom.nextGamma). Completes
  * the `rand_distr 0.5.1` tail with beta/cauchy/chi-square/student-t
  * (`/root/reference/Cargo.toml:15`). */
case class RandgenFloat64Gamma(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_gamma"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextGamma(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextGamma($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_beta(a, b [, seed])` — proportions/rates on (0, 1). */
case class RandgenFloat64Beta(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_beta"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextBeta(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextBeta($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_cauchy(median, scale [, seed])` — momentless heavy
  * tails (resonance noise, adversarial outlier injection). */
case class RandgenFloat64Cauchy(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_cauchy"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextCauchy(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextCauchy($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_chisquare(df [, seed])` — Gamma(df/2, 2); goodness-of-
  * fit noise, variance priors. Non-integer df allowed. */
case class RandgenFloat64ChiSquare(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_chisquare"
  override protected def sample(a: Any): Any =
    rng.nextChiSquare(a.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextChiSquare($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_float64_student_t(nu [, seed])` — Z/sqrt(ChiSq(ν)/ν). */
case class RandgenFloat64StudentT(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_student_t"
  override protected def sample(a: Any): Any =
    rng.nextStudentT(a.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextStudentT($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_float64_gumbel(mu, beta [, seed])` — max-extreme-value law
  * (block maxima); location mu, scale beta > 0. */
case class RandgenFloat64Gumbel(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_gumbel"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextGumbel(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextGumbel($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_frechet(shape, scale [, seed])` — heavy-tailed
  * max-extreme-value law; k-th moments exist only for k < shape. Location
  * shifts are additive — apply in SQL. */
case class RandgenFloat64Frechet(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_frechet"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextFrechet(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextFrechet($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_fisher_f(d1, d2 [, seed])` — variance-ratio law,
  * (ChiSq(d1)/d1)/(ChiSq(d2)/d2). */
case class RandgenFloat64FisherF(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_fisher_f"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextFisherF(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextFisherF($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_inverse_gaussian(mu, lambda [, seed])` — Wald
  * first-passage-time law; mean mu, variance mu^3/lambda. */
case class RandgenFloat64InverseGaussian(left: Expression, right: Expression,
    seed: Long) extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_inverse_gaussian"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextInverseGaussian(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextInverseGaussian($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_int64_negative_binomial(r, p [, seed])` — failures before the
  * r-th success (r real-valued via the Gamma–Poisson mixture):
  * overdispersed count data. */
case class RandgenInt64NegativeBinomial(left: Expression, right: Expression,
    seed: Long) extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "randgen_int64_negative_binomial"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextNegativeBinomial(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextNegativeBinomial($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_float64_triangular(min, max, mode [, seed])` — bounded
  * three-point estimate. */
case class RandgenFloat64Triangular(first: Expression, second: Expression,
    third: Expression, seed: Long) extends RandgenTernary {
  override def inputTypes = Seq(DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_triangular"
  override protected def sample(a: Any, b: Any, c: Any): Any =
    rng.nextTriangular(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String,
      c: String): String = s"$t.nextTriangular($a, $b, $c)"
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(first = a, second = b, third = c)
}

/** `randgen_int64_hypergeometric(n_total, k_success, n_draws [, seed])` —
  * successes in draws WITHOUT replacement. */
case class RandgenInt64Hypergeometric(first: Expression, second: Expression,
    third: Expression, seed: Long) extends RandgenTernary {
  override def inputTypes = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "randgen_int64_hypergeometric"
  override protected def sample(a: Any, b: Any, c: Any): Any =
    rng.nextHypergeometric(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])
  override protected def sampleCode(t: String, a: String, b: String,
      c: String): String = s"$t.nextHypergeometric($a, $b, $c)"
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(first = a, second = b, third = c)
}

/** `randgen_float64_skew_normal(location, scale, alpha [, seed])` —
  * Azzalini skew-normal; alpha = 0 degenerates to the normal. */
case class RandgenFloat64SkewNormal(first: Expression, second: Expression,
    third: Expression, seed: Long) extends RandgenTernary {
  override def inputTypes = Seq(DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_skew_normal"
  override protected def sample(a: Any, b: Any, c: Any): Any =
    rng.nextSkewNormal(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String,
      c: String): String = s"$t.nextSkewNormal($a, $b, $c)"
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(first = a, second = b, third = c)
}

/** `randgen_int64_zeta(s [, seed])` — unbounded power-law rank,
  * P(X = k) = k^-s / zeta(s); s > 1. */
case class RandgenInt64Zeta(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "randgen_int64_zeta"
  override protected def sample(a: Any): Any =
    rng.nextZeta(a.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextZeta($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_float64_pert(min, max, mode [, seed])` — the smooth three-point
  * estimate (`rand_distr::Pert::new`, shape fixed at 4): a stretched
  * Beta(1 + 4(mode-min)/range, 1 + 4(max-mode)/range) with mean exactly
  * (min + 4·mode + max)/6. Fails fast unless min < mode < max. */
case class RandgenFloat64Pert(first: Expression, second: Expression,
    third: Expression, seed: Long) extends RandgenTernary {
  override def inputTypes = Seq(DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_pert"
  override protected def sample(a: Any, b: Any, c: Any): Any =
    rng.nextPert(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String,
      c: String): String = s"$t.nextPert($a, $b, $c)"
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(first = a, second = b, third = c)
}

/** `randgen_float64_nig(alpha, beta [, seed])` — NormalInverseGaussian with
  * tail alpha > 0, asymmetry |beta| < alpha (standard mu = 0, delta = 1, as
  * `rand_distr::NormalInverseGaussian::new`); affine shifts go in SQL.
  * Completes the `rand_distr 0.5` surface
  * (`/root/reference/Cargo.toml:15`). */
case class RandgenFloat64Nig(left: Expression, right: Expression, seed: Long)
    extends RandgenBinary {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "randgen_float64_nig"
  override protected def sample(a: Any, b: Any): Any =
    rng.nextNormalInverseGaussian(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def sampleCode(t: String, a: String, b: String): String =
    s"$t.nextNormalInverseGaussian($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `randgen_array_dirichlet(alphas [, seed])` — point on the probability
  * simplex, Gamma-normalization sampling (`rand_distr::Dirichlet`); the
  * mixture-weights / topic-proportions generator. Element i has a
  * Beta(alpha_i, alpha_0 - alpha_i) marginal; components sum to 1. */
case class RandgenArrayDirichlet(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "randgen_array_dirichlet"
  override protected def sample(a: Any): Any =
    rng.nextDirichlet(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextDirichlet($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_array_unit_vector(dim [, seed])` — uniform direction on the
  * unit (dim-1)-sphere (normalized i.i.d. gaussians, Muller 1959);
  * dim 2/3 are `rand_distr::UnitCircle`/`UnitSphere`, higher dim is the
  * synthetic-embedding direction sampler. */
case class RandgenArrayUnitVector(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "randgen_array_unit_vector"
  override protected def sample(a: Any): Any =
    rng.nextUnitVector(a.asInstanceOf[Int])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextUnitVector($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_array_unit_ball(dim [, seed])` — uniform point INSIDE the unit
  * dim-ball (direction scaled by U^(1/dim)); dim 2/3 are
  * `rand_distr::UnitDisc`/`UnitBall`. */
case class RandgenArrayUnitBall(child: Expression, seed: Long)
    extends RandgenUnary {
  override def inputTypes = Seq(IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "randgen_array_unit_ball"
  override protected def sample(a: Any): Any =
    rng.nextUnitBall(a.asInstanceOf[Int])
  override protected def sampleCode(t: String, a: String): String =
    s"$t.nextUnitBall($a)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `randgen_uuid([seed])` — RFC 4122 v4-format UUID string, drawn from the
  * seeded per-partition stream (reproducible + retry-stable, unlike
  * java.util.UUID.randomUUID). Zero-argument leaf generator. */
case class RandgenUuid(seed: Long) extends LeafExpression with RandgenExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "randgen_uuid"
  override protected def evalInternal(input: InternalRow): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(rng.nextUuidString())
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val term = rngTerm(ctx)
    ev.copy(
      code = code"""
        final UTF8String ${ev.value} =
          UTF8String.fromString($term.nextUuidString());""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

/**
 * `randgen_choice_weighted(arr, weights [, seed])` — element of `arr`
 * picked with probability weights[i]/sum(weights); null for null inputs;
 * preserves element nulls. Errors on negative weights or a non-positive
 * sum (fail-fast, matching the family's bounds contract).
 */
case class RandgenChoiceWeighted(left: Expression, right: Expression, seed: Long)
    extends BinaryExpression with RandgenExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType, ArrayType(DoubleType))
  override def dataType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  override def prettyName: String = "randgen_choice_weighted"

  override protected def evalInternal(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val w = right.eval(input)
    if (w == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ws = w.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != ws.numElements()) {
      throw new IllegalArgumentException(
        s"randgen_choice_weighted: ${arr.numElements()} values vs " +
          s"${ws.numElements()} weights")
    }
    val i = rng.nextWeightedIndex(ws)
    if (arr.isNullAt(i)) null else arr.get(i, dataType)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val term = rngTerm(ctx)
    nullSafeCodeGen(ctx, ev, (arr, ws) => {
      val i = ctx.freshName("wIdx")
      s"""
         |if ($arr.numElements() != $ws.numElements()) {
         |  throw new IllegalArgumentException(
         |    "randgen_choice_weighted: values/weights length mismatch");
         |}
         |int $i = $term.nextWeightedIndex($ws);
         |if ($arr.isNullAt($i)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${CodeGenerator.getValue(arr, dataType, i)};
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/**
 * `randgen_choice(arr [, seed])` — uniformly random element of the array
 * argument; null for null or empty arrays; preserves element nulls.
 */
case class RandgenChoice(child: Expression, seed: Long)
    extends UnaryExpression with RandgenExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType)
  override def dataType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def prettyName: String = "randgen_choice"

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      if (n == 0) null
      else {
        val i = rng.nextLongInclusive(0, n - 1).toInt
        if (arr.isNullAt(i)) null else arr.get(i, dataType)
      }
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val term = rngTerm(ctx)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("choiceIdx")
      s"""
         |if ($arr.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = (int) $term.nextLongInclusive(0L, $arr.numElements() - 1L);
         |  if ($arr.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = ${CodeGenerator.getValue(arr, dataType, i)};
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
