package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.RandgenFunctions

/**
 * Driver-facing correctness queries for the `randgen_*` family.
 *
 * Volatile generator output cannot hash-match an oracle by value
 * (SURVEY.md §5, §7.4), so each query wraps the generator in
 * *deterministic property aggregates* — row counts, null counts, inclusive
 * bounds, and (for seeded runs) moment checks — and the DuckDB oracle is the
 * constant row those properties must equal. This turns every reference test
 * shape (`/root/reference/src/randgen/int64_uniform.rs:155-276`) into a
 * hash-matchable entry in the driver's correctness gate.
 */
object GeneratorQueries {

  private def sql(q: String)(spark: SparkSession, dir: String): DataFrame = {
    RandgenFunctions.registerAll(spark)
    spark.sql(q)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference bounds test #1: const/const (int64_uniform.rs:166-178).
    "gen_int64_uniform_bounds" -> sql(
      """SELECT count(*) AS n, count(x) AS n_nonnull,
        |       CAST(min(x) >= 1 AND max(x) <= 10 AS BOOLEAN) AS in_bounds
        |FROM (SELECT randgen_int64_uniform(1, 10) AS x FROM range(1, 101))
        |""".stripMargin) _,
    // Reference bounds test #4: array/array via chained subquery
    // (int64_uniform.rs:205-220).
    "gen_int64_uniform_chained" -> sql(
      """SELECT count(*) AS n, count(x) AS n_nonnull,
        |       CAST(min(x) >= 1 AND max(x) <= 20 AS BOOLEAN) AS in_bounds
        |FROM (SELECT randgen_int64_uniform(a, b) AS x FROM
        |       (SELECT randgen_int64_uniform(1, 10) AS a,
        |               randgen_int64_uniform(11, 20) AS b FROM range(1, 101)))
        |""".stripMargin) _,
    // Reference null tests (int64_uniform.rs:222-275): all five shapes.
    "gen_int64_uniform_nulls" -> sql(
      """SELECT count(*) AS n,
        |       count(a) AS nn_a, count(b) AS nn_b, count(c) AS nn_c,
        |       count(d) AS nn_d, count(e) AS nn_e
        |FROM (SELECT
        |  randgen_int64_uniform(1, CAST(NULL AS BIGINT)) AS a,
        |  randgen_int64_uniform(randgen_int64_uniform(1, 10),
        |                        CAST(NULL AS BIGINT)) AS b,
        |  randgen_int64_uniform(CAST(NULL AS BIGINT),
        |                        CAST(NULL AS BIGINT)) AS c,
        |  randgen_int64_uniform(CAST(NULL AS BIGINT), 10) AS d,
        |  randgen_int64_uniform(CAST(NULL AS BIGINT),
        |                        randgen_int64_uniform(11, 20)) AS e
        |  FROM range(1, 101))
        |""".stripMargin) _,
    // Seeded determinism + uniform moments: avg of U[0,9] over 100k draws.
    "gen_int64_uniform_moments" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(avg(x) - 4.5) < 0.1 AS BOOLEAN) AS mean_ok,
        |       CAST(count(DISTINCT x) = 10 AS BOOLEAN) AS support_ok
        |FROM (SELECT randgen_int64_uniform(0, 9, 123) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    "gen_float64_uniform_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 2.0 AND max(x) < 5.0 AS BOOLEAN) AS in_bounds,
        |       CAST(abs(avg(x) - 3.5) < 0.05 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_float64_uniform(2.0, 5.0, 7) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    "gen_float64_normal_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(avg(x) - 10.0) < 0.05 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(stddev_samp(x) - 2.0) < 0.05 AS BOOLEAN) AS std_ok
        |FROM (SELECT randgen_float64_normal(10.0, 2.0, 11) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Bivariate correlated normal: standard margins AND the requested
    // correlation reproduced empirically (100k pairs — corr estimator
    // sd ~ (1-rho^2)/sqrt(n) ~ 0.0016, so 0.03 is a ~19-sigma band).
    "gen_normal_pair_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(avg(z1)) < 0.05 AND abs(avg(z2)) < 0.05
        |            AS BOOLEAN) AS means_ok,
        |       CAST(abs(stddev_samp(z1) - 1.0) < 0.05 AND
        |            abs(stddev_samp(z2) - 1.0) < 0.05 AS BOOLEAN) AS stds_ok,
        |       CAST(abs(corr(z1, z2) - 0.7) < 0.03 AS BOOLEAN) AS corr_ok
        |FROM (SELECT element_at(z, 1) AS z1, element_at(z, 2) AS z2
        |      FROM (SELECT randgen_float64_normal_pair(0.7, 37) AS z
        |            FROM range(1, 100001)))
        |""".stripMargin) _,
    "gen_float64_exponential_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 0.0 AS BOOLEAN) AS nonneg,
        |       CAST(abs(avg(x) - 0.5) < 0.02 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_float64_exponential(2.0, 13) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Zipf: support in [1, 50]; rank 1 strictly most frequent at s=1.2.
    "gen_int64_zipf_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 1 AND max(x) <= 50 AS BOOLEAN) AS in_bounds,
        |       CAST(sum(CASE WHEN x = 1 THEN 1 ELSE 0 END) >
        |            sum(CASE WHEN x = 2 THEN 1 ELSE 0 END) AS BOOLEAN) AS head_heavier
        |FROM (SELECT randgen_int64_zipf(50, 1.2, 17) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    "gen_bool_bernoulli_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(avg(CASE WHEN x THEN 1.0 ELSE 0.0 END) - 0.3) < 0.01
        |            AS BOOLEAN) AS p_ok
        |FROM (SELECT randgen_bool_bernoulli(0.3, 19) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    "gen_string_alphanum_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(length(x)) >= 5 AND max(length(x)) <= 10
        |            AS BOOLEAN) AS len_ok,
        |       CAST(count(CASE WHEN x RLIKE '^[a-zA-Z0-9]*$' THEN 1 END) = 1000
        |            AS BOOLEAN) AS charset_ok
        |FROM (SELECT randgen_string_alphanum(5, 10, 23) AS x FROM range(1, 1001))
        |""".stripMargin) _,
    "gen_date_uniform_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= DATE '2020-01-01' AND
        |            max(x) <= DATE '2020-12-31' AS BOOLEAN) AS in_bounds
        |FROM (SELECT randgen_date_uniform(DATE '2020-01-01', DATE '2020-12-31', 29) AS x
        |      FROM range(1, 1001))
        |""".stripMargin) _,
    "gen_timestamp_uniform_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= TIMESTAMP '2020-01-01 00:00:00' AND
        |            max(x) <= TIMESTAMP '2020-01-02 00:00:00' AS BOOLEAN) AS in_bounds
        |FROM (SELECT randgen_timestamp_uniform(TIMESTAMP '2020-01-01 00:00:00',
        |                                       TIMESTAMP '2020-01-02 00:00:00', 31) AS x
        |      FROM range(1, 1001))
        |""".stripMargin) _,
    "gen_choice_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(count(CASE WHEN x IN ('a', 'b', 'c') THEN 1 END) = 1000
        |            AS BOOLEAN) AS members_ok,
        |       CAST(count(DISTINCT x) = 3 AS BOOLEAN) AS support_ok
        |FROM (SELECT randgen_choice(array('a', 'b', 'c'), 37) AS x FROM range(1, 1001))
        |""".stripMargin) _,
    "gen_uuid_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(count(DISTINCT x) = 10000 AS BOOLEAN) AS all_distinct,
        |       CAST(count(CASE WHEN x RLIKE
        |         '^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$'
        |         THEN 1 END) = 10000 AS BOOLEAN) AS format_ok
        |FROM (SELECT randgen_uuid(47) AS x FROM range(1, 10001))
        |""".stripMargin) _,
    "gen_choice_weighted_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(count(CASE WHEN x IN ('lo', 'mid', 'hi') THEN 1 END) = 100000
        |            AS BOOLEAN) AS members_ok,
        |       CAST(abs(count(CASE WHEN x = 'hi' THEN 1 END) / 100000.0 - 0.7)
        |            < 0.01 AS BOOLEAN) AS hi_freq_ok,
        |       CAST(abs(count(CASE WHEN x = 'lo' THEN 1 END) / 100000.0 - 0.1)
        |            < 0.01 AS BOOLEAN) AS lo_freq_ok
        |FROM (SELECT randgen_choice_weighted(array('lo', 'mid', 'hi'),
        |             array(1.0D, 2.0D, 7.0D), 53) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    "gen_int64_poisson_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 0 AS BOOLEAN) AS nonneg,
        |       CAST(abs(avg(x) - 4.0) < 0.05 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_int64_poisson(4.0, 41) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    "gen_int64_geometric_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 0 AS BOOLEAN) AS nonneg,
        |       CAST(abs(avg(x) - 3.0) < 0.1 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_int64_geometric(0.25, 43) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    "gen_float64_pareto_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 1.0 AS BOOLEAN) AS support_ok,
        |       CAST(abs(avg(x) - 1.5) < 0.05 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_float64_pareto(1.0, 3.0, 47) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    "gen_float64_laplace_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(avg(x) - 5.0) < 0.1 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(abs(x - 5.0)) - 2.0) < 0.1 AS BOOLEAN) AS scale_ok
        |FROM (SELECT randgen_float64_laplace(5.0, 2.0, 53) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Log-normal(0, 0.5): mean = exp(sigma^2/2) ~ 1.13315 (sd 0.604 ->
    // se 0.0019 over 100k; 0.02 is a ~10-sigma band), median = exp(mu) = 1.
    "gen_float64_lognormal_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) > 0.0 AS BOOLEAN) AS positive,
        |       CAST(abs(avg(x) - 1.13315) < 0.02 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(percentile(x, 0.5) - 1.0) < 0.02 AS BOOLEAN) AS median_ok
        |FROM (SELECT randgen_float64_lognormal(0.0, 0.5, 59) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Weibull(scale 2, shape 2): mean = 2*Gamma(1.5) ~ 1.77245 (sd 0.927
    // -> se 0.0029; 0.03 is ~10 sigma); median = 2*ln(2)^(1/2) ~ 1.66511.
    "gen_float64_weibull_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 0.0 AS BOOLEAN) AS nonneg,
        |       CAST(abs(avg(x) - 1.77245) < 0.03 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(percentile(x, 0.5) - 1.66511) < 0.03 AS BOOLEAN) AS median_ok
        |FROM (SELECT randgen_float64_weibull(2.0, 2.0, 61) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Binomial: x1 ~ B(40, 0.3) exercises the direct geometric-skip loop
    // (mean 12, sd 2.9 -> se 0.0092); x2 ~ B(25, 0.8) exercises the
    // p > 1/2 symmetry path (mean 20, sd 2.0 -> se 0.0063).
    "gen_int64_binomial_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x1) >= 0 AND max(x1) <= 40 AND
        |            min(x2) >= 0 AND max(x2) <= 25 AS BOOLEAN) AS in_bounds,
        |       CAST(abs(avg(x1) - 12.0) < 0.1 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(x2) - 20.0) < 0.07 AS BOOLEAN) AS mean_flip_ok
        |FROM (SELECT randgen_int64_binomial(40, 0.3, 67) AS x1,
        |             randgen_int64_binomial(25, 0.8, 71) AS x2
        |      FROM range(1, 100001))
        |""".stripMargin) _,
    // Gamma(3, 2): mean = kθ = 6 (sd = sqrt(k)·θ = 3.464 -> se 0.011;
    // 0.12 is ~10 sigma); var = kθ² = 12 (se ≈ var·sqrt((κx+2)/n) with
    // excess kurtosis 6/k = 2 -> 0.076; band 0.8).
    "gen_float64_gamma_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) > 0.0 AS BOOLEAN) AS positive,
        |       CAST(abs(avg(x) - 6.0) < 0.12 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(x * x) - avg(x) * avg(x) - 12.0) < 0.8 AS BOOLEAN) AS var_ok
        |FROM (SELECT randgen_float64_gamma(3.0, 2.0, 73) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Beta(2, 5): support (0,1), mean a/(a+b) = 2/7 ~ 0.285714 (sd 0.1597
    // -> se 0.0005; 0.006 is ~12 sigma); var = ab/((a+b)^2(a+b+1)) ~ 0.02551.
    "gen_float64_beta_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) > 0.0 AND max(x) < 1.0 AS BOOLEAN) AS in_bounds,
        |       CAST(abs(avg(x) - 0.285714) < 0.006 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(x * x) - avg(x) * avg(x) - 0.025510) < 0.002 AS BOOLEAN) AS var_ok
        |FROM (SELECT randgen_float64_beta(2.0, 5.0, 79) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Cauchy(10, 2) has NO moments — assert quantiles only: median = 10
    // (se (π·scale)/(2·sqrt(n)) ~ 0.0099; 0.1 is ~10 sigma), quartiles
    // median ± scale (se ~ 0.017; band 0.17).
    "gen_float64_cauchy_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(percentile(x, 0.5) - 10.0) < 0.1 AS BOOLEAN) AS median_ok,
        |       CAST(abs(percentile(x, 0.25) - 8.0) < 0.17 AND
        |            abs(percentile(x, 0.75) - 12.0) < 0.17 AS BOOLEAN) AS quartiles_ok
        |FROM (SELECT randgen_float64_cauchy(10.0, 2.0, 83) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // ChiSq(5): mean = df = 5 (sd sqrt(2·df) = 3.162 -> se 0.01; band 0.1),
    // var = 2·df = 10 (excess kurtosis 12/df = 2.4 -> se var 0.066; band 0.7).
    "gen_float64_chisquare_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) > 0.0 AS BOOLEAN) AS positive,
        |       CAST(abs(avg(x) - 5.0) < 0.1 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(x * x) - avg(x) * avg(x) - 10.0) < 0.7 AS BOOLEAN) AS var_ok
        |FROM (SELECT randgen_float64_chisquare(5.0, 89) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // t(8): median 0 (se 1/(2·f(0)·sqrt(n)) ~ 0.0041; band 0.04), var =
    // ν/(ν-2) = 4/3 (excess kurtosis 6/(ν-4) = 1.5 -> se var 0.0079;
    // band 0.08) — both moments exist at ν = 8.
    "gen_float64_student_t_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(percentile(x, 0.5)) < 0.04 AS BOOLEAN) AS median_ok,
        |       CAST(abs(avg(x)) < 0.04 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(x * x) - avg(x) * avg(x) - 1.333333) < 0.08 AS BOOLEAN) AS var_ok
        |FROM (SELECT randgen_float64_student_t(8.0, 97) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Gumbel(1, 2): mean = mu + beta*gamma_E ~ 2.154431 (sd = pi*beta/sqrt(6)
    // = 2.565 -> se 0.0081; band 0.09 ~ 11 sigma), median = mu - beta*ln(ln 2)
    // ~ 1.733026 (se ~ 0.0091; band 0.09).
    "gen_float64_gumbel_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(avg(x) - 2.154431) < 0.09 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(percentile(x, 0.5) - 1.733026) < 0.09 AS BOOLEAN) AS median_ok
        |FROM (SELECT randgen_float64_gumbel(1.0, 2.0, 101) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Frechet(shape 3, scale 2): support > 0; mean = 2*Gamma(2/3) ~ 2.708236
    // (sd 1.839 -> se 0.0058; band 0.08 is ~13 sigma, wide because the
    // third moment diverges at alpha = 3), median = 2*ln(2)^(-1/3) ~ 2.259895.
    "gen_float64_frechet_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) > 0.0 AS BOOLEAN) AS positive,
        |       CAST(abs(avg(x) - 2.708236) < 0.08 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(percentile(x, 0.5) - 2.259895) < 0.03 AS BOOLEAN) AS median_ok
        |FROM (SELECT randgen_float64_frechet(3.0, 2.0, 103) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // F(6, 20): mean = d2/(d2-2) ~ 1.111111 (var 0.6173 -> se 0.0025;
    // band 0.025 ~ 10 sigma); support > 0.
    "gen_float64_fisher_f_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) > 0.0 AS BOOLEAN) AS positive,
        |       CAST(abs(avg(x) - 1.111111) < 0.025 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_float64_fisher_f(6.0, 20.0, 107) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // InverseGaussian(2, 6): mean = mu = 2 (sd 1.155 -> se 0.0037; band
    // 0.04), var = mu^3/lambda = 4/3 (excess kurtosis 15*mu/lambda = 5 ->
    // se var 0.011; band 0.12); support > 0.
    "gen_float64_inverse_gaussian_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) > 0.0 AS BOOLEAN) AS positive,
        |       CAST(abs(avg(x) - 2.0) < 0.04 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(x * x) - avg(x) * avg(x) - 1.333333) < 0.12 AS BOOLEAN) AS var_ok
        |FROM (SELECT randgen_float64_inverse_gaussian(2.0, 6.0, 109) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // NegativeBinomial(5, 0.4): failures before the 5th success; mean =
    // r(1-p)/p = 7.5 (var 18.75 -> se 0.0137; band 0.14 ~ 10 sigma).
    "gen_int64_negative_binomial_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 0 AS BOOLEAN) AS nonneg,
        |       CAST(abs(avg(x) - 7.5) < 0.14 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_int64_negative_binomial(5.0, 0.4, 113) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Triangular(0, 10, mode 2): bounded support; mean = (a+b+c)/3 = 4
    // (var 14/3 -> se 0.0068; band 0.07 ~ 10 sigma).
    "gen_float64_triangular_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 0.0 AND max(x) <= 10.0 AS BOOLEAN) AS in_bounds,
        |       CAST(abs(avg(x) - 4.0) < 0.07 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_float64_triangular(0.0, 10.0, 2.0, 127) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Hypergeometric(N=50, K=20, n=10): successes without replacement;
    // bounds [0, 10]; mean = nK/N = 4 (var = 1.9592 -> se 0.0044; band 0.05).
    "gen_int64_hypergeometric_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 0 AND max(x) <= 10 AS BOOLEAN) AS in_bounds,
        |       CAST(abs(avg(x) - 4.0) < 0.05 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_int64_hypergeometric(50, 20, 10, 131) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // SkewNormal(0, 1, alpha 4): delta = 4/sqrt(17); mean = delta*sqrt(2/pi)
    // ~ 0.774062 (se 0.0020; band 0.02 ~ 10 sigma), var = 1 - 2 delta^2/pi
    // ~ 0.400828 (se var ~ 0.0020; band 0.02).
    "gen_float64_skew_normal_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(avg(x) - 0.774062) < 0.02 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(x * x) - avg(x) * avg(x) - 0.400828) < 0.02 AS BOOLEAN) AS var_ok
        |FROM (SELECT randgen_float64_skew_normal(0.0, 1.0, 4.0, 137) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Zeta(4): unbounded power-law rank; P(1) = 1/zeta(4) ~ 0.923938
    // (se 0.00084; band 0.009 ~ 10 sigma), mean = zeta(3)/zeta(4)
    // ~ 1.110627 (se 0.0017; band 0.017) — variance is finite at s = 4.
    "gen_int64_zeta_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 1 AS BOOLEAN) AS support_ok,
        |       CAST(abs(avg(CASE WHEN x = 1 THEN 1.0 ELSE 0.0 END) - 0.923938)
        |            < 0.009 AS BOOLEAN) AS p1_ok,
        |       CAST(abs(avg(x) - 1.110627) < 0.017 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_int64_zeta(4.0, 139) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // PERT(2, 10, mode 4): Beta(2, 4) stretched onto [2, 10]; mean =
    // (min + 4*mode + max)/6 = 28/6 ~ 4.666667 (var 64*8/(36*7) ~ 2.0317,
    // sd 1.4254 -> se 0.0045; band 0.05 ~ 11 sigma); bounded support.
    "gen_float64_pert_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(min(x) >= 2.0 AND max(x) <= 10.0 AS BOOLEAN) AS in_bounds,
        |       CAST(abs(avg(x) - 4.666667) < 0.05 AS BOOLEAN) AS mean_ok
        |FROM (SELECT randgen_float64_pert(2.0, 10.0, 4.0, 149) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // NormalInverseGaussian(alpha 3, beta 1): gamma = sqrt(8); mean =
    // beta/gamma ~ 0.353553 (se 0.0020; band 0.02 ~ 10 sigma), var =
    // alpha^2/gamma^3 ~ 0.397748 (excess kurtosis ~ 1.532 -> se var
    // 0.0024; band 0.025).
    "gen_float64_nig_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(abs(avg(x) - 0.353553) < 0.02 AS BOOLEAN) AS mean_ok,
        |       CAST(abs(avg(x * x) - avg(x) * avg(x) - 0.397748) < 0.025
        |            AS BOOLEAN) AS var_ok
        |FROM (SELECT randgen_float64_nig(3.0, 1.0, 151) AS x FROM range(1, 100001))
        |""".stripMargin) _,
    // Dirichlet(2, 3, 5): simplex point — components sum to 1 exactly
    // (per-row assert), marginal means alpha_i/alpha_0 = .2/.3/.5
    // (Beta marginal se ~ 0.0004-0.0005; bands 0.004-0.005 ~ 10 sigma),
    // every component strictly inside (0, 1).
    "gen_dirichlet_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(max(abs(x1 + x2 + x3 - 1.0)) < 1e-9 AS BOOLEAN) AS sum_ok,
        |       CAST(min(least(x1, x2, x3)) > 0.0 AND
        |            max(greatest(x1, x2, x3)) < 1.0 AS BOOLEAN) AS in_bounds,
        |       CAST(abs(avg(x1) - 0.2) < 0.004 AND abs(avg(x2) - 0.3) < 0.005
        |            AND abs(avg(x3) - 0.5) < 0.005 AS BOOLEAN) AS means_ok
        |FROM (SELECT element_at(v, 1) AS x1, element_at(v, 2) AS x2,
        |             element_at(v, 3) AS x3
        |      FROM (SELECT randgen_array_dirichlet(array(2.0D, 3.0D, 5.0D), 157) AS v
        |            FROM range(1, 100001)))
        |""".stripMargin) _,
    // Unit sphere S^3 (dim 4) + unit 3-ball: vector norm is 1 up to fp
    // (per-row assert); component mean 0 (se 0.0016; band 0.016) and
    // E[x^2] = 1/d = 0.25 (se 0.0008; band 0.008) — rotation invariance
    // in expectation; ball radius^2 has E = d/(d+2) = 3/5 (se 0.00083;
    // band 0.008) and never exceeds 1.
    "gen_unit_vector_props" -> sql(
      """SELECT count(*) AS n,
        |       CAST(max(abs(v1*v1 + v2*v2 + v3*v3 + v4*v4 - 1.0)) < 1e-9
        |            AS BOOLEAN) AS norm_ok,
        |       CAST(abs(avg(v1)) < 0.016 AND abs(avg(v1*v1) - 0.25) < 0.008
        |            AS BOOLEAN) AS component_ok,
        |       CAST(max(w1*w1 + w2*w2 + w3*w3) <= 1.0 AND
        |            abs(avg(w1*w1 + w2*w2 + w3*w3) - 0.6) < 0.008
        |            AS BOOLEAN) AS ball_ok
        |FROM (SELECT element_at(v, 1) AS v1, element_at(v, 2) AS v2,
        |             element_at(v, 3) AS v3, element_at(v, 4) AS v4,
        |             element_at(w, 1) AS w1, element_at(w, 2) AS w2,
        |             element_at(w, 3) AS w3
        |      FROM (SELECT randgen_array_unit_vector(4, 163) AS v,
        |                   randgen_array_unit_ball(3, 167) AS w
        |            FROM range(1, 100001)))
        |""".stripMargin) _,
    // Relational child-table generation: parent (2000 rows) -> children
    // with Poisson(3) fan-out carrying the parent key. Properties:
    // referential integrity BY CONSTRUCTION (no orphan children), mean
    // fan-out 3 (sd of mean sqrt(3/2000) ~ 0.039 -> 0.4 is ~10 sigma),
    // per-parent __seq is exactly 0..cnt-1, child columns in bounds, and
    // the whole build is bit-reproducible under the seed.
    "gen_child_table_props" -> { (spark: SparkSession, _: String) =>
      import org.apache.spark.sql.functions._
      val parent = graft.TableGen.table(spark, 2000L, seed = 7L,
        "pk" -> graft.Gen.SeqId,
        "seg" -> graft.Gen.Choice(Seq("A", "B", "C")))
      def build() = graft.TableGen.childTable(parent, Seq("pk"),
        graft.Gen.Int64Poisson(3.0), seed = 11L,
        "ln" -> graft.Gen.SqlExpr("__seq + 1"),
        "qty" -> graft.Gen.Int64Uniform(1, 10))
      // child feeds five consumers (orphan check, both exceptAll
      // directions, perKey, the final aggregate) — cache it and share one
      // rebuild between the two reproducibility directions.
      val child = build().cache()
      val child2 = build().cache()
      val orphans = child.join(parent, Seq("pk"), "left_anti").count()
      val reproducible =
        child2.exceptAll(child).count() == 0 &&
          child.exceptAll(child2).count() == 0
      child2.unpersist(false)
      val perKey = child.groupBy("pk")
        .agg(count(lit(1)).as("cnt"), max(col("ln")).as("mx"),
          min(col("ln")).as("mn"))
      val seqBroken = perKey
        .where(col("mx") =!= col("cnt") || col("mn") =!= 1L).count()
      child.agg(
        count(lit(1)).as("n_children"),
        lit(orphans == 0).as("ref_ok"),
        (abs(count(lit(1)).cast("double") / 2000.0 - 3.0) < 0.4)
          .as("fanout_mean_ok"),
        lit(seqBroken == 0L).as("seq_ok"),
        (min(col("qty")) >= 1 && max(col("qty")) <= 10).as("qty_ok"),
        lit(reproducible).as("reproducible"))
        .select(lit(true).as("n_positive_ok") && col("n_children") > 4000,
          col("ref_ok"), col("fanout_mean_ok"), col("seq_ok"),
          col("qty_ok"), col("reproducible"))
        .toDF("n_positive_ok", "ref_ok", "fanout_mean_ok", "seq_ok",
          "qty_ok", "reproducible")
    },
    // Generator ∘ ANN composition, half 1: TableGen + unit-vector noise +
    // a driver Dirichlet draw synthesize a clustered embedding corpus
    // with PLANTED ground truth. Properties: exact n, float-exact unit
    // norms, all 8 planted clusters hit, every cluster's mean alignment
    // with its own centroid near the closed-form 1/sqrt(1+noise^2)
    // (= 0.857 at noise 0.6; gate at 0.8), observed mixture within 4
    // sigma of the planted Dirichlet weights, and bit-reproducibility
    // under the seed.
    "gen_synthetic_embeddings" -> { (spark: SparkSession, _: String) =>
      import org.apache.spark.sql.functions._
      val (k, dim, seed) = (8, 32, 1205L)
      val cents = graft.operators.SyntheticEmbeddings.centroids(k, dim, seed)
      val w = graft.operators.SyntheticEmbeddings
        .mixtureWeights(k, 2.0, seed ^ 0x5D1E7AL)
      def build() = graft.operators.SyntheticEmbeddings
        .clustered(spark, 4096L, k, dim, seed, 0.6)
      val corpus = build().cache()
      val corpus2 = build().cache() // one rebuild shared by both directions
      val reproducible =
        corpus2.exceptAll(corpus).count() == 0 &&
          corpus.exceptAll(corpus2).count() == 0
      corpus2.unpersist(false)
      val obs = corpus.groupBy("cluster").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1).toDouble / 4096).toMap
      val weightsOk = (0 until k).forall(i =>
        math.abs(obs.getOrElse(i.toLong, 0.0) - w(i)) < 0.03)
      graft.operators.SyntheticEmbeddings.centroidAlignment(corpus, cents)
        .groupBy("cluster")
        .agg(count(lit(1)).as("cn"), avg(col("align")).as("ca"),
          max(abs(sqrt(aggregate(col("embedding"), lit(0.0),
            (a, x) => a + x.cast("double") * x.cast("double"))) - 1.0))
            .as("ne"))
        .agg(sum(col("cn")).cast("long").as("n"),
          (count(lit(1)) === k).as("clusters_ok"),
          (max(col("ne")) < 1e-6).as("norm_ok"),
          (min(col("ca")) > 0.8).as("align_ok"),
          lit(weightsOk).as("weights_ok"),
          lit(reproducible).as("reproducible"))
    },
    // TableGen: schema-driven whole-table generation (the reference's stated
    // purpose, Cargo.toml:5) — deterministic under seed, properties constant.
    "gen_tablegen_props" -> { (spark: SparkSession, _: String) =>
      import org.apache.spark.sql.functions._
      val df = graft.TableGen.table(spark, 10000L, seed = 42L,
        "id" -> graft.Gen.SeqId,
        "qty" -> graft.Gen.Int64Uniform(1, 50),
        "price" -> graft.Gen.Float64Normal(100.0, 15.0),
        "seg" -> graft.Gen.Choice(Seq("A", "B", "C")),
        "total" -> graft.Gen.SqlExpr("qty * price"))
      df.agg(
        count(lit(1)).as("n"),
        countDistinct(col("id")).as("n_ids"),
        (min(col("qty")) >= 1 && max(col("qty")) <= 50).as("qty_ok"),
        (abs(avg(col("price")) - 100.0) < 1.0).as("price_ok"),
        (countDistinct(col("seg")) === 3).as("seg_ok"),
        (sum(when(abs(col("total") - col("qty") * col("price")) < 1e-9, 0)
          .otherwise(1)) === 0).as("total_ok"))
    },
    // Gaussian-copula correlated generation (TableGen.correlated): three
    // marginals (normal / lognormal / uniform) under target correlation
    // [[1,.7,.3],[.7,1,0],[.3,0,1]]. Closed-form expectations: ln(y) is
    // the y-side Gaussian, so corr(x, ln y) = 0.7 exactly; for the
    // uniform column U = PHI(Y), Stein's lemma gives
    // corr(X, U) = r*sqrt(3/pi) = 0.3*0.97720 = 0.29316; corr(ln y, u)
    // targets 0. Bands are ~10 sigma (se of r at n=1e5 is ~0.002-0.003).
    // Rebuild-under-seed must reproduce bit-for-bit.
    "gen_copula_props" -> { (spark: SparkSession, _: String) =>
      import org.apache.spark.sql.functions._
      val corrM = Seq(Seq(1.0, 0.7, 0.3), Seq(0.7, 1.0, 0.0),
        Seq(0.3, 0.0, 1.0))
      def build() = graft.TableGen.correlated(spark, 100000L, seed = 31337L,
        corrM,
        "x" -> graft.Gen.Float64Normal(0.0, 1.0),
        "y" -> graft.Gen.Float64Lognormal(0.0, 0.5),
        "u" -> graft.Gen.Float64Uniform(0.0, 1.0))
      // df feeds both exceptAll directions plus the final aggregate, and
      // the rebuild feeds two — cache both so the 100k-row correlated
      // generation runs twice, not five times.
      val df = build().cache()
      val df2 = build().cache()
      val reproducible =
        df2.exceptAll(df).count() == 0 && df.exceptAll(df2).count() == 0
      df2.unpersist(false)
      df.agg(
        count(lit(1)).as("n"),
        (abs(corr(col("x"), log(col("y"))) - 0.7) < 0.02).as("corr_xy_ok"),
        (abs(corr(col("x"), col("u")) - 0.29316) < 0.02).as("corr_xu_ok"),
        (abs(corr(log(col("y")), col("u"))) < 0.02).as("corr_yu_ok"),
        (min(col("u")) >= 0.0 && max(col("u")) <= 1.0 &&
          abs(avg(col("u")) - 0.5) < 0.005).as("unif_ok"),
        (abs(avg(col("x"))) < 0.02 &&
          abs(avg(col("x") * col("x")) - avg(col("x")) * avg(col("x")) - 1.0)
            < 0.03).as("norm_ok"),
        (min(col("y")) > 0.0 && abs(avg(log(col("y")))) < 0.01 &&
          abs(avg(log(col("y")) * log(col("y"))) -
            avg(log(col("y"))) * avg(log(col("y"))) - 0.25) < 0.01)
          .as("logn_ok"),
        lit(reproducible).as("reproducible"))
    },
    // Markov-chain synthetic text (TextGen): bigram model trained
    // in-engine on the documents corpus, 2000 docs generated by seeded
    // walks. Properties: every generated bigram is a trained transition
    // (the walk only follows retained edges — subset by construction,
    // asserted by anti-join), lengths in (0, 30] with dead-end early
    // stops rare, walks diverge (distinct docs), and the whole build is
    // bit-reproducible under the seed.
    "gen_markov_text_props" -> { (spark: SparkSession, dir: String) =>
      import org.apache.spark.sql.functions._
      val bigramsOf = "transform(sequence(1, size(t) - 1), " +
        "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"
      val docs = graft.Tables.load(spark, dir, "documents")
      val model = graft.operators.TextGen.trainBigrams(docs, "text",
        maxVocab = 4096, maxFanout = 32)
      def build() = graft.operators.TextGen.generate(spark, model, 2000L,
        seed = 97L, len = 30)
      // The generated corpus feeds four consumers (emitted-bigram check,
      // both exceptAll directions, the final aggregate) and the rebuild
      // feeds two — without a cache each consumer re-runs the full
      // seeded walk, 6 generation passes where 2 suffice.
      val gen = build().cache()
      val gen2 = build().cache()
      val trained = docs
        .select(split(trim(col("text")), "\\s+").as("t"))
        .where(size(col("t")) > 1) // sequence(1,0) would descend
        .select(explode(expr(bigramsOf)).as("p"))
        .select("p.a", "p.b").distinct()
      val emitted = gen
        .select(split(col("text"), " ").as("t"))
        .where(size(col("t")) > 1)
        .select(explode(expr(bigramsOf)).as("p"))
        .select("p.a", "p.b").distinct()
      val novel = emitted.join(trained, Seq("a", "b"), "left_anti").count()
      val reproducible =
        gen2.exceptAll(gen).count() == 0 && gen.exceptAll(gen2).count() == 0
      gen2.unpersist(false)
      gen.select(size(split(col("text"), " ")).as("len"), col("text")).agg(
        count(lit(1)).as("n"),
        (min(col("len")) >= 1 && max(col("len")) <= 30).as("len_ok"),
        (avg(col("len")) > 20.0).as("len_avg_ok"),
        lit(novel == 0L).as("bigrams_trained_ok"),
        (countDistinct(col("text")) > 1900L).as("distinct_ok"),
        lit(reproducible).as("reproducible"))
    },
  )

  /** Constant DuckDB rows encoding the properties asserted above. */
  val oracleSql: Map[String, String] = Map(
    "gen_int64_uniform_bounds" ->
      "SELECT CAST(100 AS BIGINT) AS n, CAST(100 AS BIGINT) AS n_nonnull, TRUE AS in_bounds",
    "gen_int64_uniform_chained" ->
      "SELECT CAST(100 AS BIGINT) AS n, CAST(100 AS BIGINT) AS n_nonnull, TRUE AS in_bounds",
    "gen_int64_uniform_nulls" ->
      ("SELECT CAST(100 AS BIGINT) AS n, CAST(0 AS BIGINT) AS nn_a, " +
        "CAST(0 AS BIGINT) AS nn_b, CAST(0 AS BIGINT) AS nn_c, " +
        "CAST(0 AS BIGINT) AS nn_d, CAST(0 AS BIGINT) AS nn_e"),
    "gen_int64_uniform_moments" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS mean_ok, TRUE AS support_ok",
    "gen_float64_uniform_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS in_bounds, TRUE AS mean_ok",
    "gen_float64_normal_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS mean_ok, TRUE AS std_ok",
    "gen_normal_pair_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS means_ok, " +
        "TRUE AS stds_ok, TRUE AS corr_ok"),
    "gen_float64_exponential_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS nonneg, TRUE AS mean_ok",
    "gen_int64_zipf_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS in_bounds, TRUE AS head_heavier",
    "gen_bool_bernoulli_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS p_ok",
    "gen_string_alphanum_props" ->
      "SELECT CAST(1000 AS BIGINT) AS n, TRUE AS len_ok, TRUE AS charset_ok",
    "gen_date_uniform_props" ->
      "SELECT CAST(1000 AS BIGINT) AS n, TRUE AS in_bounds",
    "gen_timestamp_uniform_props" ->
      "SELECT CAST(1000 AS BIGINT) AS n, TRUE AS in_bounds",
    "gen_choice_props" ->
      "SELECT CAST(1000 AS BIGINT) AS n, TRUE AS members_ok, TRUE AS support_ok",
    "gen_uuid_props" ->
      "SELECT CAST(10000 AS BIGINT) AS n, TRUE AS all_distinct, TRUE AS format_ok",
    "gen_choice_weighted_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS members_ok, " +
        "TRUE AS hi_freq_ok, TRUE AS lo_freq_ok"),
    "gen_int64_poisson_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS nonneg, TRUE AS mean_ok",
    "gen_int64_geometric_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS nonneg, TRUE AS mean_ok",
    "gen_float64_pareto_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS support_ok, TRUE AS mean_ok",
    "gen_float64_laplace_props" ->
      "SELECT CAST(100000 AS BIGINT) AS n, TRUE AS mean_ok, TRUE AS scale_ok",
    "gen_float64_lognormal_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS positive, " +
        "TRUE AS mean_ok, TRUE AS median_ok"),
    "gen_float64_weibull_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS nonneg, " +
        "TRUE AS mean_ok, TRUE AS median_ok"),
    "gen_int64_binomial_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS in_bounds, " +
        "TRUE AS mean_ok, TRUE AS mean_flip_ok"),
    "gen_float64_gamma_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS positive, " +
        "TRUE AS mean_ok, TRUE AS var_ok"),
    "gen_float64_beta_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS in_bounds, " +
        "TRUE AS mean_ok, TRUE AS var_ok"),
    "gen_float64_cauchy_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS median_ok, " +
        "TRUE AS quartiles_ok"),
    "gen_float64_chisquare_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS positive, " +
        "TRUE AS mean_ok, TRUE AS var_ok"),
    "gen_float64_student_t_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS median_ok, " +
        "TRUE AS mean_ok, TRUE AS var_ok"),
    "gen_float64_gumbel_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS mean_ok, " +
        "TRUE AS median_ok"),
    "gen_float64_frechet_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS positive, " +
        "TRUE AS mean_ok, TRUE AS median_ok"),
    "gen_float64_fisher_f_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS positive, " +
        "TRUE AS mean_ok"),
    "gen_float64_inverse_gaussian_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS positive, " +
        "TRUE AS mean_ok, TRUE AS var_ok"),
    "gen_int64_negative_binomial_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS nonneg, " +
        "TRUE AS mean_ok"),
    "gen_float64_triangular_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS in_bounds, " +
        "TRUE AS mean_ok"),
    "gen_int64_hypergeometric_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS in_bounds, " +
        "TRUE AS mean_ok"),
    "gen_float64_skew_normal_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS mean_ok, " +
        "TRUE AS var_ok"),
    "gen_int64_zeta_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS support_ok, " +
        "TRUE AS p1_ok, TRUE AS mean_ok"),
    "gen_float64_pert_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS in_bounds, " +
        "TRUE AS mean_ok"),
    "gen_float64_nig_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS mean_ok, " +
        "TRUE AS var_ok"),
    "gen_dirichlet_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS sum_ok, " +
        "TRUE AS in_bounds, TRUE AS means_ok"),
    "gen_unit_vector_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS norm_ok, " +
        "TRUE AS component_ok, TRUE AS ball_ok"),
    "gen_synthetic_embeddings" ->
      ("SELECT CAST(4096 AS BIGINT) AS n, TRUE AS clusters_ok, " +
        "TRUE AS norm_ok, TRUE AS align_ok, TRUE AS weights_ok, " +
        "TRUE AS reproducible"),
    "gen_tablegen_props" ->
      ("SELECT CAST(10000 AS BIGINT) AS n, CAST(10000 AS BIGINT) AS n_ids, " +
        "TRUE AS qty_ok, TRUE AS price_ok, TRUE AS seg_ok, TRUE AS total_ok"),
    "gen_child_table_props" ->
      ("SELECT TRUE AS n_positive_ok, TRUE AS ref_ok, TRUE AS fanout_mean_ok, " +
        "TRUE AS seq_ok, TRUE AS qty_ok, TRUE AS reproducible"),
    "gen_copula_props" ->
      ("SELECT CAST(100000 AS BIGINT) AS n, TRUE AS corr_xy_ok, " +
        "TRUE AS corr_xu_ok, TRUE AS corr_yu_ok, TRUE AS unif_ok, " +
        "TRUE AS norm_ok, TRUE AS logn_ok, TRUE AS reproducible"),
    "gen_markov_text_props" ->
      ("SELECT CAST(2000 AS BIGINT) AS n, TRUE AS len_ok, " +
        "TRUE AS len_avg_ok, TRUE AS bigrams_trained_ok, " +
        "TRUE AS distinct_ok, TRUE AS reproducible"),
  )
}
