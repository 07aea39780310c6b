package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RandgenFunctions

/**
 * Differential-privacy release primitives (SURVEY.md §2.5) — the
 * reference's generator family applied to its canonical data-engineering
 * job: releasing aggregate statistics about a corpus without exposing
 * any individual record.
 *
 * [[dpCounts]] is the ε-DP noisy-counts release (Dwork et al.): each
 * group's exact count plus Laplace(1/ε) noise (sensitivity 1 for
 * count queries — one record changes any count by at most 1), rounded
 * to an integer and clamped at 0 (both are post-processing, which DP is
 * closed under). The noise comes from the engine's partition-seeded
 * `randgen_float64_laplace` — task-retry stable, so a recomputed
 * partition releases the SAME noise instead of averaging it away
 * (retry-averaging is a real DP bug in naive implementations).
 *
 * Scale shape: one keyed count with map-side partials; the noise is a
 * narrow per-output-row expression. The released table is group-sized.
 */
object Privacy {

  /**
   * ε-DP noisy counts per group: (groups..., n_noisy, plus the exact
   * count and bound/sign witnesses when `audit` — the gate/test shape;
   * a production release selects the noisy column only).
   */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      seed: Long, audit: Boolean = false): DataFrame = {
    require(epsilon > 0, s"dpCounts: epsilon must be positive, got $epsilon")
    val b = 1.0 / epsilon
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_exact"))
    val noisy = exact.withColumn("__noise",
        RandgenFunctions.randgen_float64_laplace(lit(0.0), lit(b), seed))
      .withColumn("n_noisy",
        greatest(lit(0L), col("n_exact") + round(col("__noise")).cast("long")))
    if (audit)
      // 30b one-sided tail is exp(-30) ≈ 9e-14 — a deterministic-seed
      // witness, not a flaky statistical assertion.
      noisy.select(groupCols.map(col) ++ Seq(col("n_exact"),
        (abs(col("n_noisy") - col("n_exact")) <= lit(math.ceil(30 * b).toLong))
          .as("noise_bounded"),
        (col("n_noisy") >= 0).as("nonneg")): _*)
    else noisy.select(groupCols.map(col) :+ col("n_noisy"): _*)
  }

  /**
   * k-anonymity suppression: drop every row whose quasi-identifier
   * combination is shared by fewer than k rows — the release filter
   * that stops a rare attribute combination from singling a record out
   * (Sweeney). Exact and deterministic: one keyed count with map-side
   * partials + a count-filtered semi-join back; rows never carry the
   * count. Compose with [[dpCounts]] for the aggregate release path.
   */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, s"kAnonymize: k must be >= 1, got $k")
    val ok = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= k)
      .select(quasiCols.map(col): _*)
    df.join(ok, quasiCols, "left_semi")
  }

  /**
   * l-diversity suppression (Machanavajjhala et al.): k-anonymity's
   * known weakness is a group where every record shares the SAME
   * sensitive value — group size k reveals the attribute anyway
   * (homogeneity attack). Keep only rows whose quasi-identifier group
   * contains at least `l` DISTINCT values of `sensitiveCol`.
   *
   * Scale shape: one exact distinct-count aggregate keyed by the quasi
   * columns (two-level: distinct then count, both with map-side
   * partials) + a semi-join back; group table is quasi-cardinality
   * sized, never row-sized.
   */
  def lDiversify(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(l >= 1, s"lDiversify: l must be >= 1, got $l")
    val ok = df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("__ndv"))
      .where(col("__ndv") >= l)
      .select(quasiCols.map(col): _*)
    df.join(ok, quasiCols, "left_semi")
  }
}
