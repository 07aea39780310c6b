package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /**
   * t-closeness report (Li, Li & Venkatasubramanian 2007) — the third
   * rung of the release ladder after [[kAnonymize]] and [[lDiversify]]:
   * l-diversity still leaks when a group's sensitive values are distinct
   * but SKEWED relative to the population (skewness attack). A class is
   * t-close when the Earth Mover's Distance between its sensitive-value
   * distribution and the global one is <= t. For an ordered attribute
   * binned into m ordinal bins, EMD has the closed form
   * sum_i |cumP_i - cumQ_i| / (m - 1) over cumulative pmfs.
   *
   * Arithmetic is exact until the last step: with class cumulative count
   * C_i (class size n_c) and global cumulative count G_i (total n_g),
   * cumP_i - cumQ_i = (C_i*n_g - G_i*n_c) / (n_c*n_g), so the numerators
   * sum as BIGINTs and one fixed DOUBLE expression finishes
   * (engine-portable, same pattern as TableStats.columnCorrelations).
   * Overflow contract: C_i*n_g needs n_c*n_g < 2^63 — fine to ~3e9 rows;
   * beyond that pre-scale counts (the bins are coarse anyway).
   *
   * Scale shape: one row-level keyed count per (class, bin) and one per
   * bin, both with map-side partials; everything after is on the
   * class-cardinality x m grid (the bin table is m rows, broadcast).
   * The per-class cumulative window partitions by class — no global sort.
   */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], binCol: Column,
      t: Double): DataFrame = {
    require(t > 0 && t < 1, s"tCloseness: t must be in (0,1), got $t")
    val q = quasiCols.map(col)
    val b = df.select(q :+ binCol.cast("int").as("__bin"): _*)
    val whole = Window.partitionBy(lit(0))
    val cumW = whole.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0)
    // Global per-bin counts + cumulative counts: an m-row table (m = bin
    // cardinality), so the single-partition window is metadata-sized.
    val gcum = b.groupBy("__bin").agg(count(lit(1)).as("__g"))
      .select(col("__bin"), sum("__g").over(cumW).as("__gc"),
        sum("__g").over(whole).as("__ng"), count(lit(1)).over(whole).as("__m"))
    val cls = b.select(q: _*).distinct()
    val cbin = b.groupBy(q :+ col("__bin"): _*).agg(count(lit(1)).as("__c"))
    val clsW = Window.partitionBy(q: _*)
    val clsCumW = clsW.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0)
    // Dense (class x bin) grid: absent bins still shift the cumulative
    // pmf, so they must appear as zero-count rows before the window.
    cls.crossJoin(broadcast(gcum))
      .join(cbin, quasiCols :+ "__bin", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .withColumn("__cc", sum("__c").over(clsCumW))
      .withColumn("__nc", sum("__c").over(clsW))
      .groupBy(q: _*)
      .agg(max("__nc").as("n_c"),
        sum(abs(col("__cc") * col("__ng") - col("__gc") * col("__nc")))
          .as("__num"),
        max("__ng").as("__ng2"), max("__m").as("__m2"))
      // m = 1 (a single distinct bin) makes the closed form 0/0; the
      // distributions are then trivially identical, so emd = 0 — not NaN.
      .withColumn("emd", when(col("__m2") > 1,
        round(col("__num").cast("double") /
          (col("n_c").cast("double") * col("__ng2") * (col("__m2") - lit(1))),
          9)).otherwise(lit(0.0)))
      .withColumn("t_close", col("emd") <= lit(t))
      .select(q ++ Seq(col("n_c"), col("emd"), col("t_close")): _*)
  }
}
