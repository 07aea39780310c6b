package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextHash.hash60

/**
 * Deterministic sampling / splitting for training-data pipelines
 * (SURVEY.md §2.5): content-hash-based, so assignments are a pure function
 * of the row key — reproducible across runs, engines, partitionings, and
 * retries (unlike `df.sample`/`sampleBy`, whose seeded output still
 * depends on partitioning). This is the property that matters at 100 TB:
 * re-running the pipeline after adding data must not reshuffle old rows
 * between train and test.
 */
object Sampling {

  private val Buckets = 10000L

  /** Stable bucket in [0, 10000) from the row key (salted by purpose). */
  def hashBucket(key: Column, salt: String): Column =
    hash60(concat(lit(s"$salt:"), key.cast("string"))) % Buckets

  /**
   * Assigns each row to a named split by cumulative fraction thresholds,
   * e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)` (must sum to
   * ~1; the last split absorbs rounding). Adds a `split` column.
   */
  def hashSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    val b = hashBucket(col(keyCol), salt)
    val thresholds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(f => math.round(f * Buckets))
    val expr = fractions.map(_._1).zip(thresholds).reverse
      .foldLeft(lit(fractions.last._1): Column) {
        case (acc, (name, thr)) => when(b < thr, lit(name)).otherwise(acc)
      }
    // foldLeft over reversed list checks smallest threshold LAST, so the
    // earliest matching (smallest) threshold wins — standard cumulative
    // bucketing.
    df.withColumn("split", expr)
  }

  /**
   * Exactly-k-per-group deterministic sample (the eval-set / few-shot
   * primitive): within each group, rows are ranked by their salted
   * content hash (a stable uniform order) and the k smallest win. Unlike
   * fraction sampling this guarantees the per-group count (groups with
   * fewer than k rows keep all); adding new rows can only displace old
   * picks, never reshuffle the ordering among survivors.
   *
   * Scale: one window shuffle keyed by the group column — no global sort,
   * no collect; identical shape to any per-group top-k.
   */
  def kPerGroup(df: DataFrame, keyCol: String, groupCol: String,
      k: Int, salt: String = "kpg"): DataFrame = {
    require(k > 0, "kPerGroup: k must be positive")
    val h = hash60(concat(lit(s"$salt:"), col(groupCol).cast("string"),
      lit(":"), col(keyCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Temperature-based domain rebalancing (the data-mixing staple): domain
   * d with n_d rows is sampled at a rate proportional to n_d^alpha /
   * n_d, so alpha = 1 preserves the natural mix and alpha < 1 flattens
   * it (upweights small domains), scaled so the expected total is
   * `targetFraction` of the corpus. Rows are kept by the same
   * content-hash rule as the other samplers — deterministic under
   * retries, growth, and repartitioning.
   *
   * Scale: one tiny per-domain count aggregate broadcast back onto the
   * corpus — the corpus itself never shuffles. Cross-engine determinism:
   * alpha = 0.5 uses `sqrt` (IEEE correctly-rounded in every engine,
   * unlike libm `pow`), and the weight SUM is computed over
   * 2^20-scaled integers so float addition order can't flip a
   * threshold; the DuckDB oracle replays the identical expression tree.
   */
  def temperatureSample(df: DataFrame, keyCol: String, domainCol: String,
      alpha: Double, targetFraction: Double,
      salt: String = "temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction in (0,1], got $targetFraction")
    def weight(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else pow(c, alpha)
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__n"))
    // Global totals via an unpartitioned window over the COUNTS frame —
    // bounded at one row per domain, so the single-partition window is a
    // few dozen rows at any corpus size (and avoids the self-join
    // ambiguity a counts-crossJoin-agg(counts) plan trips over).
    val g = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // NB: resolution is case-insensitive — "__N" would silently REPLACE
    // "__n" in withColumn; keep names case-distinct-proof.
    val frac = counts
      .withColumn("__wsum",
        sum(floor(weight(col("__n")) * 1048576.0).cast("long")).over(g))
      .withColumn("__ntot", sum(col("__n")).over(g).cast("double"))
      .withColumn("__fd", least(lit(1.0),
        lit(targetFraction) * col("__ntot") * weight(col("__n")) * 1048576.0 /
          col("__wsum") / col("__n")))
      .select(col(domainCol), col("__fd"))
    val b = hash60(concat(lit(s"$salt:"), col(domainCol), lit(":"),
      col(keyCol).cast("string"))) % Buckets
    df.join(broadcast(frac), Seq(domainCol))
      .where(b < round(col("__fd") * Buckets))
      .drop("__fd")
  }

  /** Keeps ~`fraction` of rows per stratum, deterministically: a row
    * survives iff its hash bucket < fraction * 10000 under a salt that
    * includes the stratum value. */
  def hashStratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], salt: String = "strat"): DataFrame = {
    val b = hash60(concat(lit(s"$salt:"), col(stratumCol), lit(":"),
      col(keyCol).cast("string"))) % Buckets
    val thr = fractions.foldLeft(lit(0L): Column) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.where(b < thr)
  }
}
