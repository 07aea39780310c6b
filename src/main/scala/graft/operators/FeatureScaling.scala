package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-group feature conditioning for training signals: outlier clamping
 * (winsorization) and standardization — the last-mile numeric hygiene a
 * model-input pipeline applies after dedup/quality filtering.
 *
 * Determinism contract (same discipline as [[TimeSeries]]): percentile
 * bounds use NEAREST-RANK (the value at sorted position ceil(q*n)) — no
 * interpolation arithmetic to drift across engines — and moments come
 * from exact integer sums combined in one fixed expression tree, so
 * every output is bit-identical in the DuckDB replay.
 */
object FeatureScaling {

  /**
   * Nearest-rank percentile bounds per group: for each q in `qs`, the
   * value at 1-based sorted position ceil(q * n). Ties in the sort cannot
   * change the answer — position k holds the same VALUE under any tie
   * order. Returns one row per group: (grpCols..., __q<i> bound columns).
   *
   * Scale: one per-group sort window over the value column — the same
   * cost class as any exact percentile; at extreme scale swap in the
   * mergeable sketches ([[Sketches.histQuantiles]], KLL) and accept their
   * error model.
   */
  def nearestRankBounds(df: DataFrame, grpCols: Seq[String],
      valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "nearestRankBounds: quantiles must be in (0, 1]")
    val w = Window.partitionBy(grpCols.map(col): _*).orderBy(valueCol)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(grpCols.map(col): _*)))
    // Exact-integer rank (Sketches.ceilRankExact) — see histQuantiles.
    val picks = qs.zipWithIndex.map { case (q, i) =>
      max(when(col("__rn") === Sketches.ceilRankExact(q, col("__n")),
        col(valueCol))).as(s"__q$i")
    }
    ranked.groupBy(grpCols.map(col): _*).agg(picks.head, picks.tail: _*)
  }

  /**
   * Winsorization: clamps `valueCol` into the per-group nearest-rank
   * [qLo, qHi] band. Adds `value_w` (the clamped value) and
   * `clipped_lo`/`clipped_hi` flags. The bounds table is group-sized —
   * broadcast — so the data path is one narrow map after the join.
   */
  def winsorize(df: DataFrame, grpCols: Seq[String], valueCol: String,
      qLo: Double, qHi: Double): DataFrame = {
    require(qLo < qHi, "winsorize: qLo must be < qHi")
    val bounds = nearestRankBounds(df, grpCols, valueCol, Seq(qLo, qHi))
      .withColumnRenamed("__q0", "__lo").withColumnRenamed("__q1", "__hi")
    df.join(broadcast(bounds), grpCols)
      .withColumn("value_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .withColumn("clipped_lo", col(valueCol) < col("__lo"))
      .withColumn("clipped_hi", col(valueCol) > col("__hi"))
  }

  /**
   * Per-group standardization of an exact integer measure (e.g. cents):
   * z = (x - mean) / stddev with mean/variance from integer sums
   * ((ss - s^2/n) / (n-1)), every float op a single fixed-order IEEE
   * operation. Groups with fewer than 2 rows or zero variance yield null.
   * Adds `z` (rounded to 6). One keyed aggregate + a broadcast join-back.
   */
  def standardize(df: DataFrame, grpCols: Seq[String],
      valueCents: Column): DataFrame = {
    val x = valueCents.cast("long")
    val stats = df.groupBy(grpCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(x).as("__s"),
        sum(x * x).as("__ss"))
    val n = col("__n").cast("double")
    val mean = col("__s").cast("double") / n
    val variance =
      (col("__ss").cast("double") -
        col("__s").cast("double") * col("__s").cast("double") / n) /
        (n - lit(1.0))
    df.join(broadcast(stats), grpCols)
      .withColumn("z", when(col("__n") >= 2 && variance > 0.0,
        round((x.cast("double") - mean) / sqrt(variance), 6)))
      .drop("__n", "__s", "__ss")
  }

  /**
   * Robust per-group location/scale: exact nearest-rank MEDIAN and the
   * median absolute deviation (MAD) around it — the outlier-resistant
   * (mean, stddev) replacement monitoring pipelines prefer (one wild
   * value cannot move either statistic). Both medians are nearest-rank
   * (position ceil(n/2)), so the whole computation is value-exact and
   * engine-portable — no interpolation, no float accumulation.
   *
   * Shape: two per-group rank windows (values, then absolute deviations
   * against the broadcast medians). Output: one row per group
   * (grpCols..., n, median, mad).
   */
  def robustStats(df: DataFrame, grpCols: Seq[String],
      valueCol: String): DataFrame = {
    val med = nearestRankBounds(df, grpCols, valueCol, Seq(0.5))
      .withColumnRenamed("__q0", "median")
    val dev = df.join(broadcast(med), grpCols)
      .withColumn("__dev", abs(col(valueCol) - col("median")))
    val mad = nearestRankBounds(dev, grpCols, "__dev", Seq(0.5))
      .withColumnRenamed("__q0", "mad")
    df.groupBy(grpCols.map(col): _*).agg(count(lit(1)).as("n"))
      .join(med, grpCols).join(mad, grpCols)
  }

  /**
   * Categorical target + frequency encoding — the tabular-feature
   * workhorse (Micci-Barreca 2001): each category is replaced by a
   * smoothed mean of the target, shrunk toward the global prior by
   * pseudo-count `alpha`, plus the leave-one-out variant that excludes
   * the row's OWN target (the standard train-time leakage guard; null
   * for singleton categories, where LOO is undefined) and the plain
   * frequency encoding.
   *
   * Determinism: the target folds as DECIMAL(18,2) (exact, order-free
   * sums); each encoding is then ONE fixed DOUBLE expression over the
   * exact parts, so the DuckDB oracle replays it bit-for-bit. With n_c =
   * rows in the category, tn_c = rows with a NON-NULL target (they are
   * equal on a fully-observed table, where these reduce to the classic
   * formulas):
   *   prior      = gsum / gtn           (global mean over observed targets)
   *   enc_smooth = (sum_c + alpha*prior) / (tn_c + alpha)
   *   enc_loo    = (sum_c - y_i + alpha*prior) / (tn_c - 1 + alpha)
   *   freq_enc   = n_c / gn             (plain row share, nulls included)
   *
   * Null handling (explicit, not incidental): a NULL category is its own
   * group — rows keep their encodings via a null-safe join instead of
   * being silently dropped by equi-join semantics; a NULL target
   * contributes to n_c/freq_enc but to no mean (it cannot inflate
   * enc_smooth), and such a row's enc_loo equals enc_smooth (there is no
   * own-target to leave out). enc_loo stays null only where LOO is
   * genuinely undefined: a non-null target that is its category's single
   * observation.
   *
   * Scale shape: one map-side-partial aggregate to a category-sized
   * table + a 1-row global aggregate, both BROADCAST back onto the
   * row stream — the fact table is touched by exactly one narrow
   * pass, no shuffle by category (which would put every row of a
   * popular category on one reducer — the classic skew trap for
   * low-cardinality encodes).
   */

  /** Equi-depth (quantile) binning of an integer-cents column, with cut
    * points from the MERGEABLE histogram sketch
    * ([[Sketches.histBuild]]/[[Sketches.histQuantiles]] — rank error at
    * most one sketch bucket): cuts at the i/bins quantile estimates,
    * each row assigned bin = number of cuts <= its value (0..bins-1; if
    * two quantiles resolve to the same cut the in-between bin is empty
    * on BOTH engines — the replayable convention). The feature-prep
    * staple behind "bucketize this skewed numeric before crossing it".
    *
    * Scale: the sketch is one keyed aggregate with map-side combine and
    * bucket-bounded state; the bins-1 cut points collect to the driver
    * and ride the scan as a codegen'd CASE chain (the k-means-literal
    * pattern) — no second shuffle, no sort, and the sketch merges, so
    * cuts can also come from folded per-batch state. */
  def binEquiDepth(df: DataFrame, valueCents: Column, bins: Int,
      widthCents: Long): DataFrame = {
    require(bins >= 2, "binEquiDepth: bins >= 2")
    val sketch = Sketches.histBuild(df, valueCents, widthCents)
    val qs = (1 until bins).map(_.toDouble / bins)
    val cuts = Sketches.histQuantiles(sketch, qs, widthCents)
      .select(col("est_cents")).collect().map(_.getLong(0))
    // foldLeft, not reduce: an EMPTY input produces an empty sketch and
    // zero cuts — the fold then assigns bin 0 to the zero rows instead
    // of crashing with an obscure empty.reduce.
    val bin = cuts.map(c => when(valueCents >= lit(c), 1L).otherwise(0L))
      .foldLeft(lit(0L))(_ + _)
    df.withColumn("bin", bin)
  }

  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0, s"targetEncode: alpha must be positive, got $alpha")
    val yd = col(targetCol).cast("decimal(18,2)")
    val rows = df.withColumn("__y", yd.cast("double"))
    val cat = df.groupBy(col(catCol).as("__cat"))
      .agg(count(lit(1)).as("n_c"), count(yd).as("__tn_c"),
        sum(yd).as("__sum_c"))
    val glob = df.agg(count(lit(1)).as("__gn"), count(yd).as("__gtn"),
      sum(yd).as("__gsum"))
    val prior = col("__gsum").cast("double") / col("__gtn")
    rows.join(broadcast(cat), col(catCol) <=> col("__cat"))
      .crossJoin(broadcast(glob))
      .withColumn("enc_smooth",
        (coalesce(col("__sum_c").cast("double"), lit(0.0)) +
            lit(alpha) * prior) /
          (col("__tn_c").cast("double") + lit(alpha)))
      .withColumn("enc_loo",
        when(col("__y").isNull, col("enc_smooth"))
          .otherwise(when(col("__tn_c") > 1,
            (col("__sum_c").cast("double") - col("__y") +
              lit(alpha) * prior) /
              (col("__tn_c").cast("double") - lit(1.0) + lit(alpha)))))
      .withColumn("freq_enc", col("n_c").cast("double") / col("__gn"))
      .select(df.columns.map(col) ++ Seq(col("n_c"), col("enc_smooth"),
        col("enc_loo"), col("freq_enc")): _*)
  }
}
