package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ANALYZE-style column statistics (SURVEY.md §2.5): per-column min, max,
 * null count, and exact NDV in ONE pass over the table, long-format —
 * the stats table a cost-based optimizer (or a human sizing a join
 * strategy) reads before planning, and the first artifact a pipeline
 * publishes about a new dataset.
 *
 * Scale shape: all per-column aggregates fold into a single `agg` over
 * one scan; Catalyst plans the multiple DISTINCT aggregates via Expand
 * (rows × #distinct-columns before the partial aggregate — map-side,
 * never a second scan). At 100 TB swap `count_distinct` for
 * `approx_count_distinct` (HLL): the Expand collapses into plain
 * partial aggregation and NDV stays one sketch per column — same
 * output schema, property-bounded accuracy (the engine's HLL gate
 * `rel_q_approx_distinct` covers that path). The exact form here is the
 * oracle-replayable contract.
 */
object TableStats {

  /**
   * Long-format stats for `cols`: (col_name, min_val, max_val, n_nulls,
   * ndv). Min/max are canonicalized to strings AFTER aggregating (so
   * numeric ordering applies, not lexicographic). `castTo` normalizes a
   * column before all stats (e.g. timestamp -> date) so both engines
   * aggregate the same domain.
   *
   * `approx = true` is the 100 TB deployment form: NDV via
   * `approx_count_distinct` (HLL, `rsd` relative error) — the Expand
   * (rows × #columns map-side) collapses into plain partial
   * aggregation, one fixed-size sketch per column, same output schema.
   * The exact form stays the oracle-replayable contract.
   */
  def columnStats(df: DataFrame, cols: Seq[String],
      castTo: Map[String, String] = Map.empty,
      approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "columnStats: at least one column")
    def base(c: String) =
      castTo.get(c).map(t => col(c).cast(t)).getOrElse(col(c))
    val mmAggs = cols.flatMap { c =>
      Seq(min(base(c)).cast("string").as(s"__min_$c"),
        max(base(c)).cast("string").as(s"__max_$c"),
        (count(lit(1)) - count(base(c))).as(s"__nulls_$c"))
    }
    val ndvAggs = cols.map { c =>
      val ndv = if (approx) approx_count_distinct(base(c), rsd)
                else count_distinct(base(c))
      ndv.as(s"__ndv_$c")
    }
    // Exact NDV: keep the N-way DISTINCT aggregate in its OWN job.
    // Mixing it with the min/max/null aggregates forces Catalyst's
    // Expand plan (rows × (N+1) projections) to evaluate EVERY update
    // expression per expanded row — measured 3.5× slower than two
    // single-purpose scans at sf0.1 (5.2 s vs 1.5 s warm). The second
    // scan is columnar-cheap; both results are 1-row, combined with a
    // constant-size broadcast. The approx (HLL) path has no DISTINCT
    // aggregates, so one pass is already optimal there.
    val all = mmAggs ++ ndvAggs
    val wide =
      if (approx) df.agg(all.head, all.tail: _*)
      else df.agg(mmAggs.head, mmAggs.tail: _*)
        .crossJoin(broadcast(df.agg(ndvAggs.head, ndvAggs.tail: _*)))
    val stackArgs = cols.map(c =>
      s"'$c', __min_$c, __max_$c, __nulls_$c, __ndv_$c").mkString(", ")
    wide.select(expr(s"stack(${cols.size}, $stackArgs) " +
      "as (col_name, min_val, max_val, n_nulls, ndv)"))
  }

  /**
   * Pairwise Pearson correlations between numeric columns, from EXACT
   * fixed-point moment sums: every input is floor(x · 10^4)-scaled to a
   * BIGINT, the five moment sums (n, Σx, Σy, Σx², Σy², Σxy) accumulate
   * exactly (order-independent), and the final correlation is one fixed
   * expression over those integers — so both engines compute the same
   * double, unlike a native `corr()` whose per-engine accumulation
   * order and algorithm (Welford vs naive) differ.
   *
   * The dependence read before feature selection or CBO multi-column
   * estimates. One scan, one 1-row aggregate per pair — all pairs fold
   * into a single `agg` over one pass.
   *
   * Overflow contract: the caller sizes `scale` so
   * (max|x|·scale)² · rowcount < 2^63 — the moment sums must FIT, they
   * do not saturate (Spark wraps, DuckDB widens: silent divergence).
   * For unit-range ratios at 10^4 scaling that holds into the billions
   * of rows; wide-range columns take a smaller scale (correlation is
   * scale-invariant, only the floor granularity changes). The contract
   * is ENFORCED, not just documented: the same single-scan aggregate
   * also folds max|scaled| per column, and scoring raises (fail-fast at
   * action time) for any pair whose worst-case product sum could have
   * exceeded 2^63 — silent wrap is never returned.
   */
  def columnCorrelations(df: DataFrame, cols: Seq[String],
      scale: Double = 10000.0): DataFrame = {
    require(cols.size >= 2, "columnCorrelations: at least two columns")
    require(scale > 0, "columnCorrelations: scale must be positive")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def s(c: String) = floor(col(c).cast("double") * scale).cast("long")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap(c =>
      Seq(sum(s(c)).as(s"__s_$c"), sum(s(c) * s(c)).as(s"__ss_$c"),
        max(abs(s(c))).as(s"__ma_$c"))) ++
      pairs.map { case (a, b) => sum(s(a) * s(b)).as(s"__sp_${a}_$b") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      s"named_struct('ca', '$a', 'cb', '$b', 'n', __n, 'sa', __s_$a, " +
        s"'sb', __s_$b, 'ssa', __ss_$a, 'ssb', __ss_$b, " +
        s"'sp', __sp_${a}_$b, 'maa', __ma_$a, 'mab', __ma_$b)"
    }.mkString(", ")
    // The sums are exact Longs; the final combination happens in DOUBLE
    // (integer products like n·Σxy overflow Long) — every cast and op in
    // one fixed order, so both engines produce the same double.
    def d(c: String) = col(s"r.$c").cast("double")
    // Worst-case magnitude of any Long moment sum: n·max|a|·max|b| (and
    // n·max² for the squares). Checked in double — a conservative upper
    // bound on what the exact Long accumulation could have reached.
    val lim = lit(9.223372036854775e18)
    val fits = d("maa") * d("maa") * d("n") < lim &&
      d("mab") * d("mab") * d("n") < lim &&
      d("maa") * d("mab") * d("n") < lim
    wide.select(expr(s"explode(array($rows)) as r"))
      .select(col("r.ca").as("col_a"), col("r.cb").as("col_b"),
        col("r.n").as("n"),
        when(fits,
          round((d("n") * d("sp") - d("sa") * d("sb")) /
            (sqrt(d("n") * d("ssa") - d("sa") * d("sa")) *
             sqrt(d("n") * d("ssb") - d("sb") * d("sb"))), 6))
          .otherwise(raise_error(concat(
            lit("columnCorrelations: overflow contract violated for ("),
            col("r.ca"), lit(", "), col("r.cb"),
            lit("): (max|x|*scale)^2 * n >= 2^63 — reduce scale"))))
          .as("corr"))
  }

  /**
   * [[columnCorrelations]] with the fixed-point scale DERIVED from the
   * data instead of caller-sized: a first cheap pass folds max|x| per
   * column and the row count, then the largest power-of-ten scale that
   * keeps every pair's worst-case moment sum under 2^62 is applied.
   * This is the 100 TB form — the fixed default (10^4) provably
   * fail-fasts at ~6×10^7 rows of magnitude-50 columns (the sf10 scale
   * run fired that guard, by design), and correlation is
   * scale-invariant so only the floor granularity changes. Cost: one
   * extra 1-row aggregate over the same scan.
   */
  def columnCorrelationsAuto(df: DataFrame, cols: Seq[String],
      maxScale: Double = 10000.0): DataFrame =
    columnCorrelations(df, cols, deriveCorrelationScale(df, cols, maxScale))

  /** The scale-derivation pass of [[columnCorrelationsAuto]], exposed so
    * a caller pinning an oracle to a specific resolved scale can assert
    * the resolution (and fail with the real cause, not a downstream
    * value mismatch). One 1-row aggregate over the projected columns. */
  def deriveCorrelationScale(df: DataFrame, cols: Seq[String],
      maxScale: Double = 10000.0): Double = {
    require(cols.size >= 2, "columnCorrelationsAuto: at least two columns")
    val mAggs = Seq(count(lit(1)).as("__n")) ++
      cols.map(c => max(abs(col(c).cast("double"))).as(s"__m_$c"))
    val row = df.agg(mAggs.head, mAggs.tail: _*).head()
    val n = math.max(1L, row.getLong(0))
    require(cols.indices.forall(i => !row.isNullAt(i + 1)),
      "columnCorrelationsAuto: empty input or all-null column — " +
        "no magnitude to derive a scale from")
    val maxAbsPer = cols.indices
      .map(i => math.max(1e-12, row.getDouble(i + 1)))
    // Largest power of ten with (max|x| * scale)^2 * n < 2^62 (one bit
    // of slack under the operator's enforced 2^63 contract). Scales
    // below 1 are fine — fixed-point just gets coarser — but ONE global
    // scale serves every column, so the resolution check must hold for
    // the SMALLEST-magnitude column: a (|a|~1e9, |b|~1) pair would
    // otherwise floor every b to 0 and return NaN with no warning.
    val safe = math.sqrt(math.pow(2.0, 62) / n) / maxAbsPer.max
    val scale = math.min(maxScale,
      math.pow(10.0, math.floor(math.log10(safe))))
    val worst = cols(maxAbsPer.indexOf(maxAbsPer.min))
    require(maxAbsPer.min * scale >= 100.0,
      s"columnCorrelationsAuto: n=$n leaves '$worst' fewer than 100 " +
        s"fixed-point levels at the derived scale $scale — the column " +
        "magnitudes are too far apart for one shared scale; normalize " +
        "(standardize) the columns first")
    scale
  }

  /**
   * Distribution-drift diagnostic between a reference slice and a live
   * slice of the same column — the check a training pipeline runs before
   * admitting a new data drop (has the value distribution shifted since
   * the snapshot the model was tuned on?).
   *
   * Per fixed bin (explicit `edges`, bin 0 = (-inf, e0), bin i = [e_{i-1},
   * e_i), last = [e_last, inf)):
   *  - exact BIGINT counts on both sides (empty bins materialized);
   *  - PSI contribution (p−q)·ln(p/q) with add-one smoothing
   *    p=(n+1)/(N+B) (so empty bins never hit ln 0), reported in micro
   *    units (`psi_micro`, BIGINT);
   *  - the CDF gap at the bin's upper edge in micro units
   *    (`cdf_gap_micro`) — max over bins is the (binned) KS statistic;
   *  - constant columns `psi_total_micro` (Σ psi_micro, exact integer
   *    sum of already-rounded terms) and `ks_micro` (max cdf gap).
   *
   * Determinism contract (same as [[columnCorrelations]]): counts are
   * exact integers; each double combination is ONE fixed expression per
   * row (no cross-row float accumulation — the only cross-row sums are
   * BIGINT), so Spark and an oracle engine agree to the last bit except
   * a sub-ulp ln() difference that sits ~10 orders of magnitude below
   * the micro-unit rounding threshold.
   *
   * Scale shape: one keyed count per side (map-side partials, ≤B+1
   * groups), then all window/total math runs on a B-row table. The two
   * input scans are the entire data-sized cost.
   */
  def distributionDrift(ref: DataFrame, live: DataFrame, column: String,
      edges: Seq[Double]): DataFrame =
    driftReport(histogram(ref, column, edges), histogram(live, column, edges),
      edges.size + 1)

  /** The fixed-edge bin id of `c`: 0 = (-inf, e0), i = [e_{i-1}, e_i),
    * last = [e_last, inf). A pure `when` chain — codegen'd, narrow. */
  def binColumn(c: Column, edges: Seq[Double]): Column = {
    require(edges.nonEmpty, "binColumn: at least one bin edge")
    require(edges == edges.sorted && edges.distinct.size == edges.size,
      "binColumn: edges must be strictly increasing")
    edges.zipWithIndex.foldRight(lit(edges.size): Column) {
      case ((e, i), acc) => when(c < lit(e), lit(i)).otherwise(acc)
    }
  }

  /** Exact BIGINT histogram (bin, n) of `column` over fixed `edges` —
    * one keyed count with map-side partials, ≤ |edges|+1 groups. The
    * mergeable-summary form: two histograms combine by per-bin sum
    * (lossless), which is what the streaming drift fold exploits. */
  def histogram(df: DataFrame, column: String, edges: Seq[Double]): DataFrame =
    df.select(binColumn(col(column).cast("double"), edges).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))

  /** The scoring half of [[distributionDrift]], over two pre-built
    * (bin, n) histograms (missing bins treated as 0). */
  def driftReport(refHist: DataFrame, liveHist: DataFrame,
      nBins: Int): DataFrame = {
    val bins = refHist.sparkSession.range(nBins)
      .select(col("id").cast("int").as("bin"))
    val counts = bins
      .join(broadcast(refHist.withColumnRenamed("n", "__nr")),
        Seq("bin"), "left")
      .join(broadcast(liveHist.withColumnRenamed("n", "__nl")),
        Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nl"), lit(0L)).as("n_live"))
    // Everything below runs on a B-row table: single-partition windows
    // are the intended plan, not a scale hazard.
    import org.apache.spark.sql.expressions.Window
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    def d(c: Column) = c.cast("double")
    val withTot = counts
      .withColumn("__cr", sum("n_ref").over(cum))
      .withColumn("__cl", sum("n_live").over(cum))
      .withColumn("__tr", sum("n_ref").over(all))
      .withColumn("__tl", sum("n_live").over(all))
    val p = (d(col("n_ref")) + 1.0) / (d(col("__tr")) + nBins.toDouble)
    val q = (d(col("n_live")) + 1.0) / (d(col("__tl")) + nBins.toDouble)
    val scored = withTot
      .withColumn("psi_micro",
        round((p - q) * log(p / q) * 1e6).cast("long"))
      .withColumn("cdf_gap_micro",
        round(abs(d(col("__cr") * col("__tl") - col("__cl") * col("__tr"))) /
          (d(col("__tr")) * d(col("__tl"))) * 1e6).cast("long"))
    scored
      .withColumn("psi_total_micro", sum("psi_micro").over(all))
      .withColumn("ks_micro", max("cdf_gap_micro").over(all))
      .select("bin", "n_ref", "n_live", "psi_micro", "cdf_gap_micro",
        "psi_total_micro", "ks_micro")
  }

  /**
   * Pre-join cardinality + skew diagnostic: exact |A ⋈ B| on an
   * equi-key WITHOUT running the join — sum over shared keys of
   * cntA * cntB — plus the worst single key's output volume and the
   * matched-key count: the pre-flight read that decides broadcast vs
   * salt vs plain shuffle BEFORE paying for a blown-up join.
   *
   * Cost: one keyed count per side (map-side partials, key-sized
   * output) and a key-count join — never the join's own fan-out. At
   * 100 TB this runs on two count tables a million times smaller than
   * the join it predicts. Output (1 row): n_keys_matched, est_rows
   * (exact for equi-joins), max_key_rows, top_key (ties -> lowest key).
   */
  def joinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val ca = left.groupBy(col(leftKey).as("__k"))
      .agg(count(lit(1)).as("__na"))
    val cb = right.groupBy(col(rightKey).as("__k"))
      .agg(count(lit(1)).as("__nb"))
    ca.join(cb, "__k")
      .select(col("__k"), (col("__na") * col("__nb")).as("__p"))
      .agg(count(lit(1)).as("n_keys_matched"),
        sum(col("__p")).as("est_rows"),
        max(col("__p")).as("max_key_rows"),
        min_by(col("__k"), struct(negate(col("__p")), col("__k")))
          .as("top_key"))
  }
}
