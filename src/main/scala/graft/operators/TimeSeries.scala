package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyed time-series analytics over pre-bucketed counts (the monitoring /
 * data-quality layer of an event pipeline): per-key rolling baselines and
 * z-score anomaly flags.
 *
 * Determinism contract: the baseline mean/variance are derived from
 * INTEGER window sums (sum x, sum x^2 over the trailing frame), then
 * combined in one fixed expression tree — every float op is a single
 * correctly-rounded IEEE operation in a fixed order, so DuckDB replays
 * the z-scores bit-for-bit (no Welford-vs-naive engine drift, no
 * accumulation-order dependence). sqrt is IEEE-exact; the only rounding
 * knob is the final round(·, 6).
 *
 * Scale shape: one shuffle keyed by the series key; windows are
 * per-key-ordered frames (no global sort). Frames are ROWS-based with a
 * fixed width, so state is O(window) per key.
 */
object TimeSeries {

  /**
   * Trailing z-score per row: how far `valueCol` (an integer measure,
   * e.g. an hourly event count) sits from the mean of the PREVIOUS
   * `window` rows of the same key (current row excluded — the baseline
   * must not contain the observation it judges). Rows whose baseline has
   * fewer than 2 points or zero variance get a null z-score.
   *
   * Output: input columns + (base_n, base_mean, z).
   */
  def rollingZScores(buckets: DataFrame, keyCols: Seq[String],
      orderCol: String, valueCol: String, window: Int): DataFrame = {
    require(window >= 2, "rollingZScores: window must be >= 2")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(-window, -1)
    val x = col(valueCol).cast("long")
    val cnt = count(x).over(w)
    val s = sum(x).over(w)
    val ss = sum(x * x).over(w)
    // var = (ss - s^2/n) / (n-1), every step a single double op on
    // exact-integer inputs — the same expression the oracle computes.
    val n = cnt.cast("double")
    val mean = s.cast("double") / n
    val variance =
      (ss.cast("double") - s.cast("double") * s.cast("double") / n) /
        (n - lit(1.0))
    val z = (x.cast("double") - mean) / sqrt(variance)
    buckets
      .withColumn("base_n", cnt)
      .withColumn("base_mean", when(cnt >= 1, round(mean, 6)))
      .withColumn("z",
        when(cnt >= 2 && variance > 0.0, round(z, 6)))
  }

  /**
   * First-order Markov transition matrix over per-key event sequences:
   * for each observed (current, next) state pair, its count and the
   * fixed-point conditional probability
   * `p_scaled = (cnt * 10^6) div rowtotal(current)` — the
   * behavioral-model summary (and anomalous-sequence detector input) a
   * session pipeline derives from its event log.
   *
   * Determinism contract: successor pairing is a LEAD window ordered by
   * (orderCol, tiebreakCol) — a total order — and the probability is one
   * integer division, so both engines agree bit-for-bit.
   *
   * Scale shape: one shuffle keyed by the sequence key (the window),
   * then a (cur, nxt) keyed count with map-side partials — the count
   * table is states², not event-sized; the per-cur total is a window
   * over that tiny table. Nothing downstream of the first shuffle is
   * corpus-scale.
   */
  def transitionMatrix(events: DataFrame, keyCol: String, stateCol: String,
      orderCol: String, tiebreakCol: String): DataFrame = {
    val seq = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tiebreakCol))
    val counts = events
      .withColumn("__nxt", lead(col(stateCol), 1).over(seq))
      .where(col("__nxt").isNotNull)
      .groupBy(col(stateCol).as("cur"), col("__nxt").as("nxt"))
      .agg(count(lit(1)).as("cnt"))
    val perCur = Window.partitionBy("cur")
    counts
      .withColumn("cur_total", sum(col("cnt")).over(perCur))
      .withColumn("p_scaled", expr("(cnt * 1000000) div cur_total"))
  }

  /**
   * Per-key sequence likelihood under the corpus-trained first-order
   * Markov model ([[transitionMatrix]]): each key's mean negative
   * log-probability over its own transitions — behavioral perplexity.
   * Keys whose sequences are improbable under the population model
   * (bots replaying rare paths, broken clients looping) surface as the
   * high-NLL tail, exactly like low-quality documents under
   * [[TextAnalysis.lmPerplexity]] — and the fixed-point discipline is
   * the same: one ln() per transition on a ratio of exact counts,
   * floor-quantized to 1e-6, BIGINT sums.
   *
   * Scale shape: the transition model is states²-sized (broadcastable at
   * any event volume); scoring is the LEAD window (one key-partitioned
   * shuffle, shared shape with the matrix build) plus one model join
   * and one keyed re-aggregation.
   */
  def sequenceLikelihood(events: DataFrame, keyCol: String,
      stateCol: String, orderCol: String, tiebreakCol: String): DataFrame = {
    val tm = transitionMatrix(events, keyCol, stateCol, orderCol,
      tiebreakCol)
    val seq = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tiebreakCol))
    val lp = floor(log(col("cnt").cast("double") /
      col("cur_total").cast("double")) * lit(1000000.0)).cast("long")
    events
      .withColumn("__nxt", lead(col(stateCol), 1).over(seq))
      .where(col("__nxt").isNotNull)
      .select(col(keyCol), col(stateCol).as("cur"), col("__nxt").as("nxt"))
      .join(tm, Seq("cur", "nxt"))
      .select(col(keyCol), lp.as("lp"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_transitions"),
        (-sum(col("lp"))).as("nll_scaled"))
      .withColumn("avg_nll", round(col("nll_scaled").cast("double") /
        (col("n_transitions") * lit(1000000L)).cast("double"), 6))
  }

  /**
   * Per-key ordered sequence export: each key's events as one
   * delimiter-joined state string in (orderCol, tiebreakCol) order, plus
   * length and time bounds — the event-log-to-training-sequence
   * conversion a behavioral/sequence model trains on.
   *
   * Order is imposed by `array_sort` over collected (order, tiebreak,
   * state) structs — struct comparison is lexicographic, and the
   * tiebreak makes it total, so the output is partitioning-independent
   * (a bare `collect_list` is NOT: it concatenates partitions in
   * arrival order).
   *
   * Scale shape: one shuffle keyed by `keyCol` with map-side partial
   * collection; per-key state is that key's own event list — the same
   * bound any sequence export has. Keys with pathological event counts
   * should be length-capped upstream (slice after sort) — noted, not
   * silently applied.
   */
  def keyedSequences(events: DataFrame, keyCol: String, stateCol: String,
      orderCol: String, tiebreakCol: String, sep: String = ">"): DataFrame =
    events
      .groupBy(col(keyCol))
      .agg(collect_list(struct(col(orderCol).as("o"),
        col(tiebreakCol).as("t"), col(stateCol).as("s"))).as("evs"))
      .select(col(keyCol),
        size(col("evs")).cast("long").as("n_events"),
        array_join(transform(array_sort(col("evs")), e => e("s")), sep)
          .as("sequence"))

  /**
   * Per-key hourly resample with forward-fill — the gap-fill every
   * feature pipeline runs before a model sees a regular time grid:
   * irregular events become one row per (key, hour) from the key's
   * first to last observed hour, carrying the last observed value
   * through gaps (`v_filled`), the per-hour observation count
   * (`n_obs`, 0 in gaps) and a `was_gap` flag.
   *
   * Determinism: the per-hour representative value is PICKED, not
   * averaged — the latest event by (ts, tiebreak) wins, so doubles are
   * exact with no accumulation-order hazard, and the forward-fill
   * window (last value, nulls ignored) is order-total via the hour.
   *
   * Scale shape: three keyed shuffles, all on `keyCol` (+hour): the
   * per-(key,hour) window, the per-key bounds aggregate, and the
   * spine join + fill window. The spine is bounded by
   * keys x observed-hour-span — the size of the OUTPUT grid, never
   * event-scale times fanout. Per-key window state is one running
   * value (streaming-friendly; the Structured Streaming twin of this
   * fill is a flatMapGroupsWithState carrying last_v).
   */
  def gapFillHourly(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col("__h"))
    val hourly = df
      .withColumn("__h", date_trunc("hour", col(tsCol)))
      .withColumn("__rn", row_number().over(
        w.orderBy(col(tsCol).desc, col(tiebreakCol).desc)))
      .withColumn("__n", count(lit(1)).over(w))
      .where(col("__rn") === 1)
      .select(col(keyCol), col("__h"), col(valueCol).as("__v"), col("__n"))
    val spine = hourly.groupBy(col(keyCol))
      .agg(min("__h").as("__mn"), max("__h").as("__mx"))
      .select(col(keyCol), explode(sequence(col("__mn"), col("__mx"),
        expr("interval 1 hour"))).as("__h"))
    val ffW = Window.partitionBy(col(keyCol)).orderBy("__h")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(hourly, Seq(keyCol, "__h"), "left")
      .select(col(keyCol), col("__h").as("hour"),
        last(col("__v"), ignoreNulls = true).over(ffW).as("v_filled"),
        coalesce(col("__n"), lit(0L)).as("n_obs"),
        col("__v").isNull.as("was_gap"))
  }
}
