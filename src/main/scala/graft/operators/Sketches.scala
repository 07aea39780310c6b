package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextHash.hash60

/**
 * Mergeable sketch operators (SURVEY.md §2.5 scale path). The sketches are
 * deterministic — salted md5 hash families, no RNG — so the DuckDB oracle
 * replays them bit-for-bit, and results are stable under task retry and
 * partition reordering.
 *
 * Scale design: a count-min sketch over N rows aggregates to a FIXED
 * d x w cell grid (here 4 x 1024 longs) regardless of N or key
 * cardinality. The groupBy does map-side partial counting, so each
 * executor ships at most d*w cells per partition — the query that answers
 * "how often does key k appear in 100 TB" without materializing a
 * full-cardinality count table. Estimates are biased high only
 * (collisions add), with the classic (eps, delta) = (e/w, e^-d) bound.
 */
object Sketches {

  /** Salted bucket column for hash row `i` of the family. */
  private def bucket(i: Int, key: org.apache.spark.sql.Column, w: Int) =
    hash60(concat(lit(s"cms$i:"), key.cast("string"))) % w

  /** Builds the sketch: one (row, col, cnt) cell per populated bucket.
    * All d hash rows are computed in ONE scan via posexplode.
    *
    * `spreadPartitions > 0` round-robins the keys first: the hash work is
    * CPU-bound, so when the upstream is a handful of splits (one small
    * file, a single row group) the cheap shuffle of bare keys buys full
    * parallelism. Leave 0 when the input is already well-partitioned —
    * at real scale the extra exchange is pure waste. */
  def cmsBuild(df: DataFrame, keyCol: String, d: Int = 4,
      w: Int = 1024, spreadPartitions: Int = 0): DataFrame = {
    val keys = df.select(col(keyCol).as("__k"))
    val spread = if (spreadPartitions > 0) keys.repartition(spreadPartitions)
      else keys
    spread.select(posexplode(array((0 until d).map(i =>
        bucket(i, col("__k"), w)): _*)))
      .groupBy(col("pos").cast("long").as("row"), col("col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-queries the sketch for every key in `keys`: est = min over the
    * d rows of the addressed cell (0 when the cell is empty). */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val probes = keys.select(col(keyCol).as("key"),
        posexplode(array((0 until d).map(i =>
          bucket(i, col(keyCol), w)): _*)))
      .select(col("key"), col("pos").cast("long").as("row"), col("col").as("col"))
    probes.join(sketch, Seq("row", "col"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- Mergeable quantile sketch ------------------------------------------

  /** ceil(q * n) as EXACT integer arithmetic on q's decimal
    * representation: q maps through BigDecimal.valueOf (the shortest
    * decimal that round-trips the double — "0.2" stays 1/5, never the
    * binary 0.200000...0111) to num/den, and the rank is
    * (num*n + den - 1) div den in decimal(38,0) — overflow-proof at any
    * corpus count. The IEEE form ceil(q_double * n) is one too high
    * whenever q*n is an exact integer whose double product rounds up
    * (e.g. 0.8 * n with n divisible by 5 can cross at large n), which
    * silently shifts every nearest-rank cut off the DuckDB oracle's
    * exact DECIMAL ceil; this form equals the decimal ceil at EVERY n.
    * Non-terminating ratios (a caller passing 1.0/3) use the 17-digit
    * round-trip decimal — deterministic and engine-replayable, just
    * spell the intended rational in decimal. */
  def ceilRankExact(q: Double, n: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val (num, den) = ratOf(q)
    // Fast path for every humanly-written q (den <= 1e6 covers 6-decimal
    // fractions): pure BIGINT arithmetic — ceil(num*n/den) =
    // (num*n + den - 1) div den, non-negative operands so truncating
    // integral division IS floor, and the num*n product is exact or
    // fails LOUDLY under ANSI long-overflow (headroom: n up to
    // 9.2e18/num rows). The per-row decimal form this replaces measured
    // 2.5x on the window-heavy winsorize gate. Pathological round-trip
    // ratios (a caller passing 1.0/3) take the decimal(38,0) path.
    if (den <= 1000000L) {
      org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(
            lit(num) * n + lit(den - 1L)),
          org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(
            lit(den))))
    } else ceilRankCols(lit(num), lit(den), n)
  }

  /** q's exact decimal rational (num, den), reduced. */
  private[operators] def ratOf(q: Double): (Long, Long) = {
    require(q > 0.0 && q <= 1.0 && !q.isNaN,
      s"ceilRankExact: q in (0, 1], got $q")
    val bd = java.math.BigDecimal.valueOf(q).stripTrailingZeros()
    val scale = math.max(0, bd.scale())
    // Named fail-fast instead of longValueExact's raw ArithmeticException:
    // den = 10^scale must fit a Long (scale <= 18). Every humanly-written
    // quantile is far inside; a q like 1e-20 has no usable nearest-rank
    // cut anyway (rank 1 at any real n).
    require(scale <= 18,
      s"ceilRankExact: q = $q needs 10^$scale as an exact denominator, " +
        "which exceeds Long range — quantiles must have <= 18 decimal digits")
    val num0 = bd.scaleByPowerOfTen(scale).longValueExact()
    val den0 = java.math.BigInteger.TEN.pow(scale).longValueExact()
    val g = java.math.BigInteger.valueOf(num0)
      .gcd(java.math.BigInteger.valueOf(den0)).longValueExact()
    (num0 / g, den0 / g)
  }

  /** ceil(num * n / den) in decimal(38,0) integer arithmetic (column
    * operands — [[histQuantiles]] carries (num, den) as rows). */
  private def ceilRankCols(num: org.apache.spark.sql.Column,
      den: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val dec = "decimal(38,0)"
    val a = (num.cast(dec) * n.cast(dec) + (den.cast(dec) - lit(1))).cast(dec)
    ((a - pmod(a, den.cast(dec))) / den.cast(dec)).cast("long")
  }

  /**
   * Fixed-width bucketed-histogram quantile sketch over an integer
   * measure (e.g. money as cents, refunds included): one
   * (group..., bucket, cnt) row per populated bucket,
   * bucket = floorDiv(value, widthCents).
   *
   * This is the persistable, MERGEABLE companion to the per-query exact /
   * approx percentiles (rel_q26/q35): sketches built over partitions,
   * days, or groups merge by plain count addition ([[histMerge]]) with NO
   * loss — merge-then-query equals query-over-everything exactly, the
   * same contract as the HLL union (rel_q40). Deterministic integer
   * arithmetic end to end: no RNG, no floating-point bucket math, so the
   * DuckDB oracle replays the sketch bit-for-bit and retries/reorderings
   * cannot change it.
   *
   * Scale: the groupBy does map-side partial counting into at most
   * (value range / width) constant-width cells per group — each executor
   * ships bucket counts, never values. Rank error of a quantile estimate
   * is bounded by the estimate bucket's population (exact within a
   * bucket's width of value space).
   */
  def histBuild(df: DataFrame, valueCents: org.apache.spark.sql.Column,
      widthCents: Long, grpCols: Seq[String] = Nil): DataFrame = {
    require(widthCents > 0, "histBuild: widthCents must be positive")
    // Floor-division in pure integer arithmetic: subtracting pmod makes
    // the numerator an exact multiple of the width, so the decimal divide
    // is exact for the full Long range and negatives land in floor (not
    // truncate-toward-zero) buckets — the same bucket function the DuckDB
    // oracle replays.
    val b = ((valueCents - pmod(valueCents, lit(widthCents)))
      .cast("decimal(38,0)") / lit(widthCents)).cast("long").as("bucket")
    df.groupBy(grpCols.map(col) :+ (b: org.apache.spark.sql.Column): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merges sketches (any group columns dropped): bucket counts add. */
  def histMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy("bucket").agg(sum(col("cnt")).as("cnt"))

  // ---- KLL quantile sketch (DataSketches) ---------------------------------

  /** One KLL(k) sketch built per PARTITION, then all partials merged into
    * a single sketch returned to the driver as a plan-sized constant
    * (a few KB — the same "tiny aggregate to driver" contract as trained
    * k-means centroids). This is the textbook distributed-KLL shape: the
    * per-partition build touches each value once with no shuffle; only
    * sketch bytes move. KLL gives the a-priori guarantee the plain
    * histogram sketch lacks: normalized rank error ~1.65% at k=200 with
    * 99% confidence, independent of the value distribution. KLL is a
    * RANDOMIZED algorithm (compaction coin-flips), so gates on it are
    * property checks, not exact hashes. Uses org.apache.datasketches
    * (bundled with Spark 4 — the same jar behind hll_sketch_agg). */
  def kllFromValues(values: org.apache.spark.sql.Dataset[java.lang.Double],
      k: Int): org.apache.datasketches.kll.KllDoublesSketch = {
    import values.sparkSession.implicits._
    val partials = values.mapPartitions { it =>
      val sk = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
      it.foreach(v => if (v != null) sk.update(v.doubleValue()))
      Iterator.single(sk.toByteArray)
    }.collect()
    kllMergeBytes(partials, k)
  }

  /** Merges serialized KLL sketches (the cross-partition / cross-group /
    * cross-day union — lossless in the KLL error model). */
  def kllMergeBytes(sketches: Seq[Array[Byte]], k: Int)
      : org.apache.datasketches.kll.KllDoublesSketch = {
    val u = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
    sketches.foreach { b =>
      u.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(b)))
    }
    u
  }

  /** Quantile estimates from a merged sketch: for each q, the upper edge
    * (in cents) of the first bucket whose cumulative count reaches rank
    * ceil(q * n). The window/crossJoin run over the SKETCH (constant
    * size), not the data — driver-scale plan, executor-scale input. */
  def histQuantiles(sketch: DataFrame, qs: Seq[Double],
      widthCents: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = sketch
      .withColumn("cum", sum("cnt").over(w))
      .crossJoin(sketch.agg(sum("cnt").as("n")))
    // Rank threshold in EXACT integer arithmetic ([[ceilRankExact]]):
    // the IEEE ceil(q_double * n) can land one rank high exactly when
    // q*n is integral — the cut-bucket shift the DuckDB oracle's
    // DECIMAL ceil never makes.
    val qdf = sketch.sparkSession.createDataFrame(
      qs.map { q => val (nu, de) = ratOf(q); (q, nu, de) })
      .toDF("q", "__qn", "__qd")
    qdf.crossJoin(cum)
      .where(col("cum") >= ceilRankCols(col("__qn"), col("__qd"), col("n")))
      .groupBy("q")
      .agg(((min(col("bucket")) + 1) * widthCents).as("est_cents"),
        max(col("n")).as("n"))
  }

  // ---- Theta sketch set operations (DataSketches) -------------------------

  /**
   * Per-group theta sketches over a long key column — the
   * distinct-SET sketch family whose point is SET ALGEBRA: unlike HLL
   * (union only, `rel_q40`), theta sketches support intersection and
   * difference, which is how cross-corpus overlap questions ("how many
   * training docs also appear in corpus B / in neither") are answered at
   * 100 TB without a distinct-key join.
   *
   * Scale shape mirrors [[kllFromValues]]: one UpdateSketch per (group,
   * partition) built in a single `mapPartitions` pass — no shuffle of
   * the keys, only compact sketch bytes (≤ ~16 KB each at the default
   * nominal 4096) move to the driver, where per-group Unions merge them.
   * Below `nominal` distinct keys a theta sketch is EXACT (it retains
   * every key hash), so fixture-scale results are deterministic;
   * above it, estimates carry the standard ~1/sqrt(nominal) relative
   * error — gate as a property, not a hash.
   */
  def thetaPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      nominal: Int = 4096)
      : Map[String, org.apache.datasketches.theta.CompactSketch] = {
    import org.apache.datasketches.theta.{SetOperation, UpdateSketch}
    import df.sparkSession.implicits._
    val partials = df
      .select(col(groupCol).cast("string"), col(keyCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map[String, UpdateSketch]()
        it.foreach { case (g, k) =>
          m.getOrElseUpdate(g, UpdateSketch.builder()
            .setNominalEntries(nominal).build()).update(k)
        }
        m.iterator.map { case (g, sk) => (g, sk.compact().toByteArray) }
      }.collect()
    partials.groupBy(_._1).map { case (g, bs) =>
      val u = SetOperation.builder().setNominalEntries(nominal).buildUnion()
      bs.foreach(b => u.union(org.apache.datasketches.theta.CompactSketch
        .heapify(org.apache.datasketches.memory.Memory.wrap(b._2))))
      g -> u.getResult
    }
  }

  /**
   * EXACT heavy hitters in two bounded passes — every item whose count is
   * at least ceil(minFraction * N), with its exact count, and nothing
   * else. Pass 1 runs a [[graft.functions.MisraGriesAggregator]] with
   * s = ceil(1/minFraction) counters: MG guarantees every item with
   * count > N/(s+1) survives, and N * minFraction > N/(s+1) whenever
   * s >= 1/minFraction — so no qualifying item can be missed. Pass 2
   * broadcast-joins the ≤ s candidates back and counts them exactly,
   * erasing both MG's undercount and its merge-order nondeterminism.
   *
   * The 100 TB story: a full `GROUP BY item` shuffles the entire key
   * cardinality (billions of tokens); here pass 1's map-side state is
   * capped at s counters per partition and ships s rows total, and pass 2
   * shuffles only rows matching the ≤ s candidates. Output:
   * (item, cnt) for the qualifying items.
   */
  def exactHeavyHitters(items: DataFrame, itemCol: String,
      minFraction: Double): DataFrame = {
    require(minFraction > 0 && minFraction < 1,
      s"exactHeavyHitters: minFraction in (0,1), got $minFraction")
    val s = math.ceil(1.0 / minFraction).toInt
    import items.sparkSession.implicits._
    val mg = org.apache.spark.sql.functions.udaf(
      graft.functions.MisraGriesAggregator(s))
    val src = items.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    // One scan yields BOTH the MG candidates and the stream total N —
    // the corpus really is read exactly twice (this pass + the recount).
    val cands = src.agg(mg(col("item")).as("cands"), count(lit(1)).as("__n"))
      .select(explode(col("cands")).as("item"), col("__n"))
    src.join(broadcast(cands), "item")
      .groupBy("item", "__n").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= ceilRankExact(minFraction, col("__n")))
      .select("item", "cnt")
  }

  /** Union of already-built sketches (cross-group / cross-day rollup). */
  def thetaUnion(sketches: Seq[org.apache.datasketches.theta.Sketch],
      nominal: Int = 4096): org.apache.datasketches.theta.CompactSketch = {
    val u = org.apache.datasketches.theta.SetOperation.builder()
      .setNominalEntries(nominal).buildUnion()
    sketches.foreach(u.union)
    u.getResult
  }

  /** A ∩ B. */
  def thetaIntersect(a: org.apache.datasketches.theta.Sketch,
      b: org.apache.datasketches.theta.Sketch)
      : org.apache.datasketches.theta.CompactSketch = {
    val i = org.apache.datasketches.theta.SetOperation.builder()
      .buildIntersection()
    i.intersect(a); i.intersect(b)
    i.getResult
  }

  /** A \ B. */
  def thetaANotB(a: org.apache.datasketches.theta.Sketch,
      b: org.apache.datasketches.theta.Sketch)
      : org.apache.datasketches.theta.CompactSketch =
    org.apache.datasketches.theta.SetOperation.builder().buildANotB()
      .aNotB(a, b)
}
