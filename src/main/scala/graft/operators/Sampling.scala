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
      fractions: Seq[(String, Double)], salt: String = "split"): DataFrame =
    df.withColumn("split", splitAssign(hashBucket(col(keyCol), salt), fractions))

  /** Split name for a bucket under cumulative fraction thresholds. */
  private def splitAssign(b: Column,
      fractions: Seq[(String, Double)]): Column = {
    val thresholds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(f => math.round(f * Buckets))
    // foldLeft over reversed list checks smallest threshold LAST, so the
    // earliest matching (smallest) threshold wins — standard cumulative
    // bucketing.
    fractions.map(_._1).zip(thresholds).reverse
      .foldLeft(lit(fractions.last._1): Column) {
        case (acc, (name, thr)) => when(b < thr, lit(name)).otherwise(acc)
      }
  }

  /**
   * Leak-proof train/val split: near-duplicate CLUSTERS are the unit of
   * assignment, not documents. `pairs` (id_a, id_b) are near-dup edges
   * (from any [[Dedup]] detector); every document in a connected
   * component follows its cluster representative (the component's
   * smallest id) into one split, so two near-identical documents can
   * never straddle train and validation — the standard eval-contamination
   * guard a naive per-document hash split silently violates.
   *
   * Adds `cluster_id` (the representative; own id for singletons) and
   * `split`. Assignment is `hashBucket(cluster_id)` — stable under
   * re-runs and data growth, like [[hashSplit]].
   *
   * Scale shape: label propagation runs over the PAIR graph only
   * ([[Dedup.resolveClusters]] — the corpus never enters the loop); the
   * corpus then takes one left equi-join against the cluster table
   * (near-dup-cluster-sized — often broadcastable, but that's AQE's
   * runtime call, not a hardcoded hint: on a heavily-duplicated crawl
   * the cluster table is a large fraction of the corpus) and a narrow
   * hash projection. No new corpus-scale shuffle beyond that join.
   */
  def leakproofSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      fractions: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    val reps = Dedup.resolveClusters(pairs)
      .select(col("id").as(idCol), col("cluster").as("cluster_id"))
    df.join(reps, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split",
        splitAssign(hashBucket(col("cluster_id"), salt), fractions))
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

  /**
   * Weighted sampling WITHOUT replacement: exactly `k` rows, each row's
   * inclusion odds proportional to its positive integer weight, chosen by
   * the Efraimidis–Spirakis A-Res rule — but expressed in PURE INTEGER
   * hashing so the pick is bit-reproducible across engines, partitionings
   * and retries. A-Res ranks rows by exponential keys Exp(rate = w);
   * the minimum of w i.i.d. Exp(1) draws IS an Exp(w) draw, and ranking
   * ascending by min(-ln(u_j)) is ranking DESCENDING by max(u_j) — so
   * "top-k by the max of w salted hashes" is A-Res exactly, with no
   * ln/pow in sight (libm last-ulp differences can never flip a pick).
   *
   * Rows with weight < 1 are excluded (weight 0 = never sampled).
   * Ties (a 2^-60 event) break toward the smaller key value.
   *
   * Scale shape: the key is a narrow per-row projection (w hashes, so
   * O(sum of weights) work — cap weights upstream; they only need to be
   * proportional), then the heap-bounded [[TopK]] operator trims each
   * map partition to k rows BEFORE the single-point exchange — k rows
   * per partition is all that ever moves, no global sort.
   */
  def weightedK(df: DataFrame, keyCol: String, weight: Column, k: Int,
      salt: String = "wk"): DataFrame = {
    require(k > 0, "weightedK: k must be positive")
    val w = weight.cast("long")
    val key = array_max(transform(sequence(lit(1L), w),
      j => hash60(concat(lit(s"$salt:"), col(keyCol).cast("string"),
        lit(":"), j.cast("string")))))
    val withKey = df.where(w >= 1L).withColumn("__wkey", key)
    TopK.perKey(withKey, Seq(lit(1)),
        Seq(col("__wkey").desc, col(keyCol).asc), k)
      .drop("__wkey")
  }

  /**
   * Largest-remainder seat allocation of `totalN` across weighted
   * domains: floor(share * N) each, the leftover seats to the largest
   * fractional remainders (ties toward the lexicographically smaller
   * domain). Pure arithmetic on the weight table — data never touches
   * the allocation. Exposed for the oracle and spec.
   */
  def allocateMixture(weights: Map[String, Double],
      totalN: Long): Map[String, Long] = {
    require(totalN > 0 && weights.nonEmpty && weights.values.forall(_ >= 0)
      && weights.values.sum > 0, "allocateMixture: bad weights/total")
    val wsum = weights.values.sum
    val exact = weights.map { case (d, w) => d -> w / wsum * totalN }
    val floors = exact.map { case (d, e) => d -> e.toLong }
    val leftover = (totalN - floors.values.sum).toInt
    val order = exact.toSeq
      .map { case (d, e) => (d, e - floors(d)) }
      .sortBy { case (d, r) => (-r, d) }
      .take(leftover).map(_._1).toSet
    floors.map { case (d, n) => d -> (if (order(d)) n + 1 else n) }
  }

  /**
   * EXACT training-mixture sampler: picks precisely
   * `allocateMixture(weights, totalN)(domain)` rows per domain (all of a
   * domain if it is smaller than its quota — quotas are not rebalanced,
   * by design: silently stealing from a scarce domain distorts the other
   * shares), chosen by salted content-hash rank — so the mixture is
   * reproducible and adding corpus data can only displace picks, never
   * reshuffle survivors' relative order. The fraction-based
   * [[temperatureSample]] hits a mixture in expectation; this hits it
   * exactly, which is what a training-run manifest wants.
   *
   * Scale shape: the per-domain pick rides the heap-bounded [[TopK]]
   * custom operator (map-side trim to the LARGEST quota before the
   * exchange), then ranks only the surviving quota-sized groups —
   * no full per-domain sort anywhere.
   */
  /**
   * TOKEN-budgeted training mixture: [[allocateMixture]] splits
   * `totalTokens` into per-domain TOKEN budgets (largest-remainder, like
   * the row-count variant), then each domain keeps the greedy PREFIX of
   * its salted-hash-ranked docs: a doc survives iff the domain's token
   * mass BEFORE it is still under budget — so the first boundary-crossing
   * doc is included, every budget is met when supply allows (overshoot
   * bounded by one doc), and survivors are a contiguous hash-rank prefix
   * (reproducible; growing the corpus can only displace picks at the
   * boundary). This is what a training-run manifest actually allocates —
   * tokens, not rows: domains with long documents get proportionally
   * FEWER docs for the same share of the token budget.
   *
   * Zero-token docs are never picked (they would pad the manifest without
   * contributing mass). Scale shape: docs carry >= 1 token, so at most
   * `budget` rows per domain can sit inside the prefix — the heap-bounded
   * [[TopK]] trim to the largest budget bounds the exchange exactly like
   * [[exactMixture]], and only the trimmed quota-sized groups are ranked
   * and prefix-summed.
   */
  def tokenBudgetMixture(df: DataFrame, keyCol: String, domainCol: String,
      tokens: Column, weights: Map[String, Double], totalTokens: Long,
      salt: String = "mixtok"): DataFrame = {
    val budgets = allocateMixture(weights, totalTokens)
    val kmax = budgets.values.max
    require(kmax <= Int.MaxValue, "tokenBudgetMixture: budget too large")
    val h = hash60(concat(lit(s"$salt:"), col(domainCol), lit(":"),
      col(keyCol).cast("string")))
    val inScope = df
      .withColumn("__nt", tokens.cast("long"))
      .where(col("__nt") >= 1L && col(domainCol).isin(
        budgets.filter(_._2 > 0).keys.toSeq: _*))
      .withColumn("__h", h)
    val trimmed = TopK.perKey(inScope, Seq(col(domainCol)),
      Seq(col("__h"), col(keyCol)), kmax.toInt)
    val w = Window.partitionBy(domainCol).orderBy(col("__h"), col(keyCol))
    val budget = budgets.foldLeft(lit(0L): Column) { case (acc, (d, n)) =>
      when(col(domainCol) === d, lit(n)).otherwise(acc)
    }
    trimmed
      .withColumn("__before", sum(col("__nt")).over(w) - col("__nt"))
      .where(col("__before") < budget)
      .withColumn("n_tokens", col("__nt"))
      .drop("__h", "__nt", "__before")
  }

  def exactMixture(df: DataFrame, keyCol: String, domainCol: String,
      weights: Map[String, Double], totalN: Long,
      salt: String = "mix"): DataFrame = {
    val targets = allocateMixture(weights, totalN)
    val kmax = targets.values.max
    require(kmax <= Int.MaxValue, "exactMixture: per-domain quota too large")
    val h = hash60(concat(lit(s"$salt:"), col(domainCol), lit(":"),
      col(keyCol).cast("string")))
    val inScope = df.where(col(domainCol).isin(
      targets.filter(_._2 > 0).keys.toSeq: _*))
      .withColumn("__h", h)
    val trimmed = TopK.perKey(inScope, Seq(col(domainCol)),
      Seq(col("__h"), col(keyCol)), kmax.toInt)
    val w = Window.partitionBy(domainCol).orderBy(col("__h"), col(keyCol))
    val tgt = targets.foldLeft(lit(0L): Column) { case (acc, (d, n)) =>
      when(col(domainCol) === d, lit(n)).otherwise(acc)
    }
    trimmed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= tgt)
      .drop("__h", "__rn")
  }
}
