package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/**
 * Join operators Spark lacks as built-ins, composed from primitives
 * (SURVEY.md §7.3 preference (a): compose before custom plans).
 */
object Joins {

  /**
   * Backward as-of join: for every left row, attach the single right row
   * with the greatest `rightTs <= leftTs` within the same `keys` group
   * (left-join semantics: unmatched left rows keep nulls).
   *
   * Composition: equi-join on keys with the time bound as join condition,
   * then keep rank-1 per left row (`leftId` must be unique per left row).
   * Tie rule: when several right rows share the greatest `rightTs`, the one
   * with the largest `rightTieCols` tuple (descending, in order) wins —
   * pass a unique right-side id there to make the pick deterministic
   * under retries and across engines.
   * At scale the equi-join shuffles both sides by `keys` once; the window
   * repartitions by `leftId`. Pass `toleranceMs >= 0` to bound the match
   * window (`rightTs >= leftTs - tolerance`) — unbounded as-of joins on
   * keys with millions of right rows fan out before the rank filter, and
   * the tolerance predicate is what keeps the join linear-ish.
   *
   * DuckDB's native `ASOF LEFT JOIN` is the oracle for this operator.
   */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, leftId: String,
      rightValueCols: Seq[String], toleranceMs: Long = -1L,
      rightTieCols: Seq[String] = Seq.empty): DataFrame = {
    val r = right.select(
      keys.map(k => col(k).as(s"__k_$k")) ++
        Seq(col(rightTs).as("__rts")) ++
        rightTieCols.zipWithIndex.map { case (c, i) => col(c).as(s"__tie_$i") } ++
        rightValueCols.map(c => col(c).as(s"r_$c")): _*)
    val keyCond = keys.map(k => col(k) === col(s"__k_$k")).reduce(_ && _)
    val timeCond =
      if (toleranceMs >= 0)
        col("__rts") <= col(leftTs) &&
          col("__rts") >= col(leftTs) - expr(s"INTERVAL $toleranceMs MILLISECOND")
      else col("__rts") <= col(leftTs)
    val joined = left.join(r, keyCond && timeCond, "left")
    val ordering = col("__rts").desc +:
      rightTieCols.indices.map(i => col(s"__tie_$i").desc)
    val w = Window.partitionBy(col(leftId)).orderBy(ordering: _*)
    joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
      .drop(keys.map(k => s"__k_$k"): _*)
      .drop(rightTieCols.indices.map(i => s"__tie_$i"): _*)
      .withColumnRenamed("__rts", "asof_ts")
  }

  /**
   * Forward as-of join: for every left row, attach the single right row
   * with the SMALLEST `rightTs >= leftTs` in the same `keys` group — the
   * "next event after" lookup ([[asofBackward]] mirrored; ties prefer the
   * smallest `rightTieCols` tuple). Same composition and scale shape;
   * `toleranceMs` bounds the forward window (`rightTs <= leftTs +
   * tolerance`), which is what keeps the pre-rank fan-out linear-ish.
   */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, leftId: String,
      rightValueCols: Seq[String], toleranceMs: Long = -1L,
      rightTieCols: Seq[String] = Seq.empty): DataFrame = {
    val r = right.select(
      keys.map(k => col(k).as(s"__k_$k")) ++
        Seq(col(rightTs).as("__rts")) ++
        rightTieCols.zipWithIndex.map { case (c, i) => col(c).as(s"__tie_$i") } ++
        rightValueCols.map(c => col(c).as(s"r_$c")): _*)
    val keyCond = keys.map(k => col(k) === col(s"__k_$k")).reduce(_ && _)
    val timeCond =
      if (toleranceMs >= 0)
        col("__rts") >= col(leftTs) &&
          col("__rts") <= col(leftTs) + expr(s"INTERVAL $toleranceMs MILLISECOND")
      else col("__rts") >= col(leftTs)
    val joined = left.join(r, keyCond && timeCond, "left")
    val ordering = col("__rts").asc +:
      rightTieCols.indices.map(i => col(s"__tie_$i").asc)
    val w = Window.partitionBy(col(leftId)).orderBy(ordering: _*)
    joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
      .drop(keys.map(k => s"__k_$k"): _*)
      .drop(rightTieCols.indices.map(i => s"__tie_$i"): _*)
      .withColumnRenamed("__rts", "asof_ts")
  }

  /**
   * Range (interval-containment) join: pairs every point row with every
   * range row satisfying `lo <= point <= hi`, WITHOUT a nested-loop or
   * cartesian plan.
   *
   * Composition (the classic binned range join): each range is exploded to
   * the integer bins it overlaps (`floor(lo/w) .. floor(hi/w)`), each point
   * belongs to exactly ONE bin, and the join becomes an equi-join on the
   * bin id followed by the exact `BETWEEN` re-filter. A point matches a
   * range in exactly one bin (its own), so no dedup pass is needed.
   *
   * Scale: shuffle is hash-partitioned by bin — linear in input + total
   * bin-span of the ranges. Pick `binWidth` near the typical range span:
   * too small multiplies the exploded range side (span/w copies); too
   * large degrades each bin's join to a local mini cross-product. Both
   * inputs keep predicate pushdown and AQE (it is a plain equi-join to
   * Catalyst). A plain inequality join would plan as BroadcastNestedLoop /
   * cartesian — O(n*m) compares and a single-task disaster at 100 TB.
   */
  def rangeJoin(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // Reversed ranges (lo > hi) can never contain a point, but Sequence
    // with its default step would count DOWN through every bin between
    // them — a garbage row with a huge reversed span explodes into
    // millions of rows (or trips Sequence's max array length) before the
    // refilter can drop them. Filter them out up front instead.
    val r = ranges.where(col(loCol) <= col(hiCol)).withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    p.join(r, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /**
   * Interval-OVERLAP join (interval × interval, closed semantics:
   * `lLo <= rHi AND rLo <= lHi`) — sessions × maintenance windows,
   * spans × incident ranges. [[rangeJoin]]'s point side becomes a second
   * interval side, which breaks its "exactly one bin" dedup-free
   * argument: an overlapping pair can now share many bins. The standard
   * fix that keeps the join dedup-FREE is the first-shared-bin rule —
   * both sides explode to their touched bins, and after the equi-join a
   * pair is kept only in bin max(floor(lLo/w), floor(rLo/w)), the first
   * bin both intervals occupy. Every truly overlapping pair is emitted
   * exactly once, with no `distinct` shuffle over the candidate stream.
   *
   * Scale: shuffle is hash-partitioned by bin id — linear in total
   * bin-span of both sides; `binWidth` near the typical interval span
   * bounds the copies per interval. Equi-join to Catalyst (pushdown +
   * AQE intact); a bare overlap predicate would plan BroadcastNestedLoop.
   */
  def intervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.where(col(lo) <= col(hi)).withColumn("__bin",
        explode(sequence(floor(col(lo) / binWidth).cast("long"),
          floor(col(hi) / binWidth).cast("long"))))
    binned(left, lLo, lHi).join(binned(right, rLo, rHi), Seq("__bin"))
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__bin") === greatest(floor(col(lLo) / binWidth).cast("long"),
          floor(col(rLo) / binWidth).cast("long")))
      .drop("__bin")
  }

  /**
   * Skew-resistant equi-join: the left (large, skewed) side gets a
   * deterministic salt in [0, saltFactor) derived from `leftUniqueCol`;
   * the right side is replicated `saltFactor` times; the join runs on
   * (key, salt), splitting each hot key's bucket `saltFactor` ways.
   * Result set is identical to the plain join. (AQE's skew-join handles
   * the moderate cases automatically; this is the explicit tool for
   * extreme single-key skew.)
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, leftUniqueCol: String): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftUniqueCol)), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Bloom-prefiltered join — the explicit form of row-level runtime
   * filtering (what Spark's InjectRuntimeFilter derives automatically when
   * statistics allow): build a Bloom filter over the small/selective
   * side's join keys, probe it on the big side BEFORE the join's shuffle,
   * then run the exact equi-join.
   *
   * Scale: the fact side's shuffle shrinks to `selectivity + fpp` of its
   * rows — at 100 TB, pre-dropping 99% of fact rows before the exchange
   * is the difference between a 100 TB and a 1 TB shuffle. The filter is
   * built with one distributed aggregate (`stat.bloomFilter`), sized by
   * `expectedItems`/`fpp`, and probed through the codegen'd
   * BloomMightContainLong expression (deserialized once per JVM). False
   * positives pass the probe but are eliminated by the join itself —
   * results are exactly the plain join's.
   *
   * Filter shipping auto-switches on serialized size: small filters ride
   * inside the plan (simple, no broadcast lifecycle); anything above
   * `bcastThresholdBytes` ships as a Spark broadcast variable instead
   * (BloomMightContainLongBcast) — a plan-embedded 100M-key/1% filter is
   * ~115 MB re-serialized into every task closure of every stage that
   * references it, while a broadcast is torrent-distributed once per
   * executor. Both paths probe below the exchange and agree exactly
   * (spec'd).
   */
  def bloomPrefilteredJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01,
      bcastThresholdBytes: Long = 4L << 20): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: items=$expectedItems fpp=$fpp")
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    val bytes = out.toByteArray
    val keyExpr = GraftSqlBridge.expression(col(factKey).cast("long"))
    val probe = GraftSqlBridge.column(
      if (bytes.length <= bcastThresholdBytes)
        graft.functions.BloomMightContainLong(keyExpr, bytes)
      else
        graft.functions.BloomMightContainLongBcast(keyExpr,
          dim.sparkSession.sparkContext.broadcast(bytes)))
    fact.where(probe)
      .join(dim, col(factKey) === col(dimKey))
  }

  /**
   * Blocked fuzzy (edit-distance) join — the record-linkage staple: an
   * equi-join on a cheap blocking key narrows candidates, then the exact
   * Levenshtein threshold keeps real matches.
   *
   * Scale: a naive fuzzy join is an O(n*m) cross product (and Catalyst
   * would plan exactly that for a pure `levenshtein(a,b) <= k` condition
   * — a nested loop). The blocking key turns it into a plain shuffled
   * equi-join, linear in input plus the per-block candidate volume; pick
   * a key that bounds block sizes (a token, a phonetic code, a length
   * band + prefix). Catalyst evaluates `levenshtein` inside codegen on
   * the joined pairs only.
   */
  def fuzzyJoin(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String, maxDist: Int,
      blockKey: String => org.apache.spark.sql.Column): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val l = left.select(col(leftCol).as("name_a"),
      blockKey(leftCol).as("__blk"))
    val r = right.select(col(rightCol).as("name_b"),
      blockKey(rightCol).as("__blk"))
    l.join(r, Seq("__blk"))
      .where(levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .drop("__blk")
  }

  /**
   * Point-in-time (feature-store) join: each fact row picks up the
   * dimension VERSION that was valid at the fact's timestamp —
   * `eff_start <= ts < eff_end` over an SCD2-style versioned dimension.
   * THE correctness join for training-data assembly: joining "current"
   * dimension values onto historical facts leaks the future into
   * training features; the PIT join reconstructs what was knowable at
   * event time.
   *
   * Scale shape: an equi-join on the dimension key (both sides shuffle
   * once on it) with the interval predicate evaluated inside the joined
   * row — per-key fan-out is the key's VERSION count (SCD2 history
   * depth, single digits in practice), so the join output is a small
   * constant factor of the fact side, never a range-join blow-up. Facts
   * whose timestamp precedes every version are kept with null
   * attributes (inner=false) or dropped (inner=true) — explicitly, not
   * silently.
   */
  def pointInTimeJoin(facts: DataFrame, factTs: String,
      dims: DataFrame, key: String, effStart: String, effEnd: String,
      inner: Boolean = true): DataFrame = {
    val valid = col(factTs) >= col(effStart) && col(factTs) < col(effEnd)
    if (inner) facts.join(dims, Seq(key)).where(valid)
    else {
      // Single left join with the interval predicate IN the join
      // condition: a fact with no valid version gets exactly one
      // null-extended row. (The earlier matched-union-anti formulation
      // was wrong for facts carrying NULL in any column: anti-join
      // equality is null-rejecting, so a matched row with a NULL
      // survived the anti side too and was emitted twice.)
      val f = facts.alias("__pit_f")
      val d = dims.alias("__pit_d")
      val cond = col(s"__pit_f.`$key`") === col(s"__pit_d.`$key`") &&
        col(s"__pit_f.`$factTs`") >= col(s"__pit_d.`$effStart`") &&
        col(s"__pit_f.`$factTs`") < col(s"__pit_d.`$effEnd`")
      val joined = f.join(d, cond, "left").drop(col(s"__pit_d.`$key`"))
      // Match the inner path's Seq(key)-join column order: key first.
      joined.select(
        col(key) +: joined.columns.filterNot(_ == key).map(col): _*)
    }
  }
}
