package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/**
 * Mergeable histogram quantile sketch: merge losslessness (the HLL-union
 * contract) and the rank-error bound (the estimate's bucket brackets the
 * target rank, so error <= that bucket's population / one bucket width of
 * value space).
 */
class SketchQuantileSpec extends GraftSuite {
  private val dir = SparkTestBase.sf001
  private val W = 500L
  private lazy val events = Tables.load(spark, dir, "events")
  private lazy val cents = round(col("value") * 100).cast("long")

  test("merging per-group sketches == building one global sketch") {
    val perType = Sketches.histBuild(events, cents, W, Seq("event_type"))
    val merged = Sketches.histMerge(perType)
    val direct = Sketches.histBuild(events, cents, W)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("KLL: rank error within bound; partition-merge == one-pass build model") {
    import spark.implicits._
    val vals = events.select(col("value").cast("double")).as[java.lang.Double]
    val sk = Sketches.kllFromValues(vals, 200)
    val sorted = events.select(col("value").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    val n = sorted.length.toDouble
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.getQuantile(q)
      val rank = sorted.count(_ <= est) / n
      assert(math.abs(rank - q) <= 0.05, s"q=$q est=$est rank=$rank")
    }
    assert(sk.getN == sorted.length, "every value must be observed exactly once")
    // Mergeability: sketches of two halves merged cover the same stream.
    val half = Sketches.kllMergeBytes(Seq(
      Sketches.kllFromValues(events.where(col("event_id") % 2 === 0)
        .select(col("value").cast("double")).as[java.lang.Double], 200).toByteArray,
      Sketches.kllFromValues(events.where(col("event_id") % 2 === 1)
        .select(col("value").cast("double")).as[java.lang.Double], 200).toByteArray),
      200)
    assert(half.getN == sorted.length)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val rank = sorted.count(_ <= half.getQuantile(q)) / n
      assert(math.abs(rank - q) <= 0.05, s"merged q=$q rank=$rank")
    }
  }

  test("quantile estimates bracket the target rank (error <= one bucket)") {
    val merged = Sketches.histMerge(
      Sketches.histBuild(events, cents, W, Seq("event_type")))
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = Sketches.histQuantiles(merged, qs, W).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est.keySet == qs.toSet)
    val vals = events.select(cents.as("c")).collect().map(_.getLong(0)).sorted
    val n = vals.length.toLong
    qs.foreach { q =>
      val (e, nOut) = est(q)
      assert(nOut == n)
      val target = math.ceil(q * n).toLong
      // est is the upper edge of the first bucket reaching the target
      // rank: at least `target` values lie at or below it, and fewer than
      // `target` lie below the bucket's lower edge.
      assert(vals.count(_ < e) >= target, s"q=$q: est $e too low")
      assert(vals.count(_ < e - W) < target, s"q=$q: est $e too high")
    }
  }

  test("exactHeavyHitters == plain GROUP BY/HAVING, stable under repartitioning") {
    import spark.implicits._
    // Adversarial stream: 2 genuinely heavy items drowned in 5000
    // singletons (vocabulary far exceeds the MG counter budget s=100).
    val rows = Seq.fill(300)("alpha") ++ Seq.fill(120)("beta") ++
      (0 until 5000).map(i => s"noise_$i")
    val df = rows.toDF("w")
    val hh = Sketches.exactHeavyHitters(df, "w", 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.length
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= math.ceil(0.01 * n)).toMap
    assert(hh == exact, s"got $hh want $exact")
    // merge-order independence: different partitioning, same answer
    val hh2 = Sketches.exactHeavyHitters(df.repartition(23), "w", 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh2 == exact)
  }
}
