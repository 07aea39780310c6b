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
}
