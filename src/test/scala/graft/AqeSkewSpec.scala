package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins
import graft.queries.JoinQueries

/**
 * AQE skew-join demonstration (SURVEY §8.1): on a planted-skew join
 * (~75% of rows on one hot key) a skew-tuned session's AQE must actually
 * split the hot partition (OptimizeSkewedJoin), and the result must equal
 * the explicit saltedJoin — the manual tool for the extreme cases AQE's
 * heuristics miss.
 */
class AqeSkewSpec extends GraftSuite {
  private val dir = SparkTestBase.sf001

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))

  test("AQE splits the planted-skew partition; output == saltedJoin") {
    val s2 = JoinQueries.skewTunedSession(spark)
    val (l, r) = JoinQueries.skewedPair(
      Tables.load(s2, dir, "lineitem"), Tables.load(s2, dir, "orders"))
    val joined = agg(l.join(r, "k"))
    val aqeRows = joined.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE must mark the sort-merge join as skew-optimized:\n$plan")

    val (l0, r0) = JoinQueries.skewedPair(
      Tables.load(spark, dir, "lineitem"), Tables.load(spark, dir, "orders"))
    val saltedRows = agg(Joins.saltedJoin(l0, r0, "k", 8, "row_id")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    val plainRows = agg(l0.join(r0, "k")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(aqeRows == plainRows && saltedRows == plainRows,
      "AQE-skew, salted, and plain joins must agree exactly")
  }
}
