package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge

import graft.functions.BloomMightContainLong
import graft.operators.Joins

class BloomJoinSpec extends GraftSuite {

  private lazy val li = Tables.load(spark, SparkTestBase.sf001, "lineitem")
  private lazy val dim = Tables.load(spark, SparkTestBase.sf001, "orders")
    .where(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"), col("o_orderstatus"))

  private def bloomBytes(keys: org.apache.spark.sql.DataFrame, c: String) = {
    val bf = keys.stat.bloomFilter(c, 50000L, 0.01)
    val out = new java.io.ByteArrayOutputStream(); bf.writeTo(out)
    out.toByteArray
  }

  test("no false negatives: every inserted key probes true") {
    val bytes = bloomBytes(dim, "o_orderkey")
    val probe = GraftSqlBridge.column(BloomMightContainLong(
      GraftSqlBridge.expression(col("o_orderkey")), bytes))
    assert(dim.where(!probe).count() == 0)
  }

  test("prefilter drops most non-matching fact rows; join result is exact") {
    val bytes = bloomBytes(dim, "o_orderkey")
    val probe = GraftSqlBridge.column(BloomMightContainLong(
      GraftSqlBridge.expression(col("l_orderkey")), bytes))
    val total = li.count()
    val kept = li.where(probe).count()
    val trueMatches = li.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept < total) // the filter is selective at ~20% dim selectivity
    assert(kept >= trueMatches) // no false negatives at the row level
    assert(kept <= trueMatches + (0.02 * total).toLong) // fpp stays near 1%

    val viaBloom = Joins.bloomPrefilteredJoin(
        li.select("l_orderkey", "l_quantity"), "l_orderkey",
        dim, "o_orderkey", 50000L)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaBloom == plain)
  }

  test("size auto-switch: large filters ship as a broadcast, results agree") {
    val fact = li.select("l_orderkey", "l_quantity")
    // threshold 0 forces the broadcast path; default keeps plan-embedding
    val viaBcast = Joins.bloomPrefilteredJoin(
      fact, "l_orderkey", dim, "o_orderkey", 50000L,
      bcastThresholdBytes = 0L)
    val viaInline = Joins.bloomPrefilteredJoin(
      fact, "l_orderkey", dim, "o_orderkey", 50000L)
    val bcastPlan = viaBcast.queryExecution.executedPlan.toString
    val inlinePlan = viaInline.queryExecution.executedPlan.toString
    assert(bcastPlan.contains("bloom_might_contain_long_bcast"),
      s"broadcast probe missing:\n${bcastPlan.take(1500)}")
    assert(inlinePlan.contains("bloom_might_contain_long") &&
      !inlinePlan.contains("bloom_might_contain_long_bcast"),
      s"inline probe missing:\n${inlinePlan.take(1500)}")
    // the probe still sits below the join on the broadcast path
    val probeAt = bcastPlan.indexOf("bloom_might_contain_long_bcast")
    val joinAt = bcastPlan.indexOf("Join")
    assert(joinAt >= 0 && probeAt > joinAt, "bcast probe not below join")
    val a = viaBcast.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = viaInline.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b, "broadcast and inline paths must agree exactly")
  }

  test("probe sits below the join in the physical plan (runtime-filter shape)") {
    val joined = Joins.bloomPrefilteredJoin(
      li.select("l_orderkey", "l_quantity"), "l_orderkey",
      dim, "o_orderkey", 50000L)
    val plan = joined.queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("bloom_might_contain_long")
    val joinAt = plan.indexOf("Join")
    assert(probeAt >= 0, s"probe missing from plan:\n$plan")
    // In the plan tree string the join prints above its children, so the
    // probe filter appearing AFTER the join node means it is inside the
    // fact-side subtree (i.e. evaluated before the join).
    assert(joinAt >= 0 && probeAt > joinAt, s"probe not below join:\n$plan")
  }
}
