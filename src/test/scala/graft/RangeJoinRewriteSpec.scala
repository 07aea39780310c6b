package graft

import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

/** The custom optimizer rule: BETWEEN-style inequality joins become binned
  * equi-joins when spark.graft.rangeJoin.binWidth is set. */
class RangeJoinRewriteSpec extends GraftSuite {
  import spark.implicits._

  private lazy val ranges = Seq((1L, 0.0, 100.0), (2L, 15.0, 17.0),
    (3L, 10.0, 10.0), (4L, 95.0, 205.0), (5L, 300.0, 250.0)) // 5: empty range
    .toDF("rid", "lo", "hi")
  private lazy val points = Seq((10L, 0.0), (11L, 10.0), (12L, 16.5),
    (13L, 100.0), (14L, 200.0), (15L, 205.0), (16L, 300.0)).toDF("pid", "v")

  private def withRule[T](width: String)(body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.ConfKey, width)
    try body
    finally {
      spark.conf.unset(RangeJoinRewrite.ConfKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rewrite preserves results exactly (both join orders, strict + inclusive)") {
    // Naive baselines computed BEFORE the rule is installed.
    val naive = pairsOf(
      points.join(ranges, col("v") >= col("lo") && col("v") <= col("hi")))
    val naiveStrict = pairsOf(
      points.join(ranges, col("v") > col("lo") && col("v") < col("hi")))
    assert(naive != naiveStrict, "fixture must distinguish strict bounds")
    withRule("10.0") {
      val a = points.join(ranges, col("v") >= col("lo") && col("v") <= col("hi"))
      val b = ranges.join(points, col("v") >= col("lo") && col("v") <= col("hi"))
      assert(pairsOf(a) == naive)
      assert(pairsOf(b) == naive)
      val strict = points.join(ranges, col("v") > col("lo") && col("v") < col("hi"))
      assert(pairsOf(strict) == naiveStrict)
    }
  }

  test("rewrite replaces the nested-loop plan with an equi-join on the bin") {
    def plan(width: Option[String]): String = {
      val run = () => points.join(ranges,
        col("v") >= col("lo") && col("v") <= col("hi"))
        .queryExecution.executedPlan.toString
      width match {
        case Some(w) => withRule(w)(run())
        case None => run()
      }
    }
    val off = plan(None)
    assert(off.contains("BroadcastNestedLoopJoin"),
      s"without the rule this must be a nested loop:\n$off")
    val on = plan(Some("10.0"))
    assert(!on.contains("BroadcastNestedLoopJoin") && on.contains("__graft_bin"),
      s"with the rule this must be an equi-join on the bin:\n$on")
  }

  test("rule no-ops on joins with an equality conjunct or non-range conditions") {
    withRule("10.0") {
      val equi = points.join(ranges, col("pid") === col("rid"))
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_bin"))
      val half = points.join(ranges, col("v") >= col("lo"))
      assert(!half.queryExecution.executedPlan.toString.contains("__graft_bin"))
    }
  }
}
