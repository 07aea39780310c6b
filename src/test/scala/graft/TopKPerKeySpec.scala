package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKPerKeySpec extends GraftSuite {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy("l_returnflag")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
            col("l_linenumber"))))
      .where(col("__rn") <= k).drop("__rn")

  test("matches the row_number window form under a total order") {
    val li = Tables.load(spark, SparkTestBase.sf001, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val viaOp = TopK.perKey(li, Seq(col("l_returnflag")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber")), 5)
    val viaWin = windowForm(li, 5)
    assert(viaOp.count() == viaWin.count())
    assert(viaOp.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaOp).isEmpty)
  }

  test("plans heap execs around one exchange, with NO sort") {
    val li = Tables.load(spark, SparkTestBase.sf001, "lineitem")
    val plan = TopK.perKey(li, Seq(col("l_returnflag")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber")), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyFinal") &&
      plan.contains("GraftTopKPerKeyPartial"), s"missing heap execs:\n$plan")
    assert(!plan.contains("SortExec") && !" Sort ".r.findFirstIn(plan).isDefined,
      s"top-k per key must not sort:\n$plan")
    // partial below the exchange, final above it
    val lines = plan.linesIterator.toSeq
    val fi = lines.indexWhere(_.contains("GraftTopKPerKeyFinal"))
    val ei = lines.indexWhere(_.contains("Exchange"))
    val pi = lines.indexWhere(_.contains("GraftTopKPerKeyPartial"))
    assert(fi < ei && ei < pi, s"expected final/exchange/partial order:\n$plan")
  }

  test("k larger than any group returns everything; k=1 returns the min") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val all = TopK.perKey(df, Seq(col("g")), Seq(col("v")), 10)
    assert(all.count() == 4)
    val top1 = TopK.perKey(df, Seq(col("g")), Seq(col("v")), 1)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(top1 == Set(("a", 1), ("b", 9)))
  }

  test("rows within a key come back in sort order") {
    val df = Seq(("a", 5), ("a", 1), ("a", 3), ("a", 2)).toDF("g", "v")
    val got = TopK.perKey(df, Seq(col("g")), Seq(col("v")), 3)
      .collect().map(_.getInt(1)).toSeq
    assert(got == Seq(1, 2, 3), s"expected sorted emit, got $got")
  }

  test("near-unique keys: partial pass caps tracked state, result stays exact") {
    // 10k rows, ~9k distinct keys, cap of 64 tracked keys per partition:
    // the map-side pass overflows immediately and streams untracked keys
    // through — the answer must still equal the window form exactly, and
    // the heap map never grows past the cap (asserted indirectly: with a
    // 64-key cap a blowup would mean the overflow path never ran).
    val df = spark.range(10000)
      .select((col("id") % 9000).as("g"), (col("id") * 37 % 1000).as("v"),
        col("id"))
    val viaOp = TopK.perKey(df, Seq(col("g")),
        Seq(col("v"), col("id")), 2, maxPartialKeys = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val viaWin = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaOp == viaWin)
    // The plan still has exactly one exchange and no sort — the fallback
    // changes what the partial pass SHIPS, not the plan shape.
    val plan = TopK.perKey(df, Seq(col("g")), Seq(col("v"), col("id")), 2,
      maxPartialKeys = 64).queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyPartial") && !plan.contains("SortExec"))
  }

  test("null keys and null order values are handled like the window form") {
    val df = Seq((Option("a"), Option(2)), (Option("a"), None),
      (None, Option(1)), (None, Option(7)), (Option("a"), Option(5)))
      .toDF("g", "v")
    val viaOp = TopK.perKey(df, Seq(col("g")), Seq(col("v").asc, col("g")), 2)
      .collect().map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("g"))
    val viaWin = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2).drop("rn")
      .collect().map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    assert(viaOp == viaWin)
  }
}
