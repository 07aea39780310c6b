package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations

class ExpectationsSpec extends GraftSuite {
  import spark.implicits._

  private val rules = Seq(
    "positive" -> (col("v") > 0),
    "small" -> (col("v") < 100))

  test("violations carry every failed rule, in rule order") {
    val df = Seq((1L, Some(5L)), (2L, Some(-3L)), (3L, Some(500L)),
      (4L, Option.empty[Long])).toDF("k", "v")
    val out = Expectations.check(df, rules)
      .select(col("k"), concat_ws(",", col("violations")).as("vs"),
        col("is_clean"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(out(1L) == (("", true)))
    assert(out(2L) == (("positive", false)))
    assert(out(3L) == (("small", false)))
    // NULL predicate = violated (both rules are unknown on null)
    assert(out(4L) == (("positive,small", false)))
  }

  test("split routes rows and strips audit columns from the clean side") {
    val df = Seq((1L, 5L), (2L, -3L)).toDF("k", "v")
    val (clean, bad) = Expectations.split(df, rules)
    assert(clean.columns.toSeq == Seq("k", "v"))
    assert(clean.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(bad.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(bad.columns.contains("violations"))
  }
}
