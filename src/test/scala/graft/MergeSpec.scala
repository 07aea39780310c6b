package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends GraftSuite {
  import spark.implicits._

  test("upsert: replace, insert, pass-through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val upd = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val out = Merge.upsert(base, upd, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
  }

  test("scd2: close-and-version, no-op, insert, history pass-through, null attrs") {
    val current = Seq(
      (1L, Option("x"), 0L, Option(50L)),  // closed history row
      (1L, Option("y"), 50L, None),        // open, will change to "z"
      (2L, Option("p"), 0L, None),         // open, no-op change (same value)
      (3L, Option("q"), 0L, None),         // open, untouched
      (4L, Option.empty[String], 0L, None) // open with NULL attr, changes to "w"
    ).toDF("k", "seg", "vf", "vt")
    val changes = Seq(
      (1L, Option("z")), (2L, Option("p")), (4L, Option("w")),
      (5L, Option.empty[String])           // new key with NULL attr
    ).toDF("k", "seg")
    val out = Merge.scd2Apply(current, changes, Seq("k"), Seq("seg"),
        "vf", "vt", lit(100L))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(out == Set(
      (1L, Some("x"), 0L, Some(50L)),   // history untouched
      (1L, Some("y"), 50L, Some(100L)), // closed at effective
      (1L, Some("z"), 100L, None),      // new version opened
      (2L, Some("p"), 0L, None),        // no-op kept open with ORIGINAL vf
      (3L, Some("q"), 0L, None),        // untouched
      (4L, None, 0L, Some(100L)),       // null attr closed (null-safe diff)
      (4L, Some("w"), 100L, None),
      (5L, None, 100L, None)            // new key, null attr
    ))
  }

  test("scd2 invariants on the fixture gate: one open row per live key") {
    val out = graft.queries.MergeQueries.queries("merge_scd2")(
      spark, SparkTestBase.sf001)
    val openPerKey = out.where(col("vt").isNull).groupBy("k").count()
    assert(openPerKey.where(col("count") =!= 1).count() == 0)
    // intervals never invert
    assert(out.where(col("vt").isNotNull && col("vt") <= col("vf")).count() == 0)
  }
}
