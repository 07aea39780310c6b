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

  test("applyChangelog: out-of-order log folds to highest-seq winner") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    // Log arrives shuffled: key 1 updated then deleted (delete wins by
    // seq); key 2 deleted then re-inserted (insert wins); key 5 inserted
    // then updated; key 3 untouched; key 4 single delete.
    val log = Seq(
      (2L, "b2", 9L, "I"), (1L, "a1", 1L, "U"), (5L, "e0", 1L, "I"),
      (1L, "gone", 2L, "D"), (4L, "gone", 1L, "D"), (5L, "e1", 3L, "U"),
      (2L, "gone", 5L, "D")
    ).toDF("k", "v", "seq", "op")
    val out = Merge.applyChangelog(base, log, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((2L, "b2"), (3L, "c"), (5L, "e1")))
  }

  test("changelog gate invariants: deletes gone, re-inserts win, keys unique") {
    val out = graft.queries.MergeQueries.queries("merge_changelog")(
      spark, SparkTestBase.sf001)
    out.cache()
    try {
      // one row per key
      assert(out.groupBy("k").count().where(col("count") =!= 1).count() == 0)
      // key%40 re-inserted with status R (seq 3 beats the seq-2 delete)
      assert(out.where(col("k") % 40 === 0 && col("k") < 2000000L &&
        col("status") =!= "R").count() == 0)
      // key%20 (but not %40) deleted
      assert(out.where(col("k") % 20 === 0 && col("k") % 40 =!= 0 &&
        col("k") < 2000000L).count() == 0)
      // key%10 (but not %20) updated
      assert(out.where(col("k") % 10 === 0 && col("k") % 20 =!= 0 &&
        col("k") < 2000000L && col("status") =!= "U").count() == 0)
    } finally out.unpersist()
  }

  test("snapshotAsOf reconstructs every version; diff reports exact I/U/D") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val log = Seq(
      (1L, "a1", 1L, "U"), (2L, "gone", 2L, "D"), (9L, "i9", 2L, "I"),
      (2L, "b3", 3L, "I")
    ).toDF("k", "v", "seq", "op")
    def snap(s: Long) = Merge.snapshotAsOf(base, log, Seq("k"), "seq", "op", s)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(snap(0L) == Set((1L, "a"), (2L, "b"), (3L, "c"))) // pre-log
    assert(snap(1L) == Set((1L, "a1"), (2L, "b"), (3L, "c")))
    assert(snap(2L) == Set((1L, "a1"), (3L, "c"), (9L, "i9")))
    assert(snap(3L) == Set((1L, "a1"), (2L, "b3"), (3L, "c"), (9L, "i9")))
    // diff v1 -> v3: 2 changed (delete+reinsert nets to U), 9 inserted
    val d = Merge.snapshotDiff(
      Merge.snapshotAsOf(base, log, Seq("k"), "seq", "op", 1L),
      Merge.snapshotAsOf(base, log, Seq("k"), "seq", "op", 3L), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((2L, "U"), (9L, "I")), s"got $d")
    // diff v3 -> v1 is the inverse op set
    val inv = Merge.snapshotDiff(
      Merge.snapshotAsOf(base, log, Seq("k"), "seq", "op", 3L),
      Merge.snapshotAsOf(base, log, Seq("k"), "seq", "op", 1L), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(inv == Set((2L, "U"), (9L, "D")))
  }
}
