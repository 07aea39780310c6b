package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge
import graft.streaming.ChangelogStream

class ChangelogStreamSpec extends GraftSuite {
  import spark.implicits._

  test("streamed fold across micro-batches == one-shot batch fold") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdcspec")
    val logDir = root.resolve("log"); java.nio.file.Files.createDirectories(logDir)
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // batch 0: update k1, delete k2, insert k4
    // batch 1: delete k1 (later seq), re-insert k2 (later seq), update k4
    val slices = Seq(
      Seq((1L, "a1", 10L, "U"), (2L, "x", 11L, "D"), (4L, "d0", 12L, "I")),
      Seq((1L, "x", 20L, "D"), (2L, "b2", 21L, "I"), (4L, "d1", 22L, "U")))
    slices.zipWithIndex.foreach { case (rows, i) =>
      val stage = root.resolve(s"stage$i").toString
      rows.toDF("k", "v", "seq", "op").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = logDir.resolve(f"seq$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val schema = Seq((1L, "a", 1L, "U")).toDF("k", "v", "seq", "op").schema
    val out = ChangelogStream.materialize(spark, base, logDir.toString,
      schema, root.resolve("state").toString, Seq("k"), "seq", "op")
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "b2"), (3L, "c"), (4L, "d1")))
    // identical to folding the whole log in one batch
    val oneShot = Merge.applyChangelog(base,
        slices.flatten.toDF("k", "v", "seq", "op"), Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == oneShot)
    // Merge-on-read delta layout: the snapshot base plus one RAW log
    // delta per batch — no snapshot rewrite ever happened (O(batch)
    // per-batch I/O), and each delta is the replay anchor for its batch.
    val state = root.resolve("state").toString
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    assert(names == Set("snap_base0", "log_d1", "log_d2"),
      s"state layout: $names")
    // The historical snapshot at version 1 is reconstructable from
    // base + the first delta alone (Merge.snapshotAsOf's property),
    // reflecting ONLY batch 0.
    val v1 = Merge.applyChangelog(
        spark.read.parquet(s"$state/snap_base0"),
        spark.read.parquet(s"$state/log_d1"), Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1 == Set((1L, "a1"), (3L, "c"), (4L, "d0")))
  }

  test("compaction materializes the log into a new base, result-invisibly, " +
    "and vacuum keeps the replay anchors") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdccomp")
    val logDir = root.resolve("log"); java.nio.file.Files.createDirectories(logDir)
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val slices = Seq(
      Seq((1L, "a1", 10L, "U"), (4L, "d0", 11L, "I")),
      Seq((2L, "x", 20L, "D"), (4L, "d1", 21L, "U")),
      Seq((5L, "e0", 30L, "I"), (1L, "x", 31L, "D")),
      Seq((3L, "c1", 40L, "U"), (5L, "e1", 41L, "U")))
    slices.zipWithIndex.foreach { case (rows, i) =>
      val stage = root.resolve(s"stage$i").toString
      rows.toDF("k", "v", "seq", "op").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = logDir.resolve(f"seq$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val schema = Seq((1L, "a", 1L, "U")).toDF("k", "v", "seq", "op").schema
    val state = root.resolve("state").toString
    val out = ChangelogStream.materialize(spark, base, logDir.toString,
      schema, state, Seq("k"), "seq", "op", retainVersions = 2,
      compactEvery = 2)
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val oneShot = Merge.applyChangelog(base,
        slices.flatten.toDF("k", "v", "seq", "op"), Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == oneShot, "compaction must be result-invisible")
    // Compactions fired at batches 2 and 4; vacuum kept the newest 2
    // snapshot bases and the log deltas a replayed compaction re-reads.
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    assert(names == Set("snap_base2", "snap_base4", "log_d3", "log_d4"),
      s"state layout: $names")
    // snap_base2 is exactly the sequential fold of the first two batches.
    val mid = spark.read.parquet(s"$state/snap_base2")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val midRef = Merge.applyChangelog(base,
        slices.take(2).flatten.toDF("k", "v", "seq", "op"),
        Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mid == midRef)
  }
}
