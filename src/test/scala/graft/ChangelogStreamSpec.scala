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
    // versioned snapshots: v0 (base), v1, v2 all present — the idempotent
    // replay anchor for each batch id
    (0 to 2).foreach { vNum =>
      assert(java.nio.file.Files.exists(root.resolve(s"state/v$vNum")),
        s"missing snapshot v$vNum")
    }
    // intermediate state v1 reflects ONLY batch 0
    val v1 = spark.read.parquet(root.resolve("state/v1").toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1 == Set((1L, "a1"), (3L, "c"), (4L, "d0")))
    // vacuum keeps the newest 2 versions, deletes v0, final data intact
    val deleted = ChangelogStream.vacuum(root.resolve("state").toString, 2)
    assert(deleted == Seq(0L), s"expected [0], got $deleted")
    assert(!java.nio.file.Files.exists(root.resolve("state/v0")))
    assert(java.nio.file.Files.exists(root.resolve("state/v1")) &&
      java.nio.file.Files.exists(root.resolve("state/v2")))
    val after = spark.read.parquet(root.resolve("state/v2").toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == got)
  }
}
