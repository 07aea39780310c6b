package graft

import org.apache.spark.sql.functions._

import graft.streaming.DedupStream

/**
 * Streaming incremental near-dedup: per-micro-batch screening against a
 * band index that GROWS with each batch's survivors — a day-1 re-crawl
 * of a day-0 doc is only caught if the index actually grew.
 */
class DedupStreamSpec extends GraftSuite {
  import spark.implicits._

  test("index grows per batch; replays land exactly once") {
    val mk = (tag: String) => (1 to 30).map(i => s"$tag$i").mkString(" ")
    val history = Seq((1L, mk("alpha"))).toDF("doc_id", "text")
    val day0 = Seq(
      10L -> mk("bravo"),               // new, survives
      11L -> (mk("alpha") + " update")  // re-crawl of history, dropped
    ).toDF("doc_id", "text")
    val day1 = Seq(
      20L -> mk("delta"),               // new, survives
      21L -> (mk("bravo") + " update"), // re-crawl of DAY-0 doc: only
                                        // caught if the index grew
      22L -> (mk("alpha") + " redux")   // still caught vs history
    ).toDF("doc_id", "text")

    val root = java.nio.file.Files.createTempDirectory("graft_sdspec")
    val logDir = root.resolve("days")
    java.nio.file.Files.createDirectories(logDir)
    Seq(day0, day1).zipWithIndex.foreach { case (slice, i) =>
      val stage = root.resolve(s"stage$i").toString
      slice.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = logDir.resolve(f"day$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val out = DedupStream.incrementalMinhash(spark, history,
      logDir.toString, day0.schema, root.resolve("state").toString,
      "doc_id", "text")
    val got = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 20L), s"survivors $got")
    // delta-chain artifacts exist: seed base + one delta per batch +
    // each batch's disjoint output
    Seq("idx_base0", "idx_d1", "idx_d2", "out_v1", "out_v2").foreach { d =>
      assert(java.nio.file.Files.exists(root.resolve(s"state/$d")),
        s"missing $d")
    }
    // the index grew: day 0's delta carries its survivor's bands
    val d1 = spark.read.parquet(root.resolve("state/idx_d1").toString).count()
    assert(d1 > 0)
  }

  test("index retention prunes old versions; replay anchors stay usable") {
    val mk = (tag: String) => (1 to 30).map(i => s"$tag$i").mkString(" ")
    val history = Seq((1L, mk("alpha"))).toDF("doc_id", "text")
    // 4 daily batches: each day one new doc + one re-crawl of the
    // previous day's doc (caught only if the index keeps growing).
    val tags = Seq("bravo", "delta", "gamma", "omega")
    val days = tags.zipWithIndex.map { case (tag, i) =>
      val prev = if (i == 0) "alpha" else tags(i - 1)
      Seq((10L + i) -> mk(tag),
        (20L + i) -> (mk(prev) + " update")).toDF("doc_id", "text")
    }
    val root = java.nio.file.Files.createTempDirectory("graft_sdvac")
    val logDir = root.resolve("days")
    java.nio.file.Files.createDirectories(logDir)
    days.zipWithIndex.foreach { case (slice, i) =>
      val stage = root.resolve(s"stage$i").toString
      slice.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = logDir.resolve(f"day$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val state = root.resolve("state").toString
    val out = DedupStream.incrementalMinhash(spark, history,
      logDir.toString, days.head.schema, state, "doc_id", "text",
      retainIndexVersions = 2, compactEvery = 2)
    // Only the fresh docs survive; every re-crawl was screened out, so
    // the index chain genuinely grew across all four batches.
    val got = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 11L, 12L, 13L), s"survivors $got")
    // Compaction fired at batches 2 and 4; vacuum kept the newest 2 base
    // anchors and the deltas a replayed compaction would re-read. Every
    // batch's output shard is untouched (outputs are corpus, not state).
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    assert(names.filter(_.startsWith("idx_")) ==
      Set("idx_base2", "idx_base4", "idx_d3", "idx_d4"),
      s"index chain after retention: $names")
    (1 to 4).foreach(v => assert(names.contains(s"out_v$v"), s"out_v$v gone"))
    // A replayed final batch still lands idempotently from the kept
    // anchors: re-running batch 3's screening against serving state at
    // version 3 (base2 ∪ d3) reproduces out_v4 exactly.
    val idx3 = graft.streaming.DeltaState.read(spark, state, "idx", 3)
    val replayed = graft.operators.Dedup.incrementalMinhashKeepFirst(
      days(3), "doc_id", "text", idx3)
    val landed = spark.read.parquet(s"$state/out_v4")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val again = replayed.select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == landed, s"replay $again != landed $landed")
  }
}
