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
    // versioned artifacts exist: idx v0..v2, out v1..v2
    Seq("idx_v0", "idx_v1", "idx_v2", "out_v1", "out_v2").foreach { d =>
      assert(java.nio.file.Files.exists(root.resolve(s"state/$d")),
        s"missing $d")
    }
    // the index grew: v1 carries day-0 survivor bands beyond v0's
    val v0 = spark.read.parquet(root.resolve("state/idx_v0").toString).count()
    val v1 = spark.read.parquet(root.resolve("state/idx_v1").toString).count()
    assert(v1 > v0)
  }
}
