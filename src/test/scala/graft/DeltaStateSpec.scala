package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.{DeltaState, EmbeddingIndexStream}

/**
 * The write-amplification contract of the delta-chain folds: batch b
 * physically writes O(batch) bytes, never O(accumulated state) — the
 * property the versioned-full-rewrite discipline (r6–r16) violated
 * (B batches cost O(B²) total I/O; a daily batch at 100 TB rewrote the
 * whole index).
 */
class DeltaStateSpec extends GraftSuite {
  import spark.implicits._

  private def dirBytes(p: java.io.File): Long =
    if (!p.exists()) 0L
    else if (p.isFile) p.length()
    else Option(p.listFiles()).getOrElse(Array.empty).map(dirBytes).sum

  test("primitives: read = base ∪ deltas; due/compact/vacuum keep the " +
    "replay anchors; a replayed delta overwrite is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_dstate").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i"))
      .toDF("id", "v")
    DeltaState.writeBase(df(0, 10), root, "c", 0L)
    DeltaState.writeDelta(df(10, 14), root, "c", 1L)
    DeltaState.writeDelta(df(14, 20), root, "c", 2L)
    // Serving read at each version sees exactly base + deltas <= version.
    assert(DeltaState.read(spark, root, "c", 1L).count() == 14)
    assert(DeltaState.read(spark, root, "c", 2L).count() == 20)
    assert(DeltaState.read(spark, root, "c", 2L)
      .select("id").as[Long].collect().toSet == (0L until 20L).toSet)
    // Replay: re-overwriting a delta with the same content changes nothing.
    DeltaState.writeDelta(df(14, 20), root, "c", 2L)
    assert(DeltaState.read(spark, root, "c", 2L).count() == 20)
    // due() trips at the cadence, resolving the base strictly below the
    // candidate version (a replayed compaction must not see its own base).
    assert(!DeltaState.due(root, "c", 1L, 2))
    assert(DeltaState.due(root, "c", 2L, 2))
    DeltaState.compact(spark, root, "c", 2L)
    assert(spark.read.parquet(s"$root/c_base2").count() == 20)
    // due() right after compaction: base2 serves, no deltas past it.
    assert(!DeltaState.due(root, "c", 3L, 2))
    DeltaState.writeDelta(df(20, 23), root, "c", 3L)
    DeltaState.writeDelta(df(23, 25), root, "c", 4L)
    assert(DeltaState.due(root, "c", 4L, 2))
    DeltaState.compact(spark, root, "c", 4L)
    val deleted = DeltaState.vacuum(root, "c", retain = 2)
    // Newest 2 bases survive; deltas <= the OLDER retained base go; the
    // deltas a replayed batch-4 compaction re-reads (d3, d4) survive.
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(names == Set("c_base2", "c_base4", "c_d3", "c_d4"),
      s"after vacuum: $names (deleted $deleted)")
    assert(DeltaState.read(spark, root, "c", 4L).count() == 25)
    // Replayed compaction at version 4 reproduces base4 from base2+d3+d4.
    DeltaState.compact(spark, root, "c", 4L)
    assert(spark.read.parquet(s"$root/c_base4")
      .select("id").as[Long].collect().toSet == (0L until 25L).toSet)
    // Paired-chain helpers: retainedFloor + vacuumDeltas.
    assert(DeltaState.retainedFloor(root, "c", 2) == 2L)
    DeltaState.writeDelta(df(0, 1), root, "log", 1L)
    DeltaState.writeDelta(df(1, 2), root, "log", 3L)
    DeltaState.vacuumDeltas(root, "log", 2L)
    val logs = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("log_")).toSet
    assert(logs == Set("log_d3"), s"log deltas: $logs")
  }

  test("pack tier: packs absorb trailing deltas without touching the " +
    "accumulated state; reads see base ∪ packs ∪ deltas; vacuum keeps " +
    "the newest pack's input anchors; a replayed pack is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_dspack").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i"))
      .toDF("id", "v")
    DeltaState.writeBase(df(0, 10), root, "c", 0L)
    // 6 batches at packEvery=2 (the incrementalFold wiring, hand-run).
    (1 to 6).foreach { b =>
      DeltaState.writeDelta(df(10 + (b - 1) * 3, 10 + b * 3), root, "c", b)
      assert(DeltaState.packDue(root, "c", b, 2) == (b % 2 == 0),
        s"packDue at batch $b")
      if (DeltaState.packDue(root, "c", b, 2)) {
        DeltaState.pack(spark, root, "c", b)
        DeltaState.vacuum(root, "c", 2)
      }
      // Serving state is complete at every version.
      assert(DeltaState.read(spark, root, "c", b).count() == 10 + b * 3)
    }
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    // No base past the seed (the accumulated state was NEVER rewritten);
    // three packs of two deltas each; the newest pack's input deltas
    // survive as its replay anchors.
    assert(names == Set("c_base0", "c_p2", "c_p4", "c_p6", "c_d5", "c_d6"),
      s"packed layout: $names")
    // Each pack holds exactly its two batches' rows — O(batch*packEvery),
    // independent of the accumulated size.
    assert(spark.read.parquet(s"$root/c_p2").count() == 6)
    assert(spark.read.parquet(s"$root/c_p6").count() == 6)
    // Replayed pack-creating batch: rewrites only its own pack, from the
    // retained anchors, landing identically.
    DeltaState.pack(spark, root, "c", 6L)
    assert(DeltaState.read(spark, root, "c", 6L)
      .select("id").as[Long].collect().toSet == (0L until 28L).toSet)
    // Full compaction subsumes packs and deltas; vacuum then clears them.
    DeltaState.compact(spark, root, "c", 7L)
    assert(spark.read.parquet(s"$root/c_base7").count() == 28)
    DeltaState.vacuum(root, "c", 2)
    val after = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(after == Set("c_base0", "c_base7", "c_p2", "c_p4", "c_p6",
      "c_d5", "c_d6"), s"after base7 vacuum: $after")
  }

  test("state chains run unchanged under an explicit file:/// URI " +
    "stateDir: discovery, pack, compact and vacuum go through the Hadoop " +
    "FileSystem API (the path class hdfs:// and s3a:// resolve through), " +
    "and a live IVF fold serves correctly from a URI stateDir") {
    val localRoot = java.nio.file.Files.createTempDirectory("graft_dsuri")
    val root = localRoot.toUri.toString.stripSuffix("/")
    assert(root.startsWith("file:///"), s"URI root: $root")
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i"))
      .toDF("id", "v")
    DeltaState.writeBase(df(0, 10), root, "c", 0L)
    DeltaState.writeDelta(df(10, 13), root, "c", 1L)
    DeltaState.writeDelta(df(13, 16), root, "c", 2L)
    assert(DeltaState.read(spark, root, "c", 2L).count() == 16)
    // Pack + vacuum: discovery and recursive delete on the URI path.
    assert(DeltaState.packDue(root, "c", 2L, 2))
    DeltaState.pack(spark, root, "c", 2L)
    DeltaState.writeDelta(df(16, 18), root, "c", 3L)
    DeltaState.writeDelta(df(18, 20), root, "c", 4L)
    assert(DeltaState.due(root, "c", 4L, 4))
    DeltaState.compact(spark, root, "c", 4L)
    DeltaState.vacuum(root, "c", 2)
    // d1/d2 survive as the newest pack's replay anchors (p2's inputs).
    val names = streaming.StateFs.listDirNames(root).toSet
    assert(names == Set("c_base0", "c_base4", "c_p2", "c_d1", "c_d2",
      "c_d3", "c_d4"), s"URI-chain layout after vacuum: $names")
    assert(DeltaState.read(spark, root, "c", 4L)
      .select("id").as[Long].collect().toSet == (0L until 20L).toSet)
    // A live fold (seed + 2 micro-batches + serve) over the same URI
    // stateDir — the deployability contract: nothing in the fold family
    // assumes a local POSIX stateDir.
    val e = Tables.load(spark, SparkTestBase.sf001, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .where(col("id") < 300)
    val history = e.where(col("id") < 100)
    val days = Seq(e.where(col("id") >= 100 && col("id") < 200),
      e.where(col("id") >= 200))
    val logDir = localRoot.resolve("days")
    java.nio.file.Files.createDirectories(logDir)
    days.zipWithIndex.foreach { case (slice, i) =>
      val stage = localRoot.resolve(s"stage$i").toString
      slice.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = logDir.resolve(f"day$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val centroids = Similarity.trainKMeans(
      history.where(col("id") % 4 === 0), "id", "vec", 8, 64, 2)
    val served = EmbeddingIndexStream.incrementalIvf(spark, history,
      logDir.toString, days.head.schema, s"$root/state", "id", "vec",
      centroids, packEvery = 2)
    val ref = Similarity.ivfAssignments(e, "id", "vec", centroids)
    assert(served.select("cid", "id").as[(Long, Long)].collect().toSet ==
      ref.select("cid", "id").as[(Long, Long)].collect().toSet)
  }

  test("replaying the exact batch that packed after a vacuum re-lands " +
    "bit-identically: the pack's input deltas are the retained anchors") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsprep").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i"))
      .toDF("id", "v")
    DeltaState.writeBase(df(0, 10), root, "c", 0L)
    def batch(b: Int): Unit = {
      DeltaState.writeDelta(df(10 + (b - 1) * 3, 10 + b * 3), root, "c", b)
      if (DeltaState.packDue(root, "c", b, 2)) {
        DeltaState.pack(spark, root, "c", b)
        DeltaState.vacuum(root, "c", 2)
      }
    }
    (1 to 4).foreach(batch)
    // Batch 4 packed (p4 over d3, d4) and vacuumed. Kill-and-replay the
    // WHOLE batch: the delta write re-lands over d4, packDue must still
    // trip (caps resolve below the half-written p4), and the pack must
    // re-read d3 — which vacuum retained exactly as this replay's anchor.
    val before = streaming.StateFs.listDirNames(root).toSet
    assert(before == Set("c_base0", "c_p2", "c_p4", "c_d3", "c_d4"),
      s"pre-replay layout: $before")
    batch(4)
    val after = streaming.StateFs.listDirNames(root).toSet
    assert(after == before, s"replay changed the layout: $after")
    assert(spark.read.parquet(s"$root/c_p4")
      .select("id").as[Long].collect().toSet == (16L until 22L).toSet)
    assert(DeltaState.read(spark, root, "c", 4L)
      .select("id").as[Long].collect().toSet == (0L until 22L).toSet)
  }

  test("the streaming package touches state paths only through the " +
    "Hadoop FileSystem seam: no non-comment java.io.File use") {
    val dir = new java.io.File("src/main/scala/graft/streaming")
    assert(dir.isDirectory, s"source dir missing: ${dir.getAbsolutePath}")
    val offenders = dir.listFiles().filter(_.getName.endsWith(".scala"))
      .flatMap { f =>
        val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
        val use = java.util.regex.Pattern
          .compile("java\\.io\\.File(?!NotFoundException)")
        lines.zipWithIndex.collect {
          case (l, i) if use.matcher(l).find() &&
            !l.trim.startsWith("*") && !l.trim.startsWith("//") &&
            !l.trim.startsWith("/*") => s"${f.getName}:${i + 1}"
        }
      }
    assert(offenders.isEmpty,
      s"java.io.File on state paths in streaming/: ${offenders.mkString(", ")}")
  }

  test("bytes written per batch are O(batch), not O(accumulated): equal " +
    "batches land equal-sized deltas and the last batch writes a small " +
    "fraction of the accumulated state") {
    val e = Tables.load(spark, SparkTestBase.sf001, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = e.count()
    val history = e.where(col("id") < n / 5)
    // 4 equal-row batches over the remaining ids.
    val cuts = (0 to 4).map(i => n / 5 + i * (n - n / 5) / 4)
    val days = (0 until 4).map(i =>
      e.where(col("id") >= cuts(i) && col("id") < cuts(i + 1)))
    val root = java.nio.file.Files.createTempDirectory("graft_foldbytes")
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
    val centroids = Similarity.trainKMeans(
      history.where(col("id") % 4 === 0), "id", "vec", 8, 64, 2)
    val state = root.resolve("state").toString
    EmbeddingIndexStream.incrementalIvf(spark, history, logDir.toString,
      days.head.schema, state, "id", "vec", centroids)
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    // Exactly one seed base + one delta per batch: no dir was ever
    // rewritten after its batch, so bytes-on-disk per dir == bytes
    // written by that batch.
    assert(names == Set("lists_base0", "lists_d1", "lists_d2", "lists_d3",
      "lists_d4"), s"state layout: $names")
    val deltaBytes = (1 to 4).map(b =>
      dirBytes(new java.io.File(state, s"lists_d$b")))
    val baseBytes = dirBytes(new java.io.File(state, "lists_base0"))
    // Equal batches => near-equal deltas: batch 4 did NOT write more
    // because more had accumulated (the old design's v4 held history +
    // 4 batches, ~5x a delta).
    assert(deltaBytes.max <= 2 * deltaBytes.min,
      s"per-batch written bytes must be flat: $deltaBytes")
    // And the final batch's write is a small fraction of the
    // accumulated state it folded into.
    val accumulated = baseBytes + deltaBytes.sum
    assert(deltaBytes.last * 3 <= accumulated,
      s"batch-4 write ${deltaBytes.last} vs accumulated $accumulated")
  }
}
