package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.EmbeddingIndexStream

/**
 * Streaming IVF index maintenance: vector batches fold into persisted
 * inverted lists; probes against the accumulated state equal the batch
 * answer over the full corpus, and the version chain is vacuumed to the
 * replay anchors.
 */
class EmbeddingIndexStreamSpec extends GraftSuite {
  import spark.implicits._

  private val dir = SparkTestBase.sf001

  /** Stage `days` as one-file-per-batch parquet under root/days with
    * ascending mtimes (maxFilesPerTrigger=1 replays them in order). */
  private def stageDays(root: java.nio.file.Path,
      days: Seq[org.apache.spark.sql.DataFrame]): String = {
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
        java.nio.file.attribute.FileTime.fromMillis(
          1000000000000L + i * 60000L))
    }
    logDir.toString
  }

  test("accumulated lists == batch assignment; probe == batch ivfTopK; retention") {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 300),
      corpus.where(col("id") >= 300 && col("id") < 400),
      corpus.where(col("id") >= 400))
    val root = java.nio.file.Files.createTempDirectory("graft_ivfspec")
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
      history.where(col("id") % 4 === 0), "id", "vec", 16, 64, 2)
    val state = root.resolve("state").toString
    val lists = EmbeddingIndexStream.incrementalIvf(spark, history,
      logDir.toString, days.head.schema, state, "id", "vec", centroids,
      retainVersions = 2)
    // The accumulated index holds exactly the batch assignment of the
    // FULL corpus — streamed arrival changed nothing about placement.
    val streamed = lists.select("cid", "id").as[(Long, Long)].collect().toSet
    val batch = Similarity.ivfAssignments(corpus, "id", "vec", centroids)
      .select("cid", "id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    // Probing the accumulated state == batch IVF top-k over everything.
    val qs = e.where(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaIndex = Similarity.probeIndex(lists, qs, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBatch = Similarity.ivfTopK(corpus, qs, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex == viaBatch)
    // Delta layout: each batch wrote ONLY its own delta — the state dir
    // holds the seed base plus one O(batch) delta per batch, and no
    // full-state rewrite ever happened (no base past 0 without a
    // compaction boundary).
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    assert(names.filter(_.startsWith("lists_")) ==
      Set("lists_base0", "lists_d1", "lists_d2", "lists_d3"),
      s"state chain: $names")
    // A replayed final batch re-lands idempotently: serving state at its
    // input version + its own re-assignment equals the committed fold.
    val replayed = graft.streaming.DeltaState.read(spark, state, "lists", 2)
      .unionByName(Similarity.ivfAssignments(days(2), "id", "vec", centroids))
      .select("cid", "id").as[(Long, Long)].collect().toSet
    assert(replayed == streamed)
    // Compaction cadence: the same fold at compactEvery=2 lands the same
    // rows, with batch 2 compacted into a base and vacuum keeping the
    // replay anchors.
    val root2 = java.nio.file.Files.createTempDirectory("graft_ivfspec_c")
    val state2 = root2.resolve("state").toString
    val lists2 = EmbeddingIndexStream.incrementalIvf(spark, history,
      logDir.toString, days.head.schema, state2, "id", "vec", centroids,
      retainVersions = 2, compactEvery = 2)
    assert(lists2.select("cid", "id").as[(Long, Long)].collect().toSet ==
      streamed, "compaction must be result-invisible")
    val names2 = new java.io.File(state2).listFiles().map(_.getName).toSet
    assert(names2.filter(_.startsWith("lists_")) ==
      Set("lists_base0", "lists_base2", "lists_d1", "lists_d2", "lists_d3"),
      s"compacted chain: $names2")
  }

  test("IVF x PQ: accumulated code lists == batch encoding; probes agree") {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 350),
      corpus.where(col("id") >= 350))
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpqspec")
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
    val train = history.where(col("id") % 4 === 0)
    val centroids = Similarity.trainKMeans(train, "id", "vec", 16, 64, 2)
    val books = Similarity.trainPQ(train, "id", "vec", 32, 2, 16, 5)
    val lists = EmbeddingIndexStream.incrementalIvfPq(spark, history,
      logDir.toString, days.head.schema, root.resolve("state").toString,
      "id", "vec", centroids, books, 2)
    // Assignment and encoding are per-row, so the streamed fold must
    // hold exactly the batch encoding of the full corpus.
    val streamed = lists.select("cid", "id", "m", "code")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Similarity.ivfPqAssignments(corpus, "id", "vec", centroids,
        books, 2)
      .select("cid", "id", "m", "code")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    // Identical state => identical ADC probe answers.
    val qs = e.where(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaStream = Similarity.probePqIndex(lists, qs, 5, centroids, books,
        2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBatch = Similarity.probePqIndex(
        Similarity.ivfPqAssignments(corpus, "id", "vec", centroids, books, 2),
        qs, 5, centroids, books, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaStream == viaBatch)
  }

  test("IVF x SQ8: accumulated code lists == batch quantization; probes agree") {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 350),
      corpus.where(col("id") >= 350))
    val root = java.nio.file.Files.createTempDirectory("graft_ivfsq8spec")
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
    val train = history.where(col("id") % 4 === 0)
    val centroids = Similarity.trainKMeans(train, "id", "vec", 16, 64, 2)
    val lists = EmbeddingIndexStream.incrementalIvfSq8(spark, history,
      logDir.toString, days.head.schema, root.resolve("state").toString,
      "id", "vec", centroids)
    // Quantization and assignment are per-row: the fold must hold exactly
    // the batch state (codes AND scales) of the full corpus.
    val streamed = lists
      .select(col("cid"), col("id"), col("code").cast("string"), col("cmax"))
      .as[(Long, Long, String, Double)].collect().toSet
    val batch = Similarity.ivfSq8Assignments(corpus, "id", "vec", centroids)
      .select(col("cid"), col("id"), col("code").cast("string"), col("cmax"))
      .as[(Long, Long, String, Double)].collect().toSet
    assert(streamed == batch)
    // Identical state => identical integer-dot probe answers.
    val qs = e.where(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaStream = Similarity.probeSq8Index(lists, qs, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaBatch = Similarity.probeSq8Index(
        Similarity.ivfSq8Assignments(corpus, "id", "vec", centroids),
        qs, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaStream == viaBatch)
    intercept[IllegalArgumentException] {
      EmbeddingIndexStream.incrementalIvfSq8(spark, history,
        logDir.toString, days.head.schema, root.resolve("s2").toString,
        "id", "vec", Seq.empty)
    }
  }

  test("rebuildIvf: preserves every row, re-keys to the new quantizer, " +
    "and is deterministic") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val stale = Similarity.trainKMeans(
      corpus.where(col("id") % 4 === 0), "id", "vec", 4, 64, 2)
    val lists = Similarity.ivfAssignments(corpus, "id", "vec", stale)
    val (cents, rebuilt) = EmbeddingIndexStream.rebuildIvf(
      lists, "id", "vec", 16, 64, 2)
    assert(cents.size > 4, s"k=16 rebuild must widen the quantizer: " +
      s"${cents.size}")
    // Row preservation: same id set, vectors untouched.
    val before = lists.select("id").collect().map(_.getLong(0)).toSet
    val after = rebuilt.select("id").collect().map(_.getLong(0)).toSet
    assert(before == after)
    // Re-key: every row's cid is the nearest NEW centroid — the rebuilt
    // lists equal a fresh assignment of the carried vectors.
    val fresh = Similarity.ivfAssignments(
      lists.select(col("id"), col("vec")), "id", "vec", cents)
    assert(rebuilt.exceptAll(fresh).count() == 0 &&
      fresh.exceptAll(rebuilt).count() == 0)
    // Determinism over the same materialized rows.
    val (cents2, _) = EmbeddingIndexStream.rebuildIvf(
      lists, "id", "vec", 16, 64, 2)
    assert(cents.map { case (c, v) => (c, v.toSeq) } ==
      cents2.map { case (c, v) => (c, v.toSeq) })
    intercept[IllegalArgumentException] {
      EmbeddingIndexStream.rebuildIvf(lists, "id", "vec", 0, 64, 2)
    }
  }

  test("incrementalIvfWithRebuild: retrain + re-key fires MID-FOLD at the " +
    "cadence boundary with an atomic version flip; replay is identical") {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 300),
      corpus.where(col("id") >= 300 && col("id") < 400),
      corpus.where(col("id") >= 400))
    val root = java.nio.file.Files.createTempDirectory("graft_ivfrebspec")
    val logDir = stageDays(root, days)
    val stale = Similarity.trainKMeans(
      history.where(col("id") % 4 === 0), "id", "vec", 4, 64, 2)
    val (cents, lists) = EmbeddingIndexStream.incrementalIvfWithRebuild(
      spark, history, logDir, days.head.schema,
      root.resolve("state").toString, "id", "vec", stale,
      rebuildEvery = 2, rebuildK = _ => 16, dim = 64, iters = 2)
    // The rebuild fired at the batch-2 boundary, on what had accumulated
    // BY THEN (history + days 0-1, not day 2): the served quantizer must
    // equal rebuildIvf over exactly that anchor.
    val anchor = Similarity.ivfAssignments(
      history.unionByName(days(0)).unionByName(days(1)), "id", "vec", stale)
    val (centsRef, _) = EmbeddingIndexStream.rebuildIvf(
      anchor, "id", "vec", 16, 64, 2)
    assert(cents.map { case (c, v) => (c, v.toSeq) } ==
      centsRef.map { case (c, v) => (c, v.toSeq) },
      "served centroids must be the batch-2-boundary retrain")
    assert(cents.size > 4, "rebuild must have widened the stale k=4")
    // Atomic pair: day 2 folded AGAINST the rebuilt quantizer, so the
    // final lists equal a fresh full-corpus assignment under `cents` —
    // every row re-keyed, none still on a stale cid.
    val fresh = Similarity.ivfAssignments(corpus, "id", "vec", cents)
      .select("cid", "id").as[(Long, Long)].collect().toSet
    val folded = lists.select("cid", "id").as[(Long, Long)].collect().toSet
    assert(folded == fresh)
    // Replay determinism: the whole fold re-run into a fresh state dir
    // (the restarted-query shape — every batch re-reads its untouched
    // input version) lands bit-identically, rebuild included.
    val root2 = java.nio.file.Files.createTempDirectory("graft_ivfrebspec2")
    val (cents2, lists2) = EmbeddingIndexStream.incrementalIvfWithRebuild(
      spark, history, logDir, days.head.schema,
      root2.resolve("state").toString, "id", "vec", stale,
      rebuildEvery = 2, rebuildK = _ => 16, dim = 64, iters = 2)
    assert(cents.map { case (c, v) => (c, v.toSeq) } ==
      cents2.map { case (c, v) => (c, v.toSeq) })
    assert(lists2.select("cid", "id").as[(Long, Long)].collect().toSet ==
      folded)
    intercept[IllegalArgumentException] {
      EmbeddingIndexStream.incrementalIvfWithRebuild(spark, history, logDir,
        days.head.schema, root.resolve("bad").toString, "id", "vec", stale,
        rebuildEvery = 0, rebuildK = _ => 16, dim = 64, iters = 2)
    }
  }

  test("IVF x Matryoshka: accumulated prefix lists == batch assignment; " +
    "probes agree") {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 350),
      corpus.where(col("id") >= 350))
    val root = java.nio.file.Files.createTempDirectory("graft_ivfmatspec")
    val logDir = stageDays(root, days)
    val centroids = Similarity.trainKMeans(
      history.where(col("id") % 4 === 0), "id", "vec", 16, 64, 2)
    val lists = EmbeddingIndexStream.incrementalIvfMatryoshka(spark, history,
      logDir, days.head.schema, root.resolve("state").toString,
      "id", "vec", centroids, 32)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Seq[Float])] =
      df.select("cid", "id", "prefix").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2))).toSet
    assert(rows(lists) == rows(Similarity.ivfMatryoshkaAssignments(
      corpus, "id", "vec", centroids, 32)))
    val qs = e.where(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaStream = Similarity.probeMatryoshkaIndex(lists, qs, 5, centroids,
        32, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBatch = Similarity.probeMatryoshkaIndex(
        Similarity.ivfMatryoshkaAssignments(corpus, "id", "vec", centroids,
          32), qs, 5, centroids, 32, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaStream == viaBatch)
    intercept[IllegalArgumentException] {
      EmbeddingIndexStream.incrementalIvfMatryoshka(spark, history, logDir,
        days.head.schema, root.resolve("bad").toString, "id", "vec",
        Seq.empty, 32)
    }
  }

  test("incrementalIvfSq8WithRebuild: payload (code, cmax) survives the " +
    "re-key untouched; served centroids are the boundary retrain; replay " +
    "is identical") {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 300),
      corpus.where(col("id") >= 300 && col("id") < 400),
      corpus.where(col("id") >= 400))
    val root = java.nio.file.Files.createTempDirectory("graft_sq8rebspec")
    val logDir = stageDays(root, days)
    val stale = Similarity.trainKMeans(
      history.where(col("id") % 4 === 0), "id", "vec", 4, 64, 2)
    val (cents, lists) = EmbeddingIndexStream.incrementalIvfSq8WithRebuild(
      spark, history, logDir, days.head.schema,
      root.resolve("state").toString, "id", "vec", stale,
      rebuildEvery = 2, rebuildK = _ => 16, dim = 64, iters = 2)
    assert(cents.size > 4, "rebuild must have widened the stale k=4")
    // SQ8 codes are centroid-independent: the folded payload equals the
    // batch-independent quantization of the full corpus, bit for bit,
    // no matter how many re-keys happened.
    def payload(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Int], Double)] =
      df.select("id", "code", "cmax").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toSet
    assert(payload(lists) ==
      payload(Similarity.ivfSq8Assignments(corpus, "id", "vec", stale)))
    // The served quantizer is the batch-2-boundary retrain from CODES
    // ONLY (reconstructions), k grown 4 -> 16.
    val anchor = Similarity.ivfSq8Assignments(
      history.unionByName(days(0)).unionByName(days(1)), "id", "vec", stale)
    val (centsRef, _) = EmbeddingIndexStream.rebuildIvfSq8(anchor, 16, 64, 2)
    assert(cents.map { case (c, v) => (c, v.toSeq) } ==
      centsRef.map { case (c, v) => (c, v.toSeq) },
      "served centroids must be the boundary retrain from reconstructions")
    // Replay determinism: a fresh re-run of the whole fold lands
    // bit-identically, rebuild included.
    val root2 = java.nio.file.Files.createTempDirectory("graft_sq8rebspec2")
    val (cents2, lists2) = EmbeddingIndexStream.incrementalIvfSq8WithRebuild(
      spark, history, logDir, days.head.schema,
      root2.resolve("state").toString, "id", "vec", stale,
      rebuildEvery = 2, rebuildK = _ => 16, dim = 64, iters = 2)
    assert(cents2.map { case (c, v) => (c, v.toSeq) } ==
      cents.map { case (c, v) => (c, v.toSeq) })
    assert(lists2.select("cid", "id").as[(Long, Long)].collect().toSet ==
      lists.select("cid", "id").as[(Long, Long)].collect().toSet)
    intercept[IllegalArgumentException] {
      EmbeddingIndexStream.rebuildIvfSq8(anchor, 0, 64, 2)
    }
  }

  test("incrementalIvfMatryoshkaWithRebuild: prefix payload survives the " +
    "re-key untouched; served centroids are the boundary retrain from " +
    "stored prefixes; replay is identical; full-dim centroids rejected") {
    val e = Tables.load(spark, dir, "embeddings")
    val pdim = 32
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 300),
      corpus.where(col("id") >= 300 && col("id") < 400),
      corpus.where(col("id") >= 400))
    val root = java.nio.file.Files.createTempDirectory("graft_matrebspec")
    val logDir = stageDays(root, days)
    def pfx(df: org.apache.spark.sql.DataFrame, vc: String) =
      df.withColumn(vc, slice(col(vc), 1, pdim))
    // The fold's quantizer lives in PREFIX space.
    val stale = Similarity.trainKMeans(
      pfx(history.where(col("id") % 4 === 0), "vec"), "id", "vec", 4, pdim, 2)
    val (cents, lists) =
      EmbeddingIndexStream.incrementalIvfMatryoshkaWithRebuild(
        spark, history, logDir, days.head.schema,
        root.resolve("state").toString, "id", "vec", stale, pdim,
        rebuildEvery = 2, rebuildK = _ => 16, iters = 2)
    assert(cents.size > 4, "rebuild must have widened the stale k=4")
    assert(cents.forall(_._2.length == pdim),
      "rebuilt quantizer must stay in prefix space")
    // Prefix payload is centroid-independent: the folded payload equals
    // the corpus prefixes bit for bit, however many re-keys happened.
    def payload(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Float])] =
      df.select("id", "prefix").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    assert(payload(lists) == payload(
      Similarity.ivfMatryoshkaAssignments(corpus, "id", "vec",
        Similarity.trainKMeans(pfx(corpus, "vec"), "id", "vec", 4, pdim, 2),
        pdim)))
    // Served centroids = rebuildIvfMatryoshka over exactly what had
    // accumulated by the batch-2 boundary (history + days 0-1).
    val anchor = Similarity.ivfMatryoshkaAssignments(
      pfx(history.unionByName(days(0)).unionByName(days(1)), "vec"),
      "id", "vec", stale, pdim)
    val (centsRef, _) = EmbeddingIndexStream.rebuildIvfMatryoshka(
      anchor, 16, pdim, 2)
    assert(cents.map { case (c, v) => (c, v.toSeq) } ==
      centsRef.map { case (c, v) => (c, v.toSeq) },
      "served centroids must be the boundary retrain from stored prefixes")
    // Replay determinism.
    val root2 = java.nio.file.Files.createTempDirectory("graft_matrebspec2")
    val (cents2, lists2) =
      EmbeddingIndexStream.incrementalIvfMatryoshkaWithRebuild(
        spark, history, logDir, days.head.schema,
        root2.resolve("state").toString, "id", "vec", stale, pdim,
        rebuildEvery = 2, rebuildK = _ => 16, iters = 2)
    assert(cents2.map { case (c, v) => (c, v.toSeq) } ==
      cents.map { case (c, v) => (c, v.toSeq) })
    assert(lists2.select("cid", "id").as[(Long, Long)].collect().toSet ==
      lists.select("cid", "id").as[(Long, Long)].collect().toSet)
    // Full-dim centroids violate the prefix-space contract, fail fast.
    val fullDim = Similarity.trainKMeans(
      history.where(col("id") % 4 === 0), "id", "vec", 4, 64, 2)
    intercept[IllegalArgumentException] {
      EmbeddingIndexStream.incrementalIvfMatryoshkaWithRebuild(
        spark, history, logDir, days.head.schema,
        root.resolve("bad").toString, "id", "vec", fullDim, pdim,
        rebuildEvery = 2, rebuildK = _ => 16, iters = 2)
    }
  }

  test("incrementalIvfPqWithRebuild: generational contract — bv tags per " +
    "arrival epoch, codes kept verbatim, new generation serves only " +
    "later batches; versioned probe degenerates to the flat probe") {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 300),
      corpus.where(col("id") >= 300 && col("id") < 400),
      corpus.where(col("id") >= 400))
    val root = java.nio.file.Files.createTempDirectory("graft_pqrebspec")
    val logDir = stageDays(root, days)
    val train = history.where(col("id") % 4 === 0)
    val stale = Similarity.trainKMeans(train, "id", "vec", 4, 64, 2)
    val books0 = Similarity.trainPQ(train, "id", "vec", 32, 2, 16, 2)
    val (cents, gens, lists) =
      EmbeddingIndexStream.incrementalIvfPqWithRebuild(
        spark, history, logDir, days.head.schema,
        root.resolve("state").toString, "id", "vec", stale, books0, 2,
        rebuildEvery = 2, rebuildK = _ => 16, dim = 64, iters = 2,
        pqK = 16, pqIters = 2)
    // One rebuild fired (after batch 2 of 3) -> exactly two generations,
    // and generation 0's books are the initial ones verbatim.
    assert(gens.map(_._1) == Seq(0L, 1L))
    assert(gens.head._2.map(_.map { case (c, v) => (c, v.toSeq) }) ==
      books0.map(_.map { case (c, v) => (c, v.toSeq) }))
    // bv tags follow arrival epoch: rows ingested before the rebuild
    // (history + days 0-1) carry bv=0; the post-rebuild day-2 batch
    // carries bv=1.
    val bvOf = lists.select("id", "bv").distinct().as[(Long, Long)]
      .collect().toMap
    val preIds = history.unionByName(days(0)).unionByName(days(1))
      .select("id").as[Long].collect().toSet
    val postIds = days(2).select("id").as[Long].collect().toSet
    assert(preIds.forall(bvOf(_) == 0L) && postIds.forall(bvOf(_) == 1L))
    // Codes kept verbatim: bv-0 rows equal the batch encoding under
    // generation-0 books; bv-1 rows under generation-1 books.
    def codes(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("id", "m", "code").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(codes(lists.where(col("bv") === 0L)) ==
      codes(Similarity.ivfPqAssignments(
        corpus.where(col("id").isInCollection(preIds)), "id", "vec",
        stale, books0, 2)))
    assert(codes(lists.where(col("bv") === 1L)) ==
      codes(Similarity.ivfPqAssignments(days(2), "id", "vec",
        cents, gens.last._2, 2)))
    // Versioned probe over a single-generation index == the flat probe
    // (the degenerate case where the per-generation ranking contract
    // coincides with per-query ranking).
    val qs = e.where(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val flatLists = Similarity.ivfPqAssignments(corpus, "id", "vec",
      stale, books0, 2).withColumn("bv", lit(0L))
    val viaV = Similarity.probePqIndexVersioned(flatLists, qs, 5, stale,
        Seq((0L, books0)), 2, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val viaFlat = Similarity.probePqIndex(flatLists.drop("bv"), qs, 5,
        stale, books0, 2, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaV == viaFlat)
    // Replay determinism, generations included.
    val root2 = java.nio.file.Files.createTempDirectory("graft_pqrebspec2")
    val (cents2, gens2, lists2) =
      EmbeddingIndexStream.incrementalIvfPqWithRebuild(
        spark, history, logDir, days.head.schema,
        root2.resolve("state").toString, "id", "vec", stale, books0, 2,
        rebuildEvery = 2, rebuildK = _ => 16, dim = 64, iters = 2,
        pqK = 16, pqIters = 2)
    assert(cents2.map { case (c, v) => (c, v.toSeq) } ==
      cents.map { case (c, v) => (c, v.toSeq) })
    assert(gens2.map { case (bv, bs) =>
      (bv, bs.map(_.map { case (c, v) => (c, v.toSeq) })) } ==
      gens.map { case (bv, bs) =>
        (bv, bs.map(_.map { case (c, v) => (c, v.toSeq) })) })
    assert(lists2.select("cid", "id", "m", "code", "bv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet ==
      lists.select("cid", "id", "m", "code", "bv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet)
  }
}
