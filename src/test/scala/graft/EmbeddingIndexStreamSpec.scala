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
    // Retention: only the newest 2 list versions survive 3 batches.
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    assert(names.filter(_.startsWith("lists_v")) == Set("lists_v2", "lists_v3"),
      s"versions after retention: $names")
    // A replayed final batch re-lands idempotently from the kept anchor.
    val replayed = spark.read.parquet(s"$state/lists_v2").unionByName(
        Similarity.ivfAssignments(days(2), "id", "vec", centroids))
      .select("cid", "id").as[(Long, Long)].collect().toSet
    assert(replayed == streamed)
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
}
