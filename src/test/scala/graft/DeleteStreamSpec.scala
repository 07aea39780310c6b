package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextAnalysis}
import graft.streaming.DeleteStream

/**
 * Deletes through the index folds: a deleted doc can NEVER be served
 * from any probe path; the served state equals a fresh build over
 * exactly the surviving corpus; re-inserts after deletes come back;
 * compaction physically removes tombstoned rows.
 */
class DeleteStreamSpec extends GraftSuite {
  import spark.implicits._

  private val dir = SparkTestBase.sf001

  private def stage(root: java.nio.file.Path,
      days: Seq[org.apache.spark.sql.DataFrame]): String = {
    val logDir = root.resolve("days")
    java.nio.file.Files.createDirectories(logDir)
    days.zipWithIndex.foreach { case (slice, i) =>
      val st = root.resolve(s"stage$i").toString
      slice.coalesce(1).write.mode("overwrite").parquet(st)
      val part = new java.io.File(st).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = logDir.resolve(f"day$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    logDir.toString
  }

  test("IVF under deletes: no probe path (raw, SQ8, prefix) can serve a " +
    "deleted id; served lists equal a fresh assignment of survivors; " +
    "a later re-insert comes back") {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val history = corpus.where(col("id") < 200)
    val ins = (lo: Long, hi: Long) =>
      corpus.where(col("id") >= lo && col("id") < hi)
        .withColumn("op", lit("I"))
    val del = (ids: Seq[Long]) => ids.toDF("id")
      .withColumn("vec", lit(null).cast("array<float>"))
      .withColumn("op", lit("D"))
    // batch 1: insert [200, 300) and delete history ids 40, 44
    // batch 2: insert [300, 400), delete batch-1 id 250, RE-INSERT 44
    val reinserted = corpus.where(col("id") === 44)
      .withColumn("op", lit("I"))
    val days = Seq(
      ins(200, 300).unionByName(del(Seq(40L, 44L))),
      ins(300, 400).unionByName(del(Seq(250L))).unionByName(reinserted))
    val root = java.nio.file.Files.createTempDirectory("graft_delivf")
    val logDir = stage(root, days)
    val centroids = Similarity.trainKMeans(
      history.where(col("id") % 4 === 0), "id", "vec", 16, 64, 2)
    val served = DeleteStream.incrementalIvfWithDeletes(spark, history,
      logDir, days.head.schema, root.resolve("state").toString,
      "id", "vec", "op", centroids).cache()
    val survivors = corpus.where(col("id") < 400 && col("id") =!= 40 &&
      col("id") =!= 250)
    // Served lists == fresh assignment of exactly the survivors
    // (44 is back — deleted in batch 1, re-inserted in batch 2).
    val got = served.select("cid", "id").as[(Long, Long)].collect().toSet
    val ref = Similarity.ivfAssignments(survivors, "id", "vec", centroids)
      .select("cid", "id").as[(Long, Long)].collect().toSet
    assert(got == ref)
    assert(got.exists(_._2 == 44L) && !got.exists(_._2 == 40L) &&
      !got.exists(_._2 == 250L))
    // No probe path can serve a deleted id — full dial (nprobe = k
    // centroids, k = corpus) so ANY servable id WOULD be returned.
    val qs = e.where(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nAll = 1000
    val rawIds = Similarity.probeIndex(served, qs, nAll, centroids, 16)
      .select("id").as[Long].collect().toSet
    assert(!rawIds.contains(40L) && !rawIds.contains(250L),
      "deleted id served from the raw probe path")
    assert(rawIds.contains(44L), "re-inserted id must be servable")
    val sq8State = java.nio.file.Files.createTempDirectory("graft_delsq8")
    val sq8 = DeleteStream.incrementalIvfSq8WithDeletes(spark, history,
      logDir, days.head.schema, sq8State.resolve("state").toString,
      "id", "vec", "op", centroids)
    val sq8Ids = Similarity.probeSq8Index(sq8, qs, nAll, centroids, 16)
      .select("id").as[Long].collect().toSet
    assert(!sq8Ids.contains(40L) && !sq8Ids.contains(250L),
      "deleted id served from the SQ8 probe path")
    val matState = java.nio.file.Files.createTempDirectory("graft_delmat")
    val mat = DeleteStream.incrementalIvfMatryoshkaWithDeletes(spark,
      history, logDir, days.head.schema, matState.resolve("state").toString,
      "id", "vec", "op", centroids, 32)
    val matIds = Similarity.probeMatryoshkaIndex(mat, qs, nAll, centroids,
        32, 16)
      .select("id").as[Long].collect().toSet
    assert(!matIds.contains(40L) && !matIds.contains(250L),
      "deleted id served from the prefix probe path")
  }

  test("postings under deletes: bm25FromPostings over the served fold is " +
    "bit-identical to a fresh scan of the surviving corpus (df/avgdl/N " +
    "recomputed); compaction physically drops tombstoned rows") {
    val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val history = d.where(col("doc_id") < 100)
    val ins = (lo: Long, hi: Long) =>
      d.where(col("doc_id") >= lo && col("doc_id") < hi)
        .withColumn("op", lit("I"))
    val del = (ids: Seq[Long]) => ids.toDF("doc_id")
      .withColumn("text", lit(null).cast("string"))
      .withColumn("op", lit("D"))
    val days = Seq(
      ins(100, 200).unionByName(del(Seq(7L, 21L))),
      ins(200, 300).unionByName(del(Seq(150L))),
      ins(300, 350).unionByName(del(Seq(220L))),
      ins(350, 400).unionByName(del(Seq(8L))))
    val root = java.nio.file.Files.createTempDirectory("graft_delpost")
    val logDir = stage(root, days)
    val state = root.resolve("state").toString
    val served = DeleteStream.incrementalPostingsWithDeletes(spark, history,
      logDir, days.head.schema, state, "doc_id", "text", "op",
      retainVersions = 2, compactEvery = 2)
    val deleted = Set(7L, 21L, 150L, 220L, 8L)
    val survivors = d.where(col("doc_id") < 400 &&
      !col("doc_id").isInCollection(deleted))
    val terms = Seq("spark", "window", "customer")
    val viaFold = TextAnalysis.bm25FromPostings(served, terms, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fresh = TextAnalysis.bm25TopK(survivors, "doc_id", "text", terms, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaFold == fresh,
      "BM25 from the delete-aware fold must equal the surviving-corpus scan")
    // Compaction fired at batches 2 and 4: the newest postings base must
    // physically EXCLUDE every doc deleted before its horizon (no
    // tombstone filtering involved — the rows are gone from disk).
    val base4 = spark.read.parquet(s"$state/post_base4")
    val baked = base4.select("doc_id").distinct().as[Long].collect().toSet
    assert(deleted.forall(!baked.contains(_)),
      s"tombstoned docs still physically present after compaction")
    // And the tombstone chain restarted empty at the compaction horizon.
    assert(spark.read.parquet(s"$state/posttmb_base4").count() == 0)
  }
}
