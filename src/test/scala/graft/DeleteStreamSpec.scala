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

  test("IVFxPQ under deletes: served code rows equal a fresh encoding of " +
    "exactly the survivors; the pure-ADC probe never returns a deleted " +
    "id; compaction hard-deletes tombstoned codes") {
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
    val days = Seq(
      ins(200, 300).unionByName(del(Seq(40L, 44L))),
      ins(300, 400).unionByName(del(Seq(250L)))
        .unionByName(corpus.where(col("id") === 44)
          .withColumn("op", lit("I"))))
    val root = java.nio.file.Files.createTempDirectory("graft_delpq")
    val logDir = stage(root, days)
    val state = root.resolve("state").toString
    val train = history.where(col("id") % 4 === 0)
    val centroids = Similarity.trainKMeans(train, "id", "vec", 16, 64, 2)
    val books = Similarity.trainPQ(train, "id", "vec", 32, 2, 16, 5)
    val served = graft.streaming.DeleteStream.incrementalIvfPqWithDeletes(
      spark, history, logDir, days.head.schema, state, "id", "vec", "op",
      centroids, books, 2, compactEvery = 2).cache()
    val survivors = corpus.where(col("id") < 400 && col("id") =!= 40 &&
      col("id") =!= 250)
    val got = served.select("cid", "id", "m", "code")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ref = Similarity.ivfPqAssignments(survivors, "id", "vec",
        centroids, books, 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == ref)
    // Pure-ADC probe at full width cannot surface a deleted id.
    val qs = e.where(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val adcIds = Similarity.probePqIndex(served, qs, 1000, centroids,
        books, 2, 16)
      .select("id").as[Long].collect().toSet
    assert(!adcIds.contains(40L) && !adcIds.contains(250L),
      "deleted id served from the ADC probe path")
    assert(adcIds.contains(44L), "re-inserted id must serve again")
    // compactEvery=2 fired at batch 2: the baked base physically
    // excludes every tombstoned id and the tombstone chain restarted.
    val base2 = spark.read.parquet(s"$state/pq_lists_base2")
    val baked = base2.select("id").distinct().as[Long].collect().toSet
    assert(!baked.contains(40L) && !baked.contains(250L),
      "tombstoned codes still physically present after compaction")
    assert(spark.read.parquet(s"$state/pq_liststmb_base2").count() == 0)
  }

  test("dedup band index under deletes: a deleted doc stops suppressing " +
    "its re-crawl (same batch AND later batch), live docs still " +
    "suppress theirs, corpus-level deletes drop landed docs, and index " +
    "compaction hard-deletes tombstoned bands") {
    // Synthetic texts with per-doc-disjoint shingles: near-dup relations
    // are EXACTLY the planted copies, nothing else.
    def text(i: Long): String =
      (0 until 30).map(j => s"w${i}x$j").mkString(" ")
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def ins(rows: Seq[(Long, String)]) =
      df(rows).withColumn("op", lit("I"))
    def del(ids: Seq[Long]) = ids.toDF("doc_id")
      .withColumn("text", lit(null).cast("string"))
      .withColumn("op", lit("D"))
    val history = df((0L until 40L).map(i => (i, text(i))))
    // b1: delete 7 and 9; SAME batch re-crawls 7's text (50007 — lands,
    // D before I) and live 5's text (60005 — suppressed); fresh 100..109.
    val b1 = ins((100L until 110L).map(i => (i, text(i))) ++
        Seq((50007L, text(7)), (60005L, text(5))))
      .unionByName(del(Seq(7L, 9L)))
    // b2: delete landed 101; LATER-batch re-crawl of deleted 9 (30009 —
    // lands) and of live landed 100 (60100 — suppressed); fresh 200..204.
    val b2 = ins((200L until 205L).map(i => (i, text(i))) ++
        Seq((30009L, text(9)), (60100L, text(100))))
      .unionByName(del(Seq(101L)))
    val root = java.nio.file.Files.createTempDirectory("graft_deldedup")
    val logDir = stage(root, Seq(b1, b2))
    val state = root.resolve("state").toString
    val out = graft.streaming.DedupStream.incrementalMinhashWithDeletes(
      spark, history, logDir, b1.schema, state, "doc_id", "text", "op",
      compactEvery = 2)
    val ids = out.select("doc_id").as[Long].collect().toSet
    val expect = ((100L until 110L).toSet - 101L) ++
      (200L until 205L).toSet ++ Set(50007L, 30009L)
    assert(ids == expect, s"served corpus: ${ids.toSeq.sorted}")
    // Index compaction at batch 2: baked base excludes the tombstoned
    // docs' bands; the index tombstone chain restarted empty.
    val baked = spark.read.parquet(s"$state/idx_base2")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(!baked.contains(7L) && !baked.contains(9L) &&
      !baked.contains(101L),
      "tombstoned bands still physically present after compaction")
    assert(baked.contains(50007L) && baked.contains(30009L))
    assert(spark.read.parquet(s"$state/idxtmb_base2").count() == 0)
  }

  test("tombstones carry the changelog's NATIVE id type: deletes of " +
    "STRING doc ids take effect (no silent cast-to-long null-out)") {
    val d = Tables.load(spark, dir, "documents")
      .select(concat(lit("doc-"), col("doc_id")).as("doc_id"), col("text"))
      .where(col("text").isNotNull)
    val history = d.limit(60).cache()
    val histIds = history.select("doc_id").as[String].collect().toSet
    val later = d.where(!col("doc_id").isInCollection(histIds)).limit(40)
      .cache()
    val laterIds = later.select("doc_id").as[String].collect().toSeq.sorted
    val doomed = Seq(histIds.toSeq.sorted.head, laterIds.head)
    val days = Seq(
      later.withColumn("op", lit("I")),
      doomed.toDF("doc_id").withColumn("text", lit(null).cast("string"))
        .withColumn("op", lit("D")))
    val root = java.nio.file.Files.createTempDirectory("graft_delstr")
    val logDir = stage(root, days)
    val served = DeleteStream.incrementalPostingsWithDeletes(spark, history,
      logDir, days.head.schema, root.resolve("state").toString,
      "doc_id", "text", "op")
    val servedIds = served.select("doc_id").distinct().as[String]
      .collect().toSet
    assert(doomed.forall(!servedIds.contains(_)),
      s"string-id deletes no-opped: ${doomed.filter(servedIds.contains)}")
    val survivorIds = (histIds ++ laterIds).diff(doomed.toSet)
    // Docs with empty token sets produce no postings rows — compare
    // against the fresh postings build, not the raw survivor id set.
    val freshIds = TextAnalysis
      .termPostings(history.unionByName(later)
        .where(!col("doc_id").isInCollection(doomed)), "doc_id", "text")
      .select("doc_id").distinct().as[String].collect().toSet
    assert(servedIds == freshIds)
    assert(servedIds.subsetOf(survivorIds))
  }
}
