package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Filtered (predicate-aware) ANN: full-dial bit-identity to brute force
 * over the filtered corpus, every served row satisfies the predicate,
 * and the PRE-filter contract strictly beats post-filtering a trimmed
 * shortlist on selective predicates.
 */
class FilteredAnnSpec extends GraftSuite {
  import spark.implicits._

  private val dir = SparkTestBase.sf001

  private def fixture() = {
    val e = Tables.load(spark, dir, "embeddings")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label"))
    val qs = e.where(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Similarity.trainKMeans(
      corpus.where(col("id") % 4 === 0), "id", "vec", 16, 64, 2)
    (corpus, qs, cents)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

  test("full dial: filtered IVF top-k (raw and SQ8-refined) is " +
    "bit-identical to brute force over the filtered corpus") {
    val (corpus, qs, cents) = fixture()
    val pred = col("label").isin(2, 5)
    val brute = rows(Similarity.bruteForceTopK(
      corpus.where(pred).select("id", "vec"), qs, 5))
    // Raw lists, nprobe = every list: the probe covers the corpus.
    val raw = rows(Similarity.ivfFilteredTopK(corpus, qs, 5, cents,
      cents.size, pred))
    assert(raw == brute, "raw filtered probe must equal filtered brute force")
    // SQ8 payload, full dials: refine covers every filtered candidate,
    // so the exact re-rank restores the brute-force answer bit for bit.
    val sq8 = rows(Similarity.ivfSq8FilteredTopK(corpus, qs, 5, cents,
      cents.size, 1000, pred))
    assert(sq8 == brute, "SQ8 filtered probe must equal filtered brute force")
  }

  test("pre-filter contract at gate dials: every served row matches the " +
    "predicate, and pre-filtering strictly beats post-filtering the " +
    "unfiltered shortlist on a selective predicate") {
    val (corpus, qs, cents) = fixture()
    val pred = col("label") === 2 // ~10% selectivity
    val pre = Similarity.ivfFilteredTopK(corpus, qs, 5, cents, 3, pred)
      .cache()
    // Every served id satisfies the predicate.
    val offLabel = pre.join(corpus.where(!pred).select("id"), "id").count()
    assert(offLabel == 0, "filtered probe served a non-matching row")
    // Post-filter strawman: unfiltered top-5 per query, THEN filter —
    // the shortlist was trimmed before the predicate, so matches that
    // ranked 6th+ are gone for good.
    val lists = Similarity.ivfAssignmentsWithAttrs(corpus, "id", "vec",
      cents, Seq("label"))
    val post = Similarity.probeIndex(
        lists.select("cid", "id", "vec"), qs, 5, cents, 3)
      .join(corpus.where(pred).select("id"), "id")
    val nPre = pre.count()
    val nPost = post.count()
    assert(nPre > nPost,
      s"pre-filter ($nPre rows) must strictly beat post-filter ($nPost)")
    // Per query, pre-filter never returns fewer matches than post-filter.
    val preBy = pre.groupBy("qid").count().as[(Long, Long)].collect().toMap
    val postBy = post.groupBy("qid").count().as[(Long, Long)].collect().toMap
    postBy.foreach { case (q, n) =>
      assert(preBy.getOrElse(q, 0L) >= n, s"query $q: pre < post")
    }
  }

  test("refine is counted AFTER the filter: a selective predicate still " +
    "yields k exact-reranked survivors when the probed lists hold them") {
    val (corpus, qs, cents) = fixture()
    val pred = col("label").isin(2, 5)
    // Tight refine = k: with the filter applied BEFORE the shortlist
    // trim, the refine-deep shortlist is all matches, so k survivors
    // come back whenever the probed lists contain k matches — here the
    // full probe guarantees they do.
    val out = Similarity.ivfSq8FilteredTopK(corpus, qs, 5, cents,
      cents.size, 5, pred)
    val perQ = out.groupBy("qid").count().as[(Long, Long)].collect().toMap
    assert(perQ.values.forall(_ == 5L),
      s"expected 5 filtered survivors per query, got $perQ")
    intercept[IllegalArgumentException] {
      Similarity.ivfSq8FilteredTopK(corpus, qs, 5, cents, 3, 4, pred)
    }
  }

  test("PQ path: full-dial filtered IVFxPQ equals brute force over the " +
    "filtered corpus; tight refine still yields k filtered survivors") {
    val (corpus, qs, cents) = fixture()
    val pred = col("label").isin(2, 5)
    val train = corpus.where(col("id") % 4 === 0)
    val books = Similarity.trainPQ(train, "id", "vec", 32, 2, 16, 5)
    val brute = rows(Similarity.bruteForceTopK(
      corpus.where(pred).select("id", "vec"), qs, 5))
    // nprobe = every list, refine >= every filtered candidate: the ADC
    // coarse pass cannot drop a true top-k row, and the exact re-rank
    // restores brute force bit for bit.
    val pq = rows(Similarity.ivfPqFilteredTopK(corpus, qs, 5, cents,
      books, 2, cents.size, 100000, pred))
    assert(pq == brute, "PQ filtered probe must equal filtered brute force")
    // refine counts FILTERED candidates: refine = k still returns k
    // matching rows per query under the full probe.
    val tight = Similarity.ivfPqFilteredTopK(corpus, qs, 5, cents,
      books, 2, cents.size, 5, pred)
    val perQ = tight.groupBy("qid").count().as[(Long, Long)].collect().toMap
    assert(perQ.values.forall(_ == 5L),
      s"expected 5 filtered survivors per query, got $perQ")
  }

  test("attribute names colliding with internal dataflow columns are " +
    "rejected, not silently mis-joined") {
    val (corpus, qs, cents) = fixture()
    val clash = corpus.withColumnRenamed("label", "score")
    intercept[IllegalArgumentException] {
      Similarity.ivfFilteredTopK(clash, qs, 5, cents, 3, col("score") > 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfSq8FilteredTopK(clash, qs, 5, cents, 3, 12,
        col("score") > 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfAssignmentsWithAttrs(corpus.withColumnRenamed(
        "label", "qid"), "id", "vec", cents, Seq("qid"))
    }
  }

  test("streaming fold with attribute payloads: the accumulated state " +
    "serves filtered top-k identical to the one-shot filtered probe at " +
    "the same dials") {
    val (corpus, qs, cents) = fixture()
    val pred = col("label").isin(2, 5)
    val history = corpus.where(col("id") < 200)
    val days = Seq(
      corpus.where(col("id") >= 200 && col("id") < 350),
      corpus.where(col("id") >= 350))
    val root = java.nio.file.Files.createTempDirectory("graft_fltfold")
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
    val served = graft.streaming.EmbeddingIndexStream.incrementalIvfWithAttrs(
      spark, history, logDir.toString, days.head.schema,
      root.resolve("state").toString, "id", "vec", cents, Seq("label"))
    val viaFold = rows(Similarity.probeIndexFiltered(served, qs, 5, cents,
      cents.size, pred))
    val oneShot = rows(Similarity.ivfFilteredTopK(corpus, qs, 5, cents,
      cents.size, pred))
    assert(viaFold == oneShot,
      "folded-state filtered probe must equal the one-shot filtered probe")
  }
}
