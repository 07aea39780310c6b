package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorOps}

/**
 * SQ8 (symmetric int8) and Matryoshka (prefix-dimension) serving paths.
 * Contracts under test: the integer-dot expression matches the HOF
 * composition exactly; the prefix dot matches FloatVecDot over the sliced
 * prefix bit-for-bit; both top-k operators DEGENERATE to the brute-force
 * exact ranking when their approximation dial is opened fully (refine =
 * corpus, pdim = full dim) — the same wprobe=all-groups discipline the
 * hier centroid index is held to; and the recall at gate-scale dials is
 * useful.
 */
class Sq8MatryoshkaSpec extends GraftSuite {
  private val dir = SparkTestBase.sf001
  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val queries = emb.where(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val corpus = emb.where(col("vec_id") >= 5)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("dotInt equals the HOF integer dot; dotPrefix equals dot over slice") {
    val codes = emb.where(col("vec_id") < 40).select(col("vec_id"),
      VectorOps.quantizeInt8(col("embedding")).as("c"), col("embedding"))
    val pairs = codes.as("a").crossJoin(codes.as("b"))
      .where(col("a.vec_id") < col("b.vec_id"))
    val got = pairs.select(
      VectorOps.dotInt(col("a.c"), col("b.c")).as("fast"),
      aggregate(
        zip_with(col("a.c"), col("b.c"),
          (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, v) => acc + v).as("hof"),
      VectorOps.dotPrefix(col("a.embedding"), col("b.embedding"), 16)
        .as("pfast"),
      VectorOps.dot(slice(col("a.embedding"), 1, 16),
        slice(col("b.embedding"), 1, 16)).as("phof")).collect()
    assert(got.length > 100)
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "integer dot must match HOF")
      assert(r.getDouble(2) == r.getDouble(3),
        "prefix dot must be bit-identical to dot over the slice")
    }
  }

  test("dotPrefix at p >= dim degenerates to FloatVecDot bit-for-bit") {
    val r = emb.where(col("vec_id") < 20).select(
      VectorOps.dotPrefix(col("embedding"), col("embedding"), 9999).as("p"),
      VectorOps.dot(col("embedding"), col("embedding")).as("d")).collect()
    r.foreach(x => assert(x.getDouble(0) == x.getDouble(1)))
  }

  test("sq8TopK with refine = corpus size equals brute force bit-for-bit") {
    val n = corpus.count().toInt
    val sq = Similarity.sq8TopK(corpus, queries, 5, n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(sq == brute,
      "full-refine SQ8 must reproduce the exact ranking, scores included")
  }

  test("matryoshkaTopK with pdim = full dim and refine = k equals brute force") {
    val mat = Similarity.matryoshkaTopK(corpus, queries, 64, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(mat == brute,
      "full-prefix Matryoshka must reproduce the exact ranking")
  }

  test("gate-dial recall@5 vs brute force is useful; matryoshka recall is " +
      "monotone in refine (nested shortlists)") {
    val truth = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(pairs: Set[(Long, Long)]): Double =
      truth.intersect(pairs).size.toDouble / truth.size
    val sqRecall = recall(Similarity.sq8TopK(corpus, queries, 5, 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // SQ8 keeps ~7.9 effective bits/dim — near-exact estimates even at a
    // 12-deep shortlist.
    assert(sqRecall > 0.9, s"sq8 recall@5 = $sqRecall")
    // The near-uniform fixture has NO prefix concentration — the hard
    // case for a prefix scan. Recall is structurally monotone in refine
    // (top-refine shortlists are nested) and must clear the gate dial's
    // measured 0.84 with margin at (pdim=32, refine=64).
    val byRefine = Seq(12, 32, 64).map { rf =>
      recall(Similarity.matryoshkaTopK(corpus, queries, 32, 5, rf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    assert(byRefine.zip(byRefine.tail).forall { case (a, b) => a <= b },
      s"recall must not decrease with refine: $byRefine")
    assert(byRefine.last > 0.7, s"matryoshka recall@5 = ${byRefine.last}")
  }

  test("prefix-weighted (matryoshka-trained-like) embeddings: tight dials " +
      "recover the exact top-k") {
    // Scale dim j by 8/(8+j): the information profile matryoshka training
    // produces. The SAME tight dials that read 0.28 on the uniform
    // fixture clear 0.9 here — the operator's intended regime.
    val w = emb.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") * lit(8.0) / (lit(8.0) + i.cast("double")))
          .cast("float")).as("embedding"))
    val q = w.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = w.where(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val truth = Similarity.bruteForceTopK(c, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mat = Similarity.matryoshkaTopK(c, q, 16, 5, 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = truth.intersect(mat).size.toDouble / truth.size
    assert(r > 0.8, s"prefix-weighted recall@5 = $r")
  }

  test("ivfSq8TopK with all lists probed and full refine equals brute force") {
    val train = corpus.where(col("id") % 4 === 0)
    val centroids = Similarity.trainKMeans(train, "id", "vec", 8, 64, 2)
    val n = corpus.count().toInt
    val got = Similarity.ivfSq8TopK(corpus, queries, 5, centroids,
        nprobe = centroids.size, refine = n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == brute,
      "all-lists full-refine IVF x SQ8 must reproduce the exact ranking")
  }

  test("ivfSq8TopK gate dials: recall bounded by the probe, not the codes") {
    val train = corpus.where(col("id") % 4 === 0)
    val centroids = Similarity.trainKMeans(train, "id", "vec", 8, 64, 2)
    val truth = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // SQ8 estimates are near-exact, so IVF x SQ8 at nprobe=p must track
    // the RAW-vector IVF at the same p — the codes add (almost) no loss
    // on top of the probe's.
    val ivfRaw = Similarity.ivfTopK(corpus, queries, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSq8 = Similarity.ivfSq8TopK(corpus, queries, 5, centroids, 3, 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawRecall = truth.intersect(ivfRaw).size.toDouble / truth.size
    val sq8Recall = truth.intersect(ivfSq8).size.toDouble / truth.size
    assert(sq8Recall >= rawRecall - 0.05,
      s"sq8 list recall $sq8Recall must track raw-list recall $rawRecall")
    intercept[IllegalArgumentException] {
      Similarity.ivfSq8TopK(corpus, queries, 5, centroids, 3, 4)
    }
  }

  test("stored-prefix layout: equals the in-memory operator bit-for-bit, " +
      "and the coarse scan PRUNES the vector column") {
    val root = java.nio.file.Files.createTempDirectory("graft_matprefix")
    val staged = root.resolve("layout").toString
    corpus.select(col("id"), slice(col("vec"), 1, 32).as("prefix"),
        col("vec"))
      .write.mode("overwrite").parquet(staged)
    val stored = spark.read.parquet(staged)
    val viaLayout = Similarity.matryoshkaTopKFromPrefix(stored, queries,
      32, 5, 12)
    val got = viaLayout.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val direct = Similarity.matryoshkaTopK(corpus, queries, 32, 5, 12)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == direct,
      "the materialized layout must reproduce the in-memory ranking")
    // The whole point of the layout: the coarse pass's parquet scan reads
    // (id, prefix) ONLY — a scan that drags the full vectors along would
    // erase the dim/pdim IO cut.
    val reads = viaLayout.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.exists(l => l.contains("prefix") && !l.contains("vec:")),
      s"no vector-pruned coarse scan found:\n${reads.mkString("\n")}")
  }

  test("ivfMatryoshkaTopK with full refine equals ivfTopK bit-for-bit at " +
      "equal nprobe; all-lists full-refine equals brute force") {
    val train = corpus.where(col("id") % 4 === 0)
    val centroids = Similarity.trainKMeans(train, "id", "vec", 8, 64, 2)
    val n = corpus.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // refine >= pool at the SAME (centroids, nprobe): identical
    // candidate pool, exact re-rank over all of it — must equal ivfTopK
    // rank for rank, score for score.
    val mat = rows(Similarity.ivfMatryoshkaTopK(corpus, queries, 5,
      centroids, pdim = 16, nprobe = 3, refine = n))
    val raw = rows(Similarity.ivfTopK(corpus, queries, 5, centroids, 3))
    assert(mat == raw,
      "full-refine IVF x Matryoshka must equal raw IVF at equal nprobe")
    // Dial fully open: all lists probed + full refine == brute force.
    val all = rows(Similarity.ivfMatryoshkaTopK(corpus, queries, 5,
      centroids, pdim = 64, nprobe = centroids.size, refine = n))
    assert(all == rows(Similarity.bruteForceTopK(corpus, queries, 5)))
  }

  test("ivfMatryoshkaTopK gate dials: recall tracks the raw-vector IVF") {
    val train = corpus.where(col("id") % 4 === 0)
    val centroids = Similarity.trainKMeans(train, "id", "vec", 8, 64, 2)
    val truth = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRaw = Similarity.ivfTopK(corpus, queries, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfMat = Similarity.ivfMatryoshkaTopK(corpus, queries, 5,
        centroids, 32, 3, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawRecall = truth.intersect(ivfRaw).size.toDouble / truth.size
    val matRecall = truth.intersect(ivfMat).size.toDouble / truth.size
    // Half the dims on near-uniform vectors (the hard, no-prefix-
    // concentration case) still ranks the pool well enough that the
    // 16-deep refine holds most of the probe-bounded recall.
    assert(matRecall >= rawRecall - 0.15,
      s"matryoshka list recall $matRecall must track raw $rawRecall")
    intercept[IllegalArgumentException] {
      Similarity.ivfMatryoshkaTopK(corpus, queries, 5, centroids, 32, 3, 4)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfMatryoshkaAssignments(corpus, "id", "vec", centroids, 0)
    }
  }

  test("compound (prefix x SQ8): full-open dials degenerate to brute " +
      "force; refine >= pool equals ivfTopK; gate-dial recall tracks raw") {
    val train = corpus.where(col("id") % 4 === 0)
    val centroids = Similarity.trainKMeans(train, "id", "vec", 8, 64, 2)
    val n = corpus.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // pdim = dim, all lists, full refine: the estimate ranks the whole
    // pool and the exact re-rank sees all of it — brute force exactly.
    val open = rows(Similarity.ivfMatryoshkaSq8TopK(corpus, queries, 5,
      centroids, pdim = 64, nprobe = centroids.size, refine = n))
    assert(open == rows(Similarity.bruteForceTopK(corpus, queries, 5)))
    // refine >= pool at the same (centroids, nprobe): equals raw IVF.
    val comp = rows(Similarity.ivfMatryoshkaSq8TopK(corpus, queries, 5,
      centroids, pdim = 16, nprobe = 3, refine = n))
    assert(comp == rows(Similarity.ivfTopK(corpus, queries, 5, centroids, 3)),
      "full-refine compound must equal raw IVF at equal nprobe")
    // Gate dials: the 24-deep trim holds most of the probe-bounded
    // recall despite prefix-DOT (not cosine) ranking + int8 noise.
    val truth = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRaw = Similarity.ivfTopK(corpus, queries, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfMatryoshkaSq8TopK(corpus, queries, 5,
        centroids, 32, 3, 24)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawRecall = truth.intersect(ivfRaw).size.toDouble / truth.size
    val gotRecall = truth.intersect(got).size.toDouble / truth.size
    assert(gotRecall >= rawRecall - 0.2,
      s"compound recall $gotRecall must track raw $rawRecall")
    intercept[IllegalArgumentException] {
      Similarity.ivfMatryoshkaSq8TopK(corpus, queries, 5, centroids, 32, 3, 4)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfMatryoshkaSq8Assignments(corpus, "id", "vec",
        centroids, 0)
    }
  }

  test("matryoshkaTopKFromPrefix fails fast on a pdim-mismatched layout") {
    val root = java.nio.file.Files.createTempDirectory("graft_matguard")
    val staged = root.resolve("layout").toString
    // Layout materialized at pdim=16 ...
    corpus.select(col("id"), slice(col("vec"), 1, 16).as("prefix"),
        col("vec"))
      .write.mode("overwrite").parquet(staged)
    val stored = spark.read.parquet(staged)
    // ... queried at pdim=32: without the guard this would silently
    // score a non-cosine (dot over 16 elements, query norm over 32) and
    // quietly degrade recall. The per-row size check raises instead.
    val ex = intercept[Exception] {
      Similarity.matryoshkaTopKFromPrefix(stored, queries, 32, 5, 12)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        String.valueOf(e.getMessage) +: messages(e.getCause))
    assert(messages(ex).exists(_.contains("different prefix dimension")),
      s"expected the layout-mismatch message, got: ${messages(ex)}")
    // Matched pdim still works against the same layout.
    assert(Similarity.matryoshkaTopKFromPrefix(stored, queries, 16, 5, 12)
      .count() == queries.count() * 5)
  }

  test("ranks are 1..k per query and scores descend") {
    val rows = Similarity.sq8TopK(corpus, queries, 5, 12).collect()
    assert(rows.length == queries.count().toInt * 5)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(2))
      assert(byRank.map(_.getLong(2)).toSeq == (1L to 5L))
      val scores = byRank.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("fail-fast dials") {
    intercept[IllegalArgumentException] {
      Similarity.sq8TopK(corpus, queries, 5, 4)
    }
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(corpus, queries, 0, 5, 12)
    }
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(corpus, queries, 16, 5, 4)
    }
  }
}
