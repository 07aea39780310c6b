package graft

import org.apache.spark.sql.Row

import graft.operators.Retrieval

/**
 * Retrieval.rrfFuse / asRankList: reciprocal-rank fusion arithmetic,
 * tie-breaks, list-membership counting, and the k trim — on fixtures
 * where every 1/(k0+rank) term is written out by hand. The cross-engine
 * half (BM25 + cosine + fused replay) is the text_hybrid_rrf gate.
 */
class RetrievalFusionSpec extends GraftSuite {
  import spark.implicits._

  private def ranks(rows: (Long, Int)*) = rows.toSeq.toDF("id", "rnk")

  private def byId(out: Array[Row]): Map[Long, (Long, Double, Long)] =
    out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap

  test("two-list fusion: sums, ordering, and n_lists") {
    val a = ranks(10L -> 1, 20L -> 2, 30L -> 3)
    val b = ranks(20L -> 1, 40L -> 2)
    val out = byId(Retrieval.rrfFuse(Seq(a, b), 60, 10).collect())
    // id 20 appears in both lists: 1/62 + 1/61.
    assert(math.abs(out(20L)._2 - BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(20L)._3 == 2L)
    // Singles: 10 at 1/61 beats 40 at 1/62 beats 30 at 1/63.
    assert(out(10L)._1 == 2L && out(40L)._1 == 3L && out(30L)._1 == 4L,
      s"got $out")
    assert(out(20L)._1 == 1L)
    assert(Seq(10L, 30L, 40L).forall(out(_)._3 == 1L))
  }

  test("equal fused scores tie-break on id") {
    // Same rank in disjoint lists -> identical rrf; lower id wins.
    val out = Retrieval.rrfFuse(
      Seq(ranks(7L -> 1), ranks(3L -> 1)), 60, 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 7L))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("k trims the fused list") {
    val a = ranks(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4)
    assert(Retrieval.rrfFuse(Seq(a), 60, 2).count() == 2)
  }

  test("asRankList ranks by score DESC then id ASC") {
    val scored = Seq((5L, 2.0), (9L, 3.0), (2L, 2.0)).toDF("id", "score")
    val got = Retrieval.asRankList(scored, "id", "score")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(9L -> 1, 2L -> 2, 5L -> 3), s"got $got")
  }

  test("argument validation fails fast") {
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Nil) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(ranks(1L -> 1)), k0 = 0)
    }
    intercept[IllegalArgumentException] { Retrieval.rrfFuseByQuery(Nil) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuseByQuery(
        Seq(Seq((1L, 2L, 1)).toDF("qid", "id", "rnk")), k = 0)
    }
  }

  // ---- query-batched fusion -------------------------------------------------

  test("rrfFuseByQuery slices == rrfFuse run per query") {
    // Two queries with interleaved ids, shared sparse list for q0 only:
    // the batched fusion's per-qid slice must equal the single-query
    // operator fed the same lists.
    val listA = Seq((0L, 10L, 1), (0L, 20L, 2), (1L, 20L, 1), (1L, 40L, 2))
      .toDF("qid", "id", "rnk")
    val listB = Seq((0L, 20L, 1), (0L, 30L, 2), (1L, 10L, 1))
      .toDF("qid", "id", "rnk")
    val batched = Retrieval.rrfFuseByQuery(Seq(listA, listB), 60, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    val single = Seq(0L, 1L).flatMap { q =>
      Retrieval.rrfFuse(Seq(
          listA.where($"qid" === q).select("id", "rnk"),
          listB.where($"qid" === q).select("id", "rnk")), 60, 10)
        .collect()
        .map(r => (q, r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3)))
    }.toSet
    assert(batched == single, s"batched=$batched\nsingle=$single")
  }

  test("the IVF RAG chain's dense coverage is a number that CAN degrade: " +
    "monotone in nprobe, floor pinned at the gate's config") {
    // The pipeline_rag_retrieval_ivf contract: the dense half is the
    // INDEX, so chain recall genuinely responds to the index dial.
    // Everything is deterministic (seeded fixture, deterministic Lloyd),
    // so the coverage values are constants of the build.
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val e = spark.read.parquet(s"${SparkTestBase.sf001}/embeddings.parquet")
    val corpus = e.where(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val qs = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Similarity.trainKMeans(
      corpus.where(col("id") % 4 === 0), "id", "vec", 16, 64, 2)
    val truth = Similarity.bruteForceTopK(corpus, qs, 8)
      .select("qid", "id").cache()
    val nT = truth.count()
    val cov = Seq(1, 2, 3).map { np =>
      Similarity.ivfTopK(corpus, qs, 50, cents, np).select("qid", "id")
        .intersect(truth).count().toDouble / nT
    }
    assert(cov(0) < cov(1) && cov(1) < cov(2),
      s"coverage must respond to nprobe: $cov")
    // The gate's nprobe=3 config: 27/64 on this near-uniform fixture
    // (structureless vectors are the HARD case for IVF — the clustered
    // twin sim_ann_synthetic holds 0.99+ where cluster structure
    // exists). A regression in probe/list assignment shows up here.
    assert(cov(2) >= 0.40, s"nprobe=3 coverage ${cov(2)} < 0.40")
    truth.unpersist()
  }

  // ---- ranking metrics ------------------------------------------------------

  test("rankingMetrics: hand-computed MRR/P/R/nDCG on a 2-query fixture") {
    // q1: truth {10, 20}; ranked 10(rel) @1, 30 @2, 20(rel) @3.
    // q2: truth {40}; the ranker returned NOTHING for it.
    val results = Seq((1L, 10L, 1), (1L, 30L, 2), (1L, 20L, 3))
      .toDF("qid", "id", "rnk")
    val truth = Seq((1L, 10L), (1L, 20L), (2L, 40L)).toDF("qid", "id")
    val out = Retrieval.rankingMetrics(results, truth, 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = out(1L)
    assert(q1.getLong(1) == 2L && q1.getLong(2) == 2L) // n_rel, hits
    assert(q1.getLong(3) == 1L && q1.getDouble(4) == 1.0) // first_rnk, rr
    assert(q1.getDouble(5) == 0.666667 && q1.getDouble(6) == 1.0)
    def g(r: Int) = math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong
    val expNdcg = BigDecimal((g(1) + g(3)).toDouble / (g(1) + g(2)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getDouble(7) == expNdcg, s"ndcg ${q1.getDouble(7)} != $expNdcg")
    val q2 = out(2L)
    assert(q2.getLong(1) == 1L && q2.getLong(2) == 0L)
    assert(q2.isNullAt(3) && q2.getDouble(4) == 0.0)
    assert(q2.getDouble(6) == 0.0 && q2.getDouble(7) == 0.0,
      "a query the ranker missed scores 0, not NULL")
  }

  test("rankingMetrics: perfect ranking scores 1.0 everywhere") {
    val results = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("qid", "id", "rnk")
    val truth = Seq((1L, 10L), (1L, 20L)).toDF("qid", "id")
    val r = Retrieval.rankingMetrics(results, truth, 2).collect().head
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0 &&
      r.getDouble(6) == 1.0 && r.getDouble(7) == 1.0)
  }

  // ---- MMR ----------------------------------------------------------------

  private def cands(rows: (Long, Array[Float], Double)*) =
    rows.toSeq.toDF("id", "vec", "rel")

  test("MMR diversifies: a near-dup of the first pick loses to a lower-rel " +
    "orthogonal item") {
    // b is a near-copy of a (cos ~0.9992): pure relevance would rank it
    // 2nd, but at lambda 0.5 its redundancy penalty (~0.4996) crushes its
    // 0.49 relevance half; orthogonal c (penalty 0) wins the second slot.
    val out = Retrieval.mmrRerank(cands(
      (1L, Array(1f, 0f), 0.99),
      (2L, Array(0.999f, 0.04f), 0.98),
      (3L, Array(0f, 1f), 0.50)),
      "id", "vec", "rel", 3, 0.5).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L), s"got ${out.toSeq}")
    // Step-1 objective is lambda * rel exactly.
    assert(math.abs(out.head.getDouble(2) - 0.495) < 1e-9)
  }

  test("MMR at lambda 1 is pure relevance order; k > n selects all") {
    val out = Retrieval.mmrRerank(cands(
      (1L, Array(1f, 0f), 0.9),
      (2L, Array(0.999f, 0.04f), 0.8)),
      "id", "vec", "rel", 10, 1.0).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("MMR equal objectives tie-break on id") {
    val out = Retrieval.mmrRerank(cands(
      (9L, Array(1f, 0f), 0.7),
      (4L, Array(0f, 1f), 0.7)),
      "id", "vec", "rel", 1, 1.0).collect()
    assert(out.head.getLong(0) == 4L)
  }

  test("MMR validation: lambda range, k, candidate cap") {
    val one = cands((1L, Array(1f, 0f), 0.5))
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerank(one, "id", "vec", "rel", 0, 0.5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerank(one, "id", "vec", "rel", 1, 1.5)
    }
    val big = spark.range(Retrieval.MmrMaxCandidates + 1)
      .selectExpr("id", "array(cast(1.0 as float)) AS vec",
        "cast(id as double) AS rel")
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerank(big, "id", "vec", "rel", 1, 0.5)
    }
  }

  // ---- the fused chain (rrfFuse -> mmrRerank), the rag pipeline's core ----

  test("RRF fusion is list-order commutative; the chained MMR at " +
    "lambda 1 is the fused order, at low lambda it diversifies") {
    val sparse = ranks(1L -> 1, 2L -> 2, 3L -> 3)
    val dense = ranks(2L -> 1, 1L -> 2, 4L -> 3)
    val ab = Retrieval.rrfFuse(Seq(sparse, dense), 60, 10)
      .collect().map(_.toSeq).toSet
    val ba = Retrieval.rrfFuse(Seq(dense, sparse), 60, 10)
      .collect().map(_.toSeq).toSet
    assert(ab == ba, "swapping the input lists must not change the fusion")
    // Vectors: 1 and 2 near-identical; 4 orthogonal. rel = fused rrf.
    val vecs = Map(
      1L -> Array(1f, 0f), 2L -> Array(0.999f, 0.0447f),
      3L -> Array(0.97f, 0.2431f), 4L -> Array(0f, 1f))
    val fused = Retrieval.rrfFuse(Seq(sparse, dense), 60, 10)
    val cand = fused.collect()
      .map(r => (r.getLong(0), vecs(r.getLong(0)), r.getDouble(2)))
      .toSeq.toDF("id", "vec", "rel")
    val fusedOrder = fused.orderBy($"rnk").collect().map(_.getLong(0)).toSeq
    val pure = Retrieval.mmrRerank(cand, "id", "vec", "rel", 3, 1.0)
      .orderBy($"rnk").collect().map(_.getLong(0)).toSeq
    assert(pure == fusedOrder.take(3),
      s"lambda 1 must reproduce the fused order: $pure vs $fusedOrder")
    val diverse = Retrieval.mmrRerank(cand, "id", "vec", "rel", 3, 0.1)
      .orderBy($"rnk").collect().map(_.getLong(0)).toSeq
    // Pick 1 is still the fused top; pick 2 must jump to the orthogonal
    // id 4 instead of the near-duplicate runner-up.
    assert(diverse.head == fusedOrder.head && diverse(1) == 4L,
      s"low lambda must diversify away from the near-dup: $diverse")
  }

  test("MMR fails fast on a zero-norm candidate instead of NaN cosines") {
    val e = intercept[IllegalArgumentException] {
      Retrieval.mmrRerank(cands(
        (1L, Array(1f, 0f), 0.9),
        (7L, Array(0f, 0f), 0.8)), // zero vector: cosine would be 0/0
        "id", "vec", "rel", 2, 0.5)
    }
    assert(e.getMessage.contains("7"), s"must name the offender: $e")
  }

  test("mmrRerankByQuery slices == single-query mmrRerank bit-for-bit") {
    // Two queries with DIFFERENT candidate lists (overlapping ids, so a
    // cross-qid leak would be visible); the batched form's per-qid
    // slices must equal the single-query greedy over each slice exactly
    // — rnk, id, and every rounded objective digit.
    val rnd = new scala.util.Random(5)
    val slices = Map(
      3L -> (0 until 12).map(i =>
        (i.toLong, Array.fill(6)(rnd.nextFloat() * 2f - 1f),
          rnd.nextDouble())),
      9L -> (6 until 20).map(i =>
        (i.toLong, Array.fill(6)(rnd.nextFloat() * 2f - 1f),
          rnd.nextDouble())))
    val batched = slices.toSeq.flatMap { case (qid, rows) =>
      rows.map { case (id, v, rel) => (qid, id, v, rel) }
    }.toDF("qid", "id", "vec", "rel")
    val got = Retrieval.mmrRerankByQuery(batched, "qid", "id", "vec",
        "rel", 5, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = slices.toSeq.flatMap { case (qid, rows) =>
      Retrieval.mmrRerank(cands(rows: _*), "id", "vec", "rel", 5, 0.7)
        .collect()
        .map(r => (qid, r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(got == want, s"per-qid slices diverged:\n got=$got\nwant=$want")
  }

  test("mmrRerankByQuery: total candidate cap and lambda validation") {
    val one = Seq((1L, 2L, Array(1f, 0f), 0.5)).toDF("qid", "id", "vec", "rel")
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerankByQuery(one, "qid", "id", "vec", "rel", 0, 0.5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerankByQuery(one, "qid", "id", "vec", "rel", 2, 1.5)
    }
  }

  test("rrfFuseByQuery: a duplicated (qid, id) row within one list fails " +
    "loudly under the debug conf, passes silently without it") {
    val dup = Seq((1L, 5L, 1), (1L, 5L, 2), (1L, 6L, 3))
      .toDF("qid", "id", "rnk")
    val clean = Seq((1L, 5L, 1), (1L, 6L, 2)).toDF("qid", "id", "rnk")
    // Default (no conf): documented convention, no check — the dup list
    // fuses (inflated, which is exactly why the conf exists).
    assert(Retrieval.rrfFuseByQuery(Seq(dup), k = 5).count() == 2)
    spark.conf.set("spark.graft.fuse.checkUnique", "true")
    try {
      val e = intercept[Exception] {
        Retrieval.rrfFuseByQuery(Seq(dup), k = 5).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => String.valueOf(c.getMessage)
        .contains("duplicate (qid, id)")),
        s"must fail with the named duplicate error, got: $e")
      // A contract-satisfying list still fuses under the check.
      assert(Retrieval.rrfFuseByQuery(Seq(clean), k = 5).count() == 2)
    } finally spark.conf.unset("spark.graft.fuse.checkUnique")
  }
}
