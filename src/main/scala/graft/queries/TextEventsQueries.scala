package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis

/**
 * Correctness queries for text analysis (documents) and the events table
 * (JSON extraction, time-bucketed aggregation, sessionization). Oracles
 * replay the same arithmetic in DuckDB; float outputs are single-division
 * ratios rounded to 6 (deterministic in both engines).
 */
object TextEventsQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Trigram LM counts: (2-word prefix, next word, occurrences >= 2).
    "text_lm_trigrams" -> { (s, dir) =>
      TextAnalysis.ngramNextCounts(docs(s, dir), "text", 3, 2L)
    },
    // PII scrub: the fixture corpus carries no PII, so the gate PLANTS a
    // deterministic email/URL/phone per document (same construction in
    // the oracle), then counts and redacts them. md5 of the redacted text
    // is the whole-string witness.
    "text_pii_redact" -> { (s, dir) =>
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com see "),
        lit("https://ex.com/d"), col("doc_id"), lit(" or 555-123-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.piiCount(aug, TextAnalysis.EmailRe).as("n_emails"),
        TextAnalysis.piiCount(aug, TextAnalysis.UrlRe).as("n_urls"),
        TextAnalysis.piiCount(aug, TextAnalysis.PhoneRe).as("n_phones"),
        md5(TextAnalysis.redactPii(aug)).as("redacted_md5"))
    },
    // BM25 ranked retrieval over the corpus for a 3-term keyword query.
    "text_bm25_topk" -> { (s, dir) =>
      TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "window", "customer"), 15)
    },
    // STREAMING retrieval index: document batches fold into persisted
    // (doc_id, term, tf) postings; BM25 probes the ACCUMULATED state and
    // must equal the batch text scan bit-for-bit (every BM25 aggregate
    // is an integer count in double — order-proof). The oracle is
    // text_bm25_topk's, verbatim.
    "stream_bm25_index" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.where(col("doc_id") < 100)
      val days = Seq(
        d.where(col("doc_id") >= 100 && col("doc_id") < 300),
        d.where(col("doc_id") >= 300))
      val logDir = Staging.batchLog("sbm25", dir, "day", days)
      val postings = graft.streaming.RetrievalStream.incrementalPostings(
        s, history, logDir, days.head.schema,
        s"${Staging.freshStateRoot("graft_sbm25")}/state", "doc_id", "text")
      TextAnalysis.bm25FromPostings(postings,
        Seq("spark", "window", "customer"), 15)
    },
    // DELETES THROUGH THE RETRIEVAL INDEX: a changelog stream (I rows
    // carry text, D rows carry ids) maintains served postings under the
    // tombstone-delta discipline — doc 21 (history) and doc 150
    // (batch 1) are tombstoned; doc 7 is deleted in batch 1 and
    // RE-INSERTED in batch 2, so it serves again. bm25FromPostings
    // derives df/avgdl/N from the served postings themselves, so every
    // score is bit-identical to a fresh scan of the surviving corpus —
    // which is exactly what the oracle replays.
    "stream_index_delete" -> { (s, dir) =>
      import s.implicits._
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.where(col("doc_id") < 100)
      def ins(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("op", lit("I"))
      def del(ids: Seq[Long]) = ids.toDF("doc_id")
        .withColumn("text", lit(null).cast("string"))
        .withColumn("op", lit("D"))
      val days = Seq(
        ins(d.where(col("doc_id") >= 100 && col("doc_id") < 300))
          .unionByName(del(Seq(7L, 21L))),
        ins(d.where(col("doc_id") >= 300))
          .unionByName(del(Seq(150L)))
          .unionByName(ins(d.where(col("doc_id") === 7))))
      val logDir = Staging.batchLog("sbm25del", dir, "day", days)
      val served = graft.streaming.DeleteStream
        .incrementalPostingsWithDeletes(s, history, logDir,
          days.head.schema,
          s"${Staging.freshStateRoot("graft_sbm25del")}/state",
          "doc_id", "text", "op")
      TextAnalysis.bm25FromPostings(served,
        Seq("spark", "window", "customer"), 15)
    },
    // Hybrid retrieval: BM25 top-50 (sparse, the 3-term keyword query)
    // fused with brute-force cosine top-50 (dense, query = embedding 7;
    // doc_id and vec_id index the same corpus) by reciprocal-rank fusion
    // at k0=60, fused top-20. Ranks derive from each list's own
    // (score DESC, id) order; the oracle replays both retrievals and the
    // 1/(60+rank) sum.
    "text_hybrid_rrf" -> { (s, dir) =>
      val sparse = TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "window", "customer"), 50)
        .select(col("doc_id").as("id"), col("score"))
      val e = Tables.load(s, dir, "embeddings")
      val dense = graft.operators.Similarity.bruteForceTopK(
        e.select(col("vec_id").as("id"), col("embedding").as("vec")),
        e.where(col("vec_id") === 7)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        50).select(col("id"), col("rank").as("rnk"))
      graft.operators.Retrieval.rrfFuse(
        Seq(graft.operators.Retrieval.asRankList(sparse, "id", "score"),
          dense), 60, 20)
    },
    // STREAMING hybrid retrieval — the RAG serving path fed entirely
    // from FOLDED state: the sparse half probes the accumulated BM25
    // postings fold (stream_bm25_index's staging, verbatim) and the
    // dense half probes the accumulated IVF list fold
    // (stream_ivf_index's staging, verbatim; query = embedding 7,
    // nprobe 3, exact re-rank top-50), fused by RRF (k0=60, top-20).
    // Both folds equal their batch twins bit-for-bit (their own gates'
    // contract), so the oracle replays batch BM25 + trained IVF probe +
    // the 1/(60+rank) sums — a hash gate across two live streams.
    "stream_hybrid_rrf" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.where(col("doc_id") < 100)
      val days = Seq(
        d.where(col("doc_id") >= 100 && col("doc_id") < 300),
        d.where(col("doc_id") >= 300))
      val logDir = Staging.batchLog("sbm25", dir, "day", days)
      // The two folds are INDEPENDENT live streams over disjoint state
      // dirs; each is a serial micro-batch chain that leaves most cores
      // idle, so they run CONCURRENTLY (guide §2.6 overlap-independent-
      // jobs) — the second stream's tasks back-fill the first's idle
      // capacity. Results are unchanged: nothing downstream reads either
      // fold until both have completed.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val postingsF = Future(graft.streaming.RetrievalStream
        .incrementalPostings(
          s, history, logDir, days.head.schema,
          s"${Staging.freshStateRoot("graft_shyb_bm")}/state", "doc_id",
          "text"))
      val e = Tables.load(s, dir, "embeddings")
      val corpus = e.where(col("vec_id") >= 20)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val ehist = corpus.where(col("id") < 200)
      val edays = Seq(
        corpus.where(col("id") >= 200 && col("id") < 350),
        corpus.where(col("id") >= 350))
      val elogDir = Staging.batchLog("sivf", dir, "day", edays)
      val centroids = graft.operators.Similarity.trainKMeans(
        ehist.where(col("id") % 4 === 0), "id", "vec",
        SimilarityQueries.KmK, 64, SimilarityQueries.KmIters)
      val lists = graft.streaming.EmbeddingIndexStream.incrementalIvf(
        s, ehist, elogDir, edays.head.schema,
        s"${Staging.freshStateRoot("graft_shyb_ivf")}/state", "id", "vec",
        centroids)
      val sparse = TextAnalysis.bm25FromPostings(
        Await.result(postingsF, scala.concurrent.duration.Duration.Inf),
        Seq("spark", "window", "customer"), 50)
        .select(col("doc_id").as("id"), col("score"))
      val q = e.where(col("vec_id") === 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val dense = graft.operators.Similarity.probeIndex(lists, q, 50,
        centroids, 3).select(col("id"), col("rank").as("rnk"))
      graft.operators.Retrieval.rrfFuse(
        Seq(graft.operators.Retrieval.asRankList(sparse, "id", "score"),
          dense), 60, 20)
    },
    // STREAMING hybrid retrieval SERVED FROM THE COMPRESSED FOLD — the
    // r15 family's whole point made end-to-end: identical chain to
    // stream_hybrid_rrf, but the dense half's accumulated state is the
    // IVF x SQ8 fold ((cid, id, code, cmax) — 4x smaller lists, no raw
    // vector in state), probed by the exact-integer-dot estimate
    // (refine = 50), then exact-cosine re-ranked against the corpus
    // before fusing. Proves the compressed index is drop-in on the
    // serving path. Oracle: stream_hybrid_rrf's replay with the SQ8
    // quantize/estimate/shortlist stage inserted before the re-rank.
    "stream_hybrid_rrf_sq8" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.where(col("doc_id") < 100)
      val days = Seq(
        d.where(col("doc_id") >= 100 && col("doc_id") < 300),
        d.where(col("doc_id") >= 300))
      val logDir = Staging.batchLog("sbm25", dir, "day", days)
      // Concurrent independent folds — see stream_hybrid_rrf.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val postingsF = Future(graft.streaming.RetrievalStream
        .incrementalPostings(
          s, history, logDir, days.head.schema,
          s"${Staging.freshStateRoot("graft_shyb8_bm")}/state", "doc_id",
          "text"))
      val e = Tables.load(s, dir, "embeddings")
      val corpus = e.where(col("vec_id") >= 20)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val ehist = corpus.where(col("id") < 200)
      val edays = Seq(
        corpus.where(col("id") >= 200 && col("id") < 350),
        corpus.where(col("id") >= 350))
      val elogDir = Staging.batchLog("sivf", dir, "day", edays)
      val centroids = graft.operators.Similarity.trainKMeans(
        ehist.where(col("id") % 4 === 0), "id", "vec",
        SimilarityQueries.KmK, 64, SimilarityQueries.KmIters)
      val lists = graft.streaming.EmbeddingIndexStream.incrementalIvfSq8(
        s, ehist, elogDir, edays.head.schema,
        s"${Staging.freshStateRoot("graft_shyb8_ivf")}/state", "id", "vec",
        centroids)
      val sparse = TextAnalysis.bm25FromPostings(
        Await.result(postingsF, scala.concurrent.duration.Duration.Inf),
        Seq("spark", "window", "customer"), 50)
        .select(col("doc_id").as("id"), col("score"))
      val q = e.where(col("vec_id") === 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val vo = graft.operators.VectorOps
      val short = graft.operators.Similarity.probeSq8Index(lists, q, 50,
        centroids, 3).select("qid", "id")
      val dense = short
        .join(broadcast(q.withColumn("qnrm", vo.norm(col("qvec")))), "qid")
        .join(corpus.withColumn("nrm", vo.norm(col("vec"))), "id")
        .withColumn("score",
          vo.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
        .withColumn("rnk", row_number().over(Window.partitionBy("qid")
          .orderBy(col("score").desc, col("id"))))
        .where(col("rnk") <= 50)
        .select("id", "rnk")
      graft.operators.Retrieval.rrfFuse(
        Seq(graft.operators.Retrieval.asRankList(sparse, "id", "score"),
          dense), 60, 20)
    },
    // RAG retrieval deployed END-TO-END: BM25 top-50 (sparse) + brute
    // cosine top-50 (dense, query = embedding 7) -> RRF fusion (k0=60,
    // top-20) -> MMR diversified re-rank (lambda 0.7, 8 picks, rel =
    // the fused RRF score) -> ranking metrics of the picks against the
    // dense brute-force top-8 truth. Every stage is individually gated
    // (text_bm25_topk / text_hybrid_rrf / sim_mmr_rerank /
    // sim_rank_metrics); THIS gate replays the whole chain in one
    // oracle, because compositions are where k-trims and rank-contract
    // mismatches hide. Output: one metrics row for the query.
    "pipeline_rag_retrieval" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = e.where(col("vec_id") === 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val sparse = TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "window", "customer"), 50)
        .select(col("doc_id").as("id"), col("score"))
      val dense = graft.operators.Similarity.bruteForceTopK(corpus, q, 50)
        .select(col("id"), col("rank").as("rnk"))
      val fused = graft.operators.Retrieval.rrfFuse(
        Seq(graft.operators.Retrieval.asRankList(sparse, "id", "score"),
          dense), 60, 20)
      val cand = fused.select(col("id"), col("rrf").as("rel"))
        .join(corpus, "id")
      val picks = graft.operators.Retrieval.mmrRerank(
        cand, "id", "vec", "rel", 8, 0.7)
      val truth = graft.operators.Similarity.bruteForceTopK(corpus, q, 8)
        .select(col("qid"), col("id"))
      graft.operators.Retrieval.rankingMetrics(
        picks.select(lit(7L).as("qid"), col("id"), col("rnk")), truth, 8)
    },
    // The SCALE-path RAG chain, multi-query: the dense half is the IVF
    // INDEX (trained quantizer, nprobe 3) instead of brute force, over
    // EIGHT queries — so composition recall is an oracle-checked number
    // that CAN degrade (pipeline_rag_retrieval's brute dense half cannot
    // miss, and its single query makes the per-query metric mean
    // trivial). Chain: shared BM25 top-50 (sparse) + per-query ivfTopK
    // top-50 (dense) -> per-query RRF fusion (k0=60, top-20) -> ranking
    // metrics @8 against per-query brute-force truth over the SAME
    // corpus. One oracle replays training, probes, re-rank, fusion and
    // metrics end to end. Output: one metrics row per query.
    "pipeline_rag_retrieval_ivf" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val corpus = e.where(col("vec_id") >= 20)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val qs = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val centroids = graft.operators.Similarity.trainKMeans(
        corpus.where(col("id") % 4 === 0), "id", "vec",
        SimilarityQueries.KmK, 64, SimilarityQueries.KmIters)
      val dense = graft.operators.Similarity.ivfTopK(corpus, qs, 50,
        centroids, 3).select(col("qid"), col("id"), col("rank").as("rnk"))
      val sparse = TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "window", "customer"), 50)
        .select(col("doc_id").as("id"), col("score"))
      // The keyword query is shared: every dense query fuses with the
      // same sparse list (the serving shape when one text query fans
      // out to several query embeddings).
      val sparseQ = qs.select(col("qid"))
        .crossJoin(broadcast(graft.operators.Retrieval.asRankList(
          sparse, "id", "score")))
      val fused = graft.operators.Retrieval.rrfFuseByQuery(
        Seq(sparseQ, dense), 60, 20)
      val truth = graft.operators.Similarity.bruteForceTopK(corpus, qs, 8)
        .select(col("qid"), col("id"))
      graft.operators.Retrieval.rankingMetrics(
        fused.select(col("qid"), col("id"), col("rnk")), truth, 8)
    },
    // The FULL production serving chain, multi-query, MMR included:
    // pipeline_rag_retrieval_ivf's IVF-dense + shared-BM25 + per-query
    // RRF stages (4 queries here — the greedy oracle unrolls per qid),
    // then the query-batched MMR diversified re-rank (lambda 0.7,
    // 6 picks per query, rel = the fused RRF score, vectors re-joined
    // from the embeddings table). One oracle replays training, probes,
    // fusion, and all four greedy argmax chains end to end. Output:
    // (qid, id, rnk, mmr) — selection order per query.
    "pipeline_rag_retrieval_mmr" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val corpus = e.where(col("vec_id") >= 20)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val qs = e.where(col("vec_id") < 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val centroids = graft.operators.Similarity.trainKMeans(
        corpus.where(col("id") % 4 === 0), "id", "vec",
        SimilarityQueries.KmK, 64, SimilarityQueries.KmIters)
      val dense = graft.operators.Similarity.ivfTopK(corpus, qs, 50,
        centroids, 3).select(col("qid"), col("id"), col("rank").as("rnk"))
      val sparse = TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "window", "customer"), 50)
        .select(col("doc_id").as("id"), col("score"))
      val sparseQ = qs.select(col("qid"))
        .crossJoin(broadcast(graft.operators.Retrieval.asRankList(
          sparse, "id", "score")))
      val fused = graft.operators.Retrieval.rrfFuseByQuery(
        Seq(sparseQ, dense), 60, 20)
      val cand = fused.select(col("qid"), col("id"), col("rrf").as("rel"))
        .join(e.select(col("vec_id").as("id"), col("embedding").as("vec")),
          "id")
      graft.operators.Retrieval.mmrRerankByQuery(
        cand, "qid", "id", "vec", "rel", 6, 0.7)
    },
    // Overlapping token-window chunking (RAG/training prep): 20-token
    // windows, stride 10 (50% overlap), full-coverage tiling.
    "text_chunking" -> { (s, dir) =>
      TextAnalysis.chunkByTokens(docs(s, dir), "doc_id", "text", 20, 10)
    },
    "text_token_stats" -> { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_distinct"),
        TextAnalysis.pieceCount(col("text")).as("n_pieces"),
        round(TextAnalysis.meanTokenLength(col("text")), 6).as("mean_tok_len"))
    },
    "text_quality" -> { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        round(TextAnalysis.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(TextAnalysis.alnumRatio(col("text")), 6).as("alnum_ratio"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
    },
    "text_langid" -> { (s, dir) =>
      docs(s, dir)
        .select(col("lang"), TextAnalysis.languageId(col("text")).as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
    },
    // Langid CONFIDENCE per doc: top-2 profile hits, margin, and the
    // mixed-language flag — the post-langid routing signal. Exact
    // integer hit counts; the oracle replays the sorted-scores form.
    "text_langid_margin" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          TextAnalysis.languageIdDetail(col("text")).as("d"))
        .select(col("doc_id"), col("d.lang").as("lang"),
          col("d.best_hits").as("best_hits"),
          col("d.second_hits").as("second_hits"),
          col("d.margin").as("margin"), col("d.is_mixed").as("is_mixed"))
    },
    // Per-doc 5-gram novelty: fraction of a doc's distinct grams that
    // exist in no other document — the soft-dedup sampling weight. The
    // fixture's planted near-dups show up as low-novelty docs.
    "text_ngram_novelty" -> { (s, dir) =>
      TextAnalysis.ngramNovelty(docs(s, dir), "doc_id", "text", 5)
    },
    // Gopher-class repetition signals (duplicate-token mass, top token /
    // top bigram dominance) — the quality filters that catch degenerate
    // text whole-document dedup can't.
    "text_repetition" -> { (s, dir) =>
      TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text")
    },
    // Inverted index (df/cf + doc_id-sorted posting lists), flattened
    // back to rows so the exact oracle checks the whole structure.
    "text_inverted_index" -> { (s, dir) =>
      TextAnalysis.invertedIndex(docs(s, dir), "doc_id", "text", minDf = 2L)
        .select(col("term"), col("df"), col("cf"),
          posexplode(col("postings")))
        .select(col("term"), col("df"), col("cf"),
          col("pos").cast("long").as("pos"),
          col("col.doc_id").as("doc_id"), col("col.tf").as("tf"))
    },
    // Top-3 characteristic terms per doc by smoothed TF-IDF.
    "text_tfidf_top" -> { (s, dir) =>
      TextAnalysis.tfidfTopTerms(docs(s, dir), "doc_id", "text", 3)
    },
    // Rolling z-score anomaly detection on hourly per-type event counts
    // (trailing-24-bucket baseline, current bucket excluded).
    "events_anomaly" -> { (s, dir) =>
      val hourly = events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      graft.operators.TimeSeries.rollingZScores(
        hourly, Seq("event_type"), "h", "n", 24)
    },
    // Winsorization at the per-type nearest-rank [p5, p95] band; the
    // roll-up counts clips and sums the clamped values in exact cents.
    "events_winsorize" -> { (s, dir) =>
      graft.operators.FeatureScaling.winsorize(
          events(s, dir), Seq("event_type"), "value", 0.05, 0.95)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("clipped_lo"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("clipped_hi"), 1L).otherwise(0L)).as("n_hi"),
          sum(round(col("value_w") * 100).cast("long")).as("cents_w"))
    },
    // Robust per-type location/scale: exact nearest-rank median + MAD on
    // the cents measure (value-exact in both engines, no interpolation).
    "events_robust_stats" -> { (s, dir) =>
      graft.operators.FeatureScaling.robustStats(
        events(s, dir).select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents")),
        Seq("event_type"), "cents")
    },
    // Per-type standardization of the exact-cents measure; z per event.
    "events_standardize" -> { (s, dir) =>
      graft.operators.FeatureScaling.standardize(
          events(s, dir).select(col("event_id"), col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
          Seq("event_type"), col("cents"))
        .select("event_id", "z")
    },
    // Hourly gap-fill + forward-fill: irregular per-user events become a
    // regular hourly grid from each user's first to last active hour; the
    // per-hour representative value is PICKED (latest by ts, event_id),
    // so doubles survive the fill exactly. 150-user slice keeps the
    // output grid (users x hour-span) gate-sized.
    "events_gapfill" -> { (s, dir) =>
      graft.operators.TimeSeries.gapFillHourly(
        events(s, dir).where(col("user_id") % 10 === 0),
        "user_id", "ts", "event_id", "value")
    },
    "text_rolling_hash" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.rollingHash(col("text")).as("rhash"))
    },
    "text_fingerprint_bottomk" -> { (s, dir) =>
      TextAnalysis.bottomKFingerprint(docs(s, dir), "doc_id", "text")
    },
    "events_json_extract" -> { (s, dir) =>
      events(s, dir).select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },
    // VARIANT twin of events_json_extract: Spark 4's native
    // semi-structured type — props parsed ONCE into the binary variant
    // encoding, fields read with variant_get (typed path access, no
    // re-parse per extraction — the shredded-JSON scale path). Same
    // truth, same oracle arithmetic.
    "events_variant_extract" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          variant_get(col("v"), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },
    "events_hourly" -> { (s, dir) =>
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
    },
    "events_sessions" -> { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val withGap = events(s, dir)
        .withColumn("prev_s", lag(unix_timestamp(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_s").isNull ||
            unix_timestamp(col("ts")) - col("prev_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      withGap.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
            .as("duration_s"))
    },
    "events_top_error_users" -> { (s, dir) =>
      events(s, dir).where(col("event_type") === "error")
        .groupBy("user_id").agg(count(lit(1)).as("n_errors"))
        .orderBy(col("n_errors").desc, col("user_id"))
        .limit(10)
    },
    // Funnel: users whose first 'view' is followed by a 'purchase' within
    // 30 minutes — the classic conversion measure, composed from
    // per-user min/exists (one shuffle by user).
    "events_funnel" -> { (s, dir) =>
      val ev = events(s, dir)
      val firstView = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t0"))
      val converted = firstView.join(
          ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("tp")),
          Seq("user_id"))
        .where(col("tp") > col("t0") &&
          col("tp") <= col("t0") + expr("INTERVAL 30 MINUTES"))
        .select("user_id").distinct()
      firstView.select(count(lit(1)).as("n_viewers")).crossJoin(
        converted.select(count(lit(1)).as("n_converted")))
    },
    // Benchmark decontamination: eval set = every 20th doc (id % 20 = 7);
    // each remaining corpus doc gets its distinct-trigram overlap with the
    // eval set and a >=20% contamination flag. Integer counts only.
    "text_decontaminate" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.operators.Decontaminate.ngramOverlap(
        d.where(col("doc_id") % 20 =!= 7),
        d.where(col("doc_id") % 20 === 7),
        "doc_id", "text", k = 5, num = 1, den = 5)
    },
    // Bloom-prefiltered decontamination: bit-identical to
    // text_decontaminate (Bloom filters have no false negatives; the
    // exact semi-join eliminates the false positives), so the oracle is
    // the same SQL verbatim — what the gate pins is that the probe
    // rewrite stays a pure prefilter. At scale the broadcast shrinks
    // from the full eval-gram string table to ~1.2 MB per million grams
    // and non-candidate grams drop before the semi-join's hash table.
    "text_decontaminate_bloom" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.operators.Decontaminate.ngramOverlapBloom(
        d.where(col("doc_id") % 20 =!= 7),
        d.where(col("doc_id") % 20 === 7),
        "doc_id", "text", k = 5, num = 1, den = 5,
        expectedGrams = 1L << 16, fpp = 0.01)
    },
    // STREAMING decontamination: the eval gram set screens document
    // micro-batches as they arrive (the broadcast rides each batch's
    // plan — no state), batches land idempotently; the accumulated
    // screen equals the batch screen per doc, so the oracle is
    // text_decontaminate's, verbatim.
    "stream_decontaminate" -> { (s, dir) =>
      val d = docs(s, dir)
      val evalSet = d.where(col("doc_id") % 20 === 7)
      val corpus = d.where(col("doc_id") % 20 =!= 7).select("doc_id", "text")
      val days = Seq(corpus.where(col("doc_id") % 2 === 0),
        corpus.where(col("doc_id") % 2 === 1))
      val logDir = Staging.batchLog("sdec", dir, "day", days)
      val root = Staging.freshStateRoot("graft_sdec")
      val stream = s.readStream.schema(days.head.schema)
        .option("maxFilesPerTrigger", 1).parquet(logDir)
      graft.streaming.EventStream.runForeachBatch(s, stream, (batch, id) =>
        graft.operators.Decontaminate.ngramOverlap(
            batch, evalSet, "doc_id", "text", k = 5, num = 1, den = 5)
          .write.mode("overwrite").parquet(s"$root/screened/batch_id=$id"))
      s.read.parquet(s"$root/screened")
        .select("doc_id", "n_grams", "n_shared", "contaminated")
    },
    // In-engine-TRAINED quality classifier: logistic regression over
    // hashed bag-of-words presence features (64 buckets, 3 full-batch
    // rounds, fixed-point weights). Train: docs 0..199 as "good" vs the
    // same docs vowel-stripped (ids +10000) as "bad"; score the 200..299
    // holdout plus its stripped twins. Margins are exact scaled-integer
    // BIGINTs; the oracle unrolls all 3 gradient rounds in DuckDB and
    // hash-matches the trained margins bit-for-bit.
    "text_quality_model" -> { (s, dir) =>
      val d = docs(s, dir)
      val stripped = (df: DataFrame) => df
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", regexp_replace(col("text"), "[aeiou]", ""))
      val good = d.where(col("doc_id") < 200)
      val train = good.withColumn("label", lit(1))
        .unionAll(stripped(good).withColumn("label", lit(0)))
      val holdBase = d.where(col("doc_id") >= 200 && col("doc_id") < 300)
      val hold = holdBase.unionAll(stripped(holdBase))
      val (w, b) = graft.operators.QualityModel.trainLogReg(
        train, "doc_id", "text", "label",
        numBuckets = QmBuckets, iters = QmIters, lr = QmLr)
      graft.operators.QualityModel.score(
        hold, "doc_id", "text", QmBuckets, w, b)
    },
    // STREAMING model deployment: the SAME trained quality model scores
    // document micro-batches as they arrive — train offline, score
    // online. Weights ride into every batch's plan as literals (no state,
    // no join); per-batch idempotent landing keyed on batch_id; the
    // accumulated scores equal the batch scoring bit-for-bit, so the
    // oracle is text_quality_model's, verbatim.
    "stream_quality_score" -> { (s, dir) =>
      val d = docs(s, dir)
      val stripped = (df: DataFrame) => df
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", regexp_replace(col("text"), "[aeiou]", ""))
      val good = d.where(col("doc_id") < 200)
      val train = good.withColumn("label", lit(1))
        .unionAll(stripped(good).withColumn("label", lit(0)))
      val holdBase = d.where(col("doc_id") >= 200 && col("doc_id") < 300)
      val hold = holdBase.unionAll(stripped(holdBase))
        .select("doc_id", "text")
      val (w, b) = graft.operators.QualityModel.trainLogReg(
        train, "doc_id", "text", "label",
        numBuckets = QmBuckets, iters = QmIters, lr = QmLr)
      val days = Seq(hold.where(col("doc_id") % 2 === 0),
        hold.where(col("doc_id") % 2 === 1))
      val logDir = Staging.batchLog("sqs", dir, "day", days)
      val root = Staging.freshStateRoot("graft_sqs")
      val stream = s.readStream.schema(days.head.schema)
        .option("maxFilesPerTrigger", 1).parquet(logDir)
      graft.streaming.EventStream.runForeachBatch(s, stream, (batch, id) =>
        graft.operators.QualityModel.score(
            batch, "doc_id", "text", QmBuckets, w, b)
          .write.mode("overwrite").parquet(s"$root/scored/batch_id=$id"))
      s.read.parquet(s"$root/scored")
        .select("doc_id", "margin_scaled", "pred_good")
    },
    // HTML boilerplate extraction: each doc is wrapped in a deterministic
    // page (head script/style + comment, nav/ad/footer link-heavy divs
    // around the prose) built identically in the oracle. Link-density
    // keeps the two prose blocks and drops all three boilerplate blocks;
    // page_chars witnesses the whole-page stripMarkup path (script bodies
    // with bare '<' removed before tag stripping).
    "text_html_extract" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), htmlPage.as("html"))
      graft.operators.HtmlExtract.extractMainContent(d, "doc_id", "html")
        .join(d.select(col("doc_id"),
          length(graft.operators.HtmlExtract.stripMarkup(col("html")))
            .cast("long").as("page_chars")), Seq("doc_id"))
    },
    // End-to-end web-corpus manifest: HTML pages -> main-content
    // extraction -> registered-domain tag -> exact dedup on the EXTRACTED
    // text -> quality floor -> eval-set decontamination -> exact mixture
    // quotas by lang. Every stage is an individually-gated operator; the
    // oracle replays the whole chain.
    "pipeline_web_manifest" -> { (s, dir) =>
      val d = docs(s, dir)
      val pages = d.select(col("doc_id"), col("lang"),
        htmlPage.as("html"), messyUrl.as("url"))
      val evalIds = d.where(col("doc_id") % 20 === 7).select("doc_id")
      graft.operators.Pipeline.webCorpusManifest(pages, "doc_id", "html",
        "url", "lang", evalIds, WebMixWeights, WebMixTotal,
        minQuality = 0.9)
    },
    // Per-doc LM score under the corpus-trained add-one trigram model:
    // exact fixed-point log-prob sums, mean NLL rounded once at the end.
    "text_lm_perplexity" -> { (s, dir) =>
      TextAnalysis.lmPerplexity(docs(s, dir), "doc_id", "text", 3)
    },
    // CCNet-style head/middle/tail cut: per-language perplexity tiles,
    // rolled up to the (lang, bucket) decision table a pipeline reads
    // before dropping or down-weighting the tail.
    "text_ppl_buckets" -> { (s, dir) =>
      TextAnalysis.perplexityBuckets(docs(s, dir), "doc_id", "text", "lang")
    },
    // DSIR importance scores: target = every 10th document (the "curated
    // reference" stand-in), raw = the whole corpus; hashed unigram+bigram
    // bucket LMs (1024 buckets, add-1), per-doc mean log-ratio. The
    // oracle replays the md5 bucket hash, both count tables, the
    // floor-quantized per-bucket ratios, and the exact integer sums.
    "text_dsir_scores" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.operators.DataSelection.dsirScores(
        d, d.where(col("doc_id") % 10 === 0), "doc_id", "text", 1024)
    },
    // STREAMING DSIR model: the raw-corpus bucket counts fold per
    // document batch (lossless integer merge); scoring the corpus from
    // the ACCUMULATED model must equal the batch scan bit-for-bit —
    // the oracle is text_dsir_scores' verbatim.
    "stream_dsir_model" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.where(col("doc_id") < 100)
      val days = Seq(
        d.where(col("doc_id") >= 100 && col("doc_id") < 300),
        d.where(col("doc_id") >= 300))
      val logDir = Staging.batchLog("sdsir", dir, "day", days)
      val rawCounts = graft.streaming.RetrievalStream.incrementalDsirCounts(
        s, history, logDir, days.head.schema,
        s"${Staging.freshStateRoot("graft_sdsir")}/state", "text", 1024)
      graft.operators.DataSelection.dsirScoresFromCounts(
        d, "doc_id", "text", 1024,
        graft.operators.DataSelection.bucketCounts(
          d.where(col("doc_id") % 10 === 0), "text", 1024),
        rawCounts)
    },
    // TEXT drift: KL/JS divergence between the two corpus halves' hashed
    // unigram+bigram bucket LMs — the vocabulary/topic-shift monitor
    // (numeric twin: diag_drift_psi). One row; the oracle replays every
    // quantized per-bucket term.
    "text_ngram_drift" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.operators.DataSelection.bucketDivergence(
        d.where(col("doc_id") < 250), d.where(col("doc_id") >= 250),
        "text", 1024)
    },
    // STREAMING drift: the doc_id >= 250 half arrives in batches and its
    // bucket-count model FOLDS; divergence of the static < 250 reference
    // vs the accumulated state must equal the batch scan bit-for-bit —
    // oracle is text_ngram_drift's verbatim.
    "stream_ngram_drift" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val cur = d.where(col("doc_id") >= 250)
      val history = cur.where(col("doc_id") < 350)
      val days = Seq(
        cur.where(col("doc_id") >= 350 && col("doc_id") < 430),
        cur.where(col("doc_id") >= 430))
      val logDir = Staging.batchLog("sndrift", dir, "day", days)
      val folded = graft.streaming.RetrievalStream.incrementalDsirCounts(
        s, history, logDir, days.head.schema,
        s"${Staging.freshStateRoot("graft_sndrift")}/state", "text", 1024)
      graft.operators.DataSelection.bucketDivergenceFromCounts(
        graft.operators.DataSelection.bucketCounts(
          d.where(col("doc_id") < 250), "text", 1024), folded, 1024)
    },
    // DSIR deployed end-to-end: score the corpus against the target
    // sample and keep the top 20% — the selection pipeline a pretraining
    // run actually consumes. Oracle = the DSIR replay + the exact rank
    // cut.
    "pipeline_dsir_select" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.operators.DataSelection.dsirSelect(
        d, d.where(col("doc_id") % 10 === 0), "doc_id", "text", 0.2, 1024)
    },
    // The SCALE form of the DSIR selection: same scoring replay, but the
    // top-20% cut comes from the mergeable histogram sketch's 0.8
    // quantile (width 1000 micros) instead of a global rank — no window,
    // no single-partition exchange over the scored rows. Every step is
    // deterministic, so the oracle replays sketch + cut + filter exactly
    // (hash gate); the ±one-bucket rank tolerance vs the exact form is
    // the spec's contract (DataSelectionSpec).
    "pipeline_dsir_threshold" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.operators.DataSelection.dsirSelectByThreshold(
        d, d.where(col("doc_id") % 10 === 0), "doc_id", "text", 0.2, 1024,
        1000L)
    },
    // STREAMING threshold selection — DSIR deployed continuously:
    // documents arrive in batches, each batch is scored ON ARRIVAL
    // against STATIC models (target = the curated sample's LM; proposal
    // = the history slice's LM, fixed like the IVF quantizer), and both
    // the scored rows AND the histogram sketch FOLD per batch; the top-
    // 20% cut is read from the folded sketch. Static models make
    // per-batch scores final and the sketch merge is lossless count
    // addition, so the kept set equals the one-pass batch computation
    // bit-for-bit — the stream_ngram_drift verbatim-oracle contract.
    "stream_dsir_threshold" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.where(col("doc_id") < 100)
      val days = Seq(
        d.where(col("doc_id") >= 100 && col("doc_id") < 300),
        d.where(col("doc_id") >= 300))
      val logDir = Staging.batchLog("sdsel", dir, "day", days)
      val ds = graft.operators.DataSelection
      graft.streaming.RetrievalStream.incrementalDsirThreshold(
        s, history, logDir, days.head.schema,
        s"${Staging.freshStateRoot("graft_sdsel")}/state", "doc_id", "text",
        0.2, 1024, 1000L,
        ds.bucketCounts(d.where(col("doc_id") % 10 === 0), "text", 1024),
        ds.bucketCounts(history, "text", 1024))
    },
    // Collocation PMI over forward word pairs (gap 1-2): the phrase
    // signal a tokenizer/vocab builder reads; one ln() on exact integer
    // products, floor-quantized — fully hash-gated.
    "text_word_pmi" -> { (s, dir) =>
      TextAnalysis.wordPmi(docs(s, dir), "text")
    },
    // First-order Markov transitions over per-user event sequences:
    // exact counts + fixed-point conditional probabilities.
    "events_transition_matrix" -> { (s, dir) =>
      graft.operators.TimeSeries.transitionMatrix(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
    },
    // STREAMING transition fold: event batches arrive in event-time
    // order (staged as a before/after 2024-01-16 split) and fold into
    // persisted transition counts WITH boundary stitching — a user's
    // last event of batch 0 and first of batch 1 form a real
    // transition, carried through the per-user last-event state. The
    // accumulated matrix must equal the batch computation over all
    // events (same oracle verbatim).
    "stream_transition_matrix" -> { (s, dir) =>
      val ev = events(s, dir)
        .select("user_id", "ts", "event_id", "event_type")
      val cut = lit("2024-01-16").cast("timestamp")
      val days = Seq(ev.where(col("ts") < cut), ev.where(col("ts") >= cut))
      val logDir = Staging.batchLog("strans", dir, "day", days)
      graft.streaming.TimeSeriesStream.incrementalTransitions(
        s, logDir, days.head.schema,
        s"${Staging.freshStateRoot("graft_strans")}/state",
        "user_id", "event_type", "ts", "event_id")
    },
    // Event-log -> training-sequence export: per-user ordered state
    // strings (total order via the struct sort, partition-independent).
    "events_user_sequences" -> { (s, dir) =>
      graft.operators.TimeSeries.keyedSequences(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
    },
    // SPAN-level eval decontamination: verbatim 8-token eval windows
    // found at ANY offset in corpus docs, with exact contaminated-token
    // interval union — catches pasted eval answers that distinct-gram
    // overlap dilutes.
    "text_decontaminate_spans" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.operators.Decontaminate.spanOverlap(
        d.where(col("doc_id") % 20 =!= 7),
        d.where(col("doc_id") % 20 === 7),
        "doc_id", "text")
    },
    // Behavioral perplexity: per-user mean NLL under the corpus-trained
    // Markov model — bots and broken clients surface as the high tail.
    "events_sequence_likelihood" -> { (s, dir) =>
      graft.operators.TimeSeries.sequenceLikelihood(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
    },
    // Cohort retention: users grouped by first-seen week, distinct
    // active users per week offset — the product-analytics staple; two
    // user-keyed aggregates, Monday-truncated weeks in both engines.
    "events_cohort_retention" -> { (s, dir) =>
      val ev = events(s, dir)
      val cohorts = ev.groupBy("user_id")
        .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort"))
      ev.select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
        .join(cohorts, "user_id")
        .groupBy(col("cohort").cast("string").as("cohort"),
          expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    },
    // In-engine-TRAINED BPE: 8 merge rounds over the corpus word table;
    // the oracle unrolls all 8 rounds (pair count -> argmax -> literal
    // replace) and must reproduce the merge table bit-for-bit.
    "text_bpe_merges" -> { (s, dir) =>
      graft.operators.BpeTokenizer.trainBpeMerges(docs(s, dir), "text", BpeRounds)
    },
    // The trained merges applied back to the corpus: per-doc piece counts
    // and compression ratio (chars per piece).
    "text_bpe_tokenize" -> { (s, dir) =>
      val m = graft.operators.BpeTokenizer
        .trainBpeMerges(docs(s, dir), "text", BpeRounds)
        .orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2)))
      graft.operators.BpeTokenizer.tokenizeStats(
        docs(s, dir), "doc_id", "text", m.toSeq)
    },
    // Top-500 corpus vocabulary -> per-doc OOV token mass.
    "text_vocab_coverage" -> { (s, dir) =>
      TextAnalysis.vocabCoverage(docs(s, dir), "doc_id", "text", 500)
    },
    // STREAMING global top-k: corpus word counts maintained across two
    // document micro-batches (complete-mode aggregation + in-stream
    // sort/limit — legal only in Complete mode); the final table must
    // equal the batch top-10, which is the oracle.
    "stream_topk_words" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val slices = Seq(d.where(col("doc_id") % 2 === 0),
        d.where(col("doc_id") % 2 === 1))
      val logDir = Staging.batchLog("stopk", dir, "day", slices)
      val stream = s.readStream.schema(slices.head.schema)
        .option("maxFilesPerTrigger", 1).parquet(logDir)
      val topk = stream.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(10)
      graft.streaming.EventStream.runToMemory(s, topk,
        s"stream_topk_words_${System.nanoTime()}")
    },
    // Unicode text normalization (NFC + accent strip + lowercase): the
    // pre-tokenization canonicalize; accented fixture chars are injected
    // since the base corpus is ASCII. Oracle replays via DuckDB
    // lower(strip_accents(nfc_normalize(...))).
    "text_normalize" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.normalizeText(concat(col("text"),
          lit(" Café NAÏVE Über piñata Çedilla")))
          .as("text_norm"))
    },
    // URL canonicalization: messy synthetic URLs (mixed-case scheme/host,
    // userinfo, ports, www., tracking params, fragments) built identically
    // in the oracle; output is the canonical form + registered domain.
    "text_url_normalize" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"), messyUrl.as("url"))
        .select(col("doc_id"),
          graft.operators.UrlOps.normalizeUrl(col("url")).as("url_norm"),
          graft.operators.UrlOps.registeredDomain(col("url")).as("domain"))
    },
    // In-engine-TRAINED unigram-LM (SentencePiece-class) vocabulary:
    // 2 hard-EM rounds (segment under the candidate set, keep the top
    // pieces by usage, re-segment) over the distinct-word table; the
    // oracle unrolls both rounds — candidate generation, the priority-
    // ordered greedy cover as chained literal replaces, and the exact
    // integer usage counts — and must reproduce the vocabulary
    // bit-for-bit.
    "text_unigram_vocab" -> { (s, dir) =>
      graft.operators.UnigramTokenizer.trainUnigram(
        docs(s, dir), "text", UgPieces, UgRounds)
    },
    // The trained unigram vocabulary applied back to the corpus: per-doc
    // piece counts + compression, directly comparable with
    // text_bpe_tokenize (same output shape, same health check).
    "text_unigram_tokenize" -> { (s, dir) =>
      val vocab = graft.operators.UnigramTokenizer.trainUnigram(
          docs(s, dir), "text", UgPieces, UgRounds)
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      graft.operators.UnigramTokenizer.tokenizeStats(
        docs(s, dir), "doc_id", "text", vocab)
    },
  )

  private val QmBuckets = 64
  private val QmIters = 3
  private val QmLr = 1.0
  private val BpeRounds = 8
  private val UgPieces = 16
  private val UgRounds = 2
  private val WebMixWeights =
    Map("en" -> 0.4, "es" -> 0.3, "de" -> 0.2, "fr" -> 0.1)
  private val WebMixTotal = 120L

  /** The deterministic messy-URL fixture (Spark Column form), shared by
    * text_url_normalize and the web pipeline. */
  private def messyUrl: org.apache.spark.sql.Column = {
    val tld = when(col("doc_id") % 3 === 0, ".ExAmple.COM:443")
      .when(col("doc_id") % 3 === 1, ".Site.NET:8080")
      .otherwise(".Docs.ORG")
    val pathPart = when(col("doc_id") % 2 === 0,
      concat(lit("/Path/"), col("doc_id"))).otherwise(lit(""))
    concat(lit("HTTPS://user:pw@WWW."), col("source"), tld,
      pathPart, lit("?utm_source=feed&id="), col("doc_id"),
      lit("&gclid=abc&q=x%20y&utm_campaign=z#frag"))
  }

  /** DuckDB replay of [[messyUrl]] (an expression over documents rows). */
  private val duckMessyUrl: String =
    """('HTTPS://user:pw@WWW.' || source ||
      |  CASE WHEN doc_id % 3 = 0 THEN '.ExAmple.COM:443'
      |       WHEN doc_id % 3 = 1 THEN '.Site.NET:8080'
      |       ELSE '.Docs.ORG' END ||
      |  CASE WHEN doc_id % 2 = 0 THEN '/Path/' || doc_id ELSE '' END ||
      |  '?utm_source=feed&id=' || doc_id ||
      |  '&gclid=abc&q=x%20y&utm_campaign=z#frag')"""
      .stripMargin.replace("\n", " ")

  /** The deterministic HTML-page fixture (Spark Column form), shared by
    * text_html_extract and the web pipeline. */
  private def htmlPage: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>Doc "), col("doc_id"),
    lit("</title><script type=\"text/javascript\">var x = 1; " +
      "if (x < 2) { x = 3; }</script><style>.a { color: red; }" +
      "</style></head><body>"),
    lit("<div class=\"nav\"><a href=\"/\">Home</a> " +
      "<a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></div>"),
    lit("<p>"), col("text"), lit("</p>"),
    lit("<div class=\"ad\"><a href=\"x\">Buy</a> " +
      "<a href=\"y\">Now</a> cheap</div>"),
    lit("<p>Tail paragraph "), col("doc_id"), lit(" &amp; more</p>"),
    lit("<!-- tracking pixel --><div class=\"footer\">" +
      "<a href=\"/tos\">Terms</a> &nbsp; <a href=\"/p\">Privacy</a> " +
      "copyright</div></body></html>"))

  /** DuckDB replay of [[htmlPage]] + HtmlExtract.extractMainContent: the
    * `h` (pages) through `agg` (doc_id, n_blocks, n_kept, content) CTE
    * chain, shared by text_html_extract and the web pipeline oracle. */
  private lazy val duckHtmlCtes: String =
    s"""h AS (SELECT doc_id,
       |  '<html><head><title>Doc ' || doc_id ||
       |  '</title><script type="text/javascript">var x = 1; if (x < 2) { x = 3; }</script><style>.a { color: red; }</style></head><body>' ||
       |  '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>' ||
       |  '<p>' || text || '</p>' ||
       |  '<div class="ad"><a href="x">Buy</a> <a href="y">Now</a> cheap</div>' ||
       |  '<p>Tail paragraph ' || doc_id || ' &amp; more</p>' ||
       |  '<!-- tracking pixel --><div class="footer"><a href="/tos">Terms</a> &nbsp; <a href="/p">Privacy</a> copyright</div></body></html>'
       |  AS html FROM documents),
       |l AS (SELECT doc_id,
       |  regexp_extract_all(html, '<(?:p|div)[^>]*>(.*?)</(?:p|div)>', 1)
       |  AS bl FROM h),
       |b AS (SELECT doc_id, i AS pos, bl[i + 1] AS blk
       |      FROM l, unnest(range(len(bl))) t(i)),
       |c AS (SELECT doc_id, pos,
       |    trim(regexp_replace(regexp_replace(blk, '<[^>]*>', ' ', 'g'),
       |      ' +', ' ', 'g')) AS vtxt,
       |    trim(regexp_replace(${duckDecode(
             "regexp_replace(blk, '<[^>]*>', ' ', 'g')")},
       |      ' +', ' ', 'g')) AS ctxt,
       |    length(COALESCE(array_to_string(regexp_extract_all(blk,
       |      '<a[^>]*>([^<]*)</a>', 1), ''), '')) AS alen
       |  FROM b),
       |k AS (SELECT doc_id, pos, ctxt,
       |    alen * 3 <= length(vtxt) * 1 AS keep FROM c),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
       |    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    COALESCE(string_agg(CASE WHEN keep THEN ctxt END, ' '
       |      ORDER BY pos), '') AS content
       |  FROM k GROUP BY doc_id)""".stripMargin

  /** Unrolled DuckDB replay of BpeTokenizer.trainBpeMerges: per-round
    * pair-count CTE, total-tie-order argmax, and the SAME literal
    * `|A||B|` -> `|AB|` replace. Produces w0..w{k} (word, freq, s) and
    * m1..m{k} (l, r2, c). Mirrors the engine's early stop: m{r} is empty
    * when no pair occurs twice (c >= 2 gate) and w{r} then falls through
    * unchanged (COALESCE over the NULL-pattern replace), so on a corpus
    * that exhausts pairs before k rounds both sides emit the same
    * truncated merge table. */
  private def duckBpeCtes(k: Int): String = {
    val base =
      """wf AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE word <> '' AND word NOT LIKE '%|%' GROUP BY word),
        |w0 AS MATERIALIZED (SELECT word, freq,
        |    '|' || array_to_string(regexp_extract_all(word, '.'), '||') || '|'
        |      AS s
        |  FROM wf)""".stripMargin
    val rounds = (1 to k).map { r =>
      s"""p$r AS MATERIALIZED (SELECT t.l, t.r2, CAST(SUM(t.freq) AS BIGINT) AS c FROM (
         |    SELECT freq, toks[u.i] AS l, toks[u.i + 1] AS r2
         |    FROM (SELECT freq,
         |            string_split(substr(s, 2, length(s) - 2), '||') AS toks
         |          FROM w${r - 1}) x,
         |         unnest(range(1, len(toks))) u(i)) t
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT l, r2, c FROM p$r WHERE c >= 2
         |  ORDER BY c DESC, l, r2 LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word, freq, COALESCE(replace(s,
         |    '|' || (SELECT l FROM m$r) || '||' || (SELECT r2 FROM m$r) || '|',
         |    '|' || (SELECT l FROM m$r) || (SELECT r2 FROM m$r) || '|'), s) AS s
         |  FROM w${r - 1})""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** Unrolled DuckDB replay of UnigramTokenizer.trainUnigram: candidate
    * substrings (len 2..4, corpus-weighted occurrences), then per EM
    * round a priority CTE (len desc, weight desc, piece asc) and the
    * greedy cover as a statically-unrolled chain of literal replaces
    * (char-split form of the prio-j piece -> the piece as one token),
    * then exact integer usage counts and the top-V M-step. COALESCE
    * makes step j a no-op when the vocabulary has fewer than j pieces
    * (NULL pattern -> NULL replace -> fall through), mirroring the
    * engine's shorter fold. Produces uv1..uv{rounds}; with
    * `withFinalSeg` also ufin_0..ufin_{v} — the corpus word table
    * segmented under the FINAL vocabulary (what tokenizeStats applies). */
  private def duckUnigramCtes(v: Int, rounds: Int,
      withFinalSeg: Boolean = false): String = {
    val base =
      s"""uw AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         |    '|' || array_to_string(regexp_extract_all(word, '.'), '||') || '|'
         |      AS s
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word
         |        FROM documents)
         |  WHERE word <> '' AND word NOT LIKE '%|%' GROUP BY word),
         |ucand AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS w
         |  FROM (SELECT freq, substr(word, u.i + 1, ls.l) AS piece
         |        FROM uw, unnest([2, 3, 4]) ls(l),
         |             unnest(range(len(word) - ls.l + 1)) u(i))
         |  GROUP BY piece),
         |uv0 AS MATERIALIZED (SELECT piece, w FROM ucand
         |  ORDER BY w DESC, piece LIMIT ${2 * v})""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val steps = if (r == 1) 2 * v else v
      val prio =
        s"""up$r AS MATERIALIZED (SELECT piece,
           |  ROW_NUMBER() OVER (ORDER BY len(piece) DESC, w DESC, piece)
           |    AS prio FROM uv${r - 1}),
           |ua${r}_0 AS (SELECT word, freq, s FROM uw)""".stripMargin
      val folds = (1 to steps).map { j =>
        s"""ua${r}_$j AS (SELECT word, freq, COALESCE(replace(s,
           |    '|' || array_to_string(regexp_extract_all(
           |      (SELECT piece FROM up$r WHERE prio = $j), '.'), '||') || '|',
           |    '|' || (SELECT piece FROM up$r WHERE prio = $j) || '|'), s)
           |    AS s FROM ua${r}_${j - 1})""".stripMargin
      }
      val tally =
        s"""ut$r AS MATERIALIZED (SELECT tok, CAST(SUM(freq) AS BIGINT) AS w
           |  FROM (SELECT freq,
           |          unnest(string_split(substr(s, 2, length(s) - 2), '||'))
           |            AS tok
           |        FROM ua${r}_$steps)
           |  WHERE len(tok) >= 2 GROUP BY tok),
           |uv$r AS MATERIALIZED (SELECT tok AS piece, w FROM ut$r
           |  ORDER BY w DESC, tok LIMIT $v)""".stripMargin
      (prio +: folds :+ tally).mkString(",\n")
    }
    val finalSeg = if (!withFinalSeg) Nil else {
      val prio =
        s"""upfin AS MATERIALIZED (SELECT piece,
           |  ROW_NUMBER() OVER (ORDER BY len(piece) DESC, w DESC, piece)
           |    AS prio FROM uv$rounds),
           |ufin_0 AS (SELECT word, freq, s FROM uw)""".stripMargin
      val folds = (1 to v).map { j =>
        s"""ufin_$j AS (SELECT word, freq, COALESCE(replace(s,
           |    '|' || array_to_string(regexp_extract_all(
           |      (SELECT piece FROM upfin WHERE prio = $j), '.'), '||') || '|',
           |    '|' || (SELECT piece FROM upfin WHERE prio = $j) || '|'), s)
           |    AS s FROM ufin_${j - 1})""".stripMargin
      }
      List((prio +: folds).mkString(",\n"))
    }
    (base +: roundCtes ++: finalSeg).mkString(",\n")
  }

  // ---- DuckDB oracles ------------------------------------------------------

  /** DuckDB replay of HtmlExtract.decodeEntities (same order, `&amp;`
    * last). `&#39;` decodes to an escaped single quote. */
  private def duckDecode(e: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "''",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(e) { case (acc, (a, b)) =>
        s"regexp_replace($acc, '$a', '$b', 'g')"
      }

  /** Unrolled DuckDB replay of QualityModel.trainLogReg over a `train`
    * CTE (doc_id, text, label): hashed presence features, fixed-point
    * weights, and the integer rational sigmoid (BIGINT `//` division —
    * Spark's `div` twin on the non-negative operands) — bit-identical to
    * the Spark training loop with no libm call on either side. Produces
    * w{iters} / b{iters}. */
  private def duckLogRegCtes(iters: Int, buckets: Int, lr: Double): String = {
    val base =
      s"""feats AS (SELECT DISTINCT doc_id,
         |    ('0x' || substr(md5(w), 1, 15))::BIGINT % $buckets AS bucket
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM train) WHERE w <> ''),
         |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM train),
         |w0 AS (SELECT u.b AS bucket, CAST(0 AS BIGINT) AS ws
         |       FROM unnest(range($buckets)) u(b)),
         |b0 AS (SELECT CAST(0 AS BIGINT) AS bs)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""m$r AS (SELECT t.doc_id, t.label,
         |    CAST(COALESCE(SUM(w.ws), 0) + MIN(b.bs) AS BIGINT) AS ms
         |  FROM train t CROSS JOIN b${r - 1} b
         |  LEFT JOIN feats f ON f.doc_id = t.doc_id
         |  LEFT JOIN w${r - 1} w ON w.bucket = f.bucket
         |  GROUP BY t.doc_id, t.label),
         |g$r AS (SELECT doc_id, CAST(label AS BIGINT) * 1048576
         |    - (1048576 * (2097152 + abs(ms) + ms))
         |      // (2 * (2097152 + abs(ms))) AS g FROM m$r),
         |w$r AS (SELECT w.bucket, w.ws + CAST(floor(COALESCE(gs.s, 0)::DOUBLE
         |      * $lr / (SELECT n FROM nn)) AS BIGINT) AS ws
         |  FROM w${r - 1} w LEFT JOIN (SELECT f.bucket, SUM(g.g) AS s
         |    FROM feats f JOIN g$r g USING (doc_id) GROUP BY 1) gs
         |    USING (bucket)),
         |b$r AS (SELECT b.bs + CAST(floor(SUM(g.g)::DOUBLE * $lr
         |      / (SELECT n FROM nn)) AS BIGINT) AS bs
         |  FROM b${r - 1} b, g$r g GROUP BY b.bs)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** Decontamination replay (eval grams + per-doc overlap) — shared by
    * the batch gate and the streaming gate, whose accumulated per-batch
    * screens must equal the batch screen per doc. */
  private lazy val duckDecontaminateSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 5
      |    THEN list_transform(range(len(t) - 4),
      |           i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))
      |    ELSE [array_to_string(t, ' ')] END) AS g FROM toks),
      |ev AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 20 = 7),
      |corpus AS (SELECT doc_id, g FROM sh WHERE doc_id % 20 <> 7),
      |ex AS (SELECT doc_id, unnest(g) AS gram FROM corpus),
      |shared AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |           FROM ex WHERE gram IN (SELECT gram FROM ev)
      |           GROUP BY doc_id)
      |SELECT c.doc_id, CAST(len(c.g) AS BIGINT) AS n_grams,
      |  COALESCE(s.n_shared, 0) AS n_shared,
      |  COALESCE(s.n_shared, 0) * 5 >= len(c.g) * 1 AS contaminated
      |FROM corpus c LEFT JOIN shared s USING (doc_id)""".stripMargin

  /** Full quality-model replay (train + holdout scoring) — shared by the
    * batch gate and the streaming-deployment gate, whose accumulated
    * per-batch scores must equal the batch margins bit-for-bit. */
  private lazy val duckQualityModelSql: String =
    s"""WITH train AS (
       |  SELECT doc_id, text, 1 AS label FROM documents WHERE doc_id < 200
       |  UNION ALL
       |  SELECT doc_id + 10000, regexp_replace(text, '[aeiou]', '', 'g'), 0
       |  FROM documents WHERE doc_id < 200),
       |hold AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id >= 200 AND doc_id < 300
       |  UNION ALL
       |  SELECT doc_id + 10000, regexp_replace(text, '[aeiou]', '', 'g')
       |  FROM documents WHERE doc_id >= 200 AND doc_id < 300),
       |${duckLogRegCtes(QmIters, QmBuckets, QmLr)},
       |hfeats AS (SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5(w), 1, 15))::BIGINT % $QmBuckets AS bucket
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM hold) WHERE w <> '')
       |SELECT h.doc_id,
       |  CAST(COALESCE(SUM(w.ws), 0) + MIN(b.bs) AS BIGINT) AS margin_scaled,
       |  (COALESCE(SUM(w.ws), 0) + MIN(b.bs)) > 0 AS pred_good
       |FROM hold h CROSS JOIN b$QmIters b
       |LEFT JOIN hfeats f ON f.doc_id = h.doc_id
       |LEFT JOIN w$QmIters w ON w.bucket = f.bucket
       |GROUP BY h.doc_id""".stripMargin

  private val enStop = TextAnalysis.langProfiles.head._2
    .map(w => s"'$w'").mkString("[", ", ", "]")

  /** Unrounded DuckDB replay of TextAnalysis.qualityScore (term order
    * matches the Spark expression exactly) — shared with the pipeline
    * oracle. */
  private[queries] val duckQualityExpr: String =
    s"""(0.4 * least(len(string_split(text, ' '))::DOUBLE / 100.0, 1.0)
       | + 0.3 * (length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))::DOUBLE
       |          / length(text)::DOUBLE)
       | + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),
       |            t -> list_contains($enStop, t)))::DOUBLE
       |          / len(string_split(text, ' '))::DOUBLE))""".stripMargin

  private[queries] val duckLangCase: String = {
    val scores = TextAnalysis.langProfiles.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      lang -> s"len(list_intersect(list_distinct(string_split(text, ' ')), $lst))"
    }
    val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    scores.foldRight("'und'") { case ((lang, s), acc) =>
      s"CASE WHEN $s = best AND $s > 0 THEN '$lang' ELSE $acc END"
    }.replace("best", best) // inline; DuckDB lacks lateral alias reuse here
  }

  /** DuckDB replay of [[TextAnalysis.lmPerplexity]] (n=3) as a CTE chain
    * ending in `ppl (doc_id, n_grams, nll_scaled, avg_nll)` — shared by
    * the perplexity gate and the CCNet-style bucket gate. */
  private val duckPplCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |g AS (SELECT doc_id, array_to_string(tk[u.i+1 : u.i+2], ' ') AS prefix,
      |        tk[u.i+3] AS next
      |      FROM t CROSS JOIN
      |        unnest(range(0, (SELECT MAX(len(tk)) - 2 FROM t))) u(i)
      |      WHERE u.i <= len(tk) - 3),
      |pc AS (SELECT prefix, next, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
      |pf AS (SELECT prefix, SUM(cnt) AS pcnt FROM pc GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT next) AS v FROM pc),
      |sc AS (SELECT g.doc_id, CAST(floor(
      |    ln((cnt + 1)::DOUBLE / (pcnt + v)::DOUBLE) * 1000000.0) AS BIGINT)
      |    AS lp
      |  FROM g JOIN pc USING (prefix, next) JOIN pf USING (prefix)
      |  CROSS JOIN v),
      |ppl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(-SUM(lp) AS BIGINT) AS nll_scaled,
      |  round(CAST(-SUM(lp) AS DOUBLE)
      |        / CAST(COUNT(*) * 1000000 AS DOUBLE), 6) AS avg_nll
      |FROM sc GROUP BY doc_id)""".stripMargin

  /** Shared DSIR replay (batch gate + streaming-fold gate): bucket
    * hash, both count LMs, quantized ratios, exact sums. */
  /** The hashed-feature CTE body shared by every DSIR oracle. */
  private def duckDsirFeats(rel: String, withId: Boolean): String = {
      val B = 1024
      val idSel = if (withId) "doc_id, " else ""
      val idT = if (withId) "t.doc_id, " else ""
      s"""SELECT $idSel(('0x' || substr(md5(f), 1, 15))::BIGINT % $B) AS b
         |FROM (
         |  SELECT ${idSel}unnest(string_split(text, ' ')) AS f FROM $rel
         |  UNION ALL
         |  SELECT ${idT}t.tk[u.i+1] || ' ' || t.tk[u.i+2] AS f
         |  FROM (SELECT ${idSel}string_split(text, ' ') AS tk FROM $rel) t
         |    CROSS JOIN unnest(range(0,
         |      (SELECT MAX(len(tk)) - 1 FROM
         |        (SELECT string_split(text, ' ') AS tk FROM $rel) mt))) u(i)
         |  WHERE u.i <= len(t.tk) - 2
         |) z""".stripMargin
  }

  /** DSIR scoring replay over ALL documents, with the raw (proposal)
    * model counted from `rawModelCte` — "rf" scores everything either
    * way; the batch gates use the full corpus as its own proposal
    * ([[duckDsirSql]]), the streaming threshold gate a STATIC
    * history-sample proposal. */
  private def duckDsirSqlFor(rawModelCte: String): String = {
      val B = 1024
      def feats(rel: String, withId: Boolean) = duckDsirFeats(rel, withId)
      s"""WITH tgrel AS (SELECT text FROM documents WHERE doc_id % 10 = 0),
         |tf AS (${feats("tgrel", withId = false)}),
         |tc AS (SELECT b, COUNT(*) AS tc FROM tf GROUP BY 1),
         |nt AS (SELECT COALESCE(SUM(tc), 0) AS n_t FROM tc),
         |rf AS (${feats("documents", withId = true)}),
         |$rawModelCte,
         |nr AS (SELECT COALESCE(SUM(rc), 0) AS n_r FROM rc),
         |lr AS (SELECT u.b, CAST(floor(
         |    (ln((COALESCE(tc, 0) + 1)::DOUBLE / (n_t + $B)::DOUBLE)
         |     - ln((COALESCE(rc, 0) + 1)::DOUBLE / (n_r + $B)::DOUBLE))
         |    * 1000000.0) AS BIGINT) AS lr_scaled
         |  FROM (SELECT unnest(range($B)) AS b) u
         |  LEFT JOIN tc ON u.b = tc.b LEFT JOIN rc ON u.b = rc.b, nt, nr),
         |sc AS (SELECT rf.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
         |    CAST(SUM(lr_scaled) AS BIGINT) AS lr_sum_scaled
         |  FROM rf JOIN lr ON rf.b = lr.b GROUP BY 1)
         |SELECT doc_id, n_feats, lr_sum_scaled,
         |  round(lr_sum_scaled::DOUBLE / (n_feats * 1000000)::DOUBLE, 6)
         |    AS score
         |FROM sc""".stripMargin
  }

  /** The batch DSIR replay (the full corpus is its own proposal model). */
  private val duckDsirSql: String = duckDsirSqlFor(
    "rc AS (SELECT b, COUNT(*) AS rc FROM rf GROUP BY 1)")

  /** The streaming-threshold replay's scoring base: STATIC proposal
    * model from the history slice (doc_id < 100), scoring everything. */
  private val duckDsirStreamSql: String = duckDsirSqlFor(
    s"""histrel AS (SELECT text FROM documents WHERE doc_id < 100),
       |hf AS (${duckDsirFeats("histrel", withId = false)}),
       |rc AS (SELECT b, COUNT(*) AS rc FROM hf GROUP BY 1)""".stripMargin)

  /** Text-drift oracle: replay the two halves' bucket LMs and the
    * 1e-9-quantized per-bucket KL/JS terms. */
  private val duckDriftSql: String = {
    val B = 1024
    def feats(name: String, where: String) =
      s"""$name AS (
         |  SELECT (('0x' || substr(md5(f), 1, 15))::BIGINT % $B) AS b
         |  FROM (
         |    SELECT unnest(string_split(text, ' ')) AS f FROM documents
         |    WHERE $where
         |    UNION ALL
         |    SELECT t.tk[u.i+1] || ' ' || t.tk[u.i+2] AS f
         |    FROM (SELECT string_split(text, ' ') AS tk FROM documents
         |          WHERE $where) t
         |      CROSS JOIN unnest(range(0,
         |        (SELECT MAX(len(tk)) - 1 FROM
         |          (SELECT string_split(text, ' ') AS tk FROM documents
         |           WHERE $where) mt))) u(i)
         |    WHERE u.i <= len(t.tk) - 2
         |  ) z)""".stripMargin
    s"""WITH ${feats("fa", "doc_id < 250")},
       |${feats("fb", "doc_id >= 250")},
       |ca AS (SELECT b, COUNT(*) AS cnta FROM fa GROUP BY 1),
       |cb AS (SELECT b, COUNT(*) AS cntb FROM fb GROUP BY 1),
       |na AS (SELECT COALESCE(SUM(cnta), 0) AS n_a FROM ca),
       |nb AS (SELECT COALESCE(SUM(cntb), 0) AS n_b FROM cb),
       |g AS (SELECT u.b,
       |    (COALESCE(cnta, 0) + 1)::DOUBLE / (n_a + $B)::DOUBLE AS p,
       |    (COALESCE(cntb, 0) + 1)::DOUBLE / (n_b + $B)::DOUBLE AS q,
       |    n_a, n_b
       |  FROM (SELECT unnest(range($B)) AS b) u
       |  LEFT JOIN ca ON u.b = ca.b LEFT JOIN cb ON u.b = cb.b, na, nb),
       |s AS (SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
       |    CAST(MAX(n_b) AS BIGINT) AS n_b,
       |    CAST(SUM(CAST(floor(p * ln(p / q) * 1000000000.0) AS BIGINT))
       |      AS BIGINT) AS kab,
       |    CAST(SUM(CAST(floor(q * ln(q / p) * 1000000000.0) AS BIGINT))
       |      AS BIGINT) AS kba,
       |    CAST(SUM(CAST(floor((p * ln(p / ((p + q) / 2.0)) +
       |        q * ln(q / ((p + q) / 2.0))) * 500000000.0) AS BIGINT))
       |      AS BIGINT) AS jss
       |  FROM g)
       |SELECT n_a, n_b,
       |  round(kab::DOUBLE / 1000000000.0, 6) AS kl_ab,
       |  round(kba::DOUBLE / 1000000000.0, 6) AS kl_ba,
       |  round(jss::DOUBLE / 1000000000.0, 6) AS js
       |FROM s""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "text_ngram_drift" -> duckDriftSql,
    "stream_ngram_drift" -> duckDriftSql,
    // DSIR selection: the full scoring replay ranked and cut at the top
    // 20%. DuckDB's ceil(0.2 * nn) is exact DECIMAL arithmetic; the
    // Spark side computes the same rank in exact integer arithmetic
    // (Sketches.ceilRankExact), so the cut agrees at EVERY corpus count
    // — including the n % 5 == 0 counts where an IEEE 0.2 * n product
    // can round past the integer.
    "pipeline_dsir_select" ->
      s"""WITH base AS (
         |$duckDsirSql
         |), r AS (SELECT doc_id, score,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk,
         |    COUNT(*) OVER () AS nn FROM base)
         |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, score
         |FROM r WHERE rnk <= ceil(0.2 * nn)""".stripMargin,
    // Sketch-threshold selection: replay the integer mean log-ratio
    // (exact floor division), the width-1000 histogram, the 0.8-quantile
    // cut ((min qualifying bucket + 1) * width — the feat_bin_equidepth
    // rule), and the v >= cut filter.
    "pipeline_dsir_threshold" ->
      s"""WITH base AS (
         |$duckDsirSql
         |), v AS (SELECT doc_id, score,
         |    (lr_sum_scaled - ((lr_sum_scaled % n_feats + n_feats)
         |       % n_feats)) // n_feats AS v
         |  FROM base),
         |b AS (SELECT (v - ((v % 1000 + 1000) % 1000)) // 1000 AS bucket,
         |             COUNT(*) AS cnt FROM v GROUP BY 1),
         |cum AS (SELECT bucket, cnt, SUM(cnt) OVER (ORDER BY bucket) AS cum,
         |             SUM(cnt) OVER () AS n FROM b),
         |cut AS (SELECT CAST((MIN(bucket) + 1) * 1000 AS BIGINT) AS cut
         |  FROM cum WHERE cum >= ceil(0.8 * n))
         |SELECT doc_id, score FROM v, cut WHERE v.v >= cut.cut""".stripMargin,
    // Streaming threshold selection: folded scores == batch scoring
    // against the same STATIC models (per-doc, broadcast lr table) and
    // the folded sketch == one histBuild (lossless count merge), so the
    // oracle is the batch replay with the history-slice proposal model —
    // same sketch/cut/filter tail as pipeline_dsir_threshold.
    "stream_dsir_threshold" ->
      s"""WITH base AS (
         |$duckDsirStreamSql
         |), v AS (SELECT doc_id, score,
         |    (lr_sum_scaled - ((lr_sum_scaled % n_feats + n_feats)
         |       % n_feats)) // n_feats AS v
         |  FROM base),
         |b AS (SELECT (v - ((v % 1000 + 1000) % 1000)) // 1000 AS bucket,
         |             COUNT(*) AS cnt FROM v GROUP BY 1),
         |cum AS (SELECT bucket, cnt, SUM(cnt) OVER (ORDER BY bucket) AS cum,
         |             SUM(cnt) OVER () AS n FROM b),
         |cut AS (SELECT CAST((MIN(bucket) + 1) * 1000 AS BIGINT) AS cut
         |  FROM cum WHERE cum >= ceil(0.8 * n))
         |SELECT doc_id, score FROM v, cut WHERE v.v >= cut.cut""".stripMargin,
    "text_lm_trigrams" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT array_to_string(tk[u.i+1 : u.i+2], ' ') AS prefix,
        |        tk[u.i+3] AS next
        |      FROM t CROSS JOIN
        |        unnest(range(0, (SELECT MAX(len(tk)) - 2 FROM t))) u(i)
        |      WHERE u.i <= len(tk) - 3)
        |SELECT prefix, next, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM g GROUP BY prefix, next HAVING COUNT(*) >= 2""".stripMargin,
    "text_pii_redact" -> {
      import graft.operators.TextAnalysis.{EmailRe, PhoneRe, UrlRe}
      s"""WITH a AS (SELECT doc_id,
         |  text || ' contact user' || doc_id || '@example.com see ' ||
         |  'https://ex.com/d' || doc_id || ' or 555-123-' ||
         |  lpad((doc_id % 10000)::VARCHAR, 4, '0') AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(aug, '$UrlRe')) AS BIGINT) AS n_urls,
         |  CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$UrlRe', '<URL>', 'g'),
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
         |FROM a""".stripMargin
    },
    // Folded postings == batch scan, so the oracle is identical.
    "stream_bm25_index" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i").mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st)
         |SELECT doc_id, score FROM sc WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
    },
    // Survivor-filtered BM25 replay: corpus stats (N, avgdl, df) are
    // recomputed over exactly the surviving documents, matching the
    // postings-derived stats of the delete-aware fold bit for bit.
    "stream_index_delete" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i").mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents WHERE doc_id NOT IN (21, 150)),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st)
         |SELECT doc_id, score FROM sc WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
    },
    "text_bm25_topk" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i").mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st)
         |SELECT doc_id, score FROM sc WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
    },
    // Hybrid RRF: replay BM25 (rounded scores, top-50), brute cosine
    // (raw scores, top-50), both rank orders, and the 1/(60+rank) fused
    // sum (at most one contribution per list per id — a single IEEE
    // addition, so the double is bit-identical across engines).
    "text_hybrid_rrf" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      def dot(a: String, b: String) =
        s"list_reduce(list_transform(range(64), j -> " +
          s"$a[j+1]::DOUBLE * $b[j+1]::DOUBLE), (p, q) -> p + q)"
      val cos = s"${dot("embedding", "qv")} / (sqrt(${dot("embedding",
        "embedding")}) * sqrt(${dot("qv", "qv")}))"
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st),
         |sp AS (SELECT doc_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM (SELECT doc_id, score FROM sc WHERE score > 0
         |        ORDER BY score DESC, doc_id LIMIT 50) sp0),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
         |dn AS (SELECT id, rnk FROM (
         |  SELECT vec_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY $cos DESC, vec_id) AS rnk
         |  FROM embeddings, q) dn0 WHERE rnk <= 50),
         |u AS (SELECT id, 1.0 / (60 + rnk) AS contrib FROM sp
         |  UNION ALL SELECT id, 1.0 / (60 + rnk) FROM dn),
         |fz AS (SELECT id, SUM(contrib) AS rrf, COUNT(*) AS n_lists
         |  FROM u GROUP BY id),
         |r AS (SELECT id, ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS rnk,
         |    rrf, n_lists FROM fz)
         |SELECT id, CAST(rnk AS BIGINT) AS rnk, round(rrf, 6) AS rrf,
         |  CAST(n_lists AS BIGINT) AS n_lists
         |FROM r WHERE rnk <= 20""".stripMargin
    },
    // Streaming hybrid: both folds equal their batch twins bit-for-bit,
    // so the oracle replays batch BM25 top-50 + the trained-IVF probe
    // (k-means unrolled on the HISTORY 1-in-4 sample, nprobe-1 lists
    // over the full corpus, qid 7's 3 nearest lists, exact cosine
    // re-rank top-50) + the 1/(60+rank) fused sums.
    "stream_hybrid_rrf" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      import SimilarityQueries.{duckCos, duckKMeansCtes, KmK, KmIters}
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st),
         |sp AS (SELECT doc_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM (SELECT doc_id, score FROM sc WHERE score > 0
         |        ORDER BY score DESC, doc_id LIMIT 50) sp0),
         |corp AS (SELECT vec_id AS id, embedding AS v
         |  FROM embeddings WHERE vec_id >= 20),
         |train AS (SELECT id, v FROM corp WHERE id < 200 AND id % 4 = 0),
         |${duckKMeansCtes(KmK, KmIters, "train")},
         |cent AS (SELECT cid, cv FROM cent$KmIters),
         |lists AS (SELECT id, cid FROM (
         |  SELECT corp.id, cent.cid,
         |    ROW_NUMBER() OVER (PARTITION BY corp.id
         |      ORDER BY ${duckCos("v", "cv")} DESC, cid) AS rn
         |  FROM corp, cent) t WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id = 7),
         |probes AS (SELECT cid FROM (
         |  SELECT cent.cid,
         |    ROW_NUMBER() OVER (ORDER BY ${duckCos("qv", "cv")} DESC, cid)
         |      AS rn
         |  FROM q, cent) t WHERE rn <= 3),
         |cand AS (SELECT DISTINCT id FROM probes JOIN lists USING (cid)),
         |dsc AS (SELECT cand.id, ${duckCos("qv", "c.v")} AS score
         |  FROM cand JOIN corp c ON cand.id = c.id, q),
         |dn AS (SELECT id, rnk FROM (
         |  SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk
         |  FROM dsc) t WHERE rnk <= 50),
         |u AS (SELECT id, 1.0 / (60 + rnk) AS contrib FROM sp
         |  UNION ALL SELECT id, 1.0 / (60 + rnk) FROM dn),
         |fz AS (SELECT id, SUM(contrib) AS rrf, COUNT(*) AS n_lists
         |  FROM u GROUP BY id),
         |r AS (SELECT id, ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS rnk,
         |    rrf, n_lists FROM fz)
         |SELECT id, CAST(rnk AS BIGINT) AS rnk, round(rrf, 6) AS rrf,
         |  CAST(n_lists AS BIGINT) AS n_lists
         |FROM r WHERE rnk <= 20""".stripMargin
    },
    // Streaming hybrid from the COMPRESSED fold: stream_hybrid_rrf's
    // replay with the SQ8 stage inserted in the dense half — probed
    // candidates quantize on both sides (the sim_quantize_int8
    // arithmetic verbatim), the exact-BIGINT dot's scaled estimate trims
    // the 50-deep shortlist, and the exact cosine re-ranks ONLY the
    // shortlist before the 1/(60+rank) fusion.
    "stream_hybrid_rrf_sq8" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      import SimilarityQueries.{duckCos, duckKMeansCtes, KmK, KmIters}
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st),
         |sp AS (SELECT doc_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM (SELECT doc_id, score FROM sc WHERE score > 0
         |        ORDER BY score DESC, doc_id LIMIT 50) sp0),
         |corp AS (SELECT vec_id AS id, embedding AS v
         |  FROM embeddings WHERE vec_id >= 20),
         |train AS (SELECT id, v FROM corp WHERE id < 200 AND id % 4 = 0),
         |${duckKMeansCtes(KmK, KmIters, "train")},
         |cent AS (SELECT cid, cv FROM cent$KmIters),
         |lists AS (SELECT id, cid FROM (
         |  SELECT corp.id, cent.cid,
         |    ROW_NUMBER() OVER (PARTITION BY corp.id
         |      ORDER BY ${duckCos("v", "cv")} DESC, cid) AS rn
         |  FROM corp, cent) t WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id = 7),
         |probes AS (SELECT cid FROM (
         |  SELECT cent.cid,
         |    ROW_NUMBER() OVER (ORDER BY ${duckCos("qv", "cv")} DESC, cid)
         |      AS rn
         |  FROM q, cent) t WHERE rn <= 3),
         |cand AS (SELECT DISTINCT id FROM probes JOIN lists USING (cid)),
         |cm AS (SELECT c.id, c.v,
         |    list_max(list_transform(c.v, x -> abs(x::DOUBLE))) AS cmax
         |  FROM corp c JOIN cand ON cand.id = c.id),
         |cc AS (SELECT id, cmax, list_transform(v,
         |    x -> CAST(floor(x::DOUBLE * 127.0 / cmax + 0.5) AS BIGINT))
         |    AS code FROM cm),
         |qm AS (SELECT qid, qv,
         |    list_max(list_transform(qv, x -> abs(x::DOUBLE))) AS qmax
         |  FROM q),
         |qc AS (SELECT qid, qmax, list_transform(qv,
         |    x -> CAST(floor(x::DOUBLE * 127.0 / qmax + 0.5) AS BIGINT))
         |    AS qcode FROM qm),
         |est AS (SELECT cc.id,
         |    (cc.cmax / 127.0) * (qc.qmax / 127.0) *
         |    CAST(list_reduce(list_transform(range(64),
         |      j -> qc.qcode[j+1] * cc.code[j+1]), (p2, q2) -> p2 + q2)
         |      AS DOUBLE) AS est
         |  FROM cc, qc),
         |shrt AS (SELECT id FROM (
         |  SELECT id, ROW_NUMBER() OVER (ORDER BY est DESC, id) AS rn
         |  FROM est) t WHERE rn <= 50),
         |dsc AS (SELECT shrt.id, ${duckCos("qv", "c.v")} AS score
         |  FROM shrt JOIN corp c ON shrt.id = c.id, q),
         |dn AS (SELECT id, rnk FROM (
         |  SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk
         |  FROM dsc) t WHERE rnk <= 50),
         |u AS (SELECT id, 1.0 / (60 + rnk) AS contrib FROM sp
         |  UNION ALL SELECT id, 1.0 / (60 + rnk) FROM dn),
         |fz AS (SELECT id, SUM(contrib) AS rrf, COUNT(*) AS n_lists
         |  FROM u GROUP BY id),
         |r AS (SELECT id, ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS rnk,
         |    rrf, n_lists FROM fz)
         |SELECT id, CAST(rnk AS BIGINT) AS rnk, round(rrf, 6) AS rrf,
         |  CAST(n_lists AS BIGINT) AS n_lists
         |FROM r WHERE rnk <= 20""".stripMargin
    },
    // Full RAG chain: BM25 + dense cosine lists, the RRF fusion, the
    // MMR greedy argmax unrolled 8 steps over the fused top-20 (rel =
    // the ROUNDED rrf, penalty = GREATEST of raw cosines to the picks,
    // objective literals from the exact Scala doubles: 1 - 0.7 is
    // 0.30000000000000004 in IEEE), and the fixed-point ranking metrics
    // of the picks against the dense brute top-8 truth.
    "pipeline_rag_retrieval" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      def dot(a: String, b: String) =
        s"list_reduce(list_transform(range(64), jj -> " +
          s"$a[jj+1]::DOUBLE * $b[jj+1]::DOUBLE), (p, q) -> p + q)"
      def cos(a: String, b: String) =
        s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
      val lam = "0.7"
      val oneMinus = (1.0 - 0.7).toString
      val mmrK = 8
      val steps = (1 to mmrK).map { i =>
        if (i == 1)
          s"p1 AS (SELECT id, v, $lam * rel AS obj FROM cand" +
            s" ORDER BY obj DESC, id LIMIT 1)"
        else {
          val prev = (1 until i).map(j => s"p$j").mkString(", ")
          val notIn = (1 until i).map(j => s"c.id <> p$j.id").mkString(" AND ")
          val sims = (1 until i).map(j => cos("c.v", s"p$j.v")).mkString(", ")
          val pen = if (i == 2) sims else s"GREATEST($sims)"
          s"""p$i AS (SELECT id, v, obj FROM (
             |  SELECT c.id, c.v AS v, $lam * c.rel - $oneMinus * ($pen) AS obj
             |  FROM cand c, $prev WHERE $notIn) x$i
             |  ORDER BY obj DESC, id LIMIT 1)""".stripMargin
        }
      }.mkString(",\n")
      val pages = (1 to mmrK).map(i =>
        s"SELECT id, CAST($i AS BIGINT) AS rnk FROM p$i")
        .mkString("\nUNION ALL\n")
      def gain(x: String) =
        s"CAST(floor(1000000.0 / (ln(($x + 1)::DOUBLE) / ln(2.0))) AS BIGINT)"
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st),
         |sp AS (SELECT doc_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM (SELECT doc_id, score FROM sc WHERE score > 0
         |        ORDER BY score DESC, doc_id LIMIT 50) sp0),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
         |dall AS (SELECT vec_id AS id, embedding AS v,
         |    ROW_NUMBER() OVER (ORDER BY ${cos("embedding", "qv")} DESC,
         |      vec_id) AS rnk
         |  FROM embeddings, q),
         |dn AS (SELECT id, rnk FROM dall WHERE rnk <= 50),
         |u AS (SELECT id, 1.0 / (60 + rnk) AS contrib FROM sp
         |  UNION ALL SELECT id, 1.0 / (60 + rnk) FROM dn),
         |fz AS (SELECT id, SUM(contrib) AS rrf FROM u GROUP BY id),
         |fr AS (SELECT id, round(rrf, 6) AS rel,
         |    ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS frnk FROM fz),
         |cand AS (SELECT fr.id, e.embedding AS v, fr.rel
         |  FROM fr JOIN embeddings e ON fr.id = e.vec_id
         |  WHERE fr.frnk <= 20),
         |$steps,
         |picks AS ($pages),
         |tru AS (SELECT id FROM dall WHERE rnk <= 8),
         |j AS (SELECT picks.rnk,
         |    CASE WHEN tru.id IS NOT NULL THEN 1 ELSE 0 END AS relv
         |  FROM picks LEFT JOIN tru ON picks.id = tru.id),
         |pq AS (SELECT CAST(SUM(relv) AS BIGINT) AS hits,
         |    MIN(CASE WHEN relv = 1 THEN rnk END) AS first_rnk,
         |    CAST(SUM(CASE WHEN relv = 1 THEN ${gain("rnk")}
         |      ELSE 0 END) AS BIGINT) AS dcg
         |  FROM j),
         |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM tru),
         |fin AS (SELECT nr.n_rel, COALESCE(pq.hits, 0) AS hits,
         |    pq.first_rnk, COALESCE(pq.dcg, 0) AS dcg,
         |    list_reduce(list_transform(range(1, least(nr.n_rel, 8) + 1),
         |      i -> ${gain("i")}), (a, b) -> a + b) AS idcg
         |  FROM nr, pq)
         |SELECT CAST(7 AS BIGINT) AS qid, n_rel, hits,
         |  CAST(first_rnk AS BIGINT) AS first_rnk,
         |  round(COALESCE(1.0 / first_rnk, 0.0), 6) AS rr,
         |  round(hits::DOUBLE / 8.0, 6) AS prec,
         |  round(hits::DOUBLE / n_rel::DOUBLE, 6) AS recall,
         |  round(dcg::DOUBLE / idcg::DOUBLE, 6) AS ndcg
         |FROM fin""".stripMargin
    },
    // IVF-dense multi-query RAG chain: replay the BM25 top-50, the
    // k-means training (unrolled Lloyd on the 1-in-4 corpus sample), the
    // nprobe-1 lists, each query's 3 probes + exact re-rank top-50, the
    // per-query RRF sums, and the fixed-point ranking metrics against
    // per-query brute-force truth. The dense half is the INDEX, so the
    // recall column is a composition number that can genuinely degrade.
    "pipeline_rag_retrieval_ivf" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      import SimilarityQueries.{duckCos, duckKMeansCtes, KmK, KmIters}
      def gain(x: String) =
        s"CAST(floor(1000000.0 / (ln(($x + 1)::DOUBLE) / ln(2.0))) AS BIGINT)"
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st),
         |sp AS (SELECT doc_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM (SELECT doc_id, score FROM sc WHERE score > 0
         |        ORDER BY score DESC, doc_id LIMIT 50) sp0),
         |corp AS (SELECT vec_id AS id, embedding AS v
         |  FROM embeddings WHERE vec_id >= 20),
         |qs AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id < 8),
         |train AS (SELECT id, v FROM corp WHERE id % 4 = 0),
         |${duckKMeansCtes(KmK, KmIters, "train")},
         |cent AS (SELECT cid, cv FROM cent$KmIters),
         |lists AS (SELECT id, cid FROM (
         |  SELECT corp.id, cent.cid,
         |    ROW_NUMBER() OVER (PARTITION BY corp.id
         |      ORDER BY ${duckCos("v", "cv")} DESC, cid) AS rn
         |  FROM corp, cent) t1 WHERE rn = 1),
         |probes AS (SELECT qid, cid FROM (
         |  SELECT qs.qid, cent.cid,
         |    ROW_NUMBER() OVER (PARTITION BY qs.qid
         |      ORDER BY ${duckCos("qv", "cv")} DESC, cid) AS rn
         |  FROM qs, cent) t2 WHERE rn <= 3),
         |cand AS (SELECT DISTINCT qid, id FROM probes JOIN lists USING (cid)),
         |dsc AS (SELECT cand.qid, cand.id, ${duckCos("q.qv", "c.v")} AS score
         |  FROM cand JOIN corp c ON cand.id = c.id
         |            JOIN qs q ON cand.qid = q.qid),
         |dn AS (SELECT qid, id, rnk FROM (
         |  SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score DESC, id) AS rnk FROM dsc) t3 WHERE rnk <= 50),
         |u AS (SELECT qs.qid, sp.id, 1.0 / (60 + sp.rnk) AS contrib
         |  FROM qs, sp
         |  UNION ALL SELECT qid, id, 1.0 / (60 + rnk) FROM dn),
         |fz AS (SELECT qid, id, SUM(contrib) AS rrf FROM u GROUP BY qid, id),
         |fr AS (SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY rrf DESC, id) AS rnk FROM fz),
         |res AS (SELECT qid, id, rnk FROM fr WHERE rnk <= 8),
         |tall AS (SELECT q.qid, c.id,
         |    ROW_NUMBER() OVER (PARTITION BY q.qid
         |      ORDER BY ${duckCos("q.qv", "c.v")} DESC, c.id) AS rnk
         |  FROM qs q, corp c),
         |tru AS (SELECT qid, id FROM tall WHERE rnk <= 8),
         |j AS (SELECT res.qid, res.rnk,
         |    CASE WHEN tru.id IS NOT NULL THEN 1 ELSE 0 END AS relv
         |  FROM res LEFT JOIN tru
         |    ON res.qid = tru.qid AND res.id = tru.id),
         |pq AS (SELECT qid, CAST(SUM(relv) AS BIGINT) AS hits,
         |    MIN(CASE WHEN relv = 1 THEN rnk END) AS first_rnk,
         |    CAST(SUM(CASE WHEN relv = 1 THEN ${gain("rnk")}
         |      ELSE 0 END) AS BIGINT) AS dcg
         |  FROM j GROUP BY qid),
         |nr AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel
         |  FROM tru GROUP BY qid),
         |fin AS (SELECT nr.qid, nr.n_rel, COALESCE(pq.hits, 0) AS hits,
         |    pq.first_rnk, COALESCE(pq.dcg, 0) AS dcg,
         |    list_reduce(list_transform(range(1, least(nr.n_rel, 8) + 1),
         |      i -> ${gain("i")}), (a, b) -> a + b) AS idcg
         |  FROM nr LEFT JOIN pq ON nr.qid = pq.qid)
         |SELECT qid, n_rel, hits, CAST(first_rnk AS BIGINT) AS first_rnk,
         |  round(COALESCE(1.0 / first_rnk, 0.0), 6) AS rr,
         |  round(hits::DOUBLE / 8.0, 6) AS prec,
         |  round(hits::DOUBLE / n_rel::DOUBLE, 6) AS recall,
         |  round(dcg::DOUBLE / idcg::DOUBLE, 6) AS ndcg
         |FROM fin""".stripMargin
    },
    // Full chain + query-batched MMR: the ivf-chain replay (BM25,
    // unrolled Lloyd, lists, probes, exact re-rank, per-query RRF) down
    // to the fused top-20, then FOUR unrolled greedy argmax chains (one
    // per qid, 6 picks each) with the exact IEEE lambda literals the
    // single-query MMR oracle established.
    "pipeline_rag_retrieval_mmr" -> {
      val terms = Seq("spark", "window", "customer")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(", ")
      val score = terms.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1) * tf$i * 2.2" +
          s" / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))").mkString(" + ")
      import SimilarityQueries.{duckCos, duckKMeansCtes, KmK, KmIters}
      val lam = "0.7"
      val oneMinus = (1.0 - 0.7).toString
      val mmrK = 6
      val qids = 0 until 4
      val perQid = qids.map { q =>
        val steps = (1 to mmrK).map { i =>
          if (i == 1)
            s"q${q}p1 AS (SELECT id, v, $lam * rel AS obj FROM cand$q" +
              s" ORDER BY obj DESC, id LIMIT 1)"
          else {
            val prev = (1 until i).map(j => s"q${q}p$j").mkString(", ")
            val notIn = (1 until i).map(j => s"c.id <> q${q}p$j.id")
              .mkString(" AND ")
            val sims = (1 until i).map(j => duckCos("c.v", s"q${q}p$j.v"))
              .mkString(", ")
            val pen = if (i == 2) sims else s"GREATEST($sims)"
            s"""q${q}p$i AS (SELECT id, v, obj FROM (
               |  SELECT c.id, c.v AS v,
               |    $lam * c.rel - $oneMinus * ($pen) AS obj
               |  FROM cand$q c, $prev WHERE $notIn) x$q$i
               |  ORDER BY obj DESC, id LIMIT 1)""".stripMargin
          }
        }.mkString(",\n")
        val cte = s"cand$q AS (SELECT id, v, rel FROM cand WHERE qid = $q),\n" +
          steps
        val pages = (1 to mmrK).map(i =>
          s"SELECT CAST($q AS BIGINT) AS qid, id, CAST($i AS BIGINT) AS rnk," +
            s" round(obj, 6) AS mmr FROM q${q}p$i")
          .mkString("\nUNION ALL\n")
        (cte, pages)
      }
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks)::DOUBLE AS dl, $tfs FROM t),
         |st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl, $dfs FROM f),
         |sc AS (SELECT doc_id, round($score, 6) AS score FROM f, st),
         |sp AS (SELECT doc_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM (SELECT doc_id, score FROM sc WHERE score > 0
         |        ORDER BY score DESC, doc_id LIMIT 50) sp0),
         |corp AS (SELECT vec_id AS id, embedding AS v
         |  FROM embeddings WHERE vec_id >= 20),
         |qs AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id < 4),
         |train AS (SELECT id, v FROM corp WHERE id % 4 = 0),
         |${duckKMeansCtes(KmK, KmIters, "train")},
         |cent AS (SELECT cid, cv FROM cent$KmIters),
         |lists AS (SELECT id, cid FROM (
         |  SELECT corp.id, cent.cid,
         |    ROW_NUMBER() OVER (PARTITION BY corp.id
         |      ORDER BY ${duckCos("v", "cv")} DESC, cid) AS rn
         |  FROM corp, cent) t1 WHERE rn = 1),
         |probes AS (SELECT qid, cid FROM (
         |  SELECT qs.qid, cent.cid,
         |    ROW_NUMBER() OVER (PARTITION BY qs.qid
         |      ORDER BY ${duckCos("qv", "cv")} DESC, cid) AS rn
         |  FROM qs, cent) t2 WHERE rn <= 3),
         |dcand AS (SELECT DISTINCT qid, id FROM probes JOIN lists USING (cid)),
         |dsc AS (SELECT dcand.qid, dcand.id, ${duckCos("q.qv", "c.v")} AS score
         |  FROM dcand JOIN corp c ON dcand.id = c.id
         |             JOIN qs q ON dcand.qid = q.qid),
         |dn AS (SELECT qid, id, rnk FROM (
         |  SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score DESC, id) AS rnk FROM dsc) t3 WHERE rnk <= 50),
         |u AS (SELECT qs.qid, sp.id, 1.0 / (60 + sp.rnk) AS contrib
         |  FROM qs, sp
         |  UNION ALL SELECT qid, id, 1.0 / (60 + rnk) FROM dn),
         |fz AS (SELECT qid, id, SUM(contrib) AS rrf FROM u GROUP BY qid, id),
         |fr AS (SELECT qid, id, rrf, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY rrf DESC, id) AS rnk FROM fz),
         |cand AS (SELECT fr.qid, fr.id, round(fr.rrf, 6) AS rel,
         |    e.embedding AS v
         |  FROM fr JOIN embeddings e ON fr.id = e.vec_id
         |  WHERE fr.rnk <= 20),
         |${perQid.map(_._1).mkString(",\n")}
         |${perQid.map(_._2).mkString("\nUNION ALL\n")}""".stripMargin
    },
    "text_chunking" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, u.i AS chunk_id, u.i*10 AS start_tok,
        |        least(20, len(toks) - u.i*10) AS n_toks,
        |        array_to_string(toks[u.i*10+1 : u.i*10+20], ' ') AS chunk_text
        |      FROM w CROSS JOIN unnest(range(0,
        |        (SELECT (greatest(0, MAX(len(toks)) - 20) + 9)//10 + 1 FROM w)))
        |        u(i)
        |      WHERE u.i <= (greatest(0, len(toks) - 20) + 9)//10)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(n_toks AS BIGINT) AS n_toks, chunk_text
        |FROM c""".stripMargin,
    "text_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
        |       AS BIGINT) AS n_pieces,
        |  round((length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
        |        / len(string_split(text, ' '))::DOUBLE, 6) AS mean_tok_len
        |FROM documents""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  round(len(list_filter(string_split(text, ' '),
         |          t -> list_contains($enStop, t)))::DOUBLE
         |        / len(string_split(text, ' '))::DOUBLE, 6) AS stop_ratio,
         |  round(length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))::DOUBLE
         |        / length(text)::DOUBLE, 6) AS alnum_ratio,
         |  round(0.4 * least(len(string_split(text, ' '))::DOUBLE / 100.0, 1.0)
         |      + 0.3 * (length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))::DOUBLE
         |               / length(text)::DOUBLE)
         |      + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),
         |                 t -> list_contains($enStop, t)))::DOUBLE
         |               / len(string_split(text, ' '))::DOUBLE), 6) AS quality
         |FROM documents""".stripMargin,
    "text_inverted_index" ->
      """WITH tf AS (SELECT doc_id, w AS term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents) GROUP BY doc_id, w),
        |st AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |         CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY term)
        |SELECT t.term, s.df, s.cf,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY t.term ORDER BY t.doc_id) - 1
        |       AS BIGINT) AS pos,
        |  t.doc_id, CAST(t.tf AS BIGINT) AS tf
        |FROM tf t JOIN st s USING (term)
        |WHERE s.df >= 2""".stripMargin,
    "text_tfidf_top" ->
      """WITH tf AS (SELECT doc_id, w AS term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents) GROUP BY doc_id, w),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |sc AS (SELECT t.doc_id, t.term,
        |    t.tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS wgt,
        |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |      ORDER BY t.tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) DESC,
        |               t.term) AS rank
        |  FROM tf t JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
        |  round(wgt, 6) AS score
        |FROM sc WHERE rank <= 3""".stripMargin,
    "events_anomaly" ->
      """WITH b AS (SELECT event_type,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, h, n,
        |    COUNT(n) OVER fr AS bn, SUM(n) OVER fr AS s,
        |    SUM(n * n) OVER fr AS ss
        |  FROM b
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, h, CAST(n AS BIGINT) AS n,
        |  CAST(bn AS BIGINT) AS base_n,
        |  CASE WHEN bn >= 1
        |       THEN round(CAST(s AS DOUBLE) / bn, 6) END AS base_mean,
        |  CASE WHEN bn >= 2 AND
        |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / bn)
        |      / (bn - 1) > 0.0
        |  THEN round((n - CAST(s AS DOUBLE) / bn) /
        |    sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |          / bn) / (bn - 1)), 6)
        |  END AS z
        |FROM w""".stripMargin,
    "events_gapfill" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events WHERE user_id % 10 = 0),
        |h AS (SELECT user_id, date_trunc('hour', ts) AS h, value,
        |        ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |          ORDER BY ts DESC, event_id DESC) AS rn,
        |        COUNT(*) OVER (PARTITION BY user_id, date_trunc('hour', ts)) AS n
        |      FROM e),
        |hv AS (SELECT user_id, h, value AS v, n FROM h WHERE rn = 1),
        |bounds AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hv GROUP BY 1),
        |spine AS (SELECT user_id,
        |            UNNEST(generate_series(mn, mx, INTERVAL '1 hour')) AS h
        |          FROM bounds),
        |j AS (SELECT s.user_id, s.h, hv.v, hv.n
        |      FROM spine s LEFT JOIN hv ON hv.user_id = s.user_id AND hv.h = s.h)
        |SELECT user_id, h AS hour,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n_obs,
        |  v IS NULL AS was_gap
        |FROM j""".stripMargin,
    "events_winsorize" ->
      """WITH r AS (SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |b AS (SELECT event_type,
        |    MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
        |             THEN value END) AS lo,
        |    MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
        |             THEN value END) AS hi
        |  FROM r GROUP BY event_type)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lo,
        |  CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi,
        |  CAST(SUM(CAST(round(least(greatest(e.value, b.lo), b.hi) * 100)
        |           AS BIGINT)) AS BIGINT) AS cents_w
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type""".stripMargin,
    "events_robust_stats" ->
      """WITH c AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM c),
        |med AS (SELECT event_type,
        |    MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |             THEN cents END) AS median
        |  FROM r GROUP BY event_type),
        |d AS (SELECT c.event_type, abs(c.cents - m.median) AS dev
        |      FROM c JOIN med m USING (event_type)),
        |r2 AS (SELECT event_type, dev,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM d),
        |mad AS (SELECT event_type,
        |    MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |             THEN dev END) AS mad
        |  FROM r2 GROUP BY event_type)
        |SELECT c.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(m.median) AS median, MIN(mad.mad) AS mad
        |FROM c JOIN med m USING (event_type) JOIN mad USING (event_type)
        |GROUP BY c.event_type""".stripMargin,
    "events_standardize" ->
      """WITH c AS (SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |st AS (SELECT event_type, COUNT(*) AS n, SUM(cents) AS s,
        |         SUM(cents * cents) AS ss FROM c GROUP BY event_type)
        |SELECT event_id,
        |  CASE WHEN n >= 2 AND
        |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
        |      / (n - 1) > 0.0
        |  THEN round((cents - CAST(s AS DOUBLE) / n) /
        |    sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |          / n) / (n - 1)), 6)
        |  END AS z
        |FROM c JOIN st USING (event_type)""".stripMargin,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |uc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
        |u AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nt,
        |        CAST(COUNT(*) AS BIGINT) AS nd, MAX(c) AS topc
        |      FROM uc GROUP BY doc_id),
        |bgr AS (SELECT doc_id, t[i+1] || ' ' || t[i+2] AS b
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents) s,
        |             unnest(range(len(t) - 1)) u(i)),
        |bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bgr GROUP BY doc_id, b),
        |b2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, MAX(c) AS topb
        |       FROM bc GROUP BY doc_id)
        |SELECT u.doc_id, nt AS n_tokens, nd AS n_distinct,
        |  1.0 - CAST(nd AS DOUBLE) / CAST(nt AS DOUBLE) AS dup_frac,
        |  CAST(topc AS DOUBLE) / CAST(nt AS DOUBLE) AS top_frac,
        |  COALESCE(CAST(topb AS DOUBLE) / CAST(nb AS DOUBLE), 0.0)
        |    AS top_bigram_frac
        |FROM u LEFT JOIN b2 ON u.doc_id = b2.doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT lang, $duckLangCase AS pred, CAST(count(*) AS BIGINT) AS n
         |FROM documents GROUP BY lang, pred""".stripMargin,
    "text_langid_margin" -> {
      val scoreExprs = TextAnalysis.langProfiles.map { case (lang, words) =>
        val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
        lang -> (s"len(list_intersect(list_distinct(string_split(text, ' ')), " +
          s"$lst))")
      }
      val cols = scoreExprs.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n    ")
      val arms = scoreExprs.map { case (l, _) =>
        s"WHEN s_$l = ss[4] AND ss[4] > 0 THEN '$l'"
      }.mkString("\n       ")
      val lst = scoreExprs.map { case (l, _) => s"s_$l" }.mkString("[", ", ", "]")
      s"""WITH sc AS (SELECT doc_id,
         |    $cols
         |  FROM documents),
         |t AS (SELECT doc_id, ${scoreExprs.map("s_" + _._1).mkString(", ")},
         |        list_sort($lst) AS ss FROM sc)
         |SELECT doc_id,
         |  CASE $arms
         |       ELSE 'und' END AS lang,
         |  CAST(ss[4] AS BIGINT) AS best_hits,
         |  CAST(ss[3] AS BIGINT) AS second_hits,
         |  CAST(ss[4] - ss[3] AS BIGINT) AS margin,
         |  (ss[3] > 0 AND ss[4] - ss[3] <= 1 AND ss[4] > 0) AS is_mixed
         |FROM t""".stripMargin
    },
    "text_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(t) >= 5
        |    THEN list_transform(range(len(t) - 4),
        |           i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))
        |    ELSE [array_to_string(t, ' ')] END) AS g FROM toks),
        |ex AS (SELECT doc_id, unnest(g) AS gram FROM sh),
        |dfs AS (SELECT gram, COUNT(*) AS df FROM ex GROUP BY gram)
        |SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS novel_grams,
        |  round(SUM(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END)::DOUBLE
        |        / COUNT(*), 6) AS novelty
        |FROM ex e JOIN dfs USING (gram) GROUP BY e.doc_id""".stripMargin,
    "text_rolling_hash" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(range(length(text)), i -> ascii(substr(text, i + 1, 1))::BIGINT)),
        |    (acc, c) -> (acc * 31 + c) % 2147483647) AS rhash
        |FROM documents""".stripMargin,
    "text_fingerprint_bottomk" ->
      """WITH grams AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN length(text) >= 5
        |      THEN list_transform(range(length(text) - 4), i -> substr(text, i + 1, 5))
        |      ELSE [text] END)) AS g FROM documents),
        |h AS (SELECT doc_id, g, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM grams),
        |r AS (SELECT doc_id, h,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h, g) AS rnk
        |      FROM h)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, h FROM r WHERE rnk <= 4""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    // The variant path reads the same values the string path does.
    "events_variant_extract" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sessions" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s
        |           FROM events),
        |g AS (SELECT user_id, event_id, ts, s,
        |        lag(s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
        |      FROM e),
        |f AS (SELECT user_id, event_id, ts, s,
        |        CASE WHEN prev_s IS NULL OR s - prev_s > 1800 THEN 1 ELSE 0 END AS new_sess
        |      FROM g),
        |sess AS (SELECT user_id, ts, s,
        |           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |         FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(s) - MIN(s) AS BIGINT) AS duration_s
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    "events_top_error_users" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_errors
        |FROM events WHERE event_type = 'error'
        |GROUP BY user_id ORDER BY n_errors DESC, user_id LIMIT 10""".stripMargin,
    "events_funnel" ->
      """WITH fv AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t0
        |            FROM events WHERE event_type = 'view' GROUP BY user_id),
        |conv AS (SELECT DISTINCT fv.user_id
        |         FROM fv JOIN events p ON fv.user_id = p.user_id
        |         WHERE p.event_type = 'purchase'
        |           AND CAST(p.ts AS TIMESTAMP) > fv.t0
        |           AND CAST(p.ts AS TIMESTAMP) <= fv.t0 + INTERVAL 30 MINUTE)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fv) AS n_viewers,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM conv) AS n_converted""".stripMargin,
    "text_decontaminate" -> duckDecontaminateSql,
    // The Bloom prefilter is result-invisible — same replay verbatim.
    "text_decontaminate_bloom" -> duckDecontaminateSql,
    // The streamed screen accumulates exactly the batch screen — eval
    // grams broadcast into every batch's plan, no state.
    "stream_decontaminate" -> duckDecontaminateSql,
    "text_quality_model" -> duckQualityModelSql,
    // The streamed scoring accumulates exactly the batch margins —
    // weights are plan literals on both paths.
    "stream_quality_score" -> duckQualityModelSql,
    "text_html_extract" -> {
      val pageStripped = duckDecode(
        """regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
          |  '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
          |  '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
          |  '(?s)<!--.*?-->', ' ', 'g'),
          |  '<[^>]*>', ' ', 'g')""".stripMargin.replace("\n", " "))
      s"""WITH $duckHtmlCtes
         |SELECT a.doc_id, a.n_blocks, a.n_kept, a.content,
         |  length(trim(regexp_replace($pageStripped, ' +', ' ', 'g')))
         |    AS page_chars
         |FROM agg a JOIN h USING (doc_id)""".stripMargin
    },
    "pipeline_web_manifest" -> {
      val targets = graft.operators.Sampling
        .allocateMixture(WebMixWeights, WebMixTotal)
      val langs = targets.keys.toSeq.sorted.map(l => s"'$l'").mkString(", ")
      val cases = targets.toSeq.sortBy(_._1)
        .map { case (l, n) => s"WHEN '$l' THEN $n" }.mkString(" ")
      s"""WITH $duckHtmlCtes,
         |dom AS (SELECT doc_id,
         |  regexp_extract(regexp_replace(regexp_replace(regexp_replace(
         |    lower(regexp_extract($duckMessyUrl,
         |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
         |    '^[^@]*@', ''), ':[0-9]*$$', ''), '^www\\.', ''),
         |    '([^.]+\\.[^.]+)$$', 1) AS domain
         |  FROM documents),
         |doc AS (SELECT a.doc_id, d.lang, dom.domain, a.content
         |  FROM agg a JOIN documents d USING (doc_id)
         |  JOIN dom USING (doc_id)),
         |corp AS (SELECT * FROM doc WHERE doc_id % 20 <> 7),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM corp
         |  GROUP BY md5(content)),
         |q AS (SELECT doc_id, lang, domain, content FROM (
         |    SELECT doc_id, lang, domain, content, content AS text
         |    FROM corp WHERE doc_id IN (SELECT doc_id FROM keep))
         |  WHERE $duckQualityExpr >= 0.9),
         |csh AS (SELECT doc_id, list_distinct(
         |    CASE WHEN len(t) >= 5
         |      THEN list_transform(range(len(t) - 4),
         |             i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))
         |      ELSE [array_to_string(t, ' ')] END) AS g
         |  FROM (SELECT doc_id, string_split(content, ' ') AS t FROM q)),
         |ev AS (SELECT DISTINCT unnest(g) AS gram FROM (
         |    SELECT doc_id, list_distinct(
         |      CASE WHEN len(t) >= 5
         |        THEN list_transform(range(len(t) - 4),
         |               i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))
         |        ELSE [array_to_string(t, ' ')] END) AS g
         |    FROM (SELECT doc_id, string_split(content, ' ') AS t
         |          FROM doc WHERE doc_id % 20 = 7))),
         |shared AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM (SELECT doc_id, unnest(g) AS gram FROM csh)
         |  WHERE gram IN (SELECT gram FROM ev) GROUP BY doc_id),
         |clean AS (SELECT c.doc_id FROM csh c LEFT JOIN shared s
         |    USING (doc_id)
         |  WHERE NOT (COALESCE(s.n_shared, 0) * 5 >= len(c.g) * 1)),
         |d3 AS (SELECT * FROM q
         |  WHERE doc_id IN (SELECT doc_id FROM clean)
         |    AND lang IN ($langs)),
         |ranked AS (SELECT lang, doc_id, domain, content,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
         |      ('0x' || substr(md5('mix:' || lang || ':' ||
         |        CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id) AS rn
         |  FROM d3)
         |SELECT doc_id, lang, domain,
         |  CAST(len(string_split(content, ' ')) AS BIGINT) AS n_tokens
         |FROM ranked
         |WHERE rn <= CASE lang $cases ELSE 0 END""".stripMargin
    },
    "text_unigram_vocab" ->
      s"""WITH ${duckUnigramCtes(UgPieces, UgRounds)}
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY w DESC, piece) AS BIGINT)
         |    AS "rank", piece, w AS usage
         |FROM uv$UgRounds""".stripMargin,
    "text_unigram_tokenize" ->
      s"""WITH ${duckUnigramCtes(UgPieces, UgRounds, withFinalSeg = true)},
         |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |       FROM documents),
         |jj AS (SELECT d.doc_id, length(d.word) AS chars,
         |        len(string_split(substr(w.s, 2, length(w.s) - 2), '||'))
         |          AS pieces
         |      FROM dw d JOIN ufin_$UgPieces w ON d.word = w.word
         |      WHERE d.word <> '' AND d.word NOT LIKE '%|%')
         |SELECT doc_id, CAST(SUM(chars) AS BIGINT) AS n_chars,
         |  CAST(SUM(pieces) AS BIGINT) AS n_pieces,
         |  CAST(COUNT(*) AS BIGINT) AS n_words,
         |  round(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(pieces) AS DOUBLE), 6)
         |    AS compression
         |FROM jj GROUP BY doc_id""".stripMargin,
    "text_bpe_merges" -> {
      val rows = (1 to BpeRounds).map { r =>
        s"""SELECT CAST($r AS BIGINT) AS "round", l AS "left", r2 AS "right",
           |  l || r2 AS merged, c AS pair_count FROM m$r""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH ${duckBpeCtes(BpeRounds)}\n$rows"
    },
    "text_bpe_tokenize" ->
      s"""WITH ${duckBpeCtes(BpeRounds)},
         |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |       FROM documents),
         |j AS (SELECT d.doc_id, length(d.word) AS chars,
         |        len(string_split(substr(w.s, 2, length(w.s) - 2), '||'))
         |          AS pieces
         |      FROM dw d JOIN w$BpeRounds w ON d.word = w.word
         |      WHERE d.word <> '' AND d.word NOT LIKE '%|%')
         |SELECT doc_id, CAST(SUM(chars) AS BIGINT) AS n_chars,
         |  CAST(SUM(pieces) AS BIGINT) AS n_pieces,
         |  CAST(COUNT(*) AS BIGINT) AS n_words,
         |  round(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(pieces) AS DOUBLE), 6)
         |    AS compression
         |FROM j GROUP BY doc_id""".stripMargin,
    "text_lm_perplexity" ->
      s"""WITH $duckPplCtes
         |SELECT doc_id, n_grams, nll_scaled, avg_nll FROM ppl""".stripMargin,
    // DSIR: features = unigrams UNION ALL bigrams, bucket = md5-hash60
    // % 1024 (TextHash replay), add-1 bucket LMs over target/raw, ONE
    // floor quantization per bucket, exact BIGINT per-doc sums. The
    // streaming-fold gate scores from the accumulated integer model, so
    // the same SQL is its oracle verbatim.
    "text_dsir_scores" -> duckDsirSql,
    "stream_dsir_model" -> duckDsirSql,
    // Forward pairs replayed with 1-based list indexing; the PMI ratio
    // multiplies the same exact BIGINTs both engines cast to double.
    "text_word_pmi" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |pairs AS (
        |  SELECT tk[u.i+1] AS a, tk[u.i+2] AS b
        |  FROM t, unnest(range(len(tk) - 1)) u(i)
        |  UNION ALL
        |  SELECT tk[u.i+1] AS a, tk[u.i+3] AS b
        |  FROM t, unnest(range(len(tk) - 2)) u(i)),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM
        |        (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |        GROUP BY 1),
        |tw AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM
        |       (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
        |pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS p FROM pairs),
        |pc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM pairs GROUP BY 1, 2)
        |SELECT pc.a, pc.b, pc.cnt,
        |  CAST(floor(ln((pc.cnt::DOUBLE * tw.t::DOUBLE * tw.t::DOUBLE) /
        |               (pt.p::DOUBLE * ua.c::DOUBLE * ub.c::DOUBLE))
        |             * 1000000.0) AS BIGINT)
        |    AS pmi_scaled
        |FROM pc JOIN uni ua ON pc.a = ua.w JOIN uni ub ON pc.b = ub.w
        |CROSS JOIN tw CROSS JOIN pt
        |WHERE pc.cnt >= 5""".stripMargin,
    "events_user_sequences" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS sequence
        |FROM events GROUP BY user_id""".stripMargin,
    // dup_spans' window/interval-union machinery, split corpus-vs-eval.
    "text_decontaminate_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE length(trim(text)) > 0),
        |win AS (SELECT doc_id, len(toks) AS ntok, p AS pos,
        |          md5(array_to_string(toks[p+1:p+8], ' ')) AS wh
        |        FROM d, unnest(generate_series(0,
        |          CASE WHEN len(toks) >= 8 THEN len(toks) - 8 ELSE 0 END))
        |          AS t(p)),
        |ev AS (SELECT DISTINCT wh FROM win WHERE doc_id % 20 = 7),
        |hit AS (SELECT w.doc_id, w.ntok, w.pos
        |        FROM win w JOIN ev USING (wh) WHERE w.doc_id % 20 <> 7),
        |c AS (SELECT doc_id, ntok, pos,
        |        lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        |      FROM hit),
        |agg AS (SELECT doc_id, CAST(MAX(ntok) AS BIGINT) AS n_tokens,
        |          CAST(COUNT(*) AS BIGINT) AS n_hit_windows,
        |          CAST(SUM(CASE WHEN nxt IS NULL
        |                THEN least(8, ntok - pos)
        |                ELSE least(nxt - pos, 8) END) AS BIGINT)
        |            AS contaminated_tokens
        |        FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_hit_windows, contaminated_tokens,
        |  round(contaminated_tokens::DOUBLE / n_tokens, 6)
        |    AS contaminated_frac
        |FROM agg""".stripMargin,
    "events_sequence_likelihood" ->
      """WITH seq AS (SELECT user_id, event_type, LEAD(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |pr AS (SELECT event_type AS cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT cur, CAST(SUM(cnt) AS BIGINT) AS ct
        |        FROM pr GROUP BY 1),
        |sc AS (SELECT s.user_id,
        |    CAST(floor(ln(CAST(p.cnt AS DOUBLE) / CAST(t.ct AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS lp
        |  FROM seq s JOIN pr p ON s.event_type = p.cur AND s.nxt = p.nxt
        |  JOIN tot t ON p.cur = t.cur
        |  WHERE s.nxt IS NOT NULL)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
        |  CAST(-SUM(lp) AS BIGINT) AS nll_scaled,
        |  round(CAST(-SUM(lp) AS DOUBLE)
        |        / CAST(COUNT(*) * 1000000 AS DOUBLE), 6) AS avg_nll
        |FROM sc GROUP BY user_id""".stripMargin,
    "events_cohort_retention" ->
      """WITH c AS (SELECT user_id,
        |    CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE)
        |      AS cohort
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events)
        |SELECT CAST(c.cohort AS VARCHAR) AS cohort,
        |  CAST(date_diff('day', c.cohort, a.wk) // 7 AS BIGINT)
        |    AS week_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // Boundary-stitched streamed fold == the batch matrix.
    "stream_transition_matrix" ->
      """WITH seq AS (SELECT event_type, LEAD(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events),
        |c AS (SELECT event_type AS cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT cur, CAST(SUM(cnt) AS BIGINT) AS cur_total
        |      FROM c GROUP BY 1)
        |SELECT c.cur, c.nxt, c.cnt, t.cur_total,
        |  CAST((c.cnt * 1000000) // t.cur_total AS BIGINT) AS p_scaled
        |FROM c JOIN t USING (cur)""".stripMargin,
    "events_transition_matrix" ->
      """WITH seq AS (SELECT event_type, LEAD(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events),
        |c AS (SELECT event_type AS cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT cur, CAST(SUM(cnt) AS BIGINT) AS cur_total
        |      FROM c GROUP BY 1)
        |SELECT c.cur, c.nxt, c.cnt, t.cur_total,
        |  CAST((c.cnt * 1000000) // t.cur_total AS BIGINT) AS p_scaled
        |FROM c JOIN t USING (cur)""".stripMargin,
    // Per-language NTILE over the replayed perplexity table; ordering is
    // (avg_nll, doc_id) — a total order, so tile boundaries are exact.
    "text_ppl_buckets" ->
      s"""WITH $duckPplCtes,
         |lb AS (SELECT p.doc_id, p.n_grams, p.nll_scaled, d.lang,
         |         NTILE(3) OVER (PARTITION BY d.lang
         |                        ORDER BY p.avg_nll, p.doc_id) AS bucket
         |       FROM ppl p JOIN documents d USING (doc_id))
         |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(nll_scaled) AS BIGINT) AS nll_scaled_sum,
         |  CAST(SUM(n_grams) AS BIGINT) AS n_grams_sum
         |FROM lb GROUP BY 1, 2""".stripMargin,
    "text_vocab_coverage" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |dc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
        |vc AS (SELECT w, SUM(c) AS cnt FROM dc GROUP BY 1),
        |v AS (SELECT w FROM (SELECT w,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rn FROM vc)
        |  WHERE rn <= 500)
        |SELECT dc.doc_id, CAST(SUM(dc.c) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.w IS NULL THEN dc.c ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  round(CAST(SUM(CASE WHEN v.w IS NULL THEN dc.c ELSE 0 END)
        |          AS DOUBLE) / CAST(SUM(dc.c) AS DOUBLE), 6) AS oov_rate
        |FROM dc LEFT JOIN v ON dc.w = v.w
        |GROUP BY dc.doc_id""".stripMargin,
    "stream_topk_words" ->
      """SELECT w, CAST(cnt AS BIGINT) AS cnt FROM (
        |  SELECT w, COUNT(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w)
        |ORDER BY cnt DESC, w LIMIT 10""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  lower(strip_accents(nfc_normalize(
        |    text || ' Café NAÏVE Über piñata Çedilla'))) AS text_norm
        |FROM documents""".stripMargin,
    "text_url_normalize" ->
      """WITH u AS (SELECT doc_id,
        |  'HTTPS://user:pw@WWW.' || source ||
        |  CASE WHEN doc_id % 3 = 0 THEN '.ExAmple.COM:443'
        |       WHEN doc_id % 3 = 1 THEN '.Site.NET:8080'
        |       ELSE '.Docs.ORG' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN '/Path/' || doc_id ELSE '' END ||
        |  '?utm_source=feed&id=' || doc_id ||
        |  '&gclid=abc&q=x%20y&utm_campaign=z#frag' AS url
        |  FROM documents),
        |parts AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
        |    '^[^@]*@', ''), ':[0-9]*$', ''), '^www\.', '') AS hst,
        |  regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
        |  array_to_string(list_filter(
        |    string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |    p -> p <> '' AND NOT regexp_matches(p,
        |      '^(utm_[^=]*|fbclid|gclid)(=|$)')), '&') AS q
        |  FROM u)
        |SELECT doc_id,
        |  sch || '://' || hst ||
        |    (CASE WHEN pth = '' THEN '/' ELSE pth END) ||
        |    (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS url_norm,
        |  regexp_extract(hst, '([^.]+\.[^.]+)$', 1) AS domain
        |FROM parts""".stripMargin,
  )
}
