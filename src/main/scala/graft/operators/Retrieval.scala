package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid-retrieval fusion (SURVEY.md §2.5 layer C): combine a sparse
 * (lexical, e.g. [[TextAnalysis.bm25TopK]]) and a dense (embedding, e.g.
 * [[Similarity.bruteForceTopK]] / [[Similarity.ivfTopK]]) ranked list —
 * or any number of ranked lists — into one ranking with reciprocal-rank
 * fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
 *
 *   rrf(d) = sum over lists L containing d of 1 / (k0 + rank_L(d))
 *
 * RRF is the standard production hybrid because it needs no score
 * calibration: BM25 scores and cosine similarities live on incomparable
 * scales, but ranks are ranks.
 *
 * Scale (100 TB): fusion NEVER touches the corpus. Inputs are the
 * k-bounded result lists the retrieval operators already produce (each
 * at most perList rows), so every stage here — the rank windows, the
 * union, the grouped sum, the final ranking — runs over O(lists * k)
 * rows regardless of corpus size. The heavy lifting (scan, candidate
 * generation, top-k heaps) stays in the upstream operators, which are
 * the ones with distributed-scale designs.
 */
object Retrieval {

  /** Derive (id, rnk) from a k-bounded scored list: rank 1 = best, by
    * (scoreCol DESC, idCol ASC) — the same total order every graft
    * ranking tail uses. The unpartitioned window is safe ONLY because
    * the input is an already-trimmed top-k list (document-scale inputs
    * belong in TopK.perKey, not here). */
  def asRankList(list: DataFrame, idCol: String, scoreCol: String): DataFrame =
    list.select(col(idCol).as("id"),
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).as("rnk"))

  /** Fuse pre-ranked lists (columns: id, rnk) into the RRF top-k.
    * Output: (id, rnk, rrf, n_lists) — fused rank, the rounded fused
    * score, and how many input lists contained the id.
    *
    * Determinism: each id receives at most one contribution per list;
    * with the standard two-list (sparse + dense) hybrid the grouped sum
    * is a single IEEE addition, so the fused score is bit-identical
    * across engines and partitionings. Ties break on id. */
  def rrfFuse(rankLists: Seq[DataFrame], k0: Int = 60,
      k: Int = 20): DataFrame = {
    require(rankLists.nonEmpty, "rrfFuse: need at least one rank list")
    require(k0 > 0 && k > 0, "rrfFuse: k0 > 0 and k > 0")
    val contribs = rankLists.map(_.select(col("id"),
      (lit(1.0) / (col("rnk").cast("double") + lit(k0.toDouble)))
        .as("contrib")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy("id")
      .agg(sum(col("contrib")).as("rrf"),
        count(lit(1)).cast("long").as("n_lists"))
    fused
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rrf").desc, col("id"))).cast("long"))
      .where(col("rnk") <= k)
      .select(col("id"), col("rnk"), round(col("rrf"), 6).as("rrf"),
        col("n_lists"))
  }

  /** [[rrfFuse]] batched by query — the production serving shape: every
    * input list carries (qid, id, rnk) rows for MANY queries at once
    * (e.g. [[Similarity.ivfTopK]]'s per-query output joined with a
    * shared sparse list), and fusion groups by (qid, id) so one pass
    * fuses the whole query batch. Output: (qid, id, rnk, rrf, n_lists).
    *
    * Same determinism contract as [[rrfFuse]] (at most one contribution
    * per list per (qid, id); the two-list hybrid sum is a single IEEE
    * addition; ties break on id); the rank window partitions by qid, so
    * no list is ever funneled through one task. Scale: everything here
    * runs over O(queries * lists * k) rows — corpus-independent.
    *
    * INPUT CONTRACT: each list must carry AT MOST ONE row per (qid, id)
    * — a non-deduped list silently inflates both `rrf` and `n_lists`.
    * The graft retrieval producers (ivfTopK / bm25TopK / asRankList
    * crossJoins) all satisfy it by construction; for third-party lists
    * set `spark.graft.fuse.checkUnique=true` and every duplicate fails
    * LOUDLY (a per-list (qid, id) count assertion — one extra bounded
    * window pass per list, debug-only so production plans stay
    * two-stage). */
  def rrfFuseByQuery(rankLists: Seq[DataFrame], k0: Int = 60,
      k: Int = 20): DataFrame = {
    require(rankLists.nonEmpty, "rrfFuseByQuery: need at least one list")
    require(k0 > 0 && k > 0, "rrfFuseByQuery: k0 > 0 and k > 0")
    val checkUnique = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.fuse.checkUnique", "false").toBoolean
    val checked =
      if (!checkUnique) rankLists
      else rankLists.zipWithIndex.map { case (l, i) =>
        l.withColumn("__cnt",
            count(lit(1)).over(Window.partitionBy("qid", "id")))
          .where(assert_true(col("__cnt") === 1,
            lit(s"rrfFuseByQuery: list #$i has duplicate (qid, id) rows — " +
              "each list may contribute at most once per (qid, id); " +
              "dedupe it upstream")).isNull)
          .drop("__cnt")
      }
    val contribs = checked.map(_.select(col("qid"), col("id"),
      (lit(1.0) / (col("rnk").cast("double") + lit(k0.toDouble)))
        .as("contrib")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy("qid", "id")
      .agg(sum(col("contrib")).as("rrf"),
        count(lit(1)).cast("long").as("n_lists"))
    fused
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf").desc, col("id")))
        .cast("long"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("id"), col("rnk"),
        round(col("rrf"), 6).as("rrf"), col("n_lists"))
  }

  /** Quantized nDCG gain term: floor(1e6 / log2(rank + 1)) — fixed-point
    * so per-query DCG sums are exact integers (order-independent across
    * engines and partitionings; the lmPerplexity pattern). log2 spelled
    * ln(x)/ln(2) because that exact expression replays on any engine. */
  private def gainScaled(rank: Column): Column =
    floor(lit(1000000.0) /
      (log(rank.cast("double") + lit(1.0)) / log(lit(2.0)))).cast("long")

  /** Ranking-quality metrics at cutoff k — the retrieval/RAG evaluation
    * staple: per query, hit count, first-hit rank, reciprocal rank (the
    * MRR term), precision@k, recall@k, and binary-gain nDCG@k. `results`
    * is a ranked list (qid, id, rnk); `truth` the relevant set (qid, id)
    * — e.g. an ANN index's output scored against brute-force ground
    * truth, which turns index recall into a first-class, oracle-checked
    * number instead of a spec-only assertion.
    *
    * Every query in `truth` reports (queries the ranker missed entirely
    * score 0, not NULL-out). DCG/IDCG terms are quantized once to 1e-6
    * fixed point so the grouped sums are exact integers; IDCG folds a
    * sequence(1..min(n_rel,k)) in-row.
    *
    * Scale: one k-bounded join per query + two keyed aggregates — the
    * evaluation set is always metadata-sized next to the corpus. */
  def rankingMetrics(results: DataFrame, truth: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, "rankingMetrics: k > 0")
    val res = results.where(col("rnk") <= k)
    val j = res.join(truth.select(col("qid"), col("id"), lit(1L).as("__r")),
        Seq("qid", "id"), "left")
      .withColumn("relv", coalesce(col("__r"), lit(0L)))
    val perQ = j.groupBy("qid").agg(
      sum(col("relv")).as("hits"),
      min(when(col("relv") === 1L, col("rnk").cast("long"))).as("first_rnk"),
      sum(when(col("relv") === 1L, gainScaled(col("rnk")))
        .otherwise(lit(0L))).as("dcg_scaled"))
    val nRel = truth.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    nRel.join(perQ, Seq("qid"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("dcg_scaled", coalesce(col("dcg_scaled"), lit(0L)))
      .withColumn("idcg_scaled",
        aggregate(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
          lit(0L), (acc, i) => acc + gainScaled(i)))
      .select(col("qid"), col("n_rel"), col("hits"), col("first_rnk"),
        round(coalesce(lit(1.0) / col("first_rnk").cast("double"),
          lit(0.0)), 6).as("rr"),
        round(col("hits").cast("double") / lit(k.toDouble), 6).as("prec"),
        round(col("hits").cast("double") / col("n_rel").cast("double"), 6)
          .as("recall"),
        round(col("dcg_scaled").cast("double") /
          col("idcg_scaled").cast("double"), 6).as("ndcg"))
  }

  /** Hard cap on [[mmrRerank]]'s candidate list — MMR is a RE-RANKER over
    * an already-retrieved top-N, never a corpus operator. */
  val MmrMaxCandidates: Int = 10000

  /** Maximal-marginal-relevance diversified re-rank (Carbonell &
    * Goldstein, SIGIR 1998): greedily select k items maximizing
    *
    *   lambda * rel(d) - (1 - lambda) * max over selected s of cos(d, s)
    *
    * — relevance traded against redundancy with what's already picked,
    * the standard answer to "my top-k is ten copies of the same page".
    * Step 1 has no selected set (the penalty term is 0); ties break on
    * the objective DESC then id ASC. Output: (id, rnk, mmr) — selection
    * order and the rounded objective at selection time.
    *
    * Scale (100 TB): the greedy argmax chain is inherently sequential
    * (step i depends on picks 1..i-1), so the input CONTRACT is a
    * k-bounded retrieval result (<= [[MmrMaxCandidates]] rows,
    * fail-fast), and the selection runs on the collected list —
    * O(k * n) cosines over a few hundred rows, the same bounded-driver
    * pattern as trainKMeans. The corpus-scale work (scan, candidate
    * generation, top-N) stays in the upstream retrieval operators.
    * Cosines fold left-to-right in double, matching [[VectorOps.dot]]
    * and the DuckDB oracle's list_reduce exactly. */
  def mmrRerank(candidates: DataFrame, idCol: String, vecCol: String,
      relCol: String, k: Int, lambda: Double): DataFrame = {
    require(k > 0, "mmrRerank: k > 0")
    require(lambda >= 0.0 && lambda <= 1.0, "mmrRerank: lambda in [0, 1]")
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .select(col(idCol).cast("long"), col(vecCol),
        col(relCol).cast("double"))
      .collect()
    require(rows.length <= MmrMaxCandidates,
      s"mmrRerank: ${rows.length} candidates exceed $MmrMaxCandidates — " +
        "MMR re-ranks a bounded retrieval list, not a corpus")
    val cand = rows.map(r => (r.getLong(0),
      r.getSeq[Float](1).toArray, r.getDouble(2))).toSeq
    mmrGreedy(cand, k, lambda, "mmrRerank").toDF("id", "rnk", "mmr")
  }

  /** The sequential greedy core both MMR forms share — one candidate
    * list in, the (id, rnk, mmr) selection out. Bit-for-bit the same
    * math for [[mmrRerank]] and each of [[mmrRerankByQuery]]'s per-qid
    * slices (the rrfFuseByQuery equality-spec pattern). */
  private def mmrGreedy(cand: Seq[(Long, Array[Float], Double)], k: Int,
      lambda: Double, caller: String): Seq[(Long, Long, Double)] = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val nrm = cand.map { case (_, v, _) => math.sqrt(dot(v, v)) }
    // Fail-fast like the siblings: a zero-norm (or NaN) vector makes its
    // cosine 0/0 = NaN, whose objective silently never wins the argmax —
    // and if all remaining candidates are NaN the argmax has no winner.
    val badNorm = cand.indices.filter(i => !(nrm(i) > 0.0))
    require(badNorm.isEmpty,
      s"$caller: ${badNorm.size} candidate vector(s) with zero/NaN norm " +
        s"(ids ${badNorm.take(5).map(cand(_)._1).mkString(", ")}) — " +
        "cosine redundancy is undefined; drop or re-embed them upstream")
    // Candidates sorted by id so every argmax sweep visits ids in the
    // same order on any engine (ties resolve to the LOWER id because a
    // later equal objective never displaces the incumbent).
    val order = cand.indices.sortBy(cand(_)._1)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val taken = scala.collection.mutable.Set.empty[Int]
    while (out.length < math.min(k, cand.length)) {
      var bestI = -1
      var bestObj = Double.NegativeInfinity
      order.foreach { i =>
        if (!taken.contains(i)) {
          val (_, v, rel) = cand(i)
          var maxSim = 0.0
          var any = false
          selected.foreach { j =>
            val s = dot(v, cand(j)._2) / (nrm(i) * nrm(j))
            if (!any || s > maxSim) { maxSim = s; any = true }
          }
          val obj = lambda * rel - (1.0 - lambda) * (if (any) maxSim else 0.0)
          if (obj > bestObj) { bestObj = obj; bestI = i }
        }
      }
      selected += bestI
      taken += bestI
      out += ((cand(bestI)._1, out.length + 1L,
        BigDecimal(bestObj).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }
    out.toSeq
  }

  /** [[mmrRerank]] batched by query — the serving shape the multi-query
    * RAG chain needs: `candidates` carries (qidCol, idCol, vecCol,
    * relCol) rows for MANY queries at once (each query's k-bounded
    * retrieval list), and the greedy selection runs independently per
    * qid. Output: (qid, id, rnk, mmr), rnk = selection order within the
    * query. Each per-qid slice is BIT-IDENTICAL to a single-query
    * [[mmrRerank]] over that slice ([[mmrGreedy]] is the shared core;
    * RetrievalFusionSpec pins the equality).
    *
    * Scale: same bounded-driver contract as [[mmrRerank]] — the greedy
    * chain is inherently sequential per query, so the TOTAL collected
    * batch is capped at [[MmrMaxCandidates]] rows (queries x per-query
    * list, corpus-independent); a bigger serving batch splits into
    * several calls upstream. Selection is O(k * n_q) per query over the
    * collected slices. */
  def mmrRerankByQuery(candidates: DataFrame, qidCol: String, idCol: String,
      vecCol: String, relCol: String, k: Int, lambda: Double): DataFrame = {
    require(k > 0, "mmrRerankByQuery: k > 0")
    require(lambda >= 0.0 && lambda <= 1.0,
      "mmrRerankByQuery: lambda in [0, 1]")
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .select(col(qidCol).cast("long"), col(idCol).cast("long"), col(vecCol),
        col(relCol).cast("double"))
      .collect()
    require(rows.length <= MmrMaxCandidates,
      s"mmrRerankByQuery: ${rows.length} candidates exceed " +
        s"$MmrMaxCandidates — MMR re-ranks bounded retrieval lists, " +
        "not a corpus; split larger query batches upstream")
    rows.map(r => (r.getLong(0),
        (r.getLong(1), r.getSeq[Float](2).toArray, r.getDouble(3))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (qid, slice) =>
        mmrGreedy(slice.map(_._2).toSeq, k, lambda, "mmrRerankByQuery")
          .map { case (id, rnk, mmr) => (qid, id, rnk, mmr) }
      }
      .toDF("qid", "id", "rnk", "mmr")
  }
}
