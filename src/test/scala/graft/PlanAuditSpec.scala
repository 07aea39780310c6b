package graft

/**
 * Workload-wide physical-plan audit: every SparkEntry query is planned and
 * checked for scale anti-patterns. Queries that intentionally use a
 * nested-loop broadcast (all-pairs baselines, non-equi as-of bound) are
 * allow-listed; nothing may ever plan a CartesianProduct.
 */
class PlanAuditSpec extends GraftSuite {
  private val dir = SparkTestBase.sf0001

  // Deliberate nested-loop users: brute-force all-pairs baselines and the
  // windowed-rank as-of composition (non-equi time bound).
  private val nestedLoopAllowed = Set(
    "dedup_embedding_pairs", "sim_brute_topk", "rel_q13_set_ops",
    "rel_q16_scalar_subquery", "rel_q20_having_cte",
    "events_funnel", // 1-row x 1-row scalar combine
    // Quantile reads crossJoin the CONSTANT-SIZE sketch (its whole point)
    // with a 1-row total and a handful of q literals — never data-scale.
    "agg_quantile_sketch",
    // BM25 broadcasts its 1-row (n, avgdl, df...) stats to every doc row
    // (same shape whether scoring the text scan or the folded postings;
    // the streaming hybrids' sparse half is the same scorer — the SQ8
    // variant's dense half is all equi-joins, code-verified r16).
    "text_bm25_topk", "stream_bm25_index", "stream_hybrid_rrf",
    "stream_hybrid_rrf_sq8",
    // Same 1-row BM25 stats broadcast, scored over the delete-aware
    // postings fold (the tombstone anti-join itself is an equi-join).
    "stream_index_delete",
    // The corpus-derived doc-frequency cap is a 1-row broadcast scalar
    // joined to the gram stats (constant-time at any corpus size).
    "dedup_ngram_pairs",
    // TF-IDF broadcasts the 1-row corpus count N into the scoring.
    "text_tfidf_top",
    // KLL property gate broadcasts 4 (q, estimate) rows to the rank check.
    "agg_kll_quantiles",
    // LM scoring broadcasts the 1-row vocabulary size V into the
    // smoothing denominator (constant-size at any corpus size).
    "text_lm_perplexity",
    // Same 1-row V broadcast via lmPerplexity, then per-lang tiling.
    "text_ppl_buckets",
    // PMI broadcasts the 1-row token and pair totals into the scorer.
    "text_word_pmi",
    // Skew diagnostic broadcasts the 1-row total count into per-key shares.
    "diag_key_skew",
    // Target encoding broadcasts the 1-row global (count, sum) prior onto
    // the row stream (constant-size at any table size).
    "feat_target_encode",
    // t-closeness tiles the m-row (bin-cardinality) global cumulative
    // table across classes to build the dense grid — constant-size
    // broadcast at any row count.
    "priv_t_closeness",
    // Intended brute-force exactness baseline (queries x corpus); the
    // bucketed scale twin is sim_hard_negatives_lsh.
    "sim_hard_negatives",
    // The SQ8/Matryoshka coarse passes broadcast the 4-row query set
    // across the corpus codes (corpus x 4 — the flat-scan serving shape;
    // compose with IVF lists for a coarse index); the refine joins are
    // equi-joins on the shortlist. The stored-prefix layout gate is the
    // same coarse pass over the materialized narrow column.
    "sim_sq8_topk", "sim_matryoshka_topk", "io_matryoshka_prefix",
    // The dense half is bruteForceTopK with ONE broadcast query row
    // (corpus x 1); swap in ivfTopK/lshTopK at corpus scale — the
    // fusion/re-rank tails are list-bounded either way. The rag
    // pipeline composes the same dense half (and its brute truth).
    "text_hybrid_rrf", "sim_mmr_rerank", "pipeline_rag_retrieval",
    // The shared sparse list (50 rows, broadcast) tiles across the 8
    // query ids before per-query fusion — list-bounded at any corpus;
    // the brute TRUTH half broadcasts the 8 query rows like the others.
    "pipeline_rag_retrieval_ivf",
    // Ground truth is the brute baseline BY DESIGN (the metric gate
    // exists to score the LSH index against exact top-k); the broadcast
    // side is the 10-row query set.
    "sim_rank_metrics",
    // DSIR broadcasts the two 1-row corpus totals (n_t, n_r) into the
    // fixed buckets-row log-ratio table — constant-size at any corpus
    // (same shape scoring the scan or the folded model).
    "text_dsir_scores", "stream_dsir_model",
    // Same two 1-row totals feeding the constant-size divergence table.
    "text_ngram_drift", "stream_ngram_drift",
    // Both selection forms embed dsirScores' two 1-row total broadcasts
    // (the exact-rank form is the oracle contract; the sketch-threshold
    // form is the scale path — its cut is a collected literal, but the
    // cached scoring plan still prints the 1-row BNLJs).
    "pipeline_dsir_select", "pipeline_dsir_threshold",
    // columnStats combines its 1-row min/max/nulls aggregate with the
    // 1-row exact-NDV aggregate via a constant-size broadcast (the
    // DISTINCT aggregates run in their own job to avoid the Expand plan).
    "diag_table_stats", "diag_table_stats_approx",
    // The lateral_fanout fuzz shape joins a 4-row inline numbers table
    // on d.i <= expr — the portable explode spelling; the broadcast
    // side is constant-size (4 rows) at any corpus scale.
    "fuzz_sql_differential")

  // Streaming queries plan at runtime; generator-only queries scan nothing.
  private val skip = Set("stream_hourly", "stream_dedup_pairs",
    "stream_stream_join", "stream_gen_source", "stream_state_sessions_live")

  test("no query plans a CartesianProduct; nested-loop only where intended") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !skip.contains(name) =>
        val plan =
          try fn(spark, dir).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"PLANNING FAILED: $e" }
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !nestedLoopAllowed.contains(name)
        if (plan.startsWith("PLANNING FAILED") || cartesian || bnlj)
          Some(s"$name: cartesian=$cartesian unexpectedBNLJ=$bnlj " +
            plan.linesIterator.take(3).mkString(" | "))
        else None
      case _ => None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("parquet scans prune columns: q2 reads only the 5 needed columns") {
    val plan = graft.queries.RelationalQueries.queries("rel_q2_filter_project")(
      spark, dir).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_shipdate") ||
      readSchema.isEmpty, s"q2 must not read unused columns: $readSchema")
  }

  test("bucketed join plans with zero exchange (co-located storage join)") {
    val df = graft.queries.ExtendedQueries.queries("io_bucketed_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not re-shuffle the join key:\n$plan")
  }

  test("partitioned read prunes directories (PartitionFilters carries the predicate)") {
    val df = graft.queries.ExtendedQueries.queries("io_partitioned_prune")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("l_returnflag"),
      s"partition predicate must prune at the source:\n$plan")
  }

  test("range join plans as an equi-join on the bin key") {
    val df = graft.queries.JoinQueries.queries("join_range_bins")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"binned range join must not plan a nested loop:\n$plan")
  }

  test("multi-way star join broadcasts the small dimensions") {
    val plan = graft.queries.RelationalQueries.queries("rel_q5_region_revenue")(
      spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"region/nation dims must broadcast:\n$plan")
  }

  test("ANALYZE TABLE feeds the catalog stats CBO reads") {
    Tables.load(spark, dir, "nation").write.mode("overwrite")
      .saveAsTable("graft_stats_probe")
    try {
      spark.sql("ANALYZE TABLE graft_stats_probe COMPUTE STATISTICS")
      val statsDesc = spark.sql("DESCRIBE TABLE EXTENDED graft_stats_probe")
        .where(org.apache.spark.sql.functions.col("col_name") === "Statistics")
        .collect()
      assert(statsDesc.nonEmpty, "ANALYZE must record catalog statistics")
      val s = statsDesc(0).getString(1)
      assert(s.contains("25 rows") && s.contains("bytes"),
        s"expected '<n> bytes, 25 rows', got '$s'")
    } finally spark.sql("DROP TABLE IF EXISTS graft_stats_probe")
  }

  test("generator queries are single-stage (no exchange before aggregation input)") {
    graft.functions.RandgenFunctions.registerAll(spark)
    val plan = spark.sql(
      "SELECT randgen_int64_uniform(1, 10, 1) AS x FROM range(1, 101)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"generator projection must not shuffle:\n$plan")
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"generator must run inside codegen:\n$plan")
  }
}
