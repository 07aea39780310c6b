package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Packing, Sampling, TextAnalysis}

/** Deterministic split/sample operators + math/set-op tail coverage. */
object SamplingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_hash_split" -> { (s, dir) =>
      Sampling.hashSplit(Tables.load(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
    },
    "sample_stratified" -> { (s, dir) =>
      Sampling.hashStratifiedSample(Tables.load(s, dir, "documents"),
          "doc_id", "lang",
          Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.1, "fr" -> 1.0, "zh" -> 0.0))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
    },
    // Exactly-5-per-language deterministic sample (few-shot/eval picks).
    "sample_k_per_group" -> { (s, dir) =>
      Sampling.kPerGroup(Tables.load(s, dir, "documents"),
          "doc_id", "lang", 5)
        .select("lang", "doc_id")
    },
    // Temperature rebalancing at alpha=0.5: small sources are upweighted
    // toward a flatter mix, expected total ~50% of the corpus. Exact
    // row-level oracle (hash-rule replay).
    "sample_temperature" -> { (s, dir) =>
      Sampling.temperatureSample(Tables.load(s, dir, "documents"),
          "doc_id", "source", alpha = 0.5, targetFraction = 0.5)
        .select("doc_id", "source")
    },
    // EXACT mixture: precisely 200 docs at en/es/de/fr = .5/.2/.2/.1 via
    // largest-remainder quotas + salted-hash rank per domain (rides the
    // heap top-k operator). Oracle embeds the same quota literals.
    // TOKEN-budgeted mixture: 20k whitespace tokens split en/es/de/fr =
    // .5/.2/.2/.1 (largest remainder), each domain keeping the greedy
    // hash-rank prefix of docs until its token budget is met (boundary
    // doc included). The oracle replays quota literals, md5 rank, and
    // the exclusive running token sum.
    "sample_token_budget" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      Sampling.tokenBudgetMixture(d, "doc_id", "lang",
          TextAnalysis.tokenCount(col("text")), MixWeights, TokTotal)
        .select("lang", "doc_id", "n_tokens")
    },
    "sample_exact_mixture" -> { (s, dir) =>
      Sampling.exactMixture(Tables.load(s, dir, "documents"),
          "doc_id", "lang", MixWeights, MixTotal)
        .select("lang", "doc_id")
    },
    // Weighted sampling WITHOUT replacement (A-Res): exactly 100 docs,
    // odds proportional to 1 + floor(n_chars/100) — longer docs more
    // likely, expressed as top-k by max-of-w-salted-hashes (pure integer
    // math; the oracle replays the identical rule).
    "sample_weighted_k" -> { (s, dir) =>
      Sampling.weightedK(Tables.load(s, dir, "documents"), "doc_id",
          lit(1L) + floor(col("n_chars") / 100.0).cast("long"), 100)
        .select("doc_id", "lang")
    },
    // Sequence packing: greedy contiguous fill of 256-token training
    // sequences within 8 deterministic shards (integer-only window math —
    // the oracle replays it bit-for-bit).
    "pack_sequences" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      Packing.packSequences(d, "doc_id",
        TextAnalysis.tokenCount(col("text")), 256L, 8)
    },
    // First-fit-decreasing packing (property gate — the per-shard
    // bin-fill fold is sequential state with no fixed-width SQL
    // encoding): every doc assigned exactly once, no multi-doc bin over
    // capacity, and FFD's pad mass never exceeds the contiguous fill's.
    "pack_ffd_props" -> { (s, dir) =>
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
      val cap = 256L
      val tc = graft.operators.TextAnalysis.tokenCount(col("text"))
      val ffd = Packing.packSequencesFfd(d, "doc_id", tc, cap, 8)
      val nDocs = d.count()
      val assignedOk = ffd.count() == nDocs &&
        ffd.select("doc_id").distinct().count() == nDocs
      def padMass(packed: org.apache.spark.sql.DataFrame): Long = {
        val t = packed.groupBy("seq_id").agg(sum("n_tokens").as("t"))
          .agg(sum(greatest(lit(cap), col("t"))).as("p"), sum(col("t")).as("tt"))
          .collect()(0)
        t.getLong(0) - t.getLong(1)
      }
      val fills = ffd.groupBy("seq_id").agg(sum("n_tokens").as("t"),
        count(lit(1)).as("nd"), max("n_tokens").as("mx"))
      val capOk = fills.where(col("t") > cap &&
        !(col("nd") === 1 && col("mx") > cap)).count() == 0
      val beats =
        padMass(ffd) <= padMass(Packing.packSequences(d, "doc_id", tc, cap, 8))
      Seq((nDocs, assignedOk, capOk, beats))
        .toDF("n_docs", "assigned_ok", "capacity_ok", "pad_not_worse")
    },
    // Per-sequence roll-up: doc count, token total, fill fraction
    // (> 1 == the tail doc straddles the capacity boundary).
    "pack_sequence_stats" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      Packing.sequenceStats(
        Packing.packSequences(d, "doc_id",
          TextAnalysis.tokenCount(col("text")), 256L, 8), 256L)
    },
    "rel_q28_math_funcs" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      // ceil/floor/sign return types differ across engines (Spark BIGINT/
      // BIGINT/DOUBLE vs DuckDB DOUBLE/DOUBLE/TINYINT) — pin them with
      // explicit casts on BOTH sides so the canonical outputs agree.
      s.sql("""SELECT l_orderkey, l_linenumber,
              |  abs(l_quantity - 25) AS a,
              |  CAST(ceil(l_quantity / 7) AS BIGINT) AS c,
              |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS f,
              |  round(sqrt(l_quantity), 6) AS sq,
              |  CAST(l_orderkey % 7 AS BIGINT) AS m,
              |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
              |FROM lineitem WHERE l_orderkey < 50
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    },
    "rel_q29_setops_all" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT
              |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
              |    (SELECT o_custkey FROM orders INTERSECT ALL
              |     SELECT c_custkey FROM customer) t1) AS n_intersect_all,
              |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
              |    (SELECT o_custkey FROM orders EXCEPT ALL
              |     SELECT c_custkey FROM customer) t2) AS n_except_all""".stripMargin)
    },
    // Z-order (Morton) codes for write-side layout clustering — the
    // shift/mask arithmetic replays bit-for-bit in DuckDB.
    "layout_zorder_codes" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem").where(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout
            .interleaveBits(col("l_orderkey"), col("l_partkey")).as("z"))
    },
    // Hilbert-curve codes (order-16) over the same keys: the Z-curve's
    // locality upgrade — consecutive positions are always grid-adjacent.
    // The oracle replays the full iterative rotation arithmetic as an
    // unrolled per-level CTE chain, so every code hash-matches.
    "layout_hilbert_codes" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem").where(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.hilbertIndex(
            col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
            bits = 16).as("h"))
    },
    // Custom heap-bounded top-k-per-key physical operator (partial below
    // the exchange + final above, no sort anywhere) under a TOTAL order;
    // the oracle is the row_number window form it replaces.
    "topk_per_key" -> { (s, dir) =>
      graft.operators.TopK.perKey(
        Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_orderkey", "l_linenumber",
            "l_extendedprice"),
        Seq(col("l_returnflag")),
        Seq(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber")), 5)
    },
    // File-level min/max data skipping: write lineitem range-clustered on
    // l_orderkey, build the per-file stats index, then answer a key-range
    // query reading ONLY overlapping files. The result must equal a plain
    // filter (the oracle) no matter how the range boundaries fell;
    // LayoutSpec asserts files were actually skipped.
    "layout_minmax_prune" -> { (s, dir) =>
      val out = s"${sys.props("java.io.tmpdir")}/graft_layout_stats_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(out)
      val index = graft.operators.Layout.fileStatsIndex(s, out, "l_orderkey")
      val (scan, _, _) = graft.operators.Layout.prunedRangeScan(
        s, out, index, "l_orderkey", 1000L, 2000L)
      scan.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
          min(col("l_orderkey")).as("k_min"), max(col("l_orderkey")).as("k_max"))
    },
    // Stable dense row ids in total (l_orderkey, l_linenumber) order via
    // the two-pass range-partition + zipWithIndex pattern; oracle is the
    // global row_number the single-partition window would compute.
    "layout_dense_ids" -> { (s, dir) =>
      graft.operators.Layout.stableDenseIds(
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 3000)
          .select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq(col("l_orderkey"), col("l_linenumber")), 8)
        .select("row_id", "l_orderkey", "l_linenumber")
    },
    // Per-file BLOOM index point lookup: lineitem written UNCLUSTERED
    // (hash repartition - min/max spans are useless here), Bloom index
    // built per file, a 3-key probe reads only might-contain files. The
    // result must equal a plain IN filter; LayoutSpec asserts skipping.
    "layout_bloom_prune" -> { (s, dir) =>
      val out = s"${sys.props("java.io.tmpdir")}/graft_layout_bloom_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .repartition(8, col("l_quantity"), col("l_linenumber"))
        .write.mode("overwrite").parquet(out)
      val index = graft.operators.Layout.fileBloomIndex(
        s, out, "l_orderkey", expectedPerFile = 100000L)
      val (scan, _, _) = graft.operators.Layout.prunedPointScan(
        s, out, index, "l_orderkey", Seq(7L, 1000L, 4999L))
      scan.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
    },
    // Small-file compaction: 50 fragment files -> ceil(n/5000) compacted
    // files (coalesce, shuffle-free), then prove the rewrite lost nothing
    // with a full-table aggregate the oracle replays on the source table.
    "layout_compact_roundtrip" -> { (s, dir) =>
      val base = s"${sys.props("java.io.tmpdir")}/graft_layout_compact_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      Tables.load(s, dir, "lineitem").where(col("l_orderkey") < 2000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .repartition(50)
        .write.mode("overwrite").parquet(s"$base/in")
      graft.operators.Layout.compact(s, s"$base/in", s"$base/out", 5000L)
      s.read.parquet(s"$base/out")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
          sum(col("l_orderkey") * col("l_linenumber")).as("checksum"))
    },
  )

  private val duckBucket =
    "('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000"

  private val MixWeights =
    Map("en" -> 0.5, "es" -> 0.2, "de" -> 0.2, "fr" -> 0.1)
  private val MixTotal = 200L

  /** Global token budget for sample_token_budget. */
  private val TokTotal = 20000L

  /** Shared packing oracle CTE: per-doc token counts -> per-shard running
    * totals (start = exclusive cumulative sum; `//` is safe because the
    * numerator is non-negative, where truncation == floor). */
  private val duckPackCte =
    """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS nt,
      |             doc_id % 8 AS shard FROM documents),
      |c AS (SELECT doc_id, shard, nt,
      |        SUM(nt) OVER (PARTITION BY shard ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt
      |          AS strt
      |      FROM d)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "sample_temperature" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(CAST(floor(sqrt(n) * 1048576.0) AS BIGINT))
        |               AS BIGINT) AS wsum,
        |             CAST(SUM(n) AS DOUBLE) AS ntot FROM c),
        |f AS (SELECT source,
        |        least(1.0, 0.5 * ntot * sqrt(n) * 1048576.0 / wsum / n) AS fd
        |      FROM c, t)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN f USING (source)
        |WHERE ('0x' || substr(md5('temp:' || d.source || ':' ||
        |         CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
        |      < round(fd * 10000)""".stripMargin,
    "pack_sequences" ->
      s"""$duckPackCte
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  CAST((strt // 256) * 8 + shard AS BIGINT) AS seq_id,
         |  CAST(strt - (strt // 256) * 256 AS BIGINT) AS offset_tokens,
         |  CAST(nt AS BIGINT) AS n_tokens
         |FROM c""".stripMargin,
    "pack_ffd_props" ->
      ("SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs, " +
        "TRUE AS assigned_ok, TRUE AS capacity_ok, TRUE AS pad_not_worse"),
    "pack_sequence_stats" ->
      s"""$duckPackCte
         |SELECT CAST((strt // 256) * 8 + shard AS BIGINT) AS seq_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(nt) AS BIGINT) AS tokens,
         |  CAST(CAST(SUM(nt) AS BIGINT) AS DOUBLE) / 256 AS fill_frac
         |FROM c GROUP BY 1""".stripMargin,
    "sample_token_budget" -> {
      val budgets = Sampling.allocateMixture(MixWeights, TokTotal)
      val langs = budgets.keys.toSeq.sorted.map(l => s"'$l'").mkString(", ")
      val cases = budgets.toSeq.sortBy(_._1)
        .map { case (l, n) => s"WHEN '$l' THEN $n" }.mkString(" ")
      s"""WITH d AS (SELECT lang, doc_id,
         |    len(string_split(text, ' ')) AS nt,
         |    ('0x' || substr(md5('mixtok:' || lang || ':' ||
         |      CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM documents
         |  WHERE lang IN ($langs) AND len(string_split(text, ' ')) >= 1),
         |c AS (SELECT lang, doc_id, nt,
         |    SUM(nt) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt
         |      AS bef
         |  FROM d)
         |SELECT lang, doc_id, CAST(nt AS BIGINT) AS n_tokens
         |FROM c WHERE bef < CASE lang $cases ELSE 0 END""".stripMargin
    },
    "sample_exact_mixture" -> {
      val targets = Sampling.allocateMixture(MixWeights, MixTotal)
      val langs = targets.keys.toSeq.sorted.map(l => s"'$l'").mkString(", ")
      val cases = targets.toSeq.sortBy(_._1)
        .map { case (l, n) => s"WHEN '$l' THEN $n" }.mkString(" ")
      s"""WITH ranked AS (SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
         |      ('0x' || substr(md5('mix:' || lang || ':' ||
         |        CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id) AS rn
         |  FROM documents WHERE lang IN ($langs))
         |SELECT lang, doc_id FROM ranked
         |WHERE rn <= CASE lang $cases ELSE 0 END""".stripMargin
    },
    "sample_weighted_k" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    list_max(list_transform(
        |      generate_series(1, CAST(1 + floor(d.n_chars / 100.0) AS BIGINT)),
        |      j -> ('0x' || substr(md5('wk:' ||
        |        CAST(d.doc_id AS VARCHAR) || ':' ||
        |        CAST(j AS VARCHAR)), 1, 15))::BIGINT)) AS wkey
        |  FROM documents d
        |  WHERE CAST(1 + floor(d.n_chars / 100.0) AS BIGINT) >= 1
        |) ORDER BY wkey DESC, doc_id LIMIT 100""".stripMargin,
    "sample_hash_split" ->
      s"""SELECT CASE WHEN $duckBucket < 8000 THEN 'train'
         |            WHEN $duckBucket < 9000 THEN 'val'
         |            ELSE 'test' END AS split,
         |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM documents GROUP BY 1""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM (SELECT lang, doc_id,
        |  ('0x' || substr(md5('strat:' || lang || ':' ||
        |     CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS b
        |  FROM documents) t
        |WHERE b < (CASE lang WHEN 'en' THEN 5000 WHEN 'es' THEN 2500
        |           WHEN 'de' THEN 1000 WHEN 'fr' THEN 10000 ELSE 0 END)
        |GROUP BY lang""".stripMargin,
    "sample_k_per_group" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY ('0x' || substr(md5('kpg:' || lang || ':' ||
        |      CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 5""".stripMargin,
    "rel_q28_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS a,
        |  CAST(ceil(l_quantity / 7) AS BIGINT) AS c,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS f,
        |  round(sqrt(l_quantity), 6) AS sq,
        |  CAST(l_orderkey % 7 AS BIGINT) AS m,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
        |FROM lineitem WHERE l_orderkey < 50
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "rel_q29_setops_all" ->
      """SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |    (SELECT o_custkey FROM orders INTERSECT ALL
        |     SELECT c_custkey FROM customer) t1) AS n_intersect_all,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |    (SELECT o_custkey FROM orders EXCEPT ALL
        |     SELECT c_custkey FROM customer) t2) AS n_except_all""".stripMargin,
    "layout_zorder_codes" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(${graft.operators.Layout.duckSql("l_orderkey", "l_partkey")}
         |       AS BIGINT) AS z
         |FROM lineitem WHERE l_orderkey < 500""".stripMargin,
    // Unrolled Hilbert xy2d: one CTE per bit level carrying (x, y, d)
    // through the flip/swap rotation — CTEs materialize, so unlike a
    // column-level fold there is no expression-tree blowup.
    "layout_hilbert_codes" -> {
      val bits = 16
      val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (lvl, k) =>
        val s = 1L << lvl
        s"""hl${k + 1} AS (SELECT l_orderkey, l_linenumber,
           |  CASE WHEN (y & $s) = 0 THEN
           |         CASE WHEN (x & $s) > 0 THEN $s - 1 - y ELSE y END
           |       ELSE x END AS x,
           |  CASE WHEN (y & $s) = 0 THEN
           |         CASE WHEN (x & $s) > 0 THEN $s - 1 - x ELSE x END
           |       ELSE y END AS y,
           |  d + ${s * s} * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
           |                     CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
           |  FROM hl$k)""".stripMargin
      }
      s"""WITH hl0 AS (SELECT l_orderkey, l_linenumber,
         |    CAST(l_orderkey AS BIGINT) AS x, CAST(l_partkey AS BIGINT) AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM lineitem WHERE l_orderkey < 500),
         |${steps.mkString(",\n")}
         |SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS h
         |FROM hl$bits""".stripMargin
    },
    "topk_per_key" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
        |        l_extendedprice,
        |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
        |          AS rn
        |      FROM lineitem) t
        |WHERE rn <= 5""".stripMargin,
    "layout_minmax_prune" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  CAST(MIN(l_orderkey) AS BIGINT) AS k_min,
        |  CAST(MAX(l_orderkey) AS BIGINT) AS k_max
        |FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey <= 2000
        |GROUP BY l_returnflag""".stripMargin,
    "layout_dense_ids" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber)
        |       - 1 AS BIGINT) AS row_id,
        |  l_orderkey, l_linenumber
        |FROM lineitem WHERE l_orderkey < 3000""".stripMargin,
    "layout_bloom_prune" ->
      """SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_orderkey IN (7, 1000, 4999)
        |GROUP BY l_orderkey""".stripMargin,
    "layout_compact_roundtrip" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  CAST(SUM(l_orderkey * l_linenumber) AS BIGINT) AS checksum
        |FROM lineitem WHERE l_orderkey < 2000
        |GROUP BY l_returnflag""".stripMargin,
  )
}
