package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Streaming graph-edge maintenance — the graph twin of
 * [[DedupStream]]/[[EmbeddingIndexStream]]'s state folds: co-occurrence
 * batches (order, member) arrive as micro-batches and fold into a
 * persisted, versioned pair-count table, so the affinity graph (and
 * everything downstream: PageRank, triangles, k-core) is always
 * queryable over EVERYTHING ingested without re-scanning history.
 *
 * The incremental formulation is exact, not approximate: alongside the
 * pair counts, the fold keeps the (order, member) membership state;
 * each batch's genuinely-new rows pair (a) against the ACCUMULATED
 * members of the same order — catching orders whose lines straddle
 * batches — and (b) within the batch. Each unordered co-occurrence is
 * counted exactly once, so the folded counts equal the batch
 * computation bit-for-bit.
 *
 * Scale shape: per batch, one anti-join + one equi-join against
 * membership state keyed by the order id (at rest the state buckets by
 * that key, so probes co-locate), one within-batch self-join, and a
 * key-partitioned merge of pair counts. The persisted pair-count state
 * is UNDIRECTED (one row per a < b pair): the graph is symmetric, so
 * the directed form would double the merge shuffle, the state write,
 * and the at-rest bytes for zero information — consumers get the
 * directed (src, dst, cnt) contract back through a narrow union view.
 * Day-N cost is O(batch x order-fanout), never O(history).
 *
 * Both growing chains fold as [[DeltaState]] append chains: batch b
 * physically writes only its own `os_d{b}` membership delta and
 * `pc2_d{b}` pair-count delta — O(batch) I/O per batch. Pair counts
 * MERGE on read (base ∪ deltas, then one groupBy-sum — the
 * merge-on-read side of a log-structured table) and compact physically
 * every `compactEvery` batches; membership is a plain append. Replays
 * re-overwrite only their own deltas, landing exactly once, and vacuum
 * keeps >= 2 base anchors like every other streaming fold.
 */
object GraphStream {

  /**
   * Folds a stream of (okCol, sCol) co-occurrence rows into versioned
   * pair-count state under `stateDir`, returning the FINAL directed
   * pair-count table (src, dst, cnt).
   */
  def incrementalPairCounts(spark: SparkSession, streamDir: String,
      schema: StructType, stateDir: String, okCol: String, sCol: String,
      retainVersions: Int = 3, compactEvery: Int = 16): DataFrame = {
    val last = foldPairCounts(spark, streamDir, schema, stateDir, okCol,
      sCol, retainVersions, compactEvery, _ => ())
    directedView(mergedCounts(spark, stateDir, last))
  }

  /** Merge-on-read for the pair-count delta chain: base ∪ deltas, then
    * one key-partitioned sum — the serving view of the undirected count
    * state at version `n`. Also the compaction merge. */
  private def mergedCounts(spark: SparkSession, stateDir: String,
      n: Long): DataFrame =
    DeltaState.read(spark, stateDir, "pc2", n)
      .groupBy("a", "b").agg(sum(col("cnt")).as("cnt"))

  /** The co-occurrence graph is undirected, so the persisted state keeps
    * ONE row per unordered pair (a < b) — half the merge shuffle, half
    * the state write, half the at-rest bytes of the directed form. This
    * view re-expands to the directed (src, dst, cnt) contract consumers
    * expect; it is a narrow union, no shuffle. */
  private def directedView(und: DataFrame): DataFrame =
    und.select(col("a").as("src"), col("b").as("dst"), col("cnt"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst"),
        col("cnt")))

  /** The shared membership + pair-count fold; `afterBatch(id)` runs at
    * the end of each micro-batch (after pc2_v{id+1}/os_v{id+1} land) so
    * derived state chains — e.g. the rank fold — version in lockstep.
    * Returns the final version id.
    *
    * State-format note: the pair-count schema changed in r10 from
    * directed (src, dst, cnt) to undirected (a, b, cnt) with 2x-different
    * count semantics; the version prefix is `pc2_v` (was `pc_v`) so a
    * stale directed-era state directory is simply not found and the fold
    * rebuilds from v0, instead of unionByName failing mid-merge on the
    * old columns. */
  private def foldPairCounts(spark: SparkSession, streamDir: String,
      schema: StructType, stateDir: String, okCol: String, sCol: String,
      retainVersions: Int, compactEvery: Int,
      afterBatch: Long => Unit): Long = {
    require(retainVersions >= 2,
      "incrementalPairCounts: retainVersions >= 2 (current + replay anchor)")
    import spark.implicits._
    // One-time migration sweep: a stateDir written by the directed-era
    // or full-rewrite-era folds still holds pc_v*/pc2_v*/os_v*
    // directories that the delta-chain vacuum never touches — without
    // this they orphan and accumulate forever.
    StateFs.listDirNames(stateDir)
      .filter(_.matches("(pc|pc2|os)_v\\d+"))
      .foreach(StateFs.deleteDir(stateDir, _))
    DeltaState.writeBase(Seq.empty[(Long, Long)].toDF("ok", "s"),
      stateDir, "os", 0L)
    DeltaState.writeBase(Seq.empty[(Long, Long, Long)].toDF("a", "b", "cnt"),
      stateDir, "pc2", 0L)
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val members = DeltaState.read(spark, stateDir, "os", id)
      val incoming = batch
        .select(col(okCol).cast("long").as("ok"), col(sCol).cast("long").as("s"))
        .distinct()
      val fresh = incoming.join(members, Seq("ok", "s"), "left_anti")
        .localCheckpoint() // consumed 3x below; retry-unstable batch plans
                           // must not recompute differently per consumer
      // Each unordered co-occurrence lands exactly once, normalized to
      // a < b (fresh and members are disjoint, so (a) cannot duplicate
      // (b), and the x.s < y.s guard halves the self-join):
      // (a) new member x already-known members of the same order.
      val crossOld = fresh.as("n")
        .join(members.as("o"), col("n.ok") === col("o.ok") &&
          col("n.s") =!= col("o.s"))
        .select(least(col("n.s"), col("o.s")).as("a"),
          greatest(col("n.s"), col("o.s")).as("b"))
      // (b) new x new within the order.
      val crossNew = fresh.as("x")
        .join(fresh.as("y"), col("x.ok") === col("y.ok") &&
          col("x.s") < col("y.s"))
        .select(col("x.s").as("a"), col("y.s").as("b"))
      val delta = crossOld.unionByName(crossNew)
        .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
      DeltaState.writeDelta(delta, stateDir, "pc2", id + 1)
      DeltaState.writeDelta(fresh, stateDir, "os", id + 1)
      if (DeltaState.due(stateDir, "pc2", id + 1, compactEvery)) {
        DeltaState.compact(spark, stateDir, "pc2", id + 1,
          _.groupBy("a", "b").agg(sum(col("cnt")).as("cnt")))
        DeltaState.compact(spark, stateDir, "os", id + 1)
        DeltaState.vacuum(stateDir, "pc2", retainVersions)
        DeltaState.vacuum(stateDir, "os", retainVersions)
      }
      afterBatch(id)
      last = id + 1
    })
    last
  }

  /**
   * Warm-start incremental PageRank over streamed co-occurrence edges:
   * each micro-batch folds into the pair-count state, re-cuts the top-k
   * affinity edges, and REFRESHES the rank state —
   * [[graft.operators.Graph.pagerank]] cold (`coldIters` rounds,
   * uniform seed) when no rank state exists yet, then
   * [[graft.operators.Graph.pagerankWarm]] for every later batch:
   * `warmRounds` rounds seeded from the previous version's ranks (new
   * nodes enter at `scale`). Day-N refresh cost is O(warmRounds x E)
   * instead of a full cold restart, and the walk keeps mixing across
   * batches through the carried state. The rank chain `pr_v{b}`
   * versions in lockstep with the pair counts (batch b reads pr_v{b},
   * writes pr_v{b+1} — exactly-once under replay) and is vacuumed on
   * the same contract. Returns the final (node, rank_scaled, rank).
   *
   * `refreshEvery` decouples rank freshness from the per-batch fold:
   * the edge/membership fold runs EVERY batch, but rank rounds (each a
   * synchronous driver barrier) run only on every `refreshEvery`-th
   * batch; in between, pr_v{b+1} carries the previous ranks forward
   * unchanged (a node-sized copy, so the chain stays replay-idempotent
   * and a refresh at batch b is exactly warm rounds from the LAST
   * refreshed state). Steady-state per-batch wall time is then
   * fold-only, and ranks lag the edge state by < refreshEvery batches.
   * Recommended settings: low-latency dashboards refreshEvery=1,
   * warmRounds=1-2 (ranks always current, cheapest refresh); bulk
   * ingest refreshEvery=8-16, warmRounds=2-4 (rank cost amortizes to
   * noise and each refresh still converges from a warm seed — warm
   * rounds needed grows only mildly with staleness since the carried
   * ranks remain a good preconditioner).
   */
  def incrementalPagerank(spark: SparkSession, streamDir: String,
      schema: StructType, stateDir: String, okCol: String, sCol: String,
      k: Int = 8, coldIters: Int = 6, warmRounds: Int = 2,
      scale: Long = graft.operators.Graph.RankScale,
      retainVersions: Int = 3, refreshEvery: Int = 1,
      compactEvery: Int = 16): DataFrame = {
    require(refreshEvery >= 1, "incrementalPagerank: refreshEvery >= 1")
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("node", "rank_scaled")
      .write.mode("overwrite").parquet(s"$stateDir/pr_v0")
    val last = foldPairCounts(spark, streamDir, schema, stateDir, okCol,
      sCol, retainVersions, compactEvery, id => {
        val prev = spark.read.parquet(s"$stateDir/pr_v$id")
        val ranks =
          if ((id + 1) % refreshEvery != 0) prev // fold-only batch
          else {
            val counts =
              directedView(mergedCounts(spark, stateDir, id + 1))
            val edges = topKEdges(counts, k)
            if (prev.isEmpty)
              graft.operators.Graph.pagerank(edges, coldIters, scale)
            else graft.operators.Graph.pagerankWarm(edges, prev, warmRounds,
              scale)
          }
        ranks.select(col("node"), col("rank_scaled"))
          .write.mode("overwrite").parquet(s"$stateDir/pr_v${id + 1}")
        ChangelogStream.vacuum(stateDir, retainVersions, prefix = "pr_v")
      })
    spark.read.parquet(s"$stateDir/pr_v$last")
      .withColumn("rank",
        round(col("rank_scaled").cast("double") / scale.toDouble, 6))
  }

  /** Top-k affinity cut over a folded pair-count table — the same edge
    * contract as [[graft.operators.Graph.topKAffinityEdges]], served
    * from streamed state. */
  def topKEdges(pairCounts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("cnt").desc, col("dst"))
    pairCounts.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("src", "dst", "cnt")
  }
}
