package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Graph analytics over relationally-derived edge lists: exact-integer
 * PageRank, triangle counting, and degree profiles.
 *
 * Training-data pipelines use these constantly — link-graph PageRank is
 * a classic web-corpus quality prior (rank a page by who links to it),
 * triangle density separates organic link neighborhoods from spam farms,
 * and the degree profile is the first diagnostic read before choosing a
 * partitioning strategy for any graph-shaped join.
 *
 * Everything here is a composition of equi-joins and keyed aggregates on
 * a `(src, dst)` edge DataFrame — no driver-side adjacency structures,
 * no vertex-program framework. At 100 TB the edge list is the ONLY
 * corpus-scale table; ranks/degrees are vertex-sized, and every
 * iteration is one keyed join + one keyed aggregate, both on the same
 * `src` partitioning.
 *
 * Determinism contract (same discipline as [[QualityModel]] /
 * [[TextAnalysis.lmPerplexity]]): ranks live as 2^30-scaled BIGINTs and
 * every step is integer arithmetic — `div` for the out-degree share and
 * the 17/20 (= 0.85) damping ratio — so per-node ranks are
 * bit-reproducible regardless of partitioning or aggregation order, and
 * a SQL oracle can replay the iterations exactly.
 */
object Graph {

  /** Rank fixed-point scale: 2^30. */
  val RankScale: Long = 1L << 30

  /** Teleport mass per node: floor(0.15 * scale) in exact integers. */
  def teleportBase(scale: Long): Long = (3L * scale) / 20L

  /**
   * Top-k supplier affinity edges from `lineitem`: for each supplier,
   * the `k` partners it most often shares an order with (co-purchase
   * support, ties to the lower partner id), as directed weighted edges
   * `(src, dst, cnt)`.
   *
   * The raw co-occurrence relation is near-complete on a TPC-H-shaped
   * dataset (every supplier eventually co-occurs with every other), and
   * a near-complete graph makes triangle enumeration and rank iteration
   * explode combinatorially. Sparsifying to each node's top-k strongest
   * neighbors is the standard move before any web-scale graph
   * computation — it bounds every degree by k (2k undirected), so all
   * downstream costs are linear in the vertex count.
   *
   * Scale shape: the within-order pair expansion is an equi-self-join on
   * `l_orderkey` — one shuffle on the order key, per-key blow-up bounded
   * by the order's line count (single digits) — followed by one
   * `(src, dst)` keyed count with map-side partials and a per-src top-k
   * window over the PAIR table (vertex × avg-degree sized, not
   * corpus-sized).
   */
  def topKAffinityEdges(lineitem: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1, "topKAffinityEdges: k >= 1")
    val sup = lineitem
      .select(col("l_orderkey").as("ok"), col("l_suppkey").cast("long").as("s"))
      .distinct()
    val pairs = sup.as("a").join(sup.as("b"),
        col("a.ok") === col("b.ok") && col("a.s") =!= col("b.s"))
      .select(col("a.s").as("src"), col("b.s").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("cnt").desc, col("dst"))
    pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("src", "dst", "cnt")
  }

  /**
   * Exact-integer PageRank, `iterations` synchronous rounds:
   *
   *   rank0(v)   = scale                        (i.e. 1.0)
   *   rank_i(v)  = floor(0.15 * scale)
   *              + floor(0.85 * sum over in-edges(u, v) of
   *                      floor(rank_{i-1}(u) / outdeg(u)))
   *
   * Nodes with no in-edges keep the teleport mass; mass arriving at
   * dangling nodes (no out-edges) leaks, the standard simplification
   * when ranks are read as relative quality scores rather than a strict
   * probability distribution. Both choices are part of the contract and
   * replayed by the oracle.
   *
   * Scale shape: the edge list is hash-partitioned by `src` ONCE and
   * persisted; each round is (vertex-sized ranks) ⋈ (vertex-sized
   * out-degrees) ⋈ edges on that same `src` key, then one `dst`-keyed
   * sum with map-side partials. Ranks are localCheckpointed each round
   * so the plan stays one-iteration deep instead of growing a
   * 2^iterations lineage. Overflow headroom: total mass is bounded by
   * N * scale, and the 17× damping multiply stays far inside Long for
   * any N the vertex table could hold.
   */
  def pagerank(edges: DataFrame, iterations: Int,
      scale: Long = RankScale): DataFrame = {
    require(iterations >= 1, "pagerank: iterations >= 1")
    require(scale >= 1000, s"pagerank: scale >= 1000, got $scale")
    val (e, outdeg, nodes) = edgeTables(edges)
    val based = nodes
      .withColumn("__base", lit(teleportBase(scale)))
      .withColumn("__r0", lit(scale))
    rankLoop(e, outdeg, based, iterations, scale)
  }

  /**
   * Warm-started PageRank: the SAME synchronous recurrence as
   * [[pagerank]], but round 0 seeds from `seedRanks` (node,
   * rank_scaled) instead of the uniform `scale` — nodes absent from the
   * seed (newly arrived) start at `scale`. Because the recurrence is
   * deterministic and memoryless, warm-starting from [[pagerank]]'s
   * round-t state and running k more rounds IS rounds t+1..t+k
   * (GraphSpec asserts the bit-for-bit splice); on a growing graph this
   * is the daily-refresh shape: a few rounds from yesterday's ranks
   * instead of a full cold restart — iteration cost per refresh drops
   * from O(iters x E) to O(refresh x E) while the walk keeps mixing
   * across days. [[graft.streaming.GraphStream.incrementalPagerank]]
   * folds it per micro-batch with versioned state.
   */
  def pagerankWarm(edges: DataFrame, seedRanks: DataFrame, rounds: Int,
      scale: Long = RankScale): DataFrame = {
    require(rounds >= 1, "pagerankWarm: rounds >= 1")
    require(scale >= 1000, s"pagerankWarm: scale >= 1000, got $scale")
    val (e, outdeg, nodes) = edgeTables(edges)
    val seeds = seedRanks.select(col("node").cast("long").as("node"),
      col("rank_scaled").cast("long").as("__prev"))
    val based = nodes.join(seeds, Seq("node"), "left")
      .select(col("node"), lit(teleportBase(scale)).as("__base"),
        coalesce(col("__prev"), lit(scale)).as("__r0"))
    rankLoop(e, outdeg, based, rounds, scale)
  }

  /**
   * Personalized PageRank: identical recurrence, but teleport mass lands
   * ONLY on `seeds` — rank measures proximity to the seed set under
   * random walks, the related-entity retrieval / trusted-source
   * propagation primitive (a TrustRank-style quality prior when seeds
   * are vetted-good hosts). Non-seed nodes start at 0 and earn rank only
   * through propagation. Same integer contract and scale shape as
   * [[pagerank]]; the seed flag is one vertex-sized left join before the
   * loop.
   */
  def personalizedPagerank(edges: DataFrame, seeds: DataFrame,
      iterations: Int, scale: Long = RankScale): DataFrame = {
    require(iterations >= 1, "personalizedPagerank: iterations >= 1")
    require(scale >= 1000, s"personalizedPagerank: scale >= 1000, got $scale")
    val (e, outdeg, nodes) = edgeTables(edges)
    val seedSet = seeds.select(col("node").cast("long").as("node")).distinct()
      .withColumn("__seed", lit(1L))
    val based = nodes.join(seedSet, Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("__seed"), lit(0L)) * teleportBase(scale)).as("__base"),
        (coalesce(col("__seed"), lit(0L)) * scale).as("__r0"))
    rankLoop(e, outdeg, based, iterations, scale)
  }

  /**
   * Weight-proportional PageRank: instead of splitting rank equally
   * across out-edges, each neighbor receives mass proportional to the
   * edge weight (`cnt` — co-occurrence support here): the random walk
   * follows STRONG affinities more often, which is what an
   * affinity-weighted quality prior should do.
   *
   * Integer contract: share(u→v) = (rank(u) * w(u,v)) div totw(u) — one
   * multiply before the divide keeps the floor loss at one unit per
   * edge (vs pre-dividing rank by totw, which loses up to totw units).
   * rank * w stays far inside Long for any vertex table the engine
   * would hold (mass ≤ N·scale ≈ 2^40ish, weights are support counts).
   */
  def pagerankWeighted(edges: DataFrame, iterations: Int,
      scale: Long = RankScale): DataFrame = {
    require(iterations >= 1, "pagerankWeighted: iterations >= 1")
    require(scale >= 1000, s"pagerankWeighted: scale >= 1000, got $scale")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("cnt").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val totw = e.groupBy("src").agg(sum(col("cnt")).as("totw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val based = nodes
      .withColumn("__base", lit(teleportBase(scale)))
      .withColumn("__r0", lit(scale))
      .localCheckpoint()
    var ranks = based.select(col("node"), col("__r0").as("rank_scaled"))
    for (i <- 1 to iterations) {
      val withRank = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(totw, "src")
        .select(col("dst"),
          expr("(rank_scaled * cnt) div totw").as("share"))
      val inbound = withRank.groupBy("dst").agg(sum(col("share")).as("m"))
      val next = based
        .join(inbound, based("node") === inbound("dst"), "left")
        .select(based("node"),
          (col("__base") + expr("(17 * coalesce(m, 0)) div 20"))
            .as("rank_scaled"))
      ranks = if (i % 2 == 0 || i == iterations) next.localCheckpoint()
        else next
    }
    ranks.withColumn("rank",
      round(col("rank_scaled").cast("double") / scale.toDouble, 6))
  }

  /** Canonical (edges, out-degrees, vertices), each persisted — built
    * once, consumed by every rank iteration. */
  private def edgeTables(edges: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    (e, outdeg, nodes)
  }

  /** The shared synchronous rank recurrence over vertex rows carrying
    * per-node (__base, __r0) fixed-point columns. */
  private def rankLoop(e: DataFrame, outdeg: DataFrame, based: DataFrame,
      iterations: Int, scale: Long): DataFrame = {
    // The vertex/base table is re-joined every round — materialize it
    // once instead of replaying its derivation (seed join, distinct).
    val b = based.localCheckpoint()
    var ranks = b.select(col("node"), col("__r0").as("rank_scaled"))
    for (i <- 1 to iterations) {
      val shares = ranks.withColumnRenamed("node", "src")
        .join(outdeg, "src")
        .select(col("src"), expr("rank_scaled div deg").as("share"))
      val inbound = e.join(shares, "src")
        .groupBy("dst").agg(sum(col("share")).as("m"))
      val next = b
        .join(inbound, b("node") === inbound("dst"), "left")
        .select(b("node"),
          (col("__base") + expr("(17 * coalesce(m, 0)) div 20"))
            .as("rank_scaled"))
      // Rank lineage grows LINEARLY (each round consumes the previous
      // ranks exactly once), so a checkpoint every other round bounds
      // plan depth at 2 rounds while halving the eager materialization
      // stalls — the per-iteration driver sync is the dominant cost of
      // the loop on small graphs.
      ranks = if (i % 2 == 0 || i == iterations) next.localCheckpoint()
        else next
    }
    ranks.withColumn("rank",
      round(col("rank_scaled").cast("double") / scale.toDouble, 6))
  }

  /** Canonical undirected orientation: one row per edge with src < dst. */
  def undirect(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

  /**
   * Triangle enumeration on the canonical orientation: (a, b, c) with
   * a < b < c and all three edges present. Classical two-join
   * wedge-close: enumerate wedges a-b-c through the middle vertex, then
   * semi-check the closing edge (a, c).
   *
   * Scale shape: orienting every edge low-id -> high-id means each
   * triangle is generated exactly once and each wedge expansion is
   * bounded by the oriented out-degree (at web scale you'd orient by
   * degree instead of id — same plan shape, smaller wedge fan-out; id
   * orientation keeps the oracle trivially replayable). Both joins are
   * key-partitioned equi-joins; nothing is broadcast except what AQE
   * chooses to.
   */
  def triangles(edges: DataFrame): DataFrame = {
    val u = undirect(edges).persist(StorageLevel.MEMORY_AND_DISK)
    u.as("e1")
      .join(u.as("e2"), col("e1.b") === col("e2.a"))
      .join(u.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
  }

  /**
   * R-round k-core peel: repeatedly drop nodes whose undirected degree
   * is below `k` (with their incident edges) for exactly `rounds`
   * rounds, then report surviving nodes with their final degrees. With
   * enough rounds this converges to the k-core — the dense backbone
   * that separates organically-linked neighborhoods from fringe/spam
   * tendrils; the FIXED round count is the oracle-replayable contract
   * (each round is deterministic, so R rounds are too).
   *
   * Scale shape: each round is one vertex-sized degree aggregate and
   * two semi-joins of the (shrinking) edge list against the keep set,
   * localCheckpointed so the plan never deepens. Rounds needed in
   * practice ~ peel depth, not graph size.
   */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "kCorePeel: k >= 1 and rounds >= 1")
    var u = undirect(edges).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = u.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("node")
      u = u
        .join(keep.withColumnRenamed("node", "a"), "a")
        .join(keep.withColumnRenamed("node", "b"), "b")
        .select("a", "b")
        .localCheckpoint()
    }
    u.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** Per-node triangle participation counts (nodes in >= 1 triangle). */
  def nodeTriangleCounts(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))

  /**
   * Undirected degree histogram: for each degree value, how many nodes
   * have it. Vertex-sized aggregate over the edge list — the diagnostic
   * read before picking broadcast/salt/AQE strategy for any graph join.
   */
  def degreeHistogram(edges: DataFrame): DataFrame =
    undirect(edges)
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .groupBy("deg").agg(count(lit(1)).as("n_nodes"))

  /**
   * Min-hop BFS by DISTINCT-frontier iteration: each round expands only
   * the nodes first reached last round, dedups, and anti-joins out
   * everything already visited — per-round cost is O(frontier-adjacent
   * edges), bounded by graph size, and the result carries each node
   * ONCE with its true minimum hop.
   *
   * This is the operator twin of the recursive-CTE gate
   * (`graph_bfs_hops`), which has BAG semantics: the CTE re-emits a
   * node once per distinct path, so its intermediate cardinality grows
   * like degree^hops — correct after the final MIN/GROUP BY, ruinous at
   * scale. The frontier iteration computes the same answer with
   * path-multiplicity never materialized (the diamond-graph case in
   * GraphSpec: 2^k paths, k+1 rows). Frontiers are localCheckpointed so
   * the plan never deepens; the per-round isEmpty check is a
   * frontier-sized scan that also stops early on exhaustion.
   *
   * `seeds`: one `node` column, hop 0. Directed expansion src -> dst.
   */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"bfsHops: maxHops must be >= 0, got $maxHops")
    // Materialize the edge list once, HASH-PARTITIONED BY src, via
    // persist (NOT localCheckpoint: a checkpoint erases the plan's
    // outputPartitioning, so every round's join would re-shuffle the
    // whole edge list — persist keeps HashPartitioning(src) visible to
    // the planner and each round shuffles only the frontier). A derived
    // edge plan (e.g. the affinity self-join) also runs once, not
    // per round: derive once, walk many.
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize eagerly so round 1 doesn't pay the derivation
    var visited = seeds.select(col("node"), lit(0L).as("hop"))
      .distinct().localCheckpoint(true)
    var frontier = visited.select("node")
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      val next = e.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit((h + 1).toLong))
        .localCheckpoint(true)
      // visited is a union of <= maxHops checkpointed blocks — lineage
      // stays round-bounded without re-checkpointing the whole set.
      visited = visited.unionByName(next)
      frontier = next.select("node")
      h += 1
    }
    // Every round's block is an EAGER localCheckpoint, so the returned
    // union no longer references e's lineage — release the cached edge
    // list instead of pinning it for the session.
    e.unpersist(blocking = false)
    visited
  }
}
