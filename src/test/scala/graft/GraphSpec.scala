package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/**
 * Graph analytics (SURVEY §2.5): exact-integer PageRank semantics on
 * hand-computable fixtures, triangle/degree correctness on a known
 * graph, and the affinity-edge contract (top-k bound, determinism) on
 * real testdata.
 */
class GraphSpec extends GraftSuite {
  import spark.implicits._

  private val scale = Graph.RankScale
  private val base = Graph.teleportBase(scale)

  private def intDiv(a: Long, b: Long): Long = a / b
  private def damp(m: Long): Long = base + intDiv(17L * m, 20L)

  test("pagerank on a 3-cycle matches the hand-unrolled integer recurrence") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // Every node has out-degree 1 and exactly one in-edge, so each round
    // applies r -> base + (17 * r) div 20 uniformly.
    val r1 = damp(scale)
    val r2 = damp(r1)
    val got = Graph.pagerank(edges, 2, scale)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.toSet == Set(r2),
      s"3-cycle ranks must all equal $r2, got $got")
  }

  test("pagerank: source-only node keeps teleport mass; dangling leaks") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pagerank(edges, 2, scale)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    // Node 1 has no in-edges: rank is the teleport base every round.
    assert(got(1L) == base)
    // Node 2's round-2 rank derives from node 1's round-1 rank (= base);
    // node 2's own mass leaked (it has no out-edges) — by contract.
    assert(got(2L) == damp(base))
  }

  test("personalized pagerank: mass flows outward from the seed only") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.personalizedPagerank(edges, seeds, 2, scale)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    // Hand-unrolled: r1 = (B, 17S div 20 damped, 0); r2 below.
    assert(got(1L) == base)
    assert(got(2L) == intDiv(17L * base, 20L))
    assert(got(3L) == intDiv(17L * intDiv(17L * scale, 20L), 20L))
  }

  test("kCorePeel: K4-minus-edge collapses at k=3, stable at k=2") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    // k=3: round 1 drops nodes 1 and 4 (degree 2); the surviving (2,3)
    // edge leaves both at degree 1, so round 2 empties the graph.
    assert(Graph.kCorePeel(edges, 3, 2).isEmpty)
    // k=2: every node has degree >= 2 — peeling is a fixed point.
    val stable = Graph.kCorePeel(edges, 2, 3).as[(Long, Long)].collect().toMap
    assert(stable == Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 2L))
  }

  test("weighted pagerank: shares proportional to edge weight, exact") {
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "cnt")
    val got = Graph.pagerankWeighted(edges, 1, scale)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    // totw(1)=4: node 2 gets 3/4 of node 1's mass, node 3 gets 1/4.
    assert(got(1L) == base)
    assert(got(2L) == damp(intDiv(scale * 3, 4)))
    assert(got(3L) == damp(intDiv(scale, 4)))
    assert(got(2L) > got(3L), "heavier edge must carry more rank")
  }

  test("triangles and degrees on K4-minus-an-edge") {
    // Nodes 1..4, all edges except (1,4): triangles (1,2,3) and (2,3,4).
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    // Feed edges in MIXED orientation to exercise canonicalization.
    val edges = (und.take(2).map(_.swap) ++ und.drop(2)).toDF("src", "dst")
    val tri = Graph.nodeTriangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    val deg = Graph.degreeHistogram(edges).as[(Long, Long)].collect().toMap
    assert(deg == Map(2L -> 2L, 3L -> 2L))
  }

  test("topKAffinityEdges: per-src bound, no self-loops, deterministic") {
    val li = Tables.load(spark, SparkTestBase.sf0001, "lineitem")
    val e1 = Graph.topKAffinityEdges(li, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e2 = Graph.topKAffinityEdges(li, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e1.sorted.sameElements(e2.sorted), "edge list must be deterministic")
    assert(e1.forall { case (s, d, _) => s != d }, "no self-loops")
    val perSrc = e1.groupBy(_._1).map(_._2.length)
    assert(perSrc.forall(_ <= 4), "top-k bound violated")
  }

  test("streaming edge fold == batch edges; cross-batch orders pair; state vacuumed") {
    val li = Tables.load(spark, SparkTestBase.sf0001, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_linenumber")
    val root = java.nio.file.Files.createTempDirectory("graft_gs").toString
    val logDir = s"$root/batches"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(logDir))
    Seq(li.where(col("l_linenumber") % 2 === 1),
        li.where(col("l_linenumber") % 2 === 0))
      .zipWithIndex.foreach { case (slice, i) =>
        val stage = s"$root/stage$i"
        slice.select("l_orderkey", "l_suppkey")
          .coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath
        java.nio.file.Files.copy(part,
          java.nio.file.Paths.get(logDir, f"b$i%03d.parquet"))
      }
    // Sanity: the split genuinely strands order-mates across batches.
    val straddling = li.groupBy("l_orderkey")
      .agg(countDistinct(when(col("l_linenumber") % 2 === 1, 1)
        .otherwise(0)).as("sides"))
      .where(col("sides") === 2).count()
    assert(straddling > 0, "fixture must contain cross-batch orders")
    val pc = graft.streaming.GraphStream.incrementalPairCounts(
      spark, logDir, li.select("l_orderkey", "l_suppkey").schema,
      s"$root/state", "l_orderkey", "l_suppkey")
    val streamed = graft.streaming.GraphStream.topKEdges(pc, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Graph.topKAffinityEdges(li, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, "folded edges must equal the batch computation")
    // Delta layout: each batch wrote only its own delta per chain.
    val kept = new java.io.File(s"$root/state").listFiles().map(_.getName)
    assert(kept.count(_.startsWith("pc2_base")) == 1 &&
      kept.count(_.startsWith("pc2_d")) == 2 &&
      kept.count(_.startsWith("os_base")) == 1 &&
      kept.count(_.startsWith("os_d")) == 2, kept.mkString(","))
  }

  test("incrementalPagerank refreshEvery: fold-only batches carry ranks; " +
      "a refresh == warm rounds from the LAST refreshed state") {
    val li = Tables.load(spark, SparkTestBase.sf0001, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_linenumber")
    val root = java.nio.file.Files.createTempDirectory("graft_gre").toString
    val logDir = s"$root/batches"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(logDir))
    val quarters = Seq(1, 2, 3, 0).map(q => li.where(col("l_linenumber") % 4 === q))
    quarters.zipWithIndex.foreach { case (slice, i) =>
      val stage = s"$root/stage$i"
      slice.select("l_orderkey", "l_suppkey")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(logDir, f"b$i%03d.parquet"))
    }
    val got = graft.streaming.GraphStream.incrementalPagerank(
      spark, logDir, li.select("l_orderkey", "l_suppkey").schema,
      s"$root/state", "l_orderkey", "l_suppkey",
      k = 8, coldIters = 4, warmRounds = 2, refreshEvery = 2)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    // Refresh points are batches 1 (v2: cold on the half graph) and 3
    // (v4: warm from v2 on the full graph); batches 0 and 2 are
    // fold-only. Replay the schedule independently from batch cuts.
    val halfEdges = Graph.topKAffinityEdges(
      li.where(col("l_linenumber") % 4 === 1 || col("l_linenumber") % 4 === 2), 8)
    val cold = Graph.pagerank(halfEdges, 4, scale)
    val fullEdges = Graph.topKAffinityEdges(li, 8)
    val expect = Graph.pagerankWarm(fullEdges,
        cold.select("node", "rank_scaled"), 2, scale)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(got == expect,
      "refresh must equal warm rounds from the last refreshed state")
    // The fold-only batch versions the chain by carrying ranks forward
    // unchanged (replay-idempotent without paying rank rounds).
    val v2 = spark.read.parquet(s"$root/state/pr_v2")
      .as[(Long, Long)].collect().toSet
    val v3 = spark.read.parquet(s"$root/state/pr_v3")
      .as[(Long, Long)].collect().toSet
    assert(v3 == v2, "fold-only batch must carry the previous ranks forward")
  }

  test("pagerank on the affinity graph: mass bounded, floor respected") {
    val edges = Graph.topKAffinityEdges(
      Tables.load(spark, SparkTestBase.sf0001, "lineitem"), 8)
    val ranks = Graph.pagerank(edges, 3, scale)
    val n = ranks.count()
    val agg = ranks.agg(sum("rank_scaled"), min("rank_scaled")).head()
    assert(agg.getLong(1) >= base, "every node keeps at least teleport mass")
    // Flooring and dangling leakage only ever REMOVE mass.
    assert(agg.getLong(0) <= n * scale, "total mass must not exceed N * scale")
  }

  test("pagerankWarm splices the recurrence: warm(4-round state, 2) == cold 6 rounds") {
    // The warm restart must CONTINUE the synchronous recurrence, so
    // seeding from the round-4 state and running 2 more rounds is
    // bit-for-bit rounds 5..6 — the invariant the streaming rank fold's
    // exactness rides on.
    val edges = Graph.topKAffinityEdges(
      Tables.load(spark, SparkTestBase.sf0001, "lineitem"), 8)
    val cold6 = Graph.pagerank(edges, 6, scale)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    val warm = Graph.pagerankWarm(edges,
        Graph.pagerank(edges, 4, scale).select("node", "rank_scaled"), 2,
        scale)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(warm == cold6)
    // A node missing from the seed enters at `scale` — drop one node's
    // seed row and only its sphere of influence may move.
    val partialSeed = Graph.pagerank(edges, 4, scale)
      .select("node", "rank_scaled").where(col("node") =!= 1L)
    val fromPartial = Graph.pagerankWarm(edges, partialSeed, 2, scale)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(fromPartial.keySet == cold6.keySet)
  }

  test("bfsHops: diamond chain has no path-multiplicity blowup; min hops exact") {
    // k stacked diamonds: a(i) -> {b(i), c(i)} -> a(i+1). 2^k distinct
    // paths from a(0) to a(k); the frontier iteration must visit each
    // node once at its true min hop (the recursive-CTE form re-emits
    // a(k) 2^k times before the final MIN).
    val k = 8
    val edges = (0 until k).flatMap { i =>
      val (a, b, c, a2) = (3L * i, 3L * i + 1, 3L * i + 2, 3L * (i + 1))
      Seq((a, b), (a, c), (b, a2), (c, a2))
    }.toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, 2 * k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 3 * k + 1, "each node exactly once")
    for (i <- 0 to k) assert(got(3L * i) == 2L * i, s"a($i)")
    for (i <- 0 until k) {
      assert(got(3L * i + 1) == 2L * i + 1, s"b($i)")
      assert(got(3L * i + 2) == 2L * i + 1, s"c($i)")
    }
    // Early exhaustion: a generous maxHops stops when the frontier
    // empties, and capping maxHops truncates the wave correctly.
    val capped = Graph.bfsHops(edges, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.size == 6 && capped.values.max == 3L)
  }
}
