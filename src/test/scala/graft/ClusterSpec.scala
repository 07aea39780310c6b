package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class ClusterSpec extends GraftSuite {
  import spark.implicits._

  test("resolveClusters: chain, star, and pair all converge to min id") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain
      (10L, 11L), (10L, 12L), // star
      (20L, 21L)) // simple pair
      .toDF("id_a", "id_b")
    val got = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("resolveClusters handles a long chain within maxIter via doubling-free propagation") {
    // Chain of length 8: worst-case diameter; still converges in <= 10.
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L))
  }

  test("resolveClusters fails loudly when maxIter cannot cover the diameter") {
    // Chain of length 15 (diameter 14): min-label propagation moves one
    // hop per round, so maxIter=3 CANNOT converge — the operator must
    // throw, not silently return mixed labels (a leak-proof-split user
    // would otherwise get train/val straddling clusters).
    val pairs = (1L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.resolveClusters(pairs, maxIter = 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("keepRepresentatives drops exactly the non-min member of each component") {
    val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b")
    // Driver-side union-find as ground truth (the planted pairs include a
    // triangle, so they are NOT all disjoint).
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = es.flatMap(e => Seq(e._1, e._2)).distinct
    val losers = members.filter(m => find(m) != m).toSet
    val kept = Dedup.keepRepresentatives(docs, "doc_id", pairs)
    assert(kept.count() == 500 - losers.size)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(losers.forall(l => !keptIds.contains(l)))
    assert(members.filterNot(losers).forall(keptIds.contains))
  }

  test("keepBestRepresentatives keeps the argmax-score member, ties to lower id") {
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), // one cluster: 2 and 3 tie on score
      (10L, 0.5), (11L, 0.8), // pair: 11 wins on score despite higher id
      (42L, 0.1)) // singleton, never enters the pair graph
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestRepresentatives(docs, "doc_id", pairs, col("q"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 11L, 42L), s"got $kept")
    // contrast: keep-first would have kept 1 and 10
    val first = Dedup.keepRepresentatives(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first == Set(1L, 10L, 42L))
  }
}
