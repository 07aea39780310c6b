package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Similarity, VectorOps}

/**
 * Semantic decontamination (Decontaminate.semanticOverlap): the LSH
 * bucket-join path recovers exactly the brute-force cosine >= threshold
 * contamination set on planted paraphrase-leak vectors, and the eval side
 * is broadcast.
 */
class SemanticDecontamSpec extends GraftSuite {

  private val Threshold = 0.98

  private lazy val e = Tables.load(spark, SparkTestBase.sf0001, "embeddings")
  private lazy val corpus =
    e.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val evalSet = e.where(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("eval_id"),
      transform(col("embedding"),
        x => (x.cast("double") * lit(0.9) + lit(0.01)).cast("float"))
        .as("evec"))

  private def bruteForcePairs: Set[(Long, Long)] = corpus
    .crossJoin(broadcast(evalSet))
    .where(VectorOps.dot(col("vec"), col("evec")) >=
      VectorOps.norm(col("vec")) * VectorOps.norm(col("evec")) * Threshold)
    .select("id", "eval_id").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def lshFlagged(out: DataFrame): Map[Long, Long] =
    out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("LSH path recovers the full brute-force contamination set") {
    val brute = bruteForcePairs
    assert(brute.nonEmpty, "fixture must plant at least one leak")
    // every planted leak pairs an eval vector with its source id
    assert(brute.forall { case (id, eid) => id == eid })
    val out = Decontaminate.semanticOverlap(corpus, evalSet,
      "id", "vec", "eval_id", "evec", Threshold)
    val flagged = lshFlagged(out)
    assert(flagged.keySet == brute.map(_._1),
      s"flagged ${flagged.keySet} != brute ${brute.map(_._1)}")
    assert(flagged.values.forall(_ == 1L), "one eval hit per source")
  }

  test("eval side joins as a broadcast (no corpus-vs-corpus shuffle)") {
    val out = Decontaminate.semanticOverlap(corpus, evalSet,
      "id", "vec", "eval_id", "evec", Threshold)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("a threshold above the planted cosine flags nothing") {
    val out = Decontaminate.semanticOverlap(corpus, evalSet,
      "id", "vec", "eval_id", "evec", 0.99999)
    assert(out.count() == 0)
  }

  test("auto dial: fixture resolution pinned, and Auto == fixed at that config") {
    // The text_decontaminate_semantic oracle embeds the auto config the
    // sf0.01 fixture resolves to — 3 occupancy-dialed planes, and the
    // 0.98-threshold recall formula needs only 2 tables. A fixture
    // resize must break HERE, not the oracle silently.
    assert(Similarity.lshAutoConfig(500L, Threshold) == (3, 2))
    val auto = lshFlagged(Decontaminate.semanticOverlapAuto(corpus, evalSet,
      "id", "vec", "eval_id", "evec", Threshold))
    val n = corpus.count()
    val (p, t) = Similarity.lshAutoConfig(n, Threshold)
    val fixed = lshFlagged(Decontaminate.semanticOverlap(corpus, evalSet,
      "id", "vec", "eval_id", "evec", Threshold, numTables = t,
      numPlanes = p))
    assert(auto == fixed)
    // And the planted leaks still come back in full at the auto config.
    assert(auto.keySet == bruteForcePairs.map(_._1))
  }
}
