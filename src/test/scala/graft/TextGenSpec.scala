package graft

import org.apache.spark.sql.functions._

import graft.operators.TextGen

/** TextGen Markov generator: exact transition training on a known tiny
  * corpus, vocabulary/fanout cuts, dead ends, partition-invariance. */
class TextGenSpec extends GraftSuite {

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("trains exact bigram transitions and start distribution") {
    val m = TextGen.trainBigrams(corpus("a b a b c", "a c"), "text")
    val id = m.tokens.zipWithIndex.toMap
    // starts: both docs start with 'a'
    assert(m.startIds.toSeq == Seq(id("a")) && m.startCum.toSeq == Seq(2L))
    // a -> b (x2), a -> c (x1); b -> a, b -> c; c -> (end)
    val aNext = m.nextIds(id("a")).map(m.tokens).toSeq
      .zip(m.nextCum(id("a")).toSeq)
    assert(aNext.toMap == Map("b" -> 2L, "c" -> 3L), s"a transitions: $aNext")
    assert(m.nextIds(id("c")).isEmpty, "'c' only ends docs — no successors")
  }

  test("maxFanout keeps each token's most frequent successors") {
    val m = TextGen.trainBigrams(
      corpus("x a x a x a x b x b x c"), "text", maxFanout = 2)
    val id = m.tokens.zipWithIndex.toMap
    // x -> {a:3, b:2, c:1}; fanout 2 keeps a and b only.
    assert(m.nextIds(id("x")).map(m.tokens).sorted.toSeq == Seq("a", "b"))
  }

  test("maxVocab keeps the most frequent tokens only") {
    val m = TextGen.trainBigrams(
      corpus("hi hi hi lo hi hi rare"), "text", maxVocab = 2)
    assert(m.tokens.toSet == Set("hi", "lo"))
  }

  test("generation is deterministic and partition-invariant") {
    val m = TextGen.trainBigrams(corpus("a b c a b", "b c a"), "text")
    val g1 = TextGen.generate(spark, m, 200, seed = 5L, len = 12,
      numPartitions = 1).collect().sortBy(_.getLong(0))
    val g4 = TextGen.generate(spark, m, 200, seed = 5L, len = 12,
      numPartitions = 4).collect().sortBy(_.getLong(0))
    assert(g1.map(_.getString(1)).toSeq == g4.map(_.getString(1)).toSeq,
      "per-row (seed, id) streams must not depend on partitioning")
    val g2 = TextGen.generate(spark, m, 200, seed = 6L, len = 12)
      .collect().sortBy(_.getLong(0))
    assert(g1.map(_.getString(1)).toSeq != g2.map(_.getString(1)).toSeq)
  }

  test("walks stop at dead ends; empty corpus is rejected") {
    val m = TextGen.trainBigrams(corpus("s t end"), "text")
    val texts = TextGen.generate(spark, m, 50, seed = 1L, len = 40)
      .select("text").collect().map(_.getString(0))
    // 'end' has no successors: every walk is exactly "s t end".
    assert(texts.forall(_ == "s t end"))
    intercept[IllegalArgumentException] {
      TextGen.trainBigrams(corpus(""), "text")
    }
  }
}
