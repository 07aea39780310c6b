package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends GraftSuite {
  private lazy val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("split fractions are near-nominal and cover every row") {
    val counts = Sampling.hashSplit(docs, "doc_id", fracs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500)
    assert(math.abs(counts("train") - 400) < 60)
    assert(counts.keySet == Set("train", "val", "test"))
  }

  test("assignments are stable when new data is added (the whole point)") {
    val first = Sampling.hashSplit(docs.where("doc_id < 250"), "doc_id", fracs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val later = Sampling.hashSplit(docs, "doc_id", fracs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    first.foreach { case (id, s) =>
      assert(later(id) == s, s"doc $id moved from $s to ${later(id)}")
    }
  }

  test("assignments are invariant to partitioning") {
    val a = Sampling.hashSplit(docs.repartition(17), "doc_id", fracs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs.coalesce(1), "doc_id", fracs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("stratified sample respects per-stratum fractions incl. 0 and 1") {
    val sampled = Sampling.hashStratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.1, "fr" -> 1.0, "zh" -> 0.0))
    val got = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("zh"), "zero-fraction stratum must vanish")
    assert(got("fr") == totals("fr"), "fraction 1.0 keeps everything")
    assert(math.abs(got("en").toDouble / totals("en") - 0.5) < 0.15)
    assert(math.abs(got("es").toDouble / totals("es") - 0.25) < 0.15)
  }

  test("temperature sample flattens the domain mix and hits the target size") {
    import org.apache.spark.sql.functions._
    // lang is the genuinely skewed domain (en dominates ~2-5x the rest).
    val kept = Sampling.temperatureSample(docs, "doc_id", "lang", 0.5, 0.5)
    val total = docs.count().toDouble
    val n = kept.count().toDouble
    assert(math.abs(n / total - 0.5) < 0.1, s"kept $n of $total")
    // alpha<1 upweights small domains: the kept fraction of the smallest
    // lang must exceed the kept fraction of the largest.
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptSizes = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallest = sizes.minBy(_._2)._1
    val largest = sizes.maxBy(_._2)._1
    val fSmall = keptSizes.getOrElse(smallest, 0L).toDouble / sizes(smallest)
    val fLarge = keptSizes.getOrElse(largest, 0L).toDouble / sizes(largest)
    assert(fSmall > fLarge,
      s"expected flattening: small=$fSmall large=$fLarge")
    // deterministic under repartitioning
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(docs.repartition(13), "doc_id",
      "lang", 0.5, 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("weightedK: exactly k rows, repartition-stable, weight-monotone") {
    val weighted = docs.withColumn("w",
      when(col("doc_id") < 50, 10L).otherwise(1L))
    val out = Sampling.weightedK(weighted, "doc_id", col("w"), 100)
    val picked = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(picked.size == 100)
    // identical picks under a different partitioning (pure hash rule)
    val again = Sampling.weightedK(weighted.repartition(17), "doc_id",
      col("w"), 100).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == picked)
    // A-Res proportionality: the 50 weight-10 docs carry 500 of the 950
    // total weight, so ~53 of the 100 picks should be theirs — far above
    // their 10% row share. Bound loosely (binomial sd ~5).
    val heavy = picked.count(_ < 50)
    assert(heavy > 30 && heavy < 75, s"heavy picks=$heavy, expected ~53")
    // weight 0 rows never selected
    val withZero = docs.withColumn("w",
      when(col("doc_id") < 250, 0L).otherwise(1L))
    val z = Sampling.weightedK(withZero, "doc_id", col("w"), 100)
      .select("doc_id").collect().map(_.getLong(0))
    assert(z.forall(_ >= 250) && z.length == 100)
  }

  test("allocateMixture: largest-remainder seats sum exactly, ties by name") {
    val t = Sampling.allocateMixture(
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 100L)
    assert(t.values.sum == 100L)
    // 33.33 each; two leftover seats -> 'a' and 'b' by tie order
    assert(t == Map("a" -> 34L, "b" -> 33L, "c" -> 33L) ||
      t("a") + t("b") + t("c") == 100L && t("a") >= t("c"))
    val exact = Sampling.allocateMixture(Map("x" -> 0.5, "y" -> 0.5), 10L)
    assert(exact == Map("x" -> 5L, "y" -> 5L))
  }

  test("exactMixture hits the quotas exactly and is repartition-stable") {
    val weights = Map("en" -> 0.5, "es" -> 0.2, "de" -> 0.2, "fr" -> 0.1)
    val targets = Sampling.allocateMixture(weights, 100L)
    val out = Sampling.exactMixture(docs, "doc_id", "lang", weights, 100L)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { case (l, n) =>
      assert(counts.getOrElse(l, 0L) == math.min(n, avail.getOrElse(l, 0L)),
        s"$l: got ${counts.get(l)}, quota $n, avail ${avail.get(l)}")
    }
    // zero-weight/unlisted domains never leak in
    assert(!counts.contains("zh"))
    // identical picks under a different partitioning
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.exactMixture(docs.repartition(17), "doc_id", "lang",
      weights, 100L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("leakproofSplit: clusters never straddle splits; singletons = hashSplit") {
    import spark.implicits._
    // Chain 1-2-3, pair 50-60, and a cluster bridging what a per-doc
    // split would separate; everything else is a singleton.
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 60L)).toDF("id_a", "id_b")
    val out = Sampling.leakproofSplit(docs, "doc_id", pairs,
      Seq("train" -> 0.9, "val" -> 0.1))
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(out.length == 500)
    // Representatives are component minima; members share the rep's split.
    Seq(1L, 2L, 3L).foreach { id =>
      assert(byId(id)._2 == 1L && byId(id)._3 == byId(1L)._3)
    }
    Seq(50L, 60L).foreach { id =>
      assert(byId(id)._2 == 50L && byId(id)._3 == byId(50L)._3)
    }
    // Singletons: own id as cluster, same assignment as plain hashSplit.
    val plain = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(t => !Set(1L, 2L, 3L, 50L, 60L).contains(t._1))
      .foreach { case (id, rep, split) =>
        assert(rep == id && split == plain(id), s"singleton $id")
      }
  }

  test("tokenBudgetMixture: budgets met minimally by a hash-rank prefix; deterministic") {
    import graft.operators.TextAnalysis
    val weights = Map("en" -> 0.5, "es" -> 0.2, "de" -> 0.2, "fr" -> 0.1)
    val total = 5000L
    val budgets = Sampling.allocateMixture(weights, total)
    val picked = Sampling.tokenBudgetMixture(docs, "doc_id", "lang",
        TextAnalysis.tokenCount(col("text")), weights, total)
      .select("lang", "doc_id", "n_tokens")
    val byLang = picked.groupBy("lang")
      .agg(sum("n_tokens").as("mass"), min("n_tokens").as("mn"),
        max("n_tokens").as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val supply = docs.where(col("lang").isin(budgets.keys.toSeq: _*))
      .groupBy("lang").agg(sum(TextAnalysis.tokenCount(col("text"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    budgets.foreach { case (l, b) =>
      val mass = byLang.getOrElse(l, 0L)
      if (supply.getOrElse(l, 0L) >= b)
        assert(mass >= b, s"$l under budget: $mass < $b")
      else assert(mass == supply(l), s"$l must take all scarce supply")
    }
    // Minimality: removing each domain's LAST pick (highest hash rank =
    // the boundary doc) drops the mass strictly below budget.
    val rows = picked.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lastTok = Sampling.tokenBudgetMixture(docs, "doc_id", "lang",
        TextAnalysis.tokenCount(col("text")), weights, total)
      .withColumn("__h", graft.operators.TextHash.hash60(
        concat(lit("mixtok:"), col("lang"), lit(":"),
          col("doc_id").cast("string"))))
      .groupBy("lang").agg(max_by(col("n_tokens"), col("__h")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    budgets.foreach { case (l, b) =>
      if (supply.getOrElse(l, 0L) >= b)
        assert(byLang(l) - lastTok(l) < b,
          s"$l not minimal: ${byLang(l)} - ${lastTok(l)} >= $b")
    }
    // Deterministic under repartitioning.
    val again = Sampling.tokenBudgetMixture(docs.repartition(13), "doc_id",
        "lang", TextAnalysis.tokenCount(col("text")), weights, total)
      .select("lang", "doc_id", "n_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.toSet)
  }
}
