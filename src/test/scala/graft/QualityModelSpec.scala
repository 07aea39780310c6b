package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{QualityModel, TextAnalysis}

/**
 * In-engine-trained quality classifier (QualityModel): separates planted
 * low-quality (vowel-stripped) docs from originals on a held-out split,
 * beats the heuristic qualityScore baseline by AUC, and trains
 * deterministically on the fixed-point grid.
 */
class QualityModelSpec extends GraftSuite {

  private val D = 64

  private lazy val d = Tables.load(spark, SparkTestBase.sf001, "documents")

  private def stripped(df: DataFrame): DataFrame = df
    .withColumn("doc_id", col("doc_id") + 10000)
    .withColumn("text", regexp_replace(col("text"), "[aeiou]", ""))

  private lazy val good = d.where(col("doc_id") < 200)
  private lazy val train = good.withColumn("label", lit(1))
    .unionAll(stripped(good).withColumn("label", lit(0)))
  private lazy val holdBase =
    d.where(col("doc_id") >= 200 && col("doc_id") < 300)
  private lazy val hold = holdBase.unionAll(stripped(holdBase))

  private lazy val model =
    QualityModel.trainLogReg(train, "doc_id", "text", "label", D, iters = 3)

  /** Pairwise-comparison AUC of (score, isGood) observations. */
  private def auc(obs: Seq[(Double, Boolean)]): Double = {
    val pos = obs.filter(_._2).map(_._1)
    val neg = obs.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size.toDouble)
  }

  test("holdout accuracy >= 0.95 on unseen docs + their stripped twins") {
    val (w, b) = model
    val scored = QualityModel.score(hold, "doc_id", "text", D, w, b)
    val agree = scored
      .where(col("pred_good") === (col("doc_id") < 10000)).count()
    val total = scored.count()
    assert(total == 2 * holdBase.count(), "holdout scored completely")
    assert(agree.toDouble / total >= 0.95,
      s"holdout accuracy = ${agree.toDouble / total}")
  }

  test("trained AUC beats the heuristic qualityScore baseline") {
    val (w, b) = model
    val trained = QualityModel.score(hold, "doc_id", "text", D, w, b)
      .select(col("doc_id"), col("margin_scaled").cast("double").as("s"))
      .collect().map(r => (r.getDouble(1), r.getLong(0) < 10000)).toSeq
    val heuristic = hold
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("s"))
      .collect().map(r => (r.getDouble(1), r.getLong(0) < 10000)).toSeq
    val (aucT, aucH) = (auc(trained), auc(heuristic))
    assert(aucT >= 0.95, s"trained AUC = $aucT")
    assert(aucT >= aucH - 1e-9,
      s"trained AUC $aucT must not trail heuristic AUC $aucH")
  }

  test("training is deterministic: two runs produce identical weights") {
    val (w1, b1) =
      QualityModel.trainLogReg(train, "doc_id", "text", "label", D, 2)
    val (w2, b2) =
      QualityModel.trainLogReg(train, "doc_id", "text", "label", D, 2)
    assert(w1.toSeq == w2.toSeq && b1 == b2)
  }

  test("sigmoid is an integer rational — engine-portable by construction") {
    // Training's per-row probability is
    //   pScaled = (S·(2S+|m|+m)) div (2·(2S+|m|)),  S = 2^20
    // — pure BIGINT arithmetic with a non-negative numerator, so Spark's
    // `div` and DuckDB's `//` (both truncating) produce identical longs
    // with NO libm exp() on either side. Verify Spark's column evaluation
    // equals exact BigInt math across the grid, including negative
    // margins and magnitudes near the long-overflow headroom bound.
    val S = 1048576L
    // Long-overflow headroom: S·(2S + 2|m|) < 2^63 requires
    // |m| < 2^42 - 2^20 ≈ 4.39e12; training margins are bounded by
    // iters·(buckets+1)·S ≈ 2e8, four orders of magnitude inside it.
    val ms = Seq(-4000000000000L, -300L * S, -3000000L, -1L, 0L, 1L,
      3000000L, 300L * S, 4000000000000L)
    import spark.implicits._
    val got = ms.toDF("ms")
      .withColumn("__num", lit(S) * (lit(2L * S) + abs(col("ms")) + col("ms")))
      .withColumn("__den", lit(2L) * (lit(2L * S) + abs(col("ms"))))
      .withColumn("p", expr("__num div __den"))
      .orderBy("ms").select("p").collect().map(_.getLong(0)).toSeq
    val want = ms.sorted.map { m =>
      (BigInt(S) * (BigInt(2L * S) + BigInt(m).abs + BigInt(m)) /
        (BigInt(2) * (BigInt(2L * S) + BigInt(m).abs))).toLong
    }
    assert(got == want, s"Spark div disagrees with exact integer math")
    // Genuine sigmoid shape on the grid: monotone, pinned at S/2 for
    // m = 0, and p(m) + p(-m) ∈ {S-1, S} (floor-adjusted symmetry).
    assert(want.zip(want.tail).forall { case (a, b) => a <= b })
    assert(want(ms.size / 2) == S / 2)
    assert(want.zip(want.reverse).forall { case (a, b) =>
      a + b == S || a + b == S - 1 })
  }

  test("zero iterations leave the zero model (bias-only margins)") {
    val (w, b) =
      QualityModel.trainLogReg(train, "doc_id", "text", "label", D, 0)
    assert(w.forall(_ == 0L) && b == 0L)
    val scored = QualityModel.score(hold.limit(5), "doc_id", "text", D, w, b)
    assert(scored.select("margin_scaled").collect().forall(_.getLong(0) == 0L))
  }
}
