package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextHash.hash60

/**
 * In-engine-TRAINED document quality classifier (SURVEY.md §2.5 layer C):
 * logistic regression over hashed bag-of-words features — the
 * fasttext-class linear model that is the standard corpus-quality gate in
 * large-scale training-data pipelines, where heuristic ratios
 * ([[TextAnalysis.qualityScore]]) are only the first filter.
 *
 * Determinism contract (same discipline as [[Similarity.trainKMeans]], so
 * the DuckDB oracle replays training bit-for-bit):
 *  - features are presence bits over `hash60(word) % numBuckets` — exact
 *    integers, engine-portable md5 arithmetic;
 *  - weights and bias live on a fixed-point grid (scaled by 2^20 =
 *    [[Similarity.KMeansScale]]) as LONGs, so per-document margins are
 *    EXACT integer sums — order-independent across partitions and engines;
 *  - the per-row sigmoid is a RATIONAL approximation evaluated entirely
 *    in integer arithmetic — σ(x) ≈ (1/2)(1 + x/(2+|x|)), same slope 1/4
 *    at 0 and same limits as the logistic — so no libm `exp` (whose ULP
 *    differences between the JVM and DuckDB could flip a floor at a grid
 *    boundary) ever enters training: engine agreement is by construction,
 *    not by luck (see QualityModelSpec's portability test);
 *  - each row's gradient contribution is therefore already ON the integer
 *    grid before the cross-row sum, so partial-aggregation order can
 *    never change the trained model;
 *  - a FIXED number of full-batch gradient rounds (no early stop — the
 *    replayed oracle unrolls the same count).
 *
 * Scale shape (the 100 TB story): training is `iters` passes, each ONE
 * narrow scan (explode words → bucket hash → presence) into ONE hash
 * aggregate keyed by bucket id — map-side partials reduce the gradient to
 * `numBuckets + 1` longs before the only exchange, and only those reach
 * the driver (the [[Similarity.trainKMeans]] collect discipline: bounded
 * plan constants, not data). The trained weights ride back into the
 * scoring scan as plan literals — scoring is a pure narrow projection +
 * one groupBy(doc), no join against any weight table.
 */
object QualityModel {

  import Similarity.KMeansScale

  /** Distinct (doc_id, bucket) presence features: every non-empty
    * space-token hashed into `numBuckets` buckets. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, "hashedFeatures: numBuckets > 0")
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col("doc_id"), (hash60(col("w")) % numBuckets).as("bucket"))
      .distinct()
  }

  /** Scaled-integer margin of every `labeled` row under (`weights`,
    * `bias`): exact LONG sum of the per-bucket weights present in the
    * doc, plus bias. Docs with no tokens keep the bare bias. Weights are
    * plan literals — no join. */
  private def margins(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, numBuckets: Int, weights: Array[Long],
      bias: Long): DataFrame = {
    val feats = hashedFeatures(labeled, idCol, textCol, numBuckets)
    val perDoc = feats.groupBy("doc_id")
      .agg(sum(element_at(typedLit(weights.toSeq),
        col("bucket").cast("int") + 1)).as("fs"))
    labeled
      .select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("label"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("fs"))
      .withColumn("ms", col("fs") + lit(bias))
  }

  /**
   * Full-batch logistic-regression training over `labeled`
   * (`labelCol` ∈ {0, 1}). Per round, with m the scaled margin and
   * S = 2^20, the predicted probability on the grid is the integer
   * rational sigmoid
   *   pScaled = (S·(2S + |m| + m)) div (2·(2S + |m|)),
   * each row contributes g = label·S − pScaled to the gradient of every
   * bucket it contains (and to the bias via a sentinel bucket), weights
   * step by floor(gradient · lr / n) on the integer grid. Every per-row
   * step is BIGINT arithmetic (div = truncating integer division; both
   * operands are non-negative, so Spark's `div` and DuckDB's `//` agree).
   * Overflow headroom: the numerator stays below 2^63 for |m| up to
   * ~4.4e12; margins are bounded by iters·(numBuckets+1)·S — orders of
   * magnitude inside it for any sane configuration.
   *
   * Returns (weightsScaled, biasScaled) — fixed-point longs.
   */
  def trainLogReg(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, numBuckets: Int, iters: Int,
      lr: Double = 1.0): (Array[Long], Long) = {
    require(numBuckets > 0 && iters >= 0 && lr > 0,
      "trainLogReg: numBuckets > 0, iters >= 0, lr > 0")
    val n = labeled.count()
    require(n > 0, "trainLogReg: empty training set")
    val S = KMeansScale.toLong
    val w = Array.fill(numBuckets)(0L)
    var bias = 0L
    for (_ <- 0 until iters) {
      // pScaled's numerator is always >= 0 (m < 0 makes |m| + m vanish)
      // and the denominator > 0, so truncating div == floor div in both
      // engines — no float touches the per-row gradient.
      val g = margins(labeled, idCol, textCol, labelCol, numBuckets, w, bias)
        .withColumn("__num",
          lit(S) * (lit(2L * S) + abs(col("ms")) + col("ms")))
        .withColumn("__den", lit(2L) * (lit(2L * S) + abs(col("ms"))))
        .withColumn("g",
          col("label").cast("long") * lit(S) - expr("__num div __den"))
        .select(col("doc_id"), col("g"))
      // Bias = sentinel bucket -1: one aggregate serves every parameter.
      val grads = hashedFeatures(labeled, idCol, textCol, numBuckets)
        .join(g, Seq("doc_id"))
        .select(col("bucket"), col("g"))
        .unionAll(g.select(lit(-1L).as("bucket"), col("g")))
        .groupBy("bucket").agg(sum(col("g")).as("gs"))
        .collect()
      grads.foreach { r =>
        val step = math.floor(r.getLong(1).toDouble * lr / n).toLong
        val b = r.getLong(0)
        if (b < 0) bias += step else w(b.toInt) += step
      }
    }
    (w, bias)
  }

  /** Score arbitrary docs under a trained model: exact scaled-integer
    * margin (`margin_scaled`, BIGINT — hash-matchable with no float in
    * the output) and the linear-threshold prediction. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int, weights: Array[Long], bias: Long): DataFrame =
    margins(docs.withColumn("__lbl", lit(0L)), idCol, textCol, "__lbl",
        numBuckets, weights, bias)
      .select(col("doc_id"), col("ms").as("margin_scaled"),
        (col("ms") > 0L).as("pred_good"))
}
