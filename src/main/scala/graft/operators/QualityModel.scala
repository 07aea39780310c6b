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
 *  - the only floating-point step is the per-row sigmoid, and each row's
 *    gradient contribution is floor-quantized back to the integer grid
 *    BEFORE the cross-row sum, so partial-aggregation order can never
 *    change the trained model;
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
   * (`labelCol` ∈ {0, 1}). Per round: p = sigmoid(margin / 2^20), each
   * row contributes g = floor((label − p)·2^20) to the gradient of every
   * bucket it contains (and to the bias via a sentinel bucket), weights
   * step by floor(gradient · lr / n) on the integer grid.
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
    val w = Array.fill(numBuckets)(0L)
    var bias = 0L
    for (_ <- 0 until iters) {
      val g = margins(labeled, idCol, textCol, labelCol, numBuckets, w, bias)
        .withColumn("g", floor((col("label") -
          lit(1.0) / (lit(1.0) + exp(lit(0.0) - col("ms") / lit(KMeansScale))))
          * lit(KMeansScale)).cast("long"))
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
