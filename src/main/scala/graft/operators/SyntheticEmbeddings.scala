package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Gen, TableGen}
import graft.functions.GraftRandom
import graft.functions.RandgenFunctions.randgen_array_unit_vector

/**
 * Synthetic clustered embedding corpora — the composition of the two
 * halves of this engine: the generator family (the reference's purpose,
 * `/root/reference/Cargo.toml:5` "A random data generator") produces the
 * input that the ANN/similarity operators consume, with CONTROLLED
 * cluster structure instead of whatever an inherited fixture happens to
 * contain. Planted centroids + per-row unit-direction noise mean recall
 * experiments have a known ground truth: rows of cluster c really do
 * concentrate around centroid c at a dialable tightness.
 *
 * Construction (all seeded, bit-reproducible):
 *  - `k` planted centroids: driver-drawn uniform unit vectors
 *    (Muller via [[GraftRandom.nextUnitVector]]) — k × dim doubles of
 *    driver state, broadcast as a literal;
 *  - mixture weights: one driver Dirichlet(alpha,...,alpha) draw
 *    ([[GraftRandom.nextDirichlet]]) — realistic UNEVEN cluster sizes,
 *    not 1/k each;
 *  - per row: cluster ~ weighted choice, direction = normalize(
 *    centroid(cluster) + noise · [[randgen_array_unit_vector]]) — one
 *    narrow codegen'd projection over `spark.range`: no shuffle, no
 *    driver data beyond the k×dim literal, linear in rows at any scale.
 *
 * Output: (id BIGINT, cluster BIGINT, embedding ARRAY<FLOAT>) — the
 * same shape as the embeddings fixture, so every Similarity operator
 * (brute force, SRP-LSH, IVF, PQ) runs on it unchanged.
 */
object SyntheticEmbeddings {

  /** `k` planted unit-vector centroids (driver-side, deterministic). */
  def centroids(k: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    require(k >= 2 && dim >= 2, "syntheticEmbeddings: k >= 2 and dim >= 2")
    val rng = new GraftRandom(seed, 0)
    Array.fill(k)(rng.nextUnitVector(dim).toDoubleArray())
  }

  /** One Dirichlet(alpha, ..., alpha) draw — the planted mixture
    * weights (uneven for small alpha, near-uniform for large). */
  def mixtureWeights(k: Int, alpha: Double, seed: Long): Array[Double] = {
    val rng = new GraftRandom(seed, 0)
    rng.nextDirichlet(new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.fill(k)(alpha))).toDoubleArray()
  }

  /**
   * The corpus: `rows` embeddings in `dim` dimensions around `k` planted
   * centroids with mixture weights ~ Dirichlet(`alpha`); `noise` scales
   * the unit-direction perturbation (0 = exact centroids, 1 = very
   * diffuse). Reproducible under `seed`.
   */
  def clustered(spark: SparkSession, rows: Long, k: Int, dim: Int,
      seed: Long, noise: Double, alpha: Double = 2.0): DataFrame = {
    require(noise >= 0.0, "syntheticEmbeddings: noise >= 0")
    val cents = centroids(k, dim, seed)
    val w = mixtureWeights(k, alpha, seed ^ 0x5D1E7AL)
    val base = TableGen.table(spark, rows, seed,
      "id" -> Gen.SeqId,
      "cluster" -> Gen.ChoiceWeighted((0 until k).map(i => i.toLong), w))
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    base
      .withColumn("__c", element_at(centLit, (col("cluster") + 1).cast("int")))
      .withColumn("__u",
        randgen_array_unit_vector(lit(dim), seed ^ 0xA11CE5L))
      .withColumn("__v",
        zip_with(col("__c"), col("__u"), (a, b) => a + lit(noise) * b))
      .withColumn("__nrm",
        sqrt(aggregate(col("__v"), lit(0.0), (acc, x) => acc + x * x)))
      .select(col("id"), col("cluster").cast("long").as("cluster"),
        transform(col("__v"), x => (x / col("__nrm")).cast("float"))
          .as("embedding"))
  }

  /** Cosine of each row's embedding against its own cluster's planted
    * centroid — the ground-truth alignment diagnostic. */
  def centroidAlignment(corpus: DataFrame, cents: Array[Array[Double]])
      : DataFrame = {
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    corpus
      .withColumn("__c", element_at(centLit, (col("cluster") + 1).cast("int")))
      .withColumn("align",
        aggregate(zip_with(col("embedding"), col("__c"),
            (a, b) => a.cast("double") * b), lit(0.0), (acc, x) => acc + x))
      .drop("__c")
  }
}
