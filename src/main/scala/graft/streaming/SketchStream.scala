package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Sketches

/**
 * Streaming sketch maintenance: mergeable sketches ARE the streaming
 * story — a count-min sketch over a key stream folds by plain counter
 * ADDITION, so the accumulated d x w grid after any batch sequence
 * equals the sketch built in one pass over everything ingested,
 * bit-for-bit (the gate's oracle builds it directly over all rows).
 * State is a fixed d*w-cell table regardless of stream volume: the
 * "how often has key k appeared, ever" query at any corpus size with
 * O(1) state and O(batch) per-batch cost.
 *
 * Versioning/vacuum contract shared with every other fold (batch b
 * reads cms_v{b}, writes cms_v{b+1} — exactly-once under replay).
 */
object SketchStream {

  /** Runs the key stream in `streamDir` (parquet, `schema`) to
    * completion, starting from `history`, merging each batch's CMS
    * cells into the accumulated grid. Returns the final sketch
    * (row, col, cnt). */
  def incrementalCms(spark: SparkSession, history: DataFrame,
      streamDir: String, schema: StructType, stateDir: String,
      keyCol: String, d: Int = 4, w: Int = 1024,
      retainVersions: Int = 3): DataFrame =
    EmbeddingIndexStream.mergedFold(spark, history, streamDir, schema,
      stateDir, "cms_v", retainVersions,
      batch => Sketches.cmsBuild(batch, keyCol, d, w),
      combine = (prev, cells) => prev.unionByName(cells)
        .groupBy("row", "col").agg(sum(col("cnt")).as("cnt")))

  /**
   * Streaming embedding-drift monitor: per-dimension moment state
   * (n, exact fixed-point sum, min, max) folds over vector batches by
   * plain (sum, sum, min, max) merges — the same lossless contract as
   * the CMS fold, so the accumulated stats equal
   * [[graft.operators.VectorOps.dimensionStats]] over everything
   * ingested, bit-for-bit. State is dim-sized regardless of volume: the
   * "has this encoder drifted, ever" read at any corpus size. The
   * rounded mean is derived once from the final state.
   */
  def incrementalDimStats(spark: SparkSession, history: DataFrame,
      streamDir: String, schema: StructType, stateDir: String,
      vecCol: String, retainVersions: Int = 3): DataFrame = {
    def core(df: DataFrame): DataFrame =
      graft.operators.VectorOps.dimensionStats(df, vecCol)
        .select("dim", "n", "sum_scaled", "min_scaled", "max_scaled")
    EmbeddingIndexStream.mergedFold(spark, history, streamDir, schema,
      stateDir, "ds_v", retainVersions, core,
      combine = (prev, cur) => prev.unionByName(cur).groupBy("dim")
        .agg(sum(col("n")).as("n"), sum(col("sum_scaled")).as("sum_scaled"),
          min(col("min_scaled")).as("min_scaled"),
          max(col("max_scaled")).as("max_scaled")))
      .withColumn("mean", round(col("sum_scaled").cast("double") /
        (col("n") * lit(1048576L)).cast("double"), 6))
  }

  /**
   * Streaming distribution-drift monitor: the live side's fixed-edge
   * histogram folds over micro-batches by per-bin counter addition
   * (lossless — the accumulated counts equal
   * [[graft.operators.TableStats.histogram]] over everything ingested,
   * bit-for-bit), and the final report scores it against the static
   * reference histogram with [[graft.operators.TableStats.driftReport]]
   * (PSI + binned KS, integer micro units). State is B bins regardless
   * of stream volume — the "has the feed drifted off the training
   * snapshot, ever" read with O(1) state and O(batch) per-batch cost.
   * Same versioning/vacuum contract as every fold.
   */
  def incrementalDriftPsi(spark: SparkSession, ref: DataFrame,
      streamDir: String, schema: StructType, stateDir: String,
      column: String, edges: Seq[Double],
      retainVersions: Int = 3): DataFrame = {
    import graft.operators.TableStats
    val emptySeed = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val liveHist = EmbeddingIndexStream.mergedFold(spark, emptySeed,
      streamDir, schema, stateDir, "drift_v", retainVersions,
      batch => TableStats.histogram(batch, column, edges),
      combine = (prev, cur) => prev.unionByName(cur)
        .groupBy("bin").agg(sum(col("n")).as("n")))
    TableStats.driftReport(TableStats.histogram(ref, column, edges),
      liveHist, edges.size + 1)
  }
}
