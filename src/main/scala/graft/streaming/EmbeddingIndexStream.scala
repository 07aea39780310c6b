package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Similarity

/**
 * Streaming embedding-index maintenance — the ANN twin of
 * [[DedupStream]]: vector batches arrive as a stream and are folded into
 * a persisted IVF inverted-list index, so similarity queries always run
 * against everything ingested so far WITHOUT re-scanning or re-assigning
 * history.
 *
 * The coarse quantizer is trained ONCE (on history, offline — the
 * standard IVF recipe; retraining is a scheduled rebuild, not a per-batch
 * step), so each micro-batch costs one narrow nprobe=1 assignment
 * projection plus an append: day-N ingest is O(batch). Versioning
 * discipline is [[ChangelogStream.materialize]]'s — batch b reads
 * lists v{b} and overwrites lists v{b+1}, so replays land exactly once —
 * and the chain is vacuumed to the newest `retainVersions` (>= 2) replay
 * anchors, the [[DedupStream]] retention contract.
 *
 * At 100 TB the lists live bucketed by cid: the per-batch append touches
 * only the buckets its vectors land in, and [[Similarity.probeIndex]]
 * co-locates with zero exchange on the index side.
 */
object EmbeddingIndexStream {

  /**
   * Runs the vector stream in `vecDir` (parquet, `schema` with id/vec
   * columns named `idCol`/`vecCol`) to completion, starting from
   * `history` (assigned as lists v0), folding (cid, id, vec) list rows
   * under `stateDir`. Returns the final accumulated index.
   */
  def incrementalIvf(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      retainVersions: Int = 3): DataFrame = {
    require(retainVersions >= 2,
      "incrementalIvf: retainVersions >= 2 (current + replay anchor)")
    require(centroids.nonEmpty,
      "incrementalIvf: empty coarse quantizer — train centroids first")
    Similarity.ivfAssignments(history, idCol, vecCol, centroids)
      .write.mode("overwrite").parquet(s"$stateDir/lists_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val prev = spark.read.parquet(s"$stateDir/lists_v$id")
      prev.unionByName(
          Similarity.ivfAssignments(batch, idCol, vecCol, centroids))
        .write.mode("overwrite").parquet(s"$stateDir/lists_v${id + 1}")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "lists_v")
      last = id + 1
    })
    spark.read.parquet(s"$stateDir/lists_v$last")
  }

  /**
   * The IVF x PQ twin of [[incrementalIvf]]: the folded state is
   * [[Similarity.ivfPqAssignments]] rows (cid, id, m, code) — each
   * ingested vector is coarse-assigned AND PQ-encoded once, on arrival,
   * and only its CODES enter the index. Per-batch cost is one narrow
   * projection + an append, and the persisted state is ~m bytes per
   * vector instead of dim x 4: the index a billion-vector deployment can
   * actually hold. Probes go through [[Similarity.probePqIndex]] (ADC
   * re-rank from the broadcast LUT) — raw vectors never leave storage on
   * the probe path. Same versioning/vacuum contract as [[incrementalIvf]].
   */
  def incrementalIvfPq(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      retainVersions: Int = 3): DataFrame = {
    require(retainVersions >= 2,
      "incrementalIvfPq: retainVersions >= 2 (current + replay anchor)")
    require(centroids.nonEmpty && codebooks.nonEmpty,
      "incrementalIvfPq: train the coarse quantizer and codebooks first")
    Similarity.ivfPqAssignments(history, idCol, vecCol, centroids,
        codebooks, subDim)
      .write.mode("overwrite").parquet(s"$stateDir/pq_lists_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val prev = spark.read.parquet(s"$stateDir/pq_lists_v$id")
      prev.unionByName(
          Similarity.ivfPqAssignments(batch, idCol, vecCol, centroids,
            codebooks, subDim))
        .write.mode("overwrite").parquet(s"$stateDir/pq_lists_v${id + 1}")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "pq_lists_v")
      last = id + 1
    })
    spark.read.parquet(s"$stateDir/pq_lists_v$last")
  }
}
