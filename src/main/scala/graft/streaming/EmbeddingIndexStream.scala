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

  /** The shared fold: seed `stateDir/<prefix>0` with the assigned
    * history, then run the vector stream to completion appending each
    * batch's assignments under [[ChangelogStream.materialize]]'s
    * versioning discipline (batch b reads v{b}, overwrites v{b+1} —
    * exactly-once under replay), vacuuming to the newest
    * `retainVersions` anchors. Returns the final accumulated index.
    * Generic over the per-batch assignment — [[MediaIndexStream]] rides
    * the same fold for signature tables. */
  private[streaming] def incrementalFold(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String, prefix: String,
      retainVersions: Int, assign: DataFrame => DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame =
        (prev, rows) => prev.unionByName(rows)): DataFrame = {
    assign(history).write.mode("overwrite").parquet(s"$stateDir/${prefix}0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val prev = spark.read.parquet(s"$stateDir/$prefix$id")
      combine(prev, assign(batch))
        .write.mode("overwrite").parquet(s"$stateDir/$prefix${id + 1}")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = prefix)
      last = id + 1
    })
    spark.read.parquet(s"$stateDir/$prefix$last")
  }

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
    incrementalFold(spark, history, vecDir, schema, stateDir, "lists_v",
      retainVersions,
      batch => Similarity.ivfAssignments(batch, idCol, vecCol, centroids))
  }

  /**
   * The SCHEDULED REBUILD the incremental fold's header promises: once
   * the ingested distribution has drifted from the history the coarse
   * quantizer was trained on, probe recall decays — the new mass lives
   * in lists whose centroids no longer resolve it. This retrains the
   * quantizer FROM the accumulated index rows themselves ((cid, id, vec)
   * — the vectors are already there; the corpus is never re-read) on the
   * deterministic 1-in-`trainMod` id sample, re-keys every list row to
   * the new quantizer in one narrow assignment pass, and returns
   * (newCentroids, newLists).
   *
   * Deployment shape: run it as a scheduled job against lists v{n},
   * write the re-keyed lists as v{n+1} under the same
   * [[ChangelogStream]] overwrite+vacuum discipline, and swap the
   * serving centroids with the version flip — probes are a (centroids,
   * lists) PAIR, so the flip is atomic at the version boundary. Grow `k`
   * with the accumulated count (the [[graft.operators.Dedup.semanticKFor]]
   * dial) so list occupancy stays flat as the index accumulates.
   *
   * Deterministic end to end ([[Similarity.trainKMeans]]'s contract), so
   * the rebuilt index is engine-replayable like the original.
   */
  def rebuildIvf(lists: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, iters: Int, trainMod: Int = 4)
      : (Seq[(Long, Array[Float])], DataFrame) = {
    require(k > 0 && trainMod >= 1, "rebuildIvf: k > 0, trainMod >= 1")
    import org.apache.spark.sql.functions.col
    val rows = lists.select(col(idCol), col(vecCol))
    val cents = Similarity.trainKMeans(
      rows.where(col(idCol) % trainMod === 0), idCol, vecCol, k, dim, iters)
    (cents, Similarity.ivfAssignments(rows, idCol, vecCol, cents))
  }

  /**
   * [[incrementalIvf]] with the SCHEDULED REBUILD WIRED INTO the fold
   * (the `refreshEvery` pattern [[GraphStream.incrementalPagerank]]
   * established): every `rebuildEvery`-th batch, after folding its own
   * assignments, retrains the quantizer from the accumulated index rows
   * ([[rebuildIvf]] — k grown with the accumulated count via `rebuildK`)
   * and re-keys every list row, so probe recall tracks distribution
   * drift WITHOUT a separate maintenance job.
   *
   * Atomic version flip, replay-idempotent: probes need a MATCHED
   * (centroids, lists) pair, so centroids persist per version alongside
   * the lists (`cents_v{b}` next to `lists_v{b}`). Batch b reads BOTH at
   * v{b} and overwrites BOTH at v{b+1} — a replayed batch re-reads its
   * untouched input version and lands bit-identically, rebuild included
   * ([[graft.operators.Similarity.trainKMeans]] is deterministic).
   * Rebuild batches stage the appended rows under `pre_v{b+1}` first
   * (training re-reads them iters+1 times; re-keying must not read the
   * version it is overwriting). Non-rebuild batches cost exactly what
   * [[incrementalIvf]]'s do plus a metadata-sized centroid copy.
   *
   * Returns the final (centroids, lists) pair.
   */
  def incrementalIvfWithRebuild(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids0: Seq[(Long, Array[Float])], rebuildEvery: Int,
      rebuildK: Long => Int, dim: Int, iters: Int, trainMod: Int = 4,
      retainVersions: Int = 3): (Seq[(Long, Array[Float])], DataFrame) = {
    require(retainVersions >= 2,
      "incrementalIvfWithRebuild: retainVersions >= 2")
    require(rebuildEvery >= 1, "incrementalIvfWithRebuild: rebuildEvery >= 1")
    require(centroids0.nonEmpty,
      "incrementalIvfWithRebuild: empty initial quantizer")
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def writeCents(cents: Seq[(Long, Array[Float])], path: String): Unit =
      cents.map { case (c, v) => (c, v.toSeq) }.toDF("cid", "cvec")
        .coalesce(1).write.mode("overwrite").parquet(path)
    def readCents(path: String): Seq[(Long, Array[Float])] =
      spark.read.parquet(path).orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    Similarity.ivfAssignments(history, idCol, vecCol, centroids0)
      .write.mode("overwrite").parquet(s"$stateDir/lists_v0")
    writeCents(centroids0, s"$stateDir/cents_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val cents = readCents(s"$stateDir/cents_v$id")
      val prev = spark.read.parquet(s"$stateDir/lists_v$id")
      val appended = prev.unionByName(
        Similarity.ivfAssignments(batch, idCol, vecCol, cents))
      if ((id + 1) % rebuildEvery == 0) {
        appended.write.mode("overwrite").parquet(s"$stateDir/pre_v${id + 1}")
        val acc = spark.read.parquet(s"$stateDir/pre_v${id + 1}")
        val (nc, nl) = rebuildIvf(acc, "id", "vec", rebuildK(acc.count()),
          dim, iters, trainMod)
        nl.write.mode("overwrite").parquet(s"$stateDir/lists_v${id + 1}")
        writeCents(nc, s"$stateDir/cents_v${id + 1}")
      } else {
        appended.write.mode("overwrite").parquet(s"$stateDir/lists_v${id + 1}")
        writeCents(cents, s"$stateDir/cents_v${id + 1}")
      }
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "lists_v")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "cents_v")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "pre_v")
      last = id + 1
    })
    (readCents(s"$stateDir/cents_v$last"),
      spark.read.parquet(s"$stateDir/lists_v$last"))
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
    incrementalFold(spark, history, vecDir, schema, stateDir, "pq_lists_v",
      retainVersions,
      batch => Similarity.ivfPqAssignments(batch, idCol, vecCol, centroids,
        codebooks, subDim))
  }

  /**
   * STREAMING IVF x SQ8 index: [[incrementalIvfPq]]'s fold with the SQ8
   * payload — each arriving vector is coarse-assigned and int8-quantized
   * once, and the persisted state is (cid, id, code, cmax): dim bytes +
   * one scale per vector (4× under raw lists) with near-exact estimates
   * (no codebook training, no LUT — the [[Similarity.probeSq8Index]]
   * probe is an exact-BIGINT dot per candidate). Same versioning/vacuum/
   * replay-idempotence contract as the sibling folds.
   */
  def incrementalIvfSq8(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      retainVersions: Int = 3): DataFrame = {
    require(retainVersions >= 2,
      "incrementalIvfSq8: retainVersions >= 2 (current + replay anchor)")
    require(centroids.nonEmpty,
      "incrementalIvfSq8: train the coarse quantizer first")
    incrementalFold(spark, history, vecDir, schema, stateDir, "sq8_lists_v",
      retainVersions,
      batch => Similarity.ivfSq8Assignments(batch, idCol, vecCol, centroids))
  }
}
