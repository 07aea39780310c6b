package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/**
 * Streaming incremental NEAR-dedup — the production shape of corpus
 * ingestion: document batches arrive as a stream; each micro-batch is
 * screened against the historical MinHash band index
 * ([[Dedup.incrementalMinhashKeepFirst]]), its survivors land in a
 * per-batch output directory, and their bands are APPENDED to a
 * versioned index so the next batch is screened against everything that
 * came before. The index is the only state that accumulates — history's
 * text is never re-read, never re-hashed.
 *
 * The band index is a [[DeltaState]] append chain: batch b probes the
 * accumulated index (one multi-path scan of base ∪ deltas, version-
 * filtered to < b so a failed earlier attempt's delta is invisible) and
 * physically writes ONLY its own `idx_d{b}` delta + its disjoint
 * `out_v{b}` output — per-batch I/O is O(batch), never O(accumulated
 * index); trailing deltas merge into packs every `packEvery` batches
 * (O(batch·packEvery), the L1 tier) and the only full rewrite is the
 * scheduled base compaction every `compactEvery` batches. Replays
 * re-overwrite only their own delta and
 * output, so they land exactly once. At 100 TB the index lives bucketed
 * on (band, band_hash) and the per-batch probe co-locates; day-N cost
 * stays O(batch).
 */
object DedupStream {

  /**
   * Runs the document stream in `docsDir` (parquet, `schema` with
   * `idCol`/`textCol`) to completion, starting from `history` (whose
   * band index becomes v0), folding survivors + index under `stateDir`.
   * `maxFilesPerTrigger 1` makes each file its own micro-batch. Returns
   * the union of all surviving batch outputs.
   *
   * Index lifecycle: batch b appends its landed survivors' bands as the
   * `idx_d{b}` delta; the accumulated index is base ∪ deltas, compacted
   * physically every `compactEvery` batches and vacuumed to the newest
   * `retainIndexVersions` base anchors (floor 2: the inputs a retried
   * compaction re-reads must survive — [[DeltaState.vacuum]]'s
   * contract). The out_v* directories are NOT state: each holds one
   * batch's disjoint surviving documents (the landed corpus itself) and
   * is never pruned.
   */
  def incrementalMinhash(spark: SparkSession, history: DataFrame,
      docsDir: String, schema: StructType, stateDir: String,
      idCol: String, textCol: String,
      retainIndexVersions: Int = 3, compactEvery: Int = 256,
      packEvery: Int = 16): DataFrame = {
    require(retainIndexVersions >= 2,
      "incrementalMinhash: retainIndexVersions >= 2 (current + replay anchor)")
    DeltaState.writeBase(Dedup.minhashBandIndex(history, idCol, textCol),
      stateDir, "idx", 0L)
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(docsDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val index = DeltaState.read(spark, stateDir, "idx", id)
      val survivors = Dedup.incrementalMinhashKeepFirst(
        batch, idCol, textCol, index)
      survivors.write.mode("overwrite").parquet(s"$stateDir/out_v${id + 1}")
      // Re-read the landed survivors so the appended bands derive from
      // the committed output, not a recomputation of the (nondeterministic
      // under retry) incoming batch plan.
      val landed = spark.read.parquet(s"$stateDir/out_v${id + 1}")
      DeltaState.writeDelta(Dedup.minhashBandIndex(landed, idCol, textCol),
        stateDir, "idx", id + 1)
      if (DeltaState.due(stateDir, "idx", id + 1, compactEvery)) {
        DeltaState.compact(spark, stateDir, "idx", id + 1)
        DeltaState.vacuum(stateDir, "idx", retainIndexVersions)
      } else if (DeltaState.packDue(stateDir, "idx", id + 1, packEvery)) {
        DeltaState.pack(spark, stateDir, "idx", id + 1)
        DeltaState.vacuum(stateDir, "idx", retainIndexVersions)
      }
      last = id + 1
    })
    (1L to last).map(v => spark.read.parquet(s"$stateDir/out_v$v"))
      .reduceOption(_.unionByName(_))
      // Empty stream (no files in docsDir): no batch ever landed.
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
  }
}
