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
 * Versioning discipline is [[ChangelogStream.materialize]]'s: batch b
 * reads index v{b} (which a failed earlier attempt cannot have touched)
 * and overwrites out v{b+1} / index v{b+1}, so replays land exactly
 * once. At 100 TB the index lives bucketed on (band, band_hash) and the
 * per-batch probe co-locates; day-N cost stays O(batch).
 */
object DedupStream {

  /**
   * Runs the document stream in `docsDir` (parquet, `schema` with
   * `idCol`/`textCol`) to completion, starting from `history` (whose
   * band index becomes v0), folding survivors + index under `stateDir`.
   * `maxFilesPerTrigger 1` makes each file its own micro-batch. Returns
   * the union of all surviving batch outputs.
   *
   * Index lifecycle: each batch rewrites the FULL band index as
   * idx_v{b+1}, so without retention the state dir holds every historical
   * copy of a growing index — O(batches²) storage at one batch per ingest
   * hour. After each batch the chain is cut back to the newest
   * `retainIndexVersions` (floor 2: the version a retried batch re-reads
   * must survive — [[ChangelogStream.vacuum]]'s contract). The out_v*
   * directories are NOT state: each holds one batch's disjoint surviving
   * documents (the landed corpus itself) and is never pruned.
   */
  def incrementalMinhash(spark: SparkSession, history: DataFrame,
      docsDir: String, schema: StructType, stateDir: String,
      idCol: String, textCol: String,
      retainIndexVersions: Int = 3): DataFrame = {
    require(retainIndexVersions >= 2,
      "incrementalMinhash: retainIndexVersions >= 2 (current + replay anchor)")
    Dedup.minhashBandIndex(history, idCol, textCol)
      .write.mode("overwrite").parquet(s"$stateDir/idx_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(docsDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val index = spark.read.parquet(s"$stateDir/idx_v$id")
      val survivors = Dedup.incrementalMinhashKeepFirst(
        batch, idCol, textCol, index)
      survivors.write.mode("overwrite").parquet(s"$stateDir/out_v${id + 1}")
      // Re-read the landed survivors so the appended bands derive from
      // the committed output, not a recomputation of the (nondeterministic
      // under retry) incoming batch plan.
      val landed = spark.read.parquet(s"$stateDir/out_v${id + 1}")
      index.unionByName(Dedup.minhashBandIndex(landed, idCol, textCol))
        .write.mode("overwrite").parquet(s"$stateDir/idx_v${id + 1}")
      ChangelogStream.vacuum(stateDir, retainIndexVersions, prefix = "idx_v")
      last = id + 1
    })
    (1L to last).map(v => spark.read.parquet(s"$stateDir/out_v$v"))
      .reduceOption(_.unionByName(_))
      // Empty stream (no files in docsDir): no batch ever landed.
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
  }
}
