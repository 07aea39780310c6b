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

  /**
   * [[incrementalMinhash]] under DELETES (takedowns / GDPR erasure) —
   * the changelog stream's D rows (needing only `idCol`) tombstone docs
   * out of BOTH levels of dedup state:
   *
   *  - the BAND INDEX: a deleted doc's bands stop suppressing future
   *    near-dups — a re-crawl of a deleted doc lands as FRESH (the
   *    takedown contract: "removed" must not survive as an invisible
   *    dedup witness), enforced by the [[DeleteStream]] tombstone rule
   *    (index rows with __v <= the tombstone version are unservable;
   *    a re-crawl's bands land at a later __v, so they serve). Index
   *    compaction bakes the served view and hard-deletes tombstoned
   *    bands.
   *  - the LANDED CORPUS: the returned survivor set excludes every doc
   *    whose landing batch precedes its tombstone. Because the out_v*
   *    outputs are immutable (each is one batch's exactly-once landing),
   *    corpus filtering reads a SEPARATE append-only delete log chain
   *    ("dlog") that — unlike the index tombstones — never restarts at
   *    index compaction; it compacts under its own cadence and is
   *    bounded by total deletions, not corpus size.
   *
   * Within a batch, deletes apply BEFORE inserts (D-then-I), so a
   * takedown and its re-crawl may share a batch. Per-batch I/O stays
   * O(batch): two tombstone deltas + one band delta + the landed output.
   */
  def incrementalMinhashWithDeletes(spark: SparkSession, history: DataFrame,
      docsDir: String, schema: StructType, stateDir: String,
      idCol: String, textCol: String, opCol: String,
      retainIndexVersions: Int = 3, compactEvery: Int = 256,
      packEvery: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(retainIndexVersions >= 2,
      "incrementalMinhashWithDeletes: retainIndexVersions >= 2")
    val idType = schema(idCol).dataType
    val emptyTombs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__tid", idType),
        org.apache.spark.sql.types.StructField("__tv",
          org.apache.spark.sql.types.LongType))))
    def minus(rows: DataFrame, tombs: DataFrame): DataFrame =
      rows.join(tombs,
        rows("doc_id") === tombs("__tid") && rows("__v") <= tombs("__tv"),
        "left_anti")
    DeltaState.writeBase(Dedup.minhashBandIndex(history, idCol, textCol)
      .withColumn("__v", lit(0L)), stateDir, "idx", 0L)
    DeltaState.writeBase(emptyTombs, stateDir, "idxtmb", 0L)
    DeltaState.writeBase(emptyTombs, stateDir, "dlog", 0L)
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(docsDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val ins = batch.where(col(opCol) === "I").drop(opCol)
      val dels = batch.where(col(opCol) === "D")
        .select(col(idCol).as("__tid")).distinct()
      DeltaState.writeDelta(dels.withColumn("__tv", lit(id + 1)),
        stateDir, "idxtmb", id + 1)
      DeltaState.writeDelta(dels.withColumn("__tv", lit(id + 1)),
        stateDir, "dlog", id + 1)
      // D-before-I: the probe view applies tombstones up to and
      // INCLUDING this batch (caps at id keep replays off any state this
      // batch's compaction wrote last time).
      val index = minus(DeltaState.read(spark, stateDir, "idx", id, id),
        DeltaState.read(spark, stateDir, "idxtmb", id + 1, id))
      val survivors = Dedup.incrementalMinhashKeepFirst(
        ins, idCol, textCol, index)
      survivors.write.mode("overwrite").parquet(s"$stateDir/out_v${id + 1}")
      val landed = spark.read.parquet(s"$stateDir/out_v${id + 1}")
      DeltaState.writeDelta(Dedup.minhashBandIndex(landed, idCol, textCol)
        .withColumn("__v", lit(id + 1)), stateDir, "idx", id + 1)
      if (DeltaState.due(stateDir, "idx", id + 1, compactEvery)) {
        // Bake the tombstones: the served view becomes the new base and
        // the index tombstone chain restarts empty — deleted bands are
        // physically gone past this horizon. dlog is NOT restarted.
        DeltaState.writeBase(
          minus(DeltaState.read(spark, stateDir, "idx", id + 1, id),
            DeltaState.read(spark, stateDir, "idxtmb", id + 1, id)),
          stateDir, "idx", id + 1)
        DeltaState.writeBase(emptyTombs, stateDir, "idxtmb", id + 1)
        DeltaState.vacuum(stateDir, "idx", retainIndexVersions)
        DeltaState.vacuum(stateDir, "idxtmb", retainIndexVersions)
      } else if (DeltaState.packDue(stateDir, "idx", id + 1, packEvery)) {
        DeltaState.pack(spark, stateDir, "idx", id + 1)
        DeltaState.vacuum(stateDir, "idx", retainIndexVersions)
      }
      if (DeltaState.due(stateDir, "dlog", id + 1, compactEvery)) {
        DeltaState.compact(spark, stateDir, "dlog", id + 1)
        DeltaState.vacuum(stateDir, "dlog", retainIndexVersions)
      }
      last = id + 1
    })
    val insSchema = org.apache.spark.sql.types.StructType(
      schema.filterNot(_.name == opCol))
    val outs = (1L to last).map(v =>
        spark.read.parquet(s"$stateDir/out_v$v").withColumn("__v", lit(v)))
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), insSchema)
        .withColumn("__v", lit(0L)))
    val dlog = DeltaState.read(spark, stateDir, "dlog", last)
    outs.join(dlog,
        outs(idCol) === dlog("__tid") && outs("__v") <= dlog("__tv"),
        "left_anti")
      .drop("__v")
  }
}
