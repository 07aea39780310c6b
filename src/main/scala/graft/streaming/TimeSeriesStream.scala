package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Streaming Markov-transition maintenance — the CROSS-BATCH sequence
 * fold: event batches arrive in event-time order (a landing zone
 * partitioned by time gives this for free) and fold into persisted
 * first-order transition counts. Unlike the per-row folds (postings,
 * signatures, sketch cells), adjacent-pair extraction SPANS batch
 * boundaries: a user's last event of batch b and first event of batch
 * b+1 form a real transition. The fold therefore carries a second
 * state — each user's LAST seen event — and stitches the boundary pair
 * per batch, so the accumulated counts equal the batch computation over
 * all events, bit-for-bit (the gate's oracle is the batch replay
 * verbatim).
 *
 * Scale shape per batch: one within-batch lag per user (shuffle by
 * user), one user-keyed join against the carried last-event state
 * (user-sized, bucketed by user at rest), and a states²-bounded count
 * merge. Day-N cost is O(batch), never O(history) — in I/O too: the
 * transition counts are states²-bounded so their full rewrite is O(1),
 * but the last-event state GROWS with the key population, so it folds
 * as a [[DeltaState]] chain (batch b writes only its own per-key-latest
 * delta; the carried state is latest-per-key over base ∪ deltas —
 * merge-on-read — compacted physically every `compactEvery` batches).
 *
 * Precondition: batches partition event time monotonically per user
 * (batch b+1's events are not earlier than batch b's for the same key)
 * — the property a time-partitioned landing zone guarantees.
 */
object TimeSeriesStream {

  /** Runs the event stream in `streamDir` to completion, folding
    * transition counts under `stateDir`. Returns the final matrix in
    * [[graft.operators.TimeSeries.transitionMatrix]]'s output shape:
    * (cur, nxt, cnt, cur_total, p_scaled). */
  def incrementalTransitions(spark: SparkSession, streamDir: String,
      schema: StructType, stateDir: String, keyCol: String,
      stateCol: String, orderCol: String, tiebreakCol: String,
      retainVersions: Int = 3, compactEvery: Int = 16): DataFrame = {
    require(retainVersions >= 2,
      "incrementalTransitions: retainVersions >= 2")
    // Latest-per-key pick: the last-event chain's merge-on-read AND its
    // compaction merge (associative — the per-batch deltas already hold
    // each key's batch-latest, so the global latest survives any split).
    def latestPerKey(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("k").orderBy(col("o").desc, col("t").desc)
      df.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
    }
    // Empty state seeds typed from the SOURCE schema, so the per-batch
    // unions line up whatever the order/key column types are.
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    empty.select(col(stateCol).as("cur"), col(stateCol).as("nxt"),
        lit(0L).as("cnt"))
      .write.mode("overwrite").parquet(s"$stateDir/tc_v0")
    DeltaState.writeBase(
      empty.select(col(keyCol).as("k"), col(orderCol).as("o"),
        col(tiebreakCol).as("t"), col(stateCol).as("st")),
      stateDir, "last", 0L)
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val prev = spark.read.parquet(s"$stateDir/tc_v$id")
      val lastPrev = latestPerKey(DeltaState.read(spark, stateDir, "last", id))
      val b = batch.select(col(keyCol).as("k"), col(orderCol).as("o"),
          col(tiebreakCol).as("t"), col(stateCol).as("st"))
        .localCheckpoint() // consumed 3x; retry-unstable batch plans
                           // must not recompute differently per consumer
      // Fail-fast on the documented precondition instead of silently
      // miscounting: a batch whose earliest event for a key precedes the
      // carried last event would stitch a backwards transition. One
      // key-bounded agg + join per batch — cheap relative to the fold.
      val violations = b.groupBy("k")
        .agg(min(struct(col("o"), col("t"))).as("__min"))
        .join(lastPrev, "k")
        .where(col("__min") < struct(col("o"), col("t")))
        .limit(1).collect()
      require(violations.isEmpty,
        s"incrementalTransitions: batch $id violates per-key event-time " +
          s"monotonicity for key ${violations.headOption.map(_.get(0))} — " +
          "late-arriving data would miscount boundary transitions")
      val seqW = Window.partitionBy("k").orderBy(col("o"), col("t"))
      val within = b.withColumn("__nxt", lead(col("st"), 1).over(seqW))
        .where(col("__nxt").isNotNull)
        .select(col("st").as("cur"), col("__nxt").as("nxt"))
      // Boundary stitch: carried last event -> the batch's first event
      // of the same key.
      val firsts = b.withColumn("__rn", row_number().over(seqW))
        .where(col("__rn") === 1).select(col("k"), col("st").as("__fst"))
      val cross = lastPrev.join(firsts, "k")
        .select(col("st").as("cur"), col("__fst").as("nxt"))
      val delta = within.unionByName(cross)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("cnt"))
      prev.unionByName(delta)
        .groupBy("cur", "nxt").agg(sum(col("cnt")).as("cnt"))
        .write.mode("overwrite").parquet(s"$stateDir/tc_v${id + 1}")
      // New last-event delta: the BATCH's per-key latest only — the
      // carried state is reconstructed on read, so the per-batch write
      // stays O(batch) however many keys have ever been seen.
      DeltaState.writeDelta(latestPerKey(b), stateDir, "last", id + 1)
      if (DeltaState.due(stateDir, "last", id + 1, compactEvery)) {
        DeltaState.compact(spark, stateDir, "last", id + 1, latestPerKey)
        DeltaState.vacuum(stateDir, "last", retainVersions)
      }
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "tc_v")
      last = id + 1
    })
    val perCur = Window.partitionBy("cur")
    spark.read.parquet(s"$stateDir/tc_v$last")
      .withColumn("cur_total", sum(col("cnt")).over(perCur))
      .withColumn("p_scaled", expr("(cnt * 1000000) div cur_total"))
  }
}
