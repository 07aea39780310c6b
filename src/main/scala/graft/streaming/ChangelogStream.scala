package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Merge

/**
 * Streaming CDC materialization: folds a CHANGELOG STREAM (I/U/D ops with
 * per-key sequence numbers) into a continuously-maintained keyed snapshot
 * — the materialized-view-maintenance pattern behind every "keep a serving
 * table in sync with the log" deployment.
 *
 * State is a [[DeltaState]] pair: a compacted snapshot base
 * (`snap_base{c}`) plus the RAW log rows of each later batch
 * (`log_d{b}`). Batch b physically writes only its own log delta —
 * O(batch) I/O, never a snapshot rewrite; the serving snapshot at
 * version n is [[Merge.applyChangelog]](base, union of log deltas in
 * (c, n]) — MERGE-ON-READ, exactly the read side of a Delta/Iceberg/
 * Hudi-style log-structured table — and compaction materializes it as
 * the next base every `compactEvery` batches. Idempotent replay: a
 * retried batch re-overwrites only its own delta (and, if it compacted,
 * the base it recomputes from inputs vacuum retains).
 *
 * Ordering contract: within one micro-batch, highest-seq-wins handles any
 * arrival order; ACROSS batches the log stream must deliver each KEY's
 * ops in sequence order (the guarantee a key-partitioned CDC log — Kafka
 * keyed by primary key, a Debezium topic — provides; ops of different
 * keys may interleave arbitrarily). That same per-key monotonicity is
 * what makes merge-on-read EXACT: the per-key max-seq winner over the
 * concatenated deltas is the winner of the latest batch that touched the
 * key, i.e. the sequential fold's answer, row for row
 * ([[Merge.snapshotAsOf]] documents the identical reconstruction
 * property).
 *
 * Scale shape: per batch, one O(batch) delta write. On read, one window
 * shuffle of the accumulated LOG SLICE (bounded by compactEvery batches)
 * plus one key-partitioned anti-join against the base. At 100 TB the
 * base is bucketed by key so the join co-locates; compaction touches
 * only changed partitions under dynamic partition overwrite.
 */
object ChangelogStream {

  /**
   * Runs the changelog stream in `logDir` (parquet files, `schema`) to
   * completion against the static fixture, folding under `stateDir`
   * starting from `base` (written as `snap_base0`); each batch lands as
   * a raw `log_d{b}` delta and the snapshot is served merge-on-read.
   * `maxFilesPerTrigger 1` makes each log file its own micro-batch, so
   * the multi-version fold path genuinely executes. Returns the final
   * snapshot as a DataFrame.
   */
  def materialize(spark: SparkSession, base: DataFrame, logDir: String,
      schema: StructType, stateDir: String, keys: Seq[String],
      seqCol: String, opCol: String, retainVersions: Int = 3,
      compactEvery: Int = 16): DataFrame = {
    DeltaState.writeBase(base, stateDir, "snap", 0L)
    // `baseCap` bounds which base may serve as the fold input: a REPLAYED
    // compaction batch passes its own version - 1 so the base it is about
    // to re-overwrite can never be picked as its own input.
    def serving(n: Long, baseCap: Long): DataFrame = {
      val c = DeltaState.baseVersion(stateDir, "snap", baseCap)
      val snap = spark.read.parquet(DeltaState.basePath(stateDir, "snap", c))
      val logs = DeltaState.deltaVersionsIn(stateDir, "log", c, n)
      if (logs.isEmpty) snap
      else Merge.applyChangelog(snap,
        spark.read.parquet(
          logs.map(DeltaState.deltaPath(stateDir, "log", _)): _*),
        keys, seqCol, opCol)
    }
    // The handler tracks the highest version it wrote; snapshot reads go
    // through the version number, never a mutable "current" pointer.
    @volatile var lastVersion = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      DeltaState.writeDelta(batch, stateDir, "log", id + 1)
      if (DeltaState.due(stateDir, "snap", id + 1, compactEvery)) {
        DeltaState.writeBase(serving(id + 1, id), stateDir, "snap", id + 1)
        DeltaState.vacuum(stateDir, "snap", retainVersions)
        DeltaState.vacuumDeltas(stateDir, "log",
          DeltaState.retainedFloor(stateDir, "snap", retainVersions))
      }
      lastVersion = id + 1
    })
    serving(lastVersion, lastVersion)
  }

  /**
   * Retention cut for a versioned state chain: keeps the newest
   * `keep` versions (the replay anchors still inside the checkpoint's
   * possible-retry horizon) and deletes older ones. Returns the deleted
   * version numbers. The table-format analogue is VACUUM; the retention
   * floor exists for the same reason — a version still referencable by a
   * retried batch must never be removed, so `keep >= 2`. `prefix` names
   * the chain — the CONSTANT-SIZE states the full-rewrite discipline is
   * still right for (CMS grids "cms_v", dim stats "ds_v", histograms
   * "dhist_v"/"drift_v", transition counts "tc_v", rank vectors "pr_v",
   * centroid/codebook metadata "cents_v"/"pq_books_v"). Growing states
   * use [[DeltaState]] chains and its vacuum instead.
   */
  def vacuum(stateDir: String, keep: Int, prefix: String = "v"): Seq[Long] = {
    require(keep >= 2, "vacuum: keep >= 2 (current + its replay anchor)")
    val pat = java.util.regex.Pattern.quote(prefix) + "\\d+"
    val versions = StateFs.listDirNames(stateDir)
      .filter(_.matches(pat))
      .map(_.drop(prefix.length).toLong).sorted
    val cut = versions.drop(math.max(0, versions.length - keep))
    val doomed = versions.filterNot(cut.contains)
    doomed.foreach(v => StateFs.deleteDir(stateDir, s"$prefix$v"))
    doomed
  }
}
