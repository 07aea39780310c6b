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
 * Each micro-batch applies [[Merge.applyChangelog]] against the previous
 * snapshot version and writes the next one: snapshot v{b+1} = fold(v{b},
 * batch b). Versioned snapshot directories make the handler IDEMPOTENT —
 * a replayed batch b re-reads v{b} (which a failed first attempt cannot
 * have touched) and overwrites v{b+1}, landing exactly once.
 *
 * Ordering contract: within one micro-batch, highest-seq-wins handles any
 * arrival order; ACROSS batches the fold is per-key append-only, so the
 * log stream must deliver each KEY's ops in sequence order (the guarantee
 * a key-partitioned CDC log — Kafka keyed by primary key, a Debezium
 * topic — provides; ops of different keys may interleave arbitrarily).
 *
 * Scale shape: per batch, one window shuffle of the BATCH plus one
 * key-partitioned anti-join against the snapshot — cost O(batch) joins +
 * one snapshot rewrite. At 100 TB the snapshot is bucketed/partitioned by
 * key so the join co-locates and the rewrite touches only changed
 * partitions (dynamic partition overwrite); the versioned-directory fold
 * here is the same commit discipline a table format (Delta/Iceberg)
 * provides transactionally.
 */
object ChangelogStream {

  /**
   * Runs the changelog stream in `logDir` (parquet files, `schema`) to
   * completion against the static fixture, folding into versioned
   * snapshots under `stateDir` starting from `base` (written as v0).
   * `maxFilesPerTrigger 1` makes each log file its own micro-batch, so
   * the multi-version fold path genuinely executes. Returns the final
   * snapshot as a DataFrame.
   */
  def materialize(spark: SparkSession, base: DataFrame, logDir: String,
      schema: StructType, stateDir: String, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    base.write.mode("overwrite").parquet(s"$stateDir/v0")
    // The handler tracks the highest version it wrote; snapshot reads go
    // through the version number, never a mutable "current" pointer.
    @volatile var lastVersion = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val prev = spark.read.parquet(s"$stateDir/v$id")
      Merge.applyChangelog(prev, batch, keys, seqCol, opCol)
        .write.mode("overwrite").parquet(s"$stateDir/v${id + 1}")
      lastVersion = id + 1
    })
    spark.read.parquet(s"$stateDir/v$lastVersion")
  }

  /**
   * Retention cut for a versioned state chain: keeps the newest
   * `keep` versions (the replay anchors still inside the checkpoint's
   * possible-retry horizon) and deletes older ones. Returns the deleted
   * version numbers. The table-format analogue is VACUUM; the retention
   * floor exists for the same reason — a version still referencable by a
   * retried batch must never be removed, so `keep >= 2`. `prefix` names
   * the chain ("v" for CDC snapshots, "idx_v" for the dedup band index —
   * [[DedupStream]] reuses this for its index lifecycle).
   */
  def vacuum(stateDir: String, keep: Int, prefix: String = "v"): Seq[Long] = {
    require(keep >= 2, "vacuum: keep >= 2 (current + its replay anchor)")
    val dir = new java.io.File(stateDir)
    val pat = java.util.regex.Pattern.quote(prefix) + "\\d+"
    val versions = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches(pat))
      .map(f => f.getName.drop(prefix.length).toLong).sorted
    val cut = versions.drop(math.max(0, versions.length - keep))
    val doomed = versions.filterNot(cut.contains)
    doomed.foreach { v =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir, s"$prefix$v"))
    }
    doomed.toIndexedSeq
  }
}
