package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Streaming graph-edge maintenance — the graph twin of
 * [[DedupStream]]/[[EmbeddingIndexStream]]'s state folds: co-occurrence
 * batches (order, member) arrive as micro-batches and fold into a
 * persisted, versioned pair-count table, so the affinity graph (and
 * everything downstream: PageRank, triangles, k-core) is always
 * queryable over EVERYTHING ingested without re-scanning history.
 *
 * The incremental formulation is exact, not approximate: alongside the
 * pair counts, the fold keeps the (order, member) membership state;
 * each batch's genuinely-new rows pair (a) against the ACCUMULATED
 * members of the same order — catching orders whose lines straddle
 * batches — and (b) within the batch. Each unordered co-occurrence is
 * counted exactly once, so the folded counts equal the batch
 * computation bit-for-bit.
 *
 * Scale shape: per batch, one anti-join + one equi-join against
 * membership state keyed by the order id (at rest the state buckets by
 * that key, so probes co-locate), one within-batch self-join, and a
 * key-partitioned full-outer merge of pair counts. Day-N cost is
 * O(batch x order-fanout), never O(history). Both state chains are
 * versioned for idempotent replay and vacuumed to >= 2 replay anchors,
 * like every other streaming fold in the engine.
 */
object GraphStream {

  /**
   * Folds a stream of (okCol, sCol) co-occurrence rows into versioned
   * pair-count state under `stateDir`, returning the FINAL directed
   * pair-count table (src, dst, cnt).
   */
  def incrementalPairCounts(spark: SparkSession, streamDir: String,
      schema: StructType, stateDir: String, okCol: String, sCol: String,
      retainVersions: Int = 3): DataFrame = {
    require(retainVersions >= 2,
      "incrementalPairCounts: retainVersions >= 2 (current + replay anchor)")
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("ok", "s")
      .write.mode("overwrite").parquet(s"$stateDir/os_v0")
    Seq.empty[(Long, Long, Long)].toDF("src", "dst", "cnt")
      .write.mode("overwrite").parquet(s"$stateDir/pc_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val members = spark.read.parquet(s"$stateDir/os_v$id")
      val counts = spark.read.parquet(s"$stateDir/pc_v$id")
      val incoming = batch
        .select(col(okCol).cast("long").as("ok"), col(sCol).cast("long").as("s"))
        .distinct()
      val fresh = incoming.join(members, Seq("ok", "s"), "left_anti")
        .localCheckpoint() // consumed 3x below; retry-unstable batch plans
                           // must not recompute differently per consumer
      // (a) new member x already-known members of the same order.
      val crossOld = fresh.as("n")
        .join(members.as("o"), col("n.ok") === col("o.ok") &&
          col("n.s") =!= col("o.s"))
        .select(col("n.s").as("src"), col("o.s").as("dst"))
      // (b) new x new within the order (self-join emits both directions).
      val crossNew = fresh.as("x")
        .join(fresh.as("y"), col("x.ok") === col("y.ok") &&
          col("x.s") =!= col("y.s"))
        .select(col("x.s").as("src"), col("y.s").as("dst"))
      val delta = crossOld.unionByName(crossOld.select(col("dst").as("src"),
          col("src").as("dst")))
        .unionByName(crossNew)
        .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      counts.unionByName(delta)
        .groupBy("src", "dst").agg(sum(col("cnt")).as("cnt"))
        .write.mode("overwrite").parquet(s"$stateDir/pc_v${id + 1}")
      members.unionByName(fresh)
        .write.mode("overwrite").parquet(s"$stateDir/os_v${id + 1}")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "os_v")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "pc_v")
      last = id + 1
    })
    spark.read.parquet(s"$stateDir/pc_v$last")
  }

  /** Top-k affinity cut over a folded pair-count table — the same edge
    * contract as [[graft.operators.Graph.topKAffinityEdges]], served
    * from streamed state. */
  def topKEdges(pairCounts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("cnt").desc, col("dst"))
    pairCounts.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("src", "dst", "cnt")
  }
}
