package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training-data pipelines (SURVEY.md §2.5): assigns
 * each document to a fixed-token-capacity training sequence, the step
 * that turns a cleaned corpus into model-ready context windows.
 *
 * Strategy: GREEDY CONTIGUOUS packing within deterministic shards.
 * Documents are sharded by `pmod(id, shards)`, ordered by id within the
 * shard, and a document goes to the sequence in which its FIRST token
 * falls (`floor(exclusive-cumulative-tokens / capacity)`). A document
 * straddling a capacity boundary stays whole in its starting sequence, so
 * a sequence can overflow by less than one document — the standard
 * "pack then truncate/pad at tokenization" contract, chosen over
 * best-fit bin packing because it is deterministic, one-pass, and
 * engine-replayable (best-fit is order-dependent and inherently serial).
 *
 * Scale shape (100 TB story): the only heavy operation is a window
 * cumulative sum PARTITIONED BY shard — no global sort, no driver loop.
 * Shard count scales with the cluster (thousands of shards => thousands
 * of independent window partitions); each shard's packing is sequential
 * only within its own partition, exactly like any keyed window. Output is
 * one row per document: (doc_id, shard, seq_id, offset_tokens, n_tokens),
 * with seq_id globally unique via seq_in_shard * shards + shard.
 */
object Packing {

  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column,
      capacity: Long, shards: Int = 64): DataFrame = {
    require(capacity > 0, "packSequences: capacity must be positive")
    require(shards > 0, "packSequences: shards must be positive")
    val base = docs.select(col(idCol).as("doc_id"),
      tokenCount.cast("long").as("n_tokens"),
      pmod(col(idCol), lit(shards.toLong)).as("shard"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Exclusive running total = inclusive - own count: integer-only math,
    // so the DuckDB oracle replays it bit-for-bit.
    val withCum = base.withColumn("__cum", sum(col("n_tokens")).over(w))
    val start = col("__cum") - col("n_tokens")
    val seqInShard = floor(start / capacity).cast("long")
    withCum.select(col("doc_id"), col("shard"),
      (seqInShard * shards + col("shard")).as("seq_id"),
      (start - seqInShard * capacity).as("offset_tokens"),
      col("n_tokens"))
  }

  /** Per-sequence roll-up of a packing: document count, total tokens, and
    * the fill fraction against capacity (> 1 marks an overflowed sequence
    * whose tail document straddles the boundary). */
  def sequenceStats(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      .withColumn("fill_frac", col("tokens").cast("double") / capacity)
}
