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

  /**
   * FIRST-FIT-DECREASING packing within the same deterministic shards —
   * the pad-minimizing upgrade of [[packSequences]]: docs sort by
   * (tokens desc, id) inside their shard and each goes to the FIRST bin
   * it fits; no bin ever exceeds capacity, except a single-doc bin for a
   * document longer than capacity (which no packing can split). FFD is
   * the classic 11/9·OPT bin-packing heuristic, so pad mass drops vs the
   * contiguous fill (PackingSpec proves it on the fixture) at the price
   * of losing doc contiguity within a shard.
   *
   * Determinism: the order is total, the fold is sequential per shard —
   * same output under any input partitioning. Scale shape: only
   * (doc_id, n_tokens) METADATA rows shuffle (one exchange keyed by
   * shard); each shard's fold holds its own doc-count × 16 bytes plus
   * one fill slot per open bin. Shard count scales with the cluster,
   * exactly like the window form. Sequential state per shard is why
   * this gate is property-checked, not SQL-replayed (the bin-fill list
   * has no fixed-width SQL encoding).
   *
   * Output: (doc_id, shard, seq_id, offset_tokens, n_tokens) — seq_id
   * globally unique via bin_in_shard * shards + shard, offset the fill
   * level where the doc landed.
   */
  def packSequencesFfd(docs: DataFrame, idCol: String, tokenCount: Column,
      capacity: Long, shards: Int = 64): DataFrame = {
    require(capacity > 0, "packSequencesFfd: capacity must be positive")
    require(shards > 0, "packSequencesFfd: shards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        tokenCount.cast("long").as("n_tokens"),
        pmod(col(idCol), lit(shards.toLong)).as("shard"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val ds = it.toArray.sortBy { case (id, nt, _) => (-nt, id) }
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.iterator.map { case (id, nt, _) =>
          var b = 0
          while (b < fills.length && fills(b) + nt > capacity) b += 1
          val off = if (b < fills.length) fills(b) else 0L
          if (b < fills.length) fills(b) += nt else fills += nt
          (id, shard, b.toLong * shards + shard, off, nt)
        }
      }
      .toDF("doc_id", "shard", "seq_id", "offset_tokens", "n_tokens")
  }
}
