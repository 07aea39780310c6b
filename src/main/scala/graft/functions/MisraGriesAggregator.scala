package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra–Gries frequent-items summary as a typed `Aggregator`: a bounded
 * map of at most `s` counters that is guaranteed to contain EVERY item
 * whose true frequency exceeds n/(s+1) — the classic deterministic
 * heavy-hitter sketch, and (per Agarwal et al., "Mergeable Summaries",
 * PODS'12) fully mergeable: combining two summaries and trimming back to
 * `s` counters preserves the guarantee over the combined stream.
 *
 * Used as the CANDIDATE pass of [[graft.operators.Sketches.exactHeavyHitters]]:
 * the summary bounds per-partition state to s counters (vs a
 * full-vocabulary hash aggregate), and a second exact pass over just the
 * ≤ s candidates makes the final answer exact. Candidate-set contents
 * beyond the guaranteed heavy hitters may vary with merge order — that
 * nondeterminism is erased by the exact second pass.
 */
case class MisraGriesAggregator(s: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(s > 0, "MisraGriesAggregator: s must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) buf // null keys would NPE the sorted finish
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < s => buf.updated(item, 1L)
      case None =>
        // Decrement-all step: drop zeros (the item itself is absorbed).
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (combined.size <= s) combined
    else {
      // Trim to s counters: subtract the (s+1)-th largest count from all
      // (the mergeable-summaries offset step), keep strictly positive.
      val cut = combined.values.toArray.sortBy(-_).apply(s)
      combined.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
