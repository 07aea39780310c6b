package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/**
 * Whole-operator custom plan (SURVEY.md §2 preference (c)): top-k rows
 * per key WITHOUT sorting anything — the "latest k versions per key" /
 * "best k candidates per query" staple that Spark only expresses as
 * `row_number() OVER (PARTITION BY ... ORDER BY ...) <= k`, which SORTS
 * every partition end to end (the WindowExec path is exchange + full
 * per-partition sort + rank + filter: O(n log n) compute and the whole
 * input materialized per sort spill).
 *
 * This operator keeps a bounded HEAP of k rows per key instead:
 *
 *  - a PARTIAL exec below the exchange trims each input partition to at
 *    most k rows per key — the map-side-combine of top-k, so the shuffle
 *    moves at most partitions x keys x k rows, not the input;
 *  - a FINAL exec above a `ClusteredDistribution(keys)` exchange merges
 *    the survivors, again into k-heaps, and emits each key's rows in
 *    sort order.
 *
 * Memory contract: the partial pass holds O(tracked-keys x k) rows; the
 * number of tracked keys per input partition is CAPPED at
 * `maxPartialKeys` — when a partition sees more distinct keys than
 * that, rows of untracked keys PASS THROUGH to the exchange untrimmed
 * (correct, since the final pass recomputes the exact top-k; only the
 * map-side-combine benefit degrades, exactly like a hash aggregate
 * falling back to sort when its hash map fills). The FINAL pass holds
 * one k-heap per key it owns — that is the OUTPUT's own size
 * (keys x k); a caller whose key column is near-unique should use the
 * window form instead, because then top-k-per-key IS the input.
 *
 * Determinism contract: rows TIED at the k boundary are kept arbitrarily
 * — pass a TOTAL sort order (break ties on a unique id) for
 * reproducible output, exactly as with `row_number`.
 *
 * Wiring: [[TopKPerKey]] (logical, resolved-attribute expressions) is
 * planned by [[GraftTopKStrategy]] into the partial+final
 * [[TopKPerKeyExec]] pair; [[graft.operators.TopK.perKey]] is the
 * user API and installs the strategy into the session on first use
 * (also injected by `graft.GraftExtensions`).
 */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys) extends UnaryNode {
  require(k > 0, "TopKPerKey: k must be > 0")
  require(maxPartialKeys > 0, "TopKPerKey: maxPartialKeys must be > 0")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

object TopKPerKey {
  /** Partial-pass tracked-key cap: 64k keys x k rows of heap state per
    * input partition is a few hundred MB at worst for typical k — above
    * it the map-side trim stops paying for itself anyway. */
  val DefaultMaxPartialKeys: Int = 1 << 16
}

/** Plans the logical node as partial-below-exchange + final-above. */
object GraftTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, maxPartialKeys) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child), maxPartialKeys)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan,
    maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "GraftTopKPerKeyPartial" else "GraftTopKPerKeyFinal"

  /** The final exec needs all rows of a key together; the partial one
    * runs on whatever the child produced (that asymmetry is what lets
    * EnsureRequirements place the exchange BETWEEN the two). */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val outAttrs = child.output
    val partialLocal = partial
    val keyCapLocal = if (partial) maxPartialKeys else Int.MaxValue
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, outAttrs)
      // Codegen'd row comparator for the sort order; the heap keeps the
      // k SMALLEST rows under it (ordering.lt = "ranks before").
      val cmp = GenerateOrdering.generate(orderLocal, outAttrs)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      // Rows of keys beyond the partial pass's tracked-key cap stream
      // straight through (lazily, before the heap drain below) — the
      // exchange carries them untrimmed and the final pass, which never
      // caps (it must own every key it receives), produces the exact
      // answer. State stays O(cap x k) no matter the key cardinality.
      val passedThrough = iter.flatMap { row =>
        val key = keyProj(row) // reused buffer — copy only on first sight
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kLocal) h.enqueue(row.copy())
            else if (cmp.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
            None
          case None if heaps.size < keyCapLocal =>
            val h = mutable.PriorityQueue.empty[InternalRow](cmp) // head = worst kept
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
            None
          case None =>
            assert(partialLocal, "final top-k pass must track every key")
            Some(row.copy())
        }
      }
      passedThrough ++ heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // worst-first dequeue -> sort order
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}
