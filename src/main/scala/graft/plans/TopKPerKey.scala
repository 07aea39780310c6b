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
 * Memory is O(distinct-keys-per-partition x k) — bounded and
 * spill-free where the window form is input-sized. At 100 TB with a
 * selective k this is the difference between shuffling the table and
 * shuffling the answer.
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
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "TopKPerKey: k must be > 0")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

/** Plans the logical node as partial-below-exchange + final-above. */
object GraftTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

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
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, outAttrs)
      // Codegen'd row comparator for the sort order; the heap keeps the
      // k SMALLEST rows under it (ordering.lt = "ranks before").
      val cmp = GenerateOrdering.generate(orderLocal, outAttrs)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer — copy only on first sight
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](cmp) // head = worst kept
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // worst-first dequeue -> sort order
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}
