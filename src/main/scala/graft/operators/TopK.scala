package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
import org.apache.spark.sql.graftbridge.GraftSqlBridge

import graft.plans.{GraftTopKStrategy, TopKPerKey}

/**
 * User API for the [[graft.plans.TopKPerKey]] custom operator: top-k rows
 * per key under a sort order, heap-bounded instead of sort-everything.
 * See the plan node's doc for the execution shape.
 */
object TopK {

  /** Installs the planner strategy into `spark` once (idempotent). The
    * `graft.GraftExtensions` conf path installs it cluster-wide; this
    * hook covers sessions created without the extension. */
  private def ensureStrategy(df: DataFrame): Unit = {
    val em = GraftSqlBridge.experimentalMethods(df.sparkSession)
    if (!em.extraStrategies.contains(GraftTopKStrategy))
      em.extraStrategies = GraftTopKStrategy +: em.extraStrategies
  }

  /**
   * Top `k` rows per `keys` group, smallest-first under `order` (use
   * `col.desc` for largest-first). Pass a TOTAL order — ties at the k
   * boundary are kept arbitrarily otherwise, same as `row_number`.
   * Output rows come grouped per key in sort order.
   *
   * `maxPartialKeys` caps the map-side pass's tracked keys per input
   * partition (state O(cap x k)); beyond it rows pass through to the
   * exact final pass untrimmed — see [[graft.plans.TopKPerKey]] for the
   * memory contract. Near-unique key columns should prefer the window
   * form: their top-k-per-key output is input-sized by definition.
   */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int,
      maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty, "topKPerKey: keys and order required")
    ensureStrategy(df)
    // Resolve the Columns to CATALYST expressions by analyzing throwaway
    // sort/select plans over the same child — the analyzer converts the
    // Column-API nodes and binds attributes to the child's exprIds (the
    // raw bridge conversion yields lazy non-serializable wrappers).
    val child = df.queryExecution.analyzed
    val sortExprs = df.sort(order: _*).queryExecution.analyzed match {
      case Sort(so, _, _, _) => so
      case other => throw new IllegalStateException(
        s"topKPerKey: unexpected sort plan ${other.nodeName}")
    }
    val keyExprs = df.select(keys: _*).queryExecution.analyzed match {
      case Project(ps, _) =>
        ps.map { case a: Alias => a.child; case e => e }
      case other => throw new IllegalStateException(
        s"topKPerKey: unexpected key plan ${other.nodeName}")
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKey(keyExprs, sortExprs, k, child, maxPartialKeys))
  }
}
