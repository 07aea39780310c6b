package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{RandgenFunctions, TextFunctions}

/**
 * Cluster install path (SURVEY.md §3 EP1): makes the whole `randgen_*`
 * family available in every session via
 * `--conf spark.sql.extensions=graft.GraftExtensions`, the idiomatic way
 * to ship a function library to a cluster where user code never calls
 * `registerAll` explicitly. Functions land in the session registry exactly
 * as the reference's `add_udfs(&mut SessionContext)` does
 * (`/root/reference/src/lib.rs:8-10`).
 *
 * Also installs the [[graft.plans.RangeJoinRewrite]] optimizer rule
 * (inactive until `spark.graft.rangeJoin.binWidth` is set).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    (RandgenFunctions.all ++ TextFunctions.all).foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    extensions.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    extensions.injectPlannerStrategy(_ => graft.plans.GraftTopKStrategy)
  }
}
