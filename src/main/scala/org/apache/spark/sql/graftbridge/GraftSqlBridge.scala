package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into Spark's `private[sql]` surface, the standard pattern
 * for Spark extension libraries: Column <-> Catalyst Expression conversion
 * and session function-registry access. Everything else in this project
 * lives in the `graft` namespace; keep this file as small as possible.
 */
object GraftSqlBridge {

  /** Wraps a Catalyst expression as a user-facing Column (classic session). */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Extracts the Catalyst expression backing a Column. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** The session's function registry (for temp-function registration). */
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  /** Wraps a logical plan as a DataFrame (for custom LogicalPlan nodes). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session's experimental-methods hook (runtime strategy install). */
  def experimentalMethods(spark: SparkSession)
      : org.apache.spark.sql.ExperimentalMethods =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.experimentalMethods
}
