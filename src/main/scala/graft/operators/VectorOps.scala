package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math over `array<float>` embedding columns, computed with
 * built-in higher-order functions (codegen'd, no UDFs).
 *
 * Determinism contract: every sum is a sequential left-to-right fold in
 * double precision (`aggregate` with 0.0 init), which matches DuckDB's
 * `list_reduce` fold — so cosine scores are bit-identical across engines
 * and ORDER BY score ties break the same way.
 */
object VectorOps {

  /** Sequential-fold dot product in double precision — a native codegen'd
    * expression (graft.functions.FloatVecDot); bit-identical to the
    * `aggregate(zip_with(...))` HOF form it replaced, ~10x faster on
    * all-pairs workloads. */
  def dot(x: Column, y: Column): Column =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.FloatVecDot(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(x),
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(y)))

  def norm(x: Column): Column = sqrt(dot(x, x))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
