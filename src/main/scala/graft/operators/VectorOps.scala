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

  /** Exact BIGINT dot product of two `array<int>` SQ8 code columns —
    * native codegen expression (graft.functions.IntVecDotLong). Integer
    * arithmetic end-to-end: order-independent, bit-replayable on any
    * engine, no IEEE contract needed. */
  def dotInt(x: Column, y: Column): Column =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.IntVecDotLong(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(x),
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(y)))

  /** FloatVecDot folded over only the first `p` elements (the Matryoshka
    * coarse pass); same sequential-double-fold contract, so the DuckDB
    * replay is duckDot over list_slice(v, 1, p). */
  def dotPrefix(x: Column, y: Column, p: Int): Column =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.FloatVecDotPrefix(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(x),
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(y), p))

  /** Prefix-cosine over the first `p` dims. */
  def cosinePrefix(a: Column, b: Column, p: Int): Column =
    dotPrefix(a, b, p) /
      (sqrt(dotPrefix(a, a, p)) * sqrt(dotPrefix(b, b, p)))

  /** max|x_i| in double precision — the per-vector SQ8 scale's numerator
    * (scale = maxAbs/127). No accumulation, so the HOF form is already
    * exact and engine-replayable (DuckDB: list_max(list_transform(v,
    * x -> abs(CAST(x AS DOUBLE))))). */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-vector symmetric int8 scalar quantization: q = floor(x * 127 /
    * max|x| + 0.5). The exact arithmetic order is the contract — the
    * DuckDB oracle replays it term-for-term (floor(+0.5) instead of
    * round() dodges the engines' different half-way conventions). Native
    * codegen expression (graft.functions.FloatVecQuantizeInt8): one pass
    * for the scale, one for the elements, fail-fast on zero vectors. */
  def quantizeInt8(vec: Column): Column =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.FloatVecQuantizeInt8(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(vec)))

  /** HOF form of `quantizeInt8` — test oracle only (re-evaluates the max
    * per element; NaN on zero vectors). */
  def quantizeInt8Hof(vec: Column): Column = {
    val m = array_max(transform(vec, x => abs(x.cast("double"))))
    transform(vec, x =>
      floor(x.cast("double") * 127.0 / m + 0.5).cast("int"))
  }

  /**
   * ANALYZE for embeddings: per-DIMENSION count, exact fixed-point sum
   * (floor(x · 2^20) — a float's 24-bit mantissa times 2^20 is exact in
   * double, and BIGINT sums are order-independent), min/max, and the
   * rounded mean. The drift/health read before trusting an embedding
   * column: a dimension whose mean wandered or whose range collapsed
   * flags a bad encoder batch or a normalization bug.
   *
   * Scale shape: one posexplode (rows × dim — the honest cost of
   * per-dimension stats) straight into a dim-keyed aggregate with
   * map-side partials; output is dim-sized. At 100 TB, sample the rows
   * first — the stats are estimates of the same moments either way.
   */
  def dimensionStats(vecs: org.apache.spark.sql.DataFrame,
      vecCol: String): org.apache.spark.sql.DataFrame = {
    val scaled = floor(col("x").cast("double") * lit(1048576.0)).cast("long")
    vecs.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), scaled.as("xs"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum(col("xs")).as("sum_scaled"),
        min(col("xs")).as("min_scaled"), max(col("xs")).as("max_scaled"))
      .withColumn("mean", round(col("sum_scaled").cast("double") /
        (col("n") * lit(1048576L)).cast("double"), 6))
  }
}
