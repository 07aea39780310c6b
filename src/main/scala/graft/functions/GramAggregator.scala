package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Accumulated second-moment state for PCA: exact scaled-integer sums of
  * the upper-triangle gram matrix, the per-dimension sums, and the row
  * count. Longs only — merge order cannot change a bit. */
case class GramState(gram: Array[Long], sums: Array[Long], n: Long)

/**
 * Gram-matrix accumulator for in-engine PCA: per input vector adds
 * floor(x_i * x_j * 2^20) to the upper-triangle cell (i, j) and
 * floor(x_i * 2^20) to the dimension sum — a BOUNDED buffer of
 * dim*(dim+1)/2 + dim longs per partition, merged by addition.
 *
 * This is the 100 TB shape for covariance estimation: the alternative
 * (posexplode into (i, j, x_i*x_j) rows) multiplies the corpus by dim^2
 * before the aggregate; here nothing is exploded and only ~17 KB of
 * state per partition moves (dim = 64).
 */
case class GramAggregator(dim: Int)
    extends Aggregator[Seq[Float], GramState, GramState] {
  require(dim > 0, "GramAggregator: dim must be positive")

  private val Scale = 1048576.0
  private def tri = dim * (dim + 1) / 2

  override def zero: GramState =
    GramState(new Array[Long](tri), new Array[Long](dim), 0L)

  override def reduce(b: GramState, v: Seq[Float]): GramState = {
    require(v.length == dim, s"GramAggregator: expected dim=$dim, got ${v.length}")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) { x(i) = v(i).toDouble; i += 1 }
    var k = 0
    i = 0
    while (i < dim) {
      b.sums(i) += math.floor(x(i) * Scale).toLong
      var j = i
      while (j < dim) {
        b.gram(k) += math.floor(x(i) * x(j) * Scale).toLong
        k += 1
        j += 1
      }
      i += 1
    }
    GramState(b.gram, b.sums, b.n + 1)
  }

  override def merge(a: GramState, b: GramState): GramState = {
    var k = 0
    while (k < a.gram.length) { a.gram(k) += b.gram(k); k += 1 }
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    GramState(a.gram, a.sums, a.n + b.n)
  }

  override def finish(s: GramState): GramState = s

  override def bufferEncoder: Encoder[GramState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[GramState]()

  override def outputEncoder: Encoder[GramState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[GramState]()
}
