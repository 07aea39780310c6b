package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * `topk_agg(value)` — typed UDAF keeping the k largest doubles per group
 * (ascending-sorted output array). A custom `Aggregator` (SURVEY.md §7.3):
 * the buffer is a bounded sorted array, so a group of any size aggregates
 * in O(n log k) memory-bounded — the scalable alternative to a full
 * per-group window sort when only the top k values are needed.
 * Registered with `functions.udaf` via [[RandgenFunctions.registerAll]]'s
 * sibling [[TopKAggregator.register]].
 */
case class TopKAggregator(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.empty

  override def reduce(buf: Array[Double], v: Double): Array[Double] = insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  /** Keeps `buf` ascending-sorted with at most k elements. */
  private def insert(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length < k) {
      val out = buf :+ v
      java.util.Arrays.sort(out)
      out
    } else if (v > buf(0)) {
      val out = buf.clone()
      out(0) = v
      java.util.Arrays.sort(out)
      out
    } else buf
  }
}

object TopKAggregator {
  /** Registers `topk<k>_agg` (e.g. topk5_agg) as a SQL-callable UDAF. */
  def register(spark: org.apache.spark.sql.SparkSession, k: Int): Unit =
    spark.udf.register(s"topk${k}_agg",
      org.apache.spark.sql.functions.udaf(TopKAggregator(k)))
}
