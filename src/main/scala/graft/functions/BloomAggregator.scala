package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/**
 * `bloom_agg(key)` — typed UDAF building a serialized Bloom filter over a
 * BIGINT key column per group. The buffer is a live BloomFilter object
 * (object-hash aggregation keeps it deserialized between rows; it only
 * serializes at partial/final shuffle boundaries), the output the
 * portable `writeTo` byte form that [[BloomMightContainLong]] and the
 * file-skipping index consume.
 *
 * Insert-order independence: a Bloom filter is a bitwise OR of per-key
 * bit patterns, so partial-aggregate merge order cannot change the final
 * bits — the same mergeability argument as the HLL/KLL/theta sketches.
 */
case class BloomAggregator(expectedItems: Long, fpp: Double)
    extends Aggregator[java.lang.Long, BloomFilter, Array[Byte]] {
  require(expectedItems > 0 && fpp > 0 && fpp < 1,
    s"bloom_agg: bad sizing items=$expectedItems fpp=$fpp")

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(buf: BloomFilter, v: java.lang.Long): BloomFilter = {
    if (v != null) buf.putLong(v)
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def finish(buf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
