package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * `bloom_might_contain_long(key)` — membership probe of a pre-built
 * Bloom filter over a BIGINT key column, as a codegen'd Catalyst
 * expression (SURVEY.md §7.3 preference (b)).
 *
 * The serialized filter travels inside the expression (task closures get
 * one copy per executor, like a broadcast variable); it is deserialized
 * ONCE per JVM via the transient lazy val, and whole-stage codegen probes
 * it through a pinned object reference — no per-row deserialization, no
 * UDF boxing. This is the row-level runtime-filter building block that
 * `Joins.bloomPrefilteredJoin` pushes below a shuffle join's exchange
 * (the same shape Spark's own InjectRuntimeFilter produces).
 *
 * Contract: never a false negative (every inserted key probes true);
 * false positives at the filter's configured fpp are acceptable because
 * the downstream join re-verifies equality. Null keys probe null.
 */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(key: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, key =>
      s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-JVM cache of deserialized Bloom filters keyed by broadcast id —
  * the executor-side half of [[BloomMightContainLongBcast]]. */
object BloomOps {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]()

  def filterFor(b: org.apache.spark.broadcast.Broadcast[Array[Byte]])
      : BloomFilter =
    cache.computeIfAbsent(b.id,
      _ => BloomFilter.readFrom(new ByteArrayInputStream(b.value)))
}

/**
 * Broadcast-backed variant of [[BloomMightContainLong]] for LARGE
 * filters: the serialized bits ship as a Spark broadcast variable (one
 * torrent-distributed copy per executor) instead of riding inside the
 * serialized plan (one copy per task closure, re-shipped with every
 * stage that references the expression). At a 100M-key dimension and 1%
 * fpp the bits are ~115 MB — plan-embedding that is a driver-memory and
 * task-launch hazard; a broadcast is the intended mechanism.
 *
 * The generated code resolves the filter ONCE per operator instance
 * (mutable-state init, a per-JVM cache lookup keyed by broadcast id) —
 * the per-row probe is the same pinned-reference call as the inline
 * variant, still inside whole-stage codegen.
 */
case class BloomMightContainLongBcast(child: Expression,
    filterBc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long_bcast"

  @transient private lazy val filter: BloomFilter = BloomOps.filterFor(filterBc)

  override protected def nullSafeEval(key: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", filterBc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val bfVar = ctx.addMutableState(classOf[BloomFilter].getName, "graftBf",
      v => s"$v = graft.functions.BloomOps.filterFor(" +
        s"(org.apache.spark.broadcast.Broadcast) $bcRef);")
    nullSafeCodeGen(ctx, ev, key =>
      s"${ev.value} = $bfVar.mightContainLong($key);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `bloom_bytes_contains_any(filterBytes)` — probes a PER-ROW serialized
  * Bloom filter column against a fixed key set: true iff any key might be
  * contained. The file-skipping index probe ([[graft.operators.Layout
  * .prunedPointScan]]): the index row carries its file's filter bytes, so
  * the probe runs WHERE the index lives — only matching file names travel
  * to the driver, never the filters (at 100 TB, files x filterBytes is
  * driver-fatal; file names are not). One deserialization per row — the
  * row count is the FILE count, metadata-scale. Eval-only: this runs over
  * index tables, never in a data-path hot loop, so codegen would buy
  * nothing (Spark falls back to interpreted eval transparently).
  */
case class BloomBytesContainsAny(child: Expression, keys: Array[Long])
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(keys.nonEmpty, "bloom_bytes_contains_any: empty key set")

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_bytes_contains_any"

  override protected def nullSafeEval(bytes: Any): Any = {
    val bf = BloomFilter.readFrom(
      new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
    keys.exists(bf.mightContainLong)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
