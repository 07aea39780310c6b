package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GraftRandom

/**
 * `graftgen` — a DataSource V2 *read* connector that generates random rows
 * natively at the scan, the reference's purpose ("a random data generator
 * for a query engine") expressed as a Spark source instead of scalar
 * functions:
 *
 * {{{
 * spark.read.format("graftgen")
 *   .option("rows", 1000000).option("partitions", 32).option("seed", 42)
 *   .option("columns", "id,qty,price,seg")
 *   .option("gen.id", "seq")
 *   .option("gen.qty", "int64_uniform:1:50")
 *   .option("gen.price", "float64_normal:100:15")
 *   .option("gen.seg", "choice:A|B|C")
 *   .load()
 * }}}
 *
 * Scale design: `planInputPartitions` splits the row range evenly into
 * `partitions` independent splits; each split's reader draws from its own
 * `GraftRandom(colSeed, partitionIndex)` stream, so generation is
 * embarrassingly parallel, shuffle-free, deterministic per (seed,
 * partition layout), and stable under task retry — 10^12 rows is just
 * more partitions. No data ever flows from the driver.
 *
 * Spec mini-language (option `gen.<col>`): `seq` | `uuid` |
 * `int64_uniform:lo:hi` | `float64_uniform:lo:hi` |
 * `float64_normal:mean:std` | `float64_exponential:lambda` |
 * `bool_bernoulli:p` | `string_alphanum:lo:hi` | `choice:a|b|c`.
 */
class GenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSpec.schemaOf(GenSpec.parse(options.asCaseSensitiveMap().asScala.toMap))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GenTable(GenSpec.parse(properties.asScala.toMap))
  override def supportsExternalMetadata(): Boolean = false
}

/** One column's parsed generator spec. */
case class ColSpec(name: String, kind: String, args: Array[String]) {
  def dataType: DataType = kind match {
    case "seq" | "int64_uniform" => LongType
    case "float64_uniform" | "float64_normal" | "float64_exponential" => DoubleType
    case "bool_bernoulli" => BooleanType
    case "uuid" | "string_alphanum" | "choice" => StringType
    case other => throw new IllegalArgumentException(
      s"graftgen: unknown generator kind '$other' for column $name")
  }
}

/** rowsPerBatch/maxBatches configure the streaming (micro-batch) path:
  * each batch emits rowsPerBatch rows; after maxBatches the offset stops
  * advancing (so processAllAvailable terminates; -1 = unbounded). */
case class GenSpec(rows: Long, partitions: Int, seed: Long, cols: Seq[ColSpec],
    rowsPerBatch: Long = 0L, maxBatches: Long = -1L)

object GenSpec {
  def parse(opts: Map[String, String]): GenSpec = {
    val ci = opts.map { case (k, v) => k.toLowerCase -> v }
    val rows = ci.getOrElse("rows",
      throw new IllegalArgumentException("graftgen: option 'rows' is required")).toLong
    val partitions = ci.getOrElse("partitions", "4").toInt
    val seed = ci.getOrElse("seed", "0").toLong
    val rowsPerBatch = ci.getOrElse("rowsperbatch", "0").toLong
    val maxBatches = ci.getOrElse("maxbatches", "-1").toLong
    val colNames = ci.getOrElse("columns",
      throw new IllegalArgumentException(
        "graftgen: option 'columns' (ordered, comma-separated) is required"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(rows >= 0 && partitions > 0, "graftgen: rows >= 0, partitions > 0")
    val cols = colNames.toSeq.map { n =>
      val spec = ci.getOrElse(s"gen.${n.toLowerCase}",
        throw new IllegalArgumentException(s"graftgen: missing option gen.$n"))
      val parts = spec.split(":", -1)
      ColSpec(n, parts.head, parts.tail)
    }
    GenSpec(rows, partitions, seed, cols, rowsPerBatch, maxBatches)
  }

  def schemaOf(spec: GenSpec): StructType =
    StructType(spec.cols.map(c => StructField(c.name, c.dataType, nullable = false)))
}

class GenTable(spec: GenSpec) extends Table with SupportsRead {
  override def name(): String = s"graftgen(${spec.rows})"
  override def schema(): StructType = GenSpec.schemaOf(spec)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  /** Splits [0, total) rows evenly; `rowBase` offsets streaming batches so
    * row ids stay globally unique, and the per-split seed mix keeps each
    * planned split reproducible under task retry. */
  private def splits(total: Long, rowBase: Long): Array[InputPartition] = {
    val per = total / spec.partitions
    val rem = total % spec.partitions
    var start = rowBase
    Array.tabulate[InputPartition](spec.partitions) { i =>
      val n = per + (if (i < rem) 1 else 0)
      val p = GenInputPartition(i, start, start + n)
      start += n
      p
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = GenSpec.schemaOf(spec)
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        splits(spec.rows, 0L)
      override def createReaderFactory(): PartitionReaderFactory =
        GenReaderFactory(spec)

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream with SupportsAdmissionControl {
          require(spec.rowsPerBatch > 0,
            "graftgen streaming requires option rowsPerBatch > 0")
          // Highest batch index this instance knows about. Restart safety
          // hinges on SupportsAdmissionControl: Spark hands the restored
          // start offset to latestOffset(start, limit) BEFORE any batch
          // is planned, so a fresh instance re-learns the checkpointed
          // position and can never advertise an offset below a committed
          // batch (a plain MicroBatchStream's no-arg latestOffset is
          // polled before deserializeOffset and would regress, silently
          // re-planning already-committed batches). The maxBatches cap
          // therefore counts total batches across restarts.
          private var seen = 0L
          private def observe(n: Long): Unit = { seen = math.max(seen, n) }
          private def advance(): Offset = {
            val next = seen + 1
            seen = if (spec.maxBatches >= 0) math.min(next, spec.maxBatches)
              else next
            GenOffset(seen)
          }
          override def initialOffset(): Offset = GenOffset(0L)
          override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
          override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
            observe(start.asInstanceOf[GenOffset].n)
            advance()
          }
          override def latestOffset(): Offset =
            throw new UnsupportedOperationException(
              "graftgen reports offsets via SupportsAdmissionControl")
          override def deserializeOffset(json: String): Offset = {
            val n = json.toLong
            observe(n)
            GenOffset(n)
          }
          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
            val s = start.asInstanceOf[GenOffset].n
            val e = end.asInstanceOf[GenOffset].n
            observe(e)
            if (e <= s) Array.empty
            else splits((e - s) * spec.rowsPerBatch, s * spec.rowsPerBatch)
          }
          override def createReaderFactory(): PartitionReaderFactory =
            GenReaderFactory(spec)
          override def commit(end: Offset): Unit =
            observe(end.asInstanceOf[GenOffset].n)
          override def stop(): Unit = {}
        }
    }
}

case class GenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

case class GenInputPartition(index: Int, start: Long, end: Long)
  extends InputPartition

case class GenReaderFactory(spec: GenSpec) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenInputPartition]
    new PartitionReader[InternalRow] {
      // One decorrelated stream per column, seeded by (seed, col, split
      // start row) — the start-row mix keeps every planned split (incl.
      // successive streaming batches that reuse partition indexes)
      // distinct and reproducible under task retry.
      private val rngs = spec.cols.indices.map(i =>
        new GraftRandom((spec.seed + 0x9E37L * (i + 1)) ^
          (p.start * 0x2545F4914F6CDD1DL), p.index)).toArray
      private var row = p.start
      private val values = new Array[Any](spec.cols.length)

      // Each spec is resolved ONCE here — bounds parsed, choice lists
      // pre-split — into a rowId => value closure, so the innermost loop
      // of a source meant for 10^12-row generation does zero string
      // parsing and zero allocation beyond the produced value itself.
      private val gens: Array[Long => Any] =
        spec.cols.indices.map { i =>
          val c = spec.cols(i)
          val rng = rngs(i)
          c.kind match {
            case "seq" => (rowId: Long) => rowId
            case "int64_uniform" =>
              val (lo, hi) = (c.args(0).toLong, c.args(1).toLong)
              (_: Long) => rng.nextLongInclusive(lo, hi)
            case "float64_uniform" =>
              val (lo, hi) = (c.args(0).toDouble, c.args(1).toDouble)
              (_: Long) => rng.nextDoubleUniform(lo, hi)
            case "float64_normal" =>
              val (mean, std) = (c.args(0).toDouble, c.args(1).toDouble)
              (_: Long) => rng.nextGaussian(mean, std)
            case "float64_exponential" =>
              val lambda = c.args(0).toDouble
              (_: Long) => rng.nextExponential(lambda)
            case "bool_bernoulli" =>
              val pTrue = c.args(0).toDouble
              (_: Long) => rng.nextBernoulli(pTrue)
            case "uuid" =>
              (_: Long) => UTF8String.fromString(rng.nextUuidString())
            case "string_alphanum" =>
              val (lo, hi) = (c.args(0).toLong, c.args(1).toLong)
              (_: Long) => UTF8String.fromString(rng.nextAlphanumeric(lo, hi))
            case "choice" =>
              // Re-join on ':' — choice values may legitimately contain it.
              val vs = c.args.mkString(":").split('|')
                .map(UTF8String.fromString)
              val n = vs.length.toLong - 1
              (_: Long) => vs(rng.nextLongInclusive(0, n).toInt)
          }
        }.toArray

      override def next(): Boolean = {
        if (row >= p.end) return false
        var i = 0
        while (i < gens.length) {
          values(i) = gens(i)(row)
          i += 1
        }
        row += 1
        true
      }

      override def get(): InternalRow = InternalRow.fromSeq(values.toIndexedSeq)
      override def close(): Unit = {}
    }
  }
}
