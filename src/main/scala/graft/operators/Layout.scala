package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/**
 * Data-layout clustering (SURVEY.md §8.1 — the write-side pruning lever):
 * Z-order (Morton) interleaving maps two sort keys onto one
 * space-filling-curve code so that sorting by the code co-locates rows
 * close in BOTH dimensions. Files written in that order carry tight
 * per-file min/max ranges on both columns, so a scan filtered on either
 * key (or a box on both) prunes most files — the effect multi-column
 * lexicographic sort only gives the leading column.
 *
 * At 100 TB this is a one-time write-side investment (one range
 * repartition + in-partition sort) that every subsequent selective read
 * collects on. `zorderWrite` is the canonical recipe:
 * repartitionByRange(code) keeps the curve contiguous per file,
 * sortWithinPartitions keeps it contiguous within each file.
 */
object Layout {

  /** 2^bits per dimension; 21 bits x 2 fits comfortably in a long. */
  val MaxBits = 21

  /** Morton (Z-order) code of two non-negative keys, `bits` bits each:
    * even result bits from `a`, odd from `b`. Built from shift/mask
    * arithmetic only, so the DuckDB oracle replays it bit-for-bit (see
    * [[duckSql]]). */
  def interleaveBits(a: Column, b: Column, bits: Int = MaxBits): Column = {
    require(bits > 0 && bits <= MaxBits, s"bits must be in [1, $MaxBits]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce((x, y) => GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.BitwiseOr(
        GraftSqlBridge.expression(x), GraftSqlBridge.expression(y))))
  }

  /** DuckDB replay of [[interleaveBits]] over column names. */
  def duckSql(a: String, b: String, bits: Int = MaxBits): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Writes `df` parquet files clustered along the (a, b) Z-curve.
    *
    * The keys are first left-shifted so both occupy the same `bits`-wide
    * window — WITHOUT this, a key with a wider value range owns all the
    * curve's top bits and the "Z-order" silently degenerates to a plain
    * sort on that key (the narrow key's per-file spans stay global). The
    * alignment shifts come from one cheap max() aggregate — the write-side
    * analogue of the column stats a real table already has. */
  def zorderWrite(df: DataFrame, path: String, a: String, b: String,
      numFiles: Int, bits: Int = MaxBits): Unit = {
    val stats = df.agg(max(col(a)).cast("long"), max(col(b)).cast("long"),
      min(col(a)).cast("long"), min(col(b)).cast("long")).collect()(0)
    require(!stats.isNullAt(0) && !stats.isNullAt(1),
      s"zorderWrite: input has no non-null ($a, $b) rows to cluster")
    require(stats.getLong(2) >= 0L && stats.getLong(3) >= 0L,
      s"zorderWrite: keys must be non-negative (min $a=${stats.getLong(2)}, " +
        s"min $b=${stats.getLong(3)}) — two's-complement bits interleave " +
        "meaninglessly; shift keys into [0, 2^bits) first")
    def width(m: Long): Int = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(m))
    val (wa, wb) = (width(stats.getLong(0)), width(stats.getLong(1)))
    require(wa <= bits && wb <= bits,
      s"zorderWrite: key widths ($wa, $wb) exceed $bits bits")
    val an = shiftleft(col(a), bits - wa)
    val bn = shiftleft(col(b), bits - wb)
    df.withColumn("__z", interleaveBits(an, bn, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-curve index of two non-negative keys (order-`bits` curve,
    * one codegen call — [[graft.functions.HilbertIndex]]). The Z-curve's
    * locality upgrade: consecutive curve positions are always
    * grid-adjacent, so code-contiguous files never straddle a quadrant
    * seam the way Morton files do. */
  def hilbertIndex(a: Column, b: Column, bits: Int = MaxBits): Column =
    GraftSqlBridge.column(graft.functions.HilbertIndex(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), bits))

  /** [[zorderWrite]] with the Hilbert curve: same key alignment, same
    * range-repartition + in-partition sort recipe, strictly better
    * adjacency at the same write cost. */
  def hilbertWrite(df: DataFrame, path: String, a: String, b: String,
      numFiles: Int, bits: Int = MaxBits): Unit = {
    val stats = df.agg(max(col(a)).cast("long"), max(col(b)).cast("long"),
      min(col(a)).cast("long"), min(col(b)).cast("long")).collect()(0)
    require(!stats.isNullAt(0) && !stats.isNullAt(1),
      s"hilbertWrite: input has no non-null ($a, $b) rows to cluster")
    require(stats.getLong(2) >= 0L && stats.getLong(3) >= 0L,
      s"hilbertWrite: keys must be non-negative (min $a=${stats.getLong(2)}, " +
        s"min $b=${stats.getLong(3)})")
    def width(m: Long): Int = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(m))
    val (wa, wb) = (width(stats.getLong(0)), width(stats.getLong(1)))
    require(wa <= bits && wb <= bits,
      s"hilbertWrite: key widths ($wa, $wb) exceed $bits bits")
    val an = shiftleft(col(a), bits - wa)
    val bn = shiftleft(col(b), bits - wb)
    df.withColumn("__h", hilbertIndex(an, bn, bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Per-file min/max statistics index over a parquet directory — the
   * table-format data-skipping primitive (Delta/Iceberg keep exactly this
   * in their metadata; here it is materialized as a DataFrame so the
   * pruning is observable and testable).
   *
   * One linear scan of the key column grouped by `input_file_name()`:
   * the index has one row per FILE, so at 100 TB it is ~N_files rows
   * (metadata-sized), cheap to persist next to the table and rebuild
   * incrementally per newly-written file.
   */
  def fileStatsIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"),
        count(lit(1)).as("n_rows"))

  /**
   * Range scan that reads ONLY the files whose [key_min, key_max] spans
   * overlap [lo, hi], per a previously built [[fileStatsIndex]]. The
   * overlap predicate runs DISTRIBUTED over the index (symmetric with
   * [[prunedPointScan]]'s Bloom probe) — only the SURVIVING file names
   * reach the driver, so at million-file scale the collect is the pruned
   * subset, not the whole index. Rows are re-filtered after the pruned
   * read, so correctness never depends on the index being tight.
   *
   * Returns (scan, filesRead, filesTotal) so callers/tests can assert the
   * pruning actually happened.
   */
  def prunedRangeScan(spark: org.apache.spark.sql.SparkSession, path: String,
      index: DataFrame, keyCol: String, lo: Long, hi: Long)
      : (DataFrame, Long, Long) = {
    require(lo <= hi, s"prunedRangeScan: empty range [$lo, $hi]")
    val total = index.count()
    val keep = survivingRangeFiles(index, lo, hi)
      .collect().map(_.getString(0))
    val scan =
      if (keep.isEmpty) spark.read.parquet(path).where(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
        .where(col(keyCol) >= lo && col(keyCol) <= hi)
    (scan, keep.length.toLong, total)
  }

  /** The pre-collect, DISTRIBUTED overlap plan [[prunedRangeScan]]
    * collects: exposed so LayoutSpec can assert the filter sits in the
    * executed plan (i.e. pruning happens before anything reaches the
    * driver), not in driver code after a full-index collect. */
  def survivingRangeFiles(index: DataFrame, lo: Long, hi: Long): DataFrame =
    index
      .where(col("key_min").isNotNull && col("key_max").isNotNull &&
        col("key_min").cast("long") <= hi && col("key_max").cast("long") >= lo)
      .select(col("file"))

  /**
   * Per-file BLOOM index over a parquet directory — the point-lookup
   * complement of [[fileStatsIndex]]: min/max spans only help when the
   * layout is range-clustered on the key; a Bloom per file skips for
   * exact-key probes on ANY layout (a key's rows land in a handful of
   * files regardless of clustering). One linear scan, one
   * object-hash-aggregated Bloom per file; the index is
   * files x filterBytes — metadata-sized, like a table format's
   * dictionary/bloom column metadata.
   */
  def fileBloomIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String, expectedPerFile: Long, fpp: Double = 0.01): DataFrame = {
    val bloomAgg = org.apache.spark.sql.functions.udaf(
      graft.functions.BloomAggregator(expectedPerFile, fpp))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(bloomAgg(col(keyCol).cast("long")).as("bloom"),
        count(lit(1)).as("n_rows"))
  }

  /**
   * Exact-key scan reading ONLY files whose Bloom filter might contain
   * one of `keys`, per a previously built [[fileBloomIndex]]. The probe
   * runs DISTRIBUTED over the index (the `BloomBytesContainsAny`
   * expression deserializes each row's filter where it lives) — only the
   * matching FILE NAMES reach the driver. At 100 TB, files x filterBytes
   * is a driver-fatal collect; file-name lists are the same metadata the
   * catalog's listing already is. Rows are re-filtered after the pruned
   * read, so Bloom false positives cost I/O, never correctness.
   */
  def prunedPointScan(spark: org.apache.spark.sql.SparkSession, path: String,
      index: DataFrame, keyCol: String, keys: Seq[Long])
      : (DataFrame, Long, Long) = {
    require(keys.nonEmpty, "prunedPointScan: need at least one key")
    val probe = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.BloomBytesContainsAny(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(
          col("bloom")), keys.toArray))
    val total = index.count()
    val keep = index.where(probe).select(col("file"))
      .collect().map(_.getString(0))
    val scan =
      if (keep.isEmpty) spark.read.parquet(path).where(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
        .where(col(keyCol).isin(keys: _*))
    (scan, keep.length.toLong, total)
  }

  /**
   * Stable dense row ids 0..n-1 in `sortCols` order — the scalable
   * replacement for the two classic traps: a global `row_number()`
   * window (single partition — one task sorts the world) and
   * `monotonically_increasing_id` (sparse, partition-layout-dependent).
   *
   * Two-pass shape: a range repartition + in-partition sort makes the
   * partition CONCATENATION the total order, then `zipWithIndex` runs
   * one counting job (per-partition sizes -> driver, numPartitions longs)
   * and assigns offsets partition-locally. Nothing global is sorted on
   * one node; driver traffic is metadata-sized. The brief RDD hop is the
   * documented per-partition-imperative exception — id assignment is the
   * textbook case.
   *
   * `sortCols` must be a TOTAL order (break ties with a unique column):
   * with ties, range-boundary sampling may split them differently across
   * runs and the ids of tied rows would swap.
   */
  def stableDenseIds(df: DataFrame, sortCols: Seq[Column],
      numPartitions: Int): DataFrame = {
    require(sortCols.nonEmpty && numPartitions > 0,
      "stableDenseIds: need sort columns and partitions")
    val sorted = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "row_id", org.apache.spark.sql.types.LongType, nullable = false))
    val withIds = sorted.rdd.zipWithIndex().map { case (row, id) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ id)
    }
    df.sparkSession.createDataFrame(withIds, schema)
  }

  /**
   * Small-file compaction: rewrite a fragmented parquet directory into
   * `ceil(rows / targetRowsPerFile)` files. Uses `coalesce` when SHRINKING
   * the file count — coalesce merges existing partitions with NO shuffle,
   * which is the whole point of compaction (at 100 TB the data volume is
   * the cost; a round-robin repartition would move every byte twice) —
   * and falls back to repartition only when the target exceeds the
   * current parallelism (growing the file count cannot be shuffle-free).
   * Returns the file count written.
   */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetRowsPerFile: Long): Int = {
    require(targetRowsPerFile > 0, "compact: targetRowsPerFile must be > 0")
    val in = spark.read.parquet(inPath)
    val n = in.count() // parquet count() is footer-metadata only
    val files = math.max(1, ((n + targetRowsPerFile - 1) / targetRowsPerFile).toInt)
    val sized =
      if (files <= in.rdd.getNumPartitions) in.coalesce(files)
      else in.repartition(files)
    sized.write.mode("overwrite").parquet(outPath)
    files
  }
}
