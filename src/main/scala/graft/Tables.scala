package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loads the driver-provisioned parquet tables (TESTDATA.md) and registers
  * them as temp views so SQL is portable between Spark and the DuckDB
  * oracle (same table names, same data).
  *
  * The events fixture has shipped with two different parquet layouts for
  * `ts` (TIMESTAMP(NANOS) → read as raw int64 nanos under
  * `nanosAsLong`, and plain TIMESTAMP_NTZ micros), so the reader is
  * schema-adaptive: it inspects the type that actually arrived and
  * converts accordingly, then fail-fasts if the decoded event-time range
  * is implausible (the guard that turns a silent unit mix-up into an
  * immediate error instead of 1000×-compressed event time).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Converts whatever `ts` type arrived into session-zoned
    * TimestampType micros: int64 ⇒ treat as nanos (the documented legacy
    * layout), TIMESTAMP/TIMESTAMP_NTZ ⇒ use as-is (a cast that is
    * value-identical under the UTC session zone every entrypoint sets).
    */
  def eventTsColumn(dt: DataType): Column = dt match {
    case LongType => expr("timestamp_micros(ts div 1000)")
    case _: TimestampNTZType => col("ts").cast(TimestampType)
    case _ => col("ts").cast(TimestampType)
  }

  /** Normalizes an events DataFrame (batch or streaming) to the canonical
    * column set with `ts` as TimestampType. */
  def normalizeEvents(df: DataFrame): DataFrame =
    df.select(col("event_id"),
      eventTsColumn(df.schema("ts").dataType).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))

  /** Dirs whose decoded event-time range has been sanity-checked this
    * JVM (one tiny scan per dir, not per registration). */
  private val tsChecked = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def assertSaneEventTime(df: DataFrame, dir: String): Unit =
    // Mark the dir checked only AFTER the require passes: if it throws,
    // every subsequent load of the same dir must fail the same way, not
    // run silently on mis-decoded timestamps.
    if (!tsChecked.contains(dir)) {
      val row = df.agg(min(year(col("ts"))), max(year(col("ts")))).head()
      if (!row.isNullAt(0)) {
        val (lo, hi) = (row.getInt(0), row.getInt(1))
        require(lo >= 1990 && hi <= 2150,
          s"events.ts decoded to an implausible range [$lo, $hi] for $dir — " +
            "fixture timestamp unit/type mismatch (expected years 1990–2150)")
      }
      tsChecked.add(dir)
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Some fixture vintages store ts as TIMESTAMP(NANOS), which Spark's
      // vectorized reader rejects outright unless read as raw int64.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val out = normalizeEvents(spark.read.parquet(s"$dir/events.parquet"))
      assertSaneEventTime(out, dir)
      out
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Registers every table as a temp view over `dir`. Cheap (schema-only
    * except a once-per-dir events time-range sanity scan). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
