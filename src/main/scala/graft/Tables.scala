package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-provisioned parquet tables (TESTDATA.md) and registers
  * them as temp views so SQL is portable between Spark and the DuckDB
  * oracle (same table names, same data).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright; read it as raw nanos and rebuild a proper
      // microsecond TimestampType column (matches DuckDB's ns->us cast).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet").selectExpr(
        "event_id", "timestamp_micros(ts div 1000) AS ts",
        "user_id", "event_type", "value", "props")
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Registers every table as a temp view over `dir`. Cheap (schema-only). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
