package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.RandgenFunctions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises both surfaces: a real parquet scan and the generator family
    * (the reference's whole purpose) enriching it with synthetic columns. */
  def entry(spark: SparkSession): DataFrame = {
    RandgenFunctions.registerAll(spark)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.select(col("l_orderkey"), col("l_quantity"))
      .withColumn("synth_qty",
        RandgenFunctions.randgen_int64_uniform(lit(1L), lit(50L), 42L))
      .withColumn("synth_noise",
        RandgenFunctions.randgen_float64_normal(lit(0.0), lit(1.0), 42L))
      .limit(100)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GeneratorQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.TextEventsQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.SamplingQueries.queries ++
      graft.queries.MergeQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.FuzzQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.GeneratorQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.TextEventsQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.ExtendedQueries.oracleSql ++
      graft.queries.JoinQueries.oracleSql ++
      graft.queries.SamplingQueries.oracleSql ++
      graft.queries.MergeQueries.oracleSql ++
      graft.queries.GraphQueries.oracleSql ++
      graft.queries.FuzzQueries.oracleSql
}
