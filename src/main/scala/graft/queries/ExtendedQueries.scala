package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/**
 * Extended operator coverage beyond the core relational workload
 * (SURVEY.md §2.3 tail): pivot, explode/lateral views, array functions,
 * exact percentiles, approximate distinct (property-checked), and
 * CSV/JSON source-sink round trips.
 */
object ExtendedQueries {

  private def reg(s: SparkSession, dir: String): Unit =
    Tables.registerAll(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pivot: explicit value list so the schema is static.
    "rel_q23_pivot" -> { (s, dir) =>
      reg(s, dir)
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
    },
    // Lateral view / explode: corpus-wide word frequencies, top 10.
    "rel_q24_explode_words" -> { (s, dir) =>
      reg(s, dir)
      s.sql("""SELECT w, CAST(COUNT(*) AS BIGINT) AS n
              |FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w
              |GROUP BY w ORDER BY n DESC, w LIMIT 10""".stripMargin)
    },
    // Array functions over token arrays.
    "rel_q25_array_funcs" -> { (s, dir) =>
      reg(s, dir)
      Tables.load(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n"),
          sort_array(col("toks")).getItem(0).as("first_tok"),
          array_contains(col("toks"), "the").as("has_the"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
          element_at(col("toks"), -1).as("last_tok"))
    },
    // Exact interpolated percentiles.
    "rel_q26_percentiles" -> { (s, dir) =>
      reg(s, dir)
      s.sql("""SELECT l_returnflag,
              |  round(percentile(l_quantity, 0.25), 4) AS p25,
              |  round(percentile(l_quantity, 0.5), 4) AS p50,
              |  round(percentile(l_quantity, 0.75), 4) AS p75
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },
    // Approximate distinct: property-checked against the exact count.
    "rel_q27_approx_distinct" -> { (s, dir) =>
      reg(s, dir)
      s.sql("""SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_nd,
              |  CAST(abs(approx_count_distinct(l_partkey) -
              |           COUNT(DISTINCT l_partkey)) <=
              |       COUNT(DISTINCT l_partkey) * 0.05 AS BOOLEAN) AS approx_ok
              |FROM lineitem""".stripMargin)
    },
    // Sink+source round trips: write a deterministic slice, read it back.
    "io_csv_roundtrip" -> { (s, dir) =>
      ioRoundtrip(s, dir, "csv")
    },
    "io_json_roundtrip" -> { (s, dir) =>
      ioRoundtrip(s, dir, "json")
    },
    "io_orc_roundtrip" -> { (s, dir) =>
      ioRoundtrip(s, dir, "orc")
    },
  )

  /** Writes a lineitem slice through `format`, reads it back, aggregates.
    * Exercises the full sink -> source path with explicit schema. */
  private def ioRoundtrip(s: SparkSession, dir: String, format: String): DataFrame = {
    val out = s"${sys.props("java.io.tmpdir")}/graft_io_${format}_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_")
    val slice = Tables.load(s, dir, "lineitem")
      .where(col("l_orderkey") < 100)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")
    slice.write.format(format).option("header", "true").mode("overwrite").save(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType)))
    s.read.format(format).option("header", "true").schema(schema).load(out)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("price"))
  }

  private val roundtripOracle =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
      |FROM lineitem WHERE l_orderkey < 100 GROUP BY l_returnflag""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "rel_q23_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "rel_q24_explode_words" ->
      """SELECT w, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |GROUP BY w ORDER BY n DESC, w LIMIT 10""".stripMargin,
    "rel_q25_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |  list_sort(string_split(text, ' '))[1] AS first_tok,
        |  list_contains(string_split(text, ' '), 'the') AS has_the,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  string_split(text, ' ')[-1] AS last_tok
        |FROM documents""".stripMargin,
    "rel_q26_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rel_q27_approx_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_nd,
        |  TRUE AS approx_ok FROM lineitem""".stripMargin,
    "io_csv_roundtrip" -> roundtripOracle,
    "io_json_roundtrip" -> roundtripOracle,
    "io_orc_roundtrip" -> roundtripOracle,
  )
}
