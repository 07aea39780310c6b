package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TopKAggregator
import graft.operators.Joins

/** As-of join, salted skew join, and custom typed UDAF coverage, with
  * DuckDB oracles (DuckDB's native ASOF JOIN checks our composition). */
object JoinQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Backward as-of join: each error event picks up the latest prior
    // click's value for the same user.
    "join_asof_events" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
      val clicks = ev.where(col("event_type") === "click")
      Joins.asofBackward(errors, clicks, Seq("user_id"), "ts", "ts",
          "event_id", Seq("value"), rightTieCols = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("r_value").as("prev_click_value"))
    },
    // Salted join result == plain join result (the oracle runs plain).
    "join_salted" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus"))
      Joins.saltedJoin(li, o, "k", 8, "l_extendedprice")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,2)")))
            .cast("double").as("revenue"))
    },
    // Custom typed UDAF: top-5 prices per return flag, exploded.
    "agg_topk" -> { (s, dir) =>
      TopKAggregator.register(s, 5)
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_returnflag, topk5_agg(l_extendedprice) AS tk
              |FROM lineitem GROUP BY l_returnflag""".stripMargin)
        .select(col("l_returnflag"), posexplode(col("tk")))
        .select(col("l_returnflag"), col("pos").cast("long").as("pos"),
          col("col").as("v"))
    },
  )

  val oracleSql: Map[String, String] = Map(
    "join_asof_events" ->
      """SELECT e.event_id, e.user_id, c.value AS prev_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin,
    "join_salted" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
    "agg_topk" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice AS v,
        |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                     ORDER BY l_extendedprice DESC) AS rn
        |FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(LEAST(COUNT(*) OVER (PARTITION BY l_returnflag), 5) - rn
        |       AS BIGINT) AS pos, v
        |FROM r WHERE rn <= 5""".stripMargin,
  )
}
