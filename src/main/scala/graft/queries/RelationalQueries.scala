package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/**
 * Deterministic relational workload over the TPC-H-ish star schema
 * (TESTDATA.md) — the query surface the reference delegates to its host
 * engine (SURVEY.md §2.3: scans, projection/filter, joins of all types,
 * hash/sort aggregation, distinct, grouping sets/rollup/cube, windows,
 * sorts/limits/top-k, set ops, subqueries, CTEs, scalar functions), each
 * with an exact DuckDB oracle.
 *
 * Dialect strategy: Spark SQL and the DuckDB oracle share the SAME string
 * unless noted. Floating aggregates go through DECIMAL (exact, associative,
 * order-insensitive) and are cast back to DOUBLE, so both engines emit
 * bit-identical doubles regardless of partial-aggregation order — summing
 * raw doubles would be sensitive to Spark's partition fan-in. Computed
 * integers are cast to BIGINT on both sides (DuckDB's SUM(int) is HUGEINT,
 * Spark's is BIGINT).
 *
 * Scale notes (the 100 TB story): every query is a straight declarative
 * plan — filters/projections reach the parquet scan, small dimensions are
 * broadcast (hints ignored harmlessly by DuckDB), aggregations are partial
 * before shuffle, and no query collects unbounded rows to the driver
 * (top-k via ORDER BY + LIMIT; wide outputs stay distributed).
 */
object RelationalQueries {

  private case class Q(name: String, sql: String, oracle: Option[String] = None)

  /** decimal-exact sum of a 2-decimal double column, emitted as DOUBLE */
  private def dsum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  private val defs: Seq[Q] = Seq(

    // Q1-style pricing summary: scan + filter + hash agg + sort.
    Q("rel_q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Selective filter + projection (pushdown surface).
    Q("rel_q2_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity >= 49 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // Q3-style: 3-way join + agg + top-k.
    Q("rel_q3_top_revenue",
      s"""SELECT o_orderkey,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |              JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderkey
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin),

    // Semi join (EXISTS).
    Q("rel_q4_exists_semi",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // Q5-style: 5-way join with broadcast-able dimensions.
    Q("rel_q5_region_revenue",
      s"""SELECT /*+ BROADCAST(region), BROADCAST(nation), BROADCAST(supplier) */
         |  n_name,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin),

    // Q6-style: single-table predicate + sum.
    Q("rel_q6_forecast",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin),

    // Anti join (NOT EXISTS).
    Q("rel_q7_anti_join",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_customers_no_orders
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin),

    // Distinct aggregates.
    Q("rel_q8_distinct_aggs",
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // Window: rank within partition + filter (top-3 per customer).
    Q("rel_q9_window_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
      oracle = Some(
        """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
          |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
          |        ROW_NUMBER() OVER (PARTITION BY o_custkey
          |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |      FROM orders) t
          |WHERE rn <= 3
          |ORDER BY o_custkey, rn""".stripMargin)),

    // Window: running sum (decimal-exact) + lag.
    Q("rel_q10_window_running",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS running_spend,
        |  LAG(o_totalprice) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders""".stripMargin),

    // Rollup (counts only: grouping columns + bigint).
    Q("rel_q11_rollup",
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),

    // Cube.
    Q("rel_q12_cube",
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin),

    // Set operations.
    Q("rel_q13_set_ops",
      """SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |    (SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer) t1)
        |    AS n_intersect,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |    (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders) t2)
        |    AS n_except,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |    (SELECT l_orderkey FROM lineitem UNION SELECT o_orderkey FROM orders) t3)
        |    AS n_union""".stripMargin),

    // String functions.
    Q("rel_q14_string_funcs",
      """SELECT p_partkey, UPPER(p_brand) AS brand_u, LOWER(p_type) AS type_l,
        |  SUBSTRING(p_name, 1, 8) AS name8,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |  CONCAT(p_brand, '/', p_type) AS brand_type,
        |  REPLACE(p_type, 'ECONOMY', 'ECON') AS type_r
        |FROM part
        |WHERE p_size BETWEEN 10 AND 20 AND p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin),

    // Date/time functions.
    Q("rel_q15_date_funcs",
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)
        |ORDER BY y, m""".stripMargin),

    // Scalar subquery (uncorrelated): above-average price.
    Q("rel_q16_scalar_subquery",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_above_avg
        |FROM part
        |WHERE p_retailprice >
        |  (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
        |          / COUNT(*) FROM part)""".stripMargin),

    // IN subquery.
    Q("rel_q17_in_subquery",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)""".stripMargin),

    // Correlated scalar subquery: each customer's priciest order.
    Q("rel_q18_correlated",
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // Full outer join shape counts.
    Q("rel_q19_full_outer",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS cust_without_orders,
        |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS orders_without_cust
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey""".stripMargin),

    // HAVING + CTE.
    Q("rel_q20_having_cte",
      """WITH per_supp AS (
        |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_name, n_lines, qty
        |FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name, n_lines, qty
        |HAVING n_lines > (SELECT CAST(AVG(n_lines) AS DOUBLE) FROM per_supp)
        |ORDER BY s_name""".stripMargin),

    // Top-k with offset pagination (deterministic via unique key).
    Q("rel_q21_limit_offset",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 10""".stripMargin),

    // CASE + arithmetic + BETWEEN mix.
    Q("rel_q22_case_buckets",
      """SELECT
        |  CASE WHEN l_quantity < 10 THEN 'low'
        |       WHEN l_quantity < 30 THEN 'mid'
        |       ELSE 'high' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin),

    // Explicit GROUPING SETS (beyond rollup/cube) + GROUPING() indicators.
    Q("rel_q30_grouping_sets",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  ${dsum("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |                        (l_returnflag), (l_linestatus), ())""".stripMargin),

    // RANGE window frame (value-based, peers included): per priority class,
    // how many orders fall within 500.0 below each order's price.
    Q("rel_q31_range_frame",
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(COUNT(*) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice
        |    RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_near
        |FROM orders WHERE o_orderkey < 2000""".stripMargin),

    // UNPIVOT (wide -> long). The oracle replays it as UNION ALL — DuckDB's
    // UNPIVOT clause has a different surface syntax.
    Q("rel_q32_unpivot",
      """SELECT c_custkey, metric, val FROM (
        |  SELECT c_custkey, c_acctbal,
        |         CAST(c_nationkey AS DOUBLE) AS nation_key
        |  FROM customer WHERE c_custkey < 100
        |) UNPIVOT (val FOR metric IN (c_acctbal AS bal, nation_key AS nation))""".stripMargin,
      oracle = Some(
        """SELECT c_custkey, 'bal' AS metric, c_acctbal AS val
          |FROM customer WHERE c_custkey < 100
          |UNION ALL
          |SELECT c_custkey, 'nation', CAST(c_nationkey AS DOUBLE)
          |FROM customer WHERE c_custkey < 100""".stripMargin)),

    // Map type + functions (creation, lookup, keys/size). The oracle
    // replays the lookups as CASE — DuckDB map literals differ.
    Q("rel_q33_map_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(element_at(map('A', 1, 'N', 2, 'R', 3), l_returnflag)
        |       AS BIGINT) AS flag_code,
        |  CAST(size(map_concat(map('A', 1, 'N', 2, 'R', 3), map('X', 9)))
        |       AS BIGINT) AS n_keys,
        |  array_join(map_keys(map('lo', l_quantity)), ',') AS k
        |FROM lineitem WHERE l_orderkey < 30""".stripMargin,
      oracle = Some(
        """SELECT l_orderkey, l_linenumber,
          |  CAST(CASE l_returnflag WHEN 'A' THEN 1 WHEN 'N' THEN 2
          |       WHEN 'R' THEN 3 END AS BIGINT) AS flag_code,
          |  CAST(4 AS BIGINT) AS n_keys, 'lo' AS k
          |FROM lineitem WHERE l_orderkey < 30""".stripMargin)),

    // Join-strategy + repartition hints: BROADCAST forces the dim-table
    // broadcast, MERGE forces a sort-merge for the fact-fact edge — the
    // per-query override knobs a tuned workload uses. DuckDB reads the
    // hint block as a plain comment, so the SAME string is the oracle.
    Q("rel_q36_join_hints",
      """SELECT /*+ BROADCAST(nation), MERGE(orders) */
        |  n_name, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN orders ON o_custkey = c_custkey
        |GROUP BY n_name""".stripMargin),

    // TPC-H Q7-style 6-way join: customer nation x supplier nation trade
    // volume — the widest join tree in the suite (two independent
    // dimension arms off the fact table; both nation arms broadcast).
    Q("rel_q39_nation_pairs",
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE cn.n_name < sn.n_name
        |GROUP BY cn.n_name, sn.n_name""".stripMargin),

    // Generator/UDTF surface: LATERAL VIEW inline over an array of structs
    // (one input row -> N typed rows). Oracle replays as UNION ALL.
    Q("rel_q34_lateral_inline",
      """SELECT o_orderkey, kind, v
        |FROM orders
        |LATERAL VIEW inline(array(
        |  named_struct('kind', 'price', 'v', o_totalprice),
        |  named_struct('kind', 'cust', 'v', CAST(o_custkey AS DOUBLE)))) x AS kind, v
        |WHERE o_orderkey < 200""".stripMargin,
      oracle = Some(
        """SELECT o_orderkey, 'price' AS kind, o_totalprice AS v
          |FROM orders WHERE o_orderkey < 200
          |UNION ALL
          |SELECT o_orderkey, 'cust', CAST(o_custkey AS DOUBLE)
          |FROM orders WHERE o_orderkey < 200""".stripMargin)),

    // IGNORE NULLS window navigation: carry-forward of the latest
    // purchase (last_value) and the PREVIOUS purchase strictly before the
    // current row (lag). Dialects differ only in where IGNORE NULLS sits
    // (Spark: after the parens; DuckDB: inside them).
    Q("rel_q41_ignore_nulls",
      """SELECT event_id,
        |  last_value(CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100) AS BIGINT) END) IGNORE NULLS
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_cents,
        |  lag(CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100) AS BIGINT) END, 1) IGNORE NULLS
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev_purchase_cents
        |FROM events""".stripMargin,
      oracle = Some(
        """SELECT event_id,
          |  last_value(CASE WHEN event_type = 'purchase'
          |    THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
          |    OVER (PARTITION BY user_id ORDER BY ts, event_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS last_purchase_cents,
          |  lag(CASE WHEN event_type = 'purchase'
          |    THEN CAST(round(value * 100) AS BIGINT) END, 1 IGNORE NULLS)
          |    OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |    AS prev_purchase_cents
          |FROM events""".stripMargin)),
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> { (spark: SparkSession, dir: String) =>
      Tables.registerAll(spark, dir)
      spark.sql(q.sql)
    }).toMap

  val oracleSql: Map[String, String] =
    defs.map(q => q.name -> q.oracle.getOrElse(q.sql)).toMap
}
