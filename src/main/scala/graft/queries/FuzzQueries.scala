package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fuzz.QueryFuzz

/**
 * Differential query-fuzz gate (SURVEY.md §2.5): the engine's own
 * randgen heritage applied to itself. A fixed-seed
 * [[graft.fuzz.QueryFuzz]] battery — twenty-nine grammar shapes
 * (scan+filter, FK join, group-agg, CASE bucketing, UNION ALL,
 * IN-subquery, 3-way chain join, scalar subquery, LEFT join, window
 * rank, correlated EXISTS, global multi-aggregate, string functions,
 * events time-bucket aggregate, ROLLUP/CUBE/GROUPING SETS with
 * GROUPING(), INTERSECT/EXCEPT ALL bag semantics, RANGE window
 * frames, LATERAL aggregates + numbers-table fan-out, DECIMAL
 * round/propagation arithmetic, aggregate FILTER (WHERE), FULL OUTER
 * join of independently filtered FK sides, WITH-clause reuse across
 * two aggregations, LIMIT/OFFSET pagination under a unique total
 * order, explicit NULLS FIRST/LAST ordering under LIMIT — the engines'
 * DEFAULT null placement differs, so explicit placement is the
 * portable spelling this battery pins) × dialect-portable predicates —
 * reduces every query to (qid, n_rows, digest), and the SAME SQL text
 * is the DuckDB oracle, so the gate IS a 31-query cross-engine
 * differential test: any divergence in predicate, join, aggregate,
 * window, null, string, timestamp, or numeric semantics fails the
 * hash match on a named qid.
 */
object FuzzQueries {

  // nQueries tracks the grammar size so the gate always covers every
  // shape exactly once (the r16 trap: a literal 30 silently dropped the
  // newest shape).
  private val cfg = QueryFuzz.FuzzConfig(seed = 0x5EED5EEDL,
    nQueries = QueryFuzz.defaultNQueries)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzz_sql_differential" -> { (s, dir) => QueryFuzz.run(s, dir, cfg) }
  )

  val oracleSql: Map[String, String] = Map(
    "fuzz_sql_differential" -> QueryFuzz.differentialSql(cfg)
  )
}
