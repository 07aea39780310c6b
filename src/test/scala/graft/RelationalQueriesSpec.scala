package graft

/**
 * Smoke-level invariants for the relational workload; exact value matching
 * is delegated to the DuckDB oracle gate (tools/check_oracle.py mirrors it).
 */
class RelationalQueriesSpec extends GraftSuite {
  private val dir = SparkTestBase.sf0001
  private def run(name: String) =
    graft.queries.RelationalQueries.queries(name)(spark, dir)

  test("every relational query executes and returns rows at sf0.001") {
    graft.queries.RelationalQueries.queries.keys.foreach { name =>
      val n = run(name).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every relational query has an oracle") {
    val qs = graft.queries.RelationalQueries.queries.keySet
    assert(graft.queries.RelationalQueries.oracleSql.keySet == qs)
  }

  test("q9 window rank caps at 3 per customer") {
    val df = run("rel_q9_window_rank")
    assert(df.where("rn > 3").count() == 0)
    assert(df.groupBy("o_custkey").count().where("count > 3").count() == 0)
  }

  test("q3 top-k is limited and sorted") {
    val rows = run("rel_q3_top_revenue").collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sorted.reverse))
  }

  test("broadcast hint takes effect in q5 plan") {
    val plan = run("rel_q5_region_revenue").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
