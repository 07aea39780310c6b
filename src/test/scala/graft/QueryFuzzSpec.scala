package graft

import graft.fuzz.QueryFuzz
import graft.fuzz.QueryFuzz.FuzzConfig

/**
 * The differential fuzz battery (queries/FuzzQueries.scala): generation
 * must be a pure function of the seed, cover every grammar shape, and
 * execute end-to-end on Spark. The cross-engine half of the contract
 * (the identical SQL on DuckDB) is the gate's oracle check.
 */
class QueryFuzzSpec extends GraftSuite {

  test("same seed emits byte-identical SQL; different seed diverges") {
    val a = QueryFuzz.differentialSql(FuzzConfig(seed = 42L, nQueries = 8))
    val b = QueryFuzz.differentialSql(FuzzConfig(seed = 42L, nQueries = 8))
    val c = QueryFuzz.differentialSql(FuzzConfig(seed = 43L, nQueries = 8))
    assert(a == b, "generation must be deterministic under the seed")
    assert(a != c, "different seeds must generate different batteries")
  }

  test("default battery covers every grammar shape exactly once, and the " +
    "default tracks the grammar size") {
    val n = QueryFuzz.defaultNQueries
    val shapes = QueryFuzz.generate(FuzzConfig()).map(_.shape)
    assert(shapes.distinct.size == n, s"expected $n shapes, got $shapes")
    assert(shapes.size == n)
  }

  test("battery executes on Spark: one row per query, qids dense") {
    val n = QueryFuzz.defaultNQueries
    val rows = QueryFuzz.run(spark, SparkTestBase.sf0001,
      FuzzConfig(seed = 0x5EED5EEDL)).collect()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).toSeq == (0L until n.toLong),
      "qid column must be dense and ordered")
    // Digests are COALESCE'd: empty results are 0, never null.
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("a fresh seed battery still parses and plans on Spark") {
    // Planning (not executing) a full unseen battery guards the grammar
    // against emitting Spark-invalid SQL for seeds beyond the gate's.
    Tables.registerAll(spark, SparkTestBase.sf0001)
    QueryFuzz.generate(FuzzConfig(seed = 987654321L))
      .foreach { g =>
        val plan = spark.sql(g.wrappedSql).queryExecution.executedPlan
        assert(plan != null, s"q${g.id} (${g.shape}) failed to plan")
      }
  }
}
