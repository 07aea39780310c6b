package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.LongType

/**
 * 1:1 port of the reference's nine end-to-end SQL tests
 * (`/root/reference/src/randgen/int64_uniform.rs:155-276`), modulo
 * `generate_series(1, 100)` -> `range(1, 101)`, plus seed-determinism and
 * extreme-bound properties the reference lacks (SURVEY.md §5).
 */
class RandgenInt64UniformSpec extends GraftSuite {

  private def longs(sql: String): Seq[Option[Long]] = {
    val df = spark.sql(sql)
    assert(df.schema.fields.head.dataType == LongType,
      s"result must be BIGINT (reference test_helpers.rs:23), got ${df.schema}")
    df.collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
  }

  private def assertAllInBounds(vs: Seq[Option[Long]], lo: Long, hi: Long): Unit = {
    assert(vs.nonEmpty, "query must return >= 1 row (test_helpers.rs:31)")
    assert(vs.size == 100)
    vs.foreach { v =>
      assert(v.isDefined, "bounds tests expect non-null outputs")
      assert(v.get >= lo && v.get <= hi, s"${v.get} outside [$lo, $hi]")
    }
  }

  // -- 4 bounds tests (int64_uniform.rs:166-220) ----------------------------

  test("const/const: values within inclusive bounds") {
    assertAllInBounds(
      longs("SELECT randgen_int64_uniform(1, 10) AS x FROM range(1, 101)"),
      1, 10)
  }

  test("array/const: chained generator as min") {
    assertAllInBounds(
      longs("""SELECT randgen_int64_uniform(y, 20) AS x FROM
              |  (SELECT randgen_int64_uniform(1, 10) AS y FROM range(1, 101))
              |""".stripMargin), 1, 20)
  }

  test("const/array: chained generator as max") {
    assertAllInBounds(
      longs("""SELECT randgen_int64_uniform(1, y) AS x FROM
              |  (SELECT randgen_int64_uniform(11, 20) AS y FROM range(1, 101))
              |""".stripMargin), 1, 20)
  }

  test("array/array: both bounds chained") {
    assertAllInBounds(
      longs("""SELECT randgen_int64_uniform(a, b) AS x FROM
              |  (SELECT randgen_int64_uniform(1, 10) AS a,
              |          randgen_int64_uniform(11, 20) AS b FROM range(1, 101))
              |""".stripMargin), 1, 20)
  }

  // -- 5 null tests (int64_uniform.rs:222-275): null in => null out ---------

  private def assertAllNull(sql: String): Unit = {
    val vs = longs(sql)
    assert(vs.size == 100)
    assert(vs.forall(_.isEmpty), "NULL argument must yield all-NULL output")
  }

  test("(const, null) => null") {
    assertAllNull(
      "SELECT randgen_int64_uniform(1, CAST(NULL AS BIGINT)) AS x FROM range(1, 101)")
  }

  test("(array, null) => null") {
    assertAllNull(
      """SELECT randgen_int64_uniform(y, CAST(NULL AS BIGINT)) AS x FROM
        |  (SELECT randgen_int64_uniform(1, 10) AS y FROM range(1, 101))""".stripMargin)
  }

  test("(null, null) => null") {
    assertAllNull(
      "SELECT randgen_int64_uniform(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)) AS x FROM range(1, 101)")
  }

  test("(null, const) => null") {
    assertAllNull(
      "SELECT randgen_int64_uniform(CAST(NULL AS BIGINT), 10) AS x FROM range(1, 101)")
  }

  test("(null, array) => null") {
    assertAllNull(
      """SELECT randgen_int64_uniform(CAST(NULL AS BIGINT), y) AS x FROM
        |  (SELECT randgen_int64_uniform(11, 20) AS y FROM range(1, 101))""".stripMargin)
  }

  // -- extensions beyond the reference --------------------------------------

  test("explicit seed is reproducible; different seeds differ") {
    val q = "SELECT randgen_int64_uniform(1, 1000000, 42) AS x FROM range(1, 1001)"
    val a = longs(q)
    val b = longs(q)
    assert(a == b, "same seed must reproduce identical values")
    val c = longs("SELECT randgen_int64_uniform(1, 1000000, 43) AS x FROM range(1, 1001)")
    assert(a != c, "different seeds should differ")
  }

  test("degenerate range min == max") {
    val vs = longs("SELECT randgen_int64_uniform(7, 7) AS x FROM range(1, 101)")
    assert(vs.forall(_.contains(7L)))
  }

  test("full Long range does not overflow") {
    val vs = longs(
      s"SELECT randgen_int64_uniform(${Long.MinValue}L, ${Long.MaxValue}L, 7) AS x FROM range(1, 101)")
    assert(vs.size == 100 && vs.forall(_.isDefined))
    assert(vs.distinct.size > 90, "full-range draws should almost surely be distinct")
  }

  test("huge-but-not-full range (width overflows Long) stays in bounds") {
    val lo = -5L
    val vs = longs(
      s"SELECT randgen_int64_uniform(${lo}L, ${Long.MaxValue}L, 11) AS x FROM range(1, 101)")
    vs.foreach(v => assert(v.get >= lo))
  }

  test("min > max fails the query (reference panics, int64_uniform.rs:99)") {
    val e = intercept[Exception] {
      spark.sql("SELECT randgen_int64_uniform(10, 1) AS x FROM range(1, 101)").collect()
    }
    assert(e.getMessage != null)
  }

  test("distribution covers the range roughly uniformly") {
    val vs = longs("SELECT randgen_int64_uniform(0, 9, 123) AS x FROM range(1, 100001)")
      .flatten
    val counts = vs.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 10, "all 10 values must appear in 100k draws")
    counts.values.foreach { n =>
      assert(math.abs(n - 10000) < 1000, s"bucket count $n too far from 10000")
    }
  }

  test("interpreted (non-codegen) path agrees with contract") {
    // Force the interpreted path by disabling whole-stage codegen.
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val vs = longs("SELECT randgen_int64_uniform(1, 10) AS x FROM range(1, 101)")
      assertAllInBounds(vs, 1, 10)
      assertAllNull(
        "SELECT randgen_int64_uniform(1, CAST(NULL AS BIGINT)) AS x FROM range(1, 101)")
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = kvs.map { case (k, _) => k -> conf.getOption(k) }
    kvs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
