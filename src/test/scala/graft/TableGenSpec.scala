package graft

import org.apache.spark.sql.types._

class TableGenSpec extends GraftSuite {

  test("schema-driven table: schema, bounds, reproducibility") {
    def make() = TableGen.table(spark, 10000L, seed = 42L,
      "id" -> Gen.SeqId,
      "qty" -> Gen.Int64Uniform(1, 50),
      "price" -> Gen.Float64Normal(100.0, 15.0),
      "seg" -> Gen.Choice(Seq("A", "B", "C")),
      "ok" -> Gen.BoolBernoulli(0.5),
      "name" -> Gen.StringAlphanum(3, 8),
      "d" -> Gen.DateUniform("2020-01-01", "2020-12-31"),
      "total" -> Gen.SqlExpr("qty * price"))

    val df = make()
    assert(df.schema.map(f => f.name -> f.dataType) == Seq(
      "id" -> LongType, "qty" -> LongType, "price" -> DoubleType,
      "seg" -> StringType, "ok" -> BooleanType, "name" -> StringType,
      "d" -> DateType, "total" -> DoubleType))

    val rows = df.collect()
    assert(rows.length == 10000)
    rows.foreach { r =>
      val qty = r.getLong(1)
      assert(qty >= 1 && qty <= 50)
      assert(Set("A", "B", "C").contains(r.getString(3)))
      val n = r.getString(5)
      assert(n.length >= 3 && n.length <= 8)
      assert(math.abs(r.getDouble(7) - qty * r.getDouble(2)) < 1e-9)
    }

    // Reproducible under the same seed, including across partition counts
    // fixed by the same range layout.
    assert(make().collect().toSeq == rows.toSeq)
    // Different seed -> different data.
    val other = TableGen.table(spark, 10000L, seed = 43L,
      "qty" -> Gen.Int64Uniform(1, 50))
    assert(other.collect().map(_.getLong(0)).toSeq !=
      rows.map(_.getLong(1)).toSeq)
  }

  test("explicit partition count controls layout; still one narrow stage") {
    val df = TableGen.table(spark, 1000L, 7L, 8, "x" -> Gen.Int64Uniform(0, 9))
    assert(df.rdd.getNumPartitions == 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"generation must not shuffle:\n$plan")
  }

  test("columns with equal specs decorrelate") {
    val df = TableGen.table(spark, 1000L, 7L,
      "a" -> Gen.Int64Uniform(1, 1000000),
      "b" -> Gen.Int64Uniform(1, 1000000))
    assert(df.where("a = b").count() < 5)
  }

  test("uuid, weighted choice and null injection specs") {
    val df = TableGen.table(spark, 20000L, 11L,
      "u" -> Gen.Uuid,
      "w" -> Gen.ChoiceWeighted(Seq("rare", "common"), Seq(0.1, 0.9)),
      "n" -> Gen.Nullable(Gen.Int64Uniform(1, 5), 0.25))
    val r = df.selectExpr(
      "count(distinct u) AS du",
      "count(CASE WHEN u RLIKE '^[0-9a-f]{8}-[0-9a-f]{4}-4' THEN 1 END) AS fmt",
      "avg(CASE WHEN w = 'common' THEN 1.0D ELSE 0.0D END) AS pc",
      "avg(CASE WHEN n IS NULL THEN 1.0D ELSE 0.0D END) AS pn",
      "min(n) AS lo", "max(n) AS hi").collect()(0)
    assert(r.getLong(0) == 20000L && r.getLong(1) == 20000L)
    assert(math.abs(r.getDouble(2) - 0.9) < 0.02)
    assert(math.abs(r.getDouble(3) - 0.25) < 0.02)
    assert(r.getLong(4) >= 1L && r.getLong(5) <= 5L)
  }
}
