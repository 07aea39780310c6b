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

  test("childTable: referential integrity, per-parent sequences, zero fan-out") {
    val parent = TableGen.table(spark, 500L, seed = 3L,
      "pk" -> Gen.SeqId, "grp" -> Gen.Choice(Seq("x", "y")))
    val child = TableGen.childTable(parent, Seq("pk"),
      Gen.Int64Poisson(2.0), seed = 5L,
      "ln" -> Gen.SqlExpr("__seq + 1"),
      "v" -> Gen.Float64Uniform(0.0, 1.0))
    assert(child.columns.toSeq == Seq("pk", "__seq", "ln", "v"))
    // every child key resolves (integrity by construction)
    assert(child.join(parent, Seq("pk"), "left_anti").count() == 0)
    // per-parent __seq is a dense 0..cnt-1 (ln = 1..cnt)
    val broken = child.groupBy("pk")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.max("ln").as("mx"),
        org.apache.spark.sql.functions.min("ln").as("mn"))
      .where(org.apache.spark.sql.functions.col("mx") =!=
        org.apache.spark.sql.functions.col("cnt") ||
        org.apache.spark.sql.functions.col("mn") =!= 1L)
    assert(broken.count() == 0)
    // Poisson(2) leaves ~13.5% of parents childless — the zero-fanout
    // guard must EMPTY them out, not emit a descending sequence.
    val parentsWithKids = child.select("pk").distinct().count()
    assert(parentsWithKids < 500,
      "fixture must exercise the zero-fanout path")
    assert(child.where(org.apache.spark.sql.functions.col("__seq") < 0)
      .count() == 0, "descending sequence leaked from a zero fan-out")
  }

  test("childTable with a constant zero fan-out is empty, not an error") {
    val parent = TableGen.table(spark, 10L, seed = 3L, "pk" -> Gen.SeqId)
    val none = TableGen.childTable(parent, Seq("pk"),
      Gen.Int64Uniform(0, 0), seed = 5L, "v" -> Gen.Int64Uniform(1, 2))
    assert(none.count() == 0)
  }

  test("new distribution specs map through the Gen ADT") {
    val df = TableGen.table(spark, 20000L, seed = 9L,
      "g" -> Gen.Float64Gamma(3.0, 2.0),
      "b" -> Gen.Float64Beta(2.0, 5.0),
      "c" -> Gen.Float64Cauchy(10.0, 2.0),
      "x" -> Gen.Float64ChiSquare(5.0),
      "t" -> Gen.Float64StudentT(8.0),
      "ln" -> Gen.Float64Lognormal(0.0, 0.5),
      "w" -> Gen.Float64Weibull(2.0, 2.0),
      "bi" -> Gen.Int64Binomial(40L, 0.3))
    val r = df.selectExpr(
      "abs(avg(g) - 6.0) < 0.3 AS g_ok",
      "min(b) > 0.0 AND max(b) < 1.0 AS b_ok",
      "abs(percentile(c, 0.5) - 10.0) < 0.3 AS c_ok",
      "abs(avg(x) - 5.0) < 0.3 AS x_ok",
      "abs(avg(t)) < 0.1 AS t_ok",
      "min(ln) > 0.0 AS ln_ok",
      "min(w) >= 0.0 AS w_ok",
      "min(bi) >= 0 AND max(bi) <= 40 AS bi_ok").collect()(0)
    (0 until 8).foreach(i => assert(r.getBoolean(i), s"field $i"))
  }

  test("array specs map through the Gen ADT: unit vectors and Dirichlet") {
    val df = TableGen.table(spark, 5000L, seed = 31L,
      "v" -> Gen.ArrayUnitVector(8),
      "w" -> Gen.ArrayDirichlet(Seq(2.0, 3.0, 5.0)))
    val r = df.selectExpr(
      "max(abs(aggregate(v, 0D, (a, x) -> a + x * x) - 1.0)) < 1e-9 AS v_norm_ok",
      "min(size(v)) = 8 AND max(size(v)) = 8 AS v_dim_ok",
      "max(abs(aggregate(w, 0D, (a, x) -> a + x) - 1.0)) < 1e-9 AS w_sum_ok",
      // Dirichlet marginal mean: alpha_i / sum(alpha) = 0.2, 0.3, 0.5.
      "abs(avg(element_at(w, 1)) - 0.2) < 0.02 AS w_m1_ok",
      "abs(avg(element_at(w, 3)) - 0.5) < 0.02 AS w_m3_ok").collect()(0)
    (0 until 5).foreach(i => assert(r.getBoolean(i), s"field $i"))
  }
}
