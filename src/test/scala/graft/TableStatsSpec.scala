package graft

import org.apache.spark.sql.functions._

import graft.operators.TableStats

class TableStatsSpec extends GraftSuite {
  import spark.implicits._

  test("columnStats approx: same schema, no Expand, NDV within HLL error") {
    val li = Tables.load(spark, SparkTestBase.sf001, "lineitem")
    val cols = Seq("l_orderkey", "l_suppkey", "l_returnflag")
    val exact = TableStats.columnStats(li, cols)
    val approx = TableStats.columnStats(li, cols, approx = true, rsd = 0.05)
    assert(approx.schema == exact.schema)
    // The whole point of the approx path: the multi-DISTINCT Expand
    // (rows x #columns map-side) must be gone from the physical plan.
    val exactPlan = exact.queryExecution.executedPlan.toString
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact NDV should plan an Expand")
    assert(!approxPlan.contains("Expand"),
      s"approx NDV must not plan an Expand:\n$approxPlan")
    val e = exact.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val a = approx.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // min/max/nulls are exact on both paths; NDV within 3x rsd.
    val eRest = exact.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    val aRest = approx.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    assert(eRest == aRest)
    cols.foreach { c =>
      val rel = math.abs(a(c).toDouble / e(c).toDouble - 1.0)
      assert(rel <= 0.15, s"$c: approx ndv ${a(c)} vs exact ${e(c)}")
    }
  }

  test("columnCorrelations: overflow contract is enforced, not silent") {
    // In-range input still works...
    val ok = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.5)).toDF("x", "y")
    val corr = TableStats.columnCorrelations(ok, Seq("x", "y"))
      .select("corr").as[Double].head()
    assert(corr > 0.99)
    // ...but out-of-contract magnitudes raise at action time instead of
    // returning a wrapped result. This input is crafted so every ACTUAL
    // per-row product and sum still fits a Long (so ANSI's own overflow
    // check stays silent) while the worst-case bound (max|x|·scale)²·n
    // exceeds 2^63 — exactly the case only the contract guard catches:
    // scaled x = 2e9, x² = 4e18 < 2^63, but 4e18·3 rows ≥ 2^63.
    val huge = Seq((2.0e5, 1.0), (0.1, 2.0), (0.2, 3.0)).toDF("x", "y")
    val ex = intercept[Exception] {
      TableStats.columnCorrelations(huge, Seq("x", "y")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("overflow contract")),
      s"expected fail-fast overflow error, got: $ex")
  }

  test("joinCardinality predicts the exact join size without running the join") {
    import spark.implicits._
    // Keys: 1 -> 2x3 rows, 2 -> 1x1, 3 only left, 4 only right.
    val left = Seq(1L, 1L, 2L, 3L).toDF("ka")
    val right = Seq(1L, 1L, 1L, 2L, 4L).toDF("kb")
    val r = TableStats.joinCardinality(left, "ka", right, "kb").head()
    assert(r.getLong(0) == 2, "keys 1 and 2 match")
    assert(r.getLong(1) == 7, "2*3 + 1*1")
    assert(r.getLong(2) == 6, "worst key volume")
    assert(r.getLong(3) == 1L, "top key")
    // The prediction equals the actual join count.
    val actual = left.join(right, col("ka") === col("kb")).count()
    assert(actual == r.getLong(1))
  }

  test("columnCorrelationsAuto derives a safe scale and keeps the answer") {
    // Copula-generated inputs with a KNOWN Pearson correlation (0.6)
    // and magnitudes that overflow the 10^4 default at this n.
    val df = TableGen.correlated(spark, 40000L, 5L,
        Seq(Seq(1.0, 0.6), Seq(0.6, 1.0)),
        "a" -> Gen.Float64Normal(0, 1), "b" -> Gen.Float64Normal(0, 1))
      .selectExpr("a * 1e7 AS a", "b * 1e7 AS b")
    intercept[Exception] { // default fixed scale must fail FAST, not wrap
      graft.operators.TableStats.columnCorrelations(df, Seq("a", "b"))
        .collect()
    }
    val r = graft.operators.TableStats.columnCorrelationsAuto(df, Seq("a", "b"))
      .head()
    assert(math.abs(r.getDouble(3) - 0.6) < 0.02,
      s"auto-scaled corr = ${r.getDouble(3)}")
    // Sub-1 scales are coarser fixed-point, not failure: magnitudes that
    // would need scale 1e-24 still resolve millions of levels.
    val huge = df.selectExpr("a * 1e30 AS a", "b * 1e30 AS b")
    val rh = graft.operators.TableStats
      .columnCorrelationsAuto(huge, Seq("a", "b")).head()
    assert(math.abs(rh.getDouble(3) - 0.6) < 0.02,
      s"huge-magnitude corr = ${rh.getDouble(3)}")
  }

  test("auto gate pin: the fixture derivation resolves to the 10^4 cap") {
    // diag_column_corr_auto's oracle replays the FIXED 10^4 mirror; this
    // pin fails loudly if a fixture resize ever moves the derived scale.
    val li = spark.read.parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")
    val cols = Seq("l_quantity", "l_discount", "l_tax")
    val auto = graft.operators.TableStats.columnCorrelationsAuto(li, cols)
      .collect().toSet
    val fixed = graft.operators.TableStats.columnCorrelations(li, cols)
      .collect().toSet
    assert(auto == fixed)
  }
}
