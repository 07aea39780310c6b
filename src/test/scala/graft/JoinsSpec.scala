package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends GraftSuite {
  private val dir = SparkTestBase.sf001

  test("asof backward: matched value is the latest prior click") {
    val ev = Tables.load(spark, dir, "events")
    val errors = ev.where(col("event_type") === "error")
    val clicks = ev.where(col("event_type") === "click")
    val asof = Joins.asofBackward(errors, clicks, Seq("user_id"), "ts", "ts",
      "event_id", Seq("value"))
    // Every asof_ts is <= the error ts, and no later click exists between.
    assert(asof.where(col("asof_ts") > col("ts")).count() == 0)
    val sample = asof.where(col("asof_ts").isNotNull).limit(5).collect()
    sample.foreach { r =>
      val uid = r.getLong(r.fieldIndex("user_id"))
      val ets = r.getTimestamp(r.fieldIndex("ts"))
      val ats = r.getTimestamp(r.fieldIndex("asof_ts"))
      val later = clicks.where(col("user_id") === uid &&
        col("ts") <= lit(ets) && col("ts") > lit(ats)).count()
      assert(later == 0, s"found a later prior click for user $uid")
    }
    // Unmatched errors (no prior click) keep nulls.
    assert(asof.count() == errors.count())
  }

  test("asof with tolerance bounds the match window") {
    val ev = Tables.load(spark, dir, "events")
    val errors = ev.where(col("event_type") === "error")
    val clicks = ev.where(col("event_type") === "click")
    val tight = Joins.asofBackward(errors, clicks, Seq("user_id"), "ts", "ts",
      "event_id", Seq("value"), toleranceMs = 60000L)
    val loose = Joins.asofBackward(errors, clicks, Seq("user_id"), "ts", "ts",
      "event_id", Seq("value"))
    assert(tight.where(col("asof_ts").isNotNull).count() <=
      loose.where(col("asof_ts").isNotNull).count())
    assert(tight.where(
      col("asof_ts") < col("ts") - expr("INTERVAL 60 SECOND")).count() == 0)
  }

  test("salted join equals plain join") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val salted = Joins.saltedJoin(li, o, "k", 8, "l_quantity")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plain = li.join(o, "k")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    // warehouse.dir is a static conf, set to a temp dir in SparkTestBase.
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    // Disable auto-broadcast so the planner actually uses the bucketed
    // sort-merge path (at real scale neither side is broadcastable).
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("ShuffleExchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
  }

  test("topk aggregator: ascending array of the k largest") {
    graft.functions.TopKAggregator.register(spark, 3)
    import spark.implicits._
    val df = Seq(5.0, 1.0, 9.0, 7.0, 3.0).toDF("v")
    val r = df.agg(expr("topk3_agg(v)")).collect()(0).getSeq[Double](0)
    assert(r == Seq(5.0, 7.0, 9.0))
  }

  test("rangeJoin == naive inequality join, across bin-boundary shapes") {
    import spark.implicits._
    // Ranges spanning multiple bins, sub-bin ranges, exact-boundary points.
    val ranges = Seq((1L, 0.0, 100.0), (2L, 15.0, 17.0), (3L, 10.0, 10.0),
      (4L, 95.0, 205.0)).toDF("rid", "lo", "hi")
    val points = Seq((10L, 0.0), (11L, 10.0), (12L, 16.5), (13L, 100.0),
      (14L, 200.0), (15L, 205.0), (16L, 300.0)).toDF("pid", "v")
    val got = Joins.rangeJoin(points, "v", ranges, "lo", "hi", 10.0)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(ranges, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got $got want $want")
    assert(want.contains((15L, 4L)) && want.contains((11L, 3L)))
  }

  test("rangeJoin == naive join on randomized inputs incl. negatives (3 seeds)") {
    import spark.implicits._
    Seq(11, 22, 33).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val ranges = (1 to 40).map { i =>
        val lo = rnd.nextDouble() * 400 - 200 // negative coordinates too
        (i.toLong, lo, lo + rnd.nextDouble() * 60)
      }.toDF("rid", "lo", "hi")
      val points = (1 to 300).map(i =>
        (i.toLong, rnd.nextDouble() * 500 - 250)).toDF("pid", "v")
      Seq(7.5, 50.0).foreach { w =>
        val got = Joins.rangeJoin(points, "v", ranges, "lo", "hi", w)
          .select("pid", "rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = points
          .join(ranges, col("v") >= col("lo") && col("v") <= col("hi"))
          .select("pid", "rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"seed=$seed w=$w: ${got.size} vs ${want.size}")
      }
    }
  }

  test("count-min sketch: estimates >= exact counts, zero for absent keys") {
    import spark.implicits._
    import graft.operators.Sketches
    val li = Tables.load(spark, dir, "lineitem")
    val keys = spark.range(1, 9).select(col("id").as("k"))
      .unionAll(Seq(999999L).toDF("k")) // absent key
    val sketch = Sketches.cmsBuild(li, "l_partkey")
    val est = Sketches.cmsEstimate(sketch, keys, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 8L).foreach { k =>
      assert(est(k) >= exact.getOrElse(k, 0L),
        s"CMS underestimated key $k: ${est(k)} < ${exact.getOrElse(k, 0L)}")
    }
    // 4 independent hash rows over 1024 cells: an absent key collides in
    // ALL rows with probability ~ (n_keys/1024)^4 — 0 here.
    assert(est(999999L) == 0L)
  }

  test("fuzzy join: blocked equi-join matches the unblocked filter within blocks") {
    import spark.implicits._
    val left = Seq("red bolt", "rod bolt", "blue bolt", "red gear")
      .toDF("p_name")
    val out = graft.operators.Joins.fuzzyJoin(left, "p_name", left, "p_name",
        2, c => element_at(split(col(c), " "), -1))
      .where(col("name_a") < col("name_b"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // "red bolt"~"rod bolt" dist 1; "blue bolt" is 3+ from both; "red
    // gear" is in another block even though dist("red bolt","red gear")=4.
    assert(out == Set(("red bolt", "rod bolt", 1L)))
    // plan stays an equi-join: no cartesian/nested-loop node
    val plan = graft.operators.Joins.fuzzyJoin(left, "p_name", left, "p_name",
      2, c => element_at(split(col(c), " "), -1))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("pointInTimeJoin: version boundaries, pre-history facts, outer nulls") {
    import spark.implicits._
    val dims = Seq(
      (1L, "segA", "2020-01-01", "2020-06-01"),
      (1L, "segB", "2020-06-01", "9999-12-31"))
      .toDF("k", "segment", "eff_start", "eff_end")
      .select(col("k"), col("segment"),
        col("eff_start").cast("date").as("eff_start"),
        col("eff_end").cast("date").as("eff_end"))
    val facts = Seq((10L, 1L, "2020-05-31"), (11L, 1L, "2020-06-01"),
        (12L, 1L, "2019-12-31"))
      .toDF("fid", "k", "ts").select(col("fid"), col("k"),
        col("ts").cast("date").as("ts"))
    val inner = Joins.pointInTimeJoin(facts, "ts", dims, "k",
        "eff_start", "eff_end")
      .select("fid", "segment").as[(Long, String)].collect().toMap
    // Start date inclusive, end exclusive; pre-history fact dropped.
    assert(inner == Map(10L -> "segA", 11L -> "segB"))
    val outer = Joins.pointInTimeJoin(facts, "ts", dims, "k",
        "eff_start", "eff_end", inner = false)
      .select("fid", "segment").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(outer == Map(10L -> Some("segA"), 11L -> Some("segB"),
      12L -> None), "pre-history fact must survive with null attributes")
  }

  test("pointInTimeJoin outer: matched fact with NULL column emits ONCE") {
    import spark.implicits._
    val dims = Seq((1L, "segA", "2020-01-01", "9999-12-31"))
      .toDF("k", "segment", "eff_start", "eff_end")
      .select(col("k"), col("segment"),
        col("eff_start").cast("date").as("eff_start"),
        col("eff_end").cast("date").as("eff_end"))
    // Fact 10 matches a version AND carries a NULL payload column — the
    // regression case: a null-rejecting anti-join on all fact columns
    // would emit it twice (matched + null-extended miss).
    val facts = Seq(
        (10L, 1L, "2020-05-31", Option.empty[String]),
        (11L, 1L, "2019-12-31", Some("note")))
      .toDF("fid", "k", "ts", "payload")
      .select(col("fid"), col("k"), col("ts").cast("date").as("ts"),
        col("payload"))
    val outer = Joins.pointInTimeJoin(facts, "ts", dims, "k",
      "eff_start", "eff_end", inner = false)
    assert(outer.count() == 2L, "each fact must emit exactly one row")
    val byFid = outer.select("fid", "segment").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byFid == Map(10L -> Some("segA"), 11L -> None))
  }
}
