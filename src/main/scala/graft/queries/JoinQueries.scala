package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TopKAggregator
import graft.operators.{Joins, Sketches}

/** As-of join, salted skew join, and custom typed UDAF coverage, with
  * DuckDB oracles (DuckDB's native ASOF JOIN checks our composition). */
object JoinQueries {

  /** Planted-skew join inputs: left = lineitem with ~75% of rows collapsed
    * onto hot key 1 (plus a unique row id for salting), right = orders
    * keyed by o_orderkey (unique — the hot key matches exactly one right
    * row, so the join stays linear and salted/AQE/plain variants are
    * comparable). Shared by the join_aqe_skew gate and AqeSkewSpec. */
  /** Child session tuned so AQE's OptimizeSkewedJoin fires at fixture
    * size: sort-merge forced, skew thresholds scaled down (at real scale
    * the defaults behave the same). Single source of truth for the
    * join_aqe_skew gate and AqeSkewSpec — retuning one retunes both. */
  def skewTunedSession(spark: SparkSession): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    s2
  }

  def skewedPair(lineitem: DataFrame, orders: DataFrame)
      : (DataFrame, DataFrame) = {
    // The round-robin repartition gives the join's key shuffle many map
    // tasks: AQE splits a skewed reduce partition by MAPPER ranges, so a
    // single-mapper stage (the fixture parquet is one row group -> one
    // scan task) is unsplittable no matter how skewed. A real cluster has
    // thousands of mappers; this recreates that precondition at test size.
    val l = lineitem.repartition(16).select(
      when(col("l_orderkey") % 4 < 3, lit(1L)).otherwise(col("l_orderkey"))
        .as("k"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("row_id"),
      col("l_quantity"))
    val r = orders.select(col("o_orderkey").as("k"), col("o_orderstatus"))
    (l, r)
  }

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
    // Forward as-of: each error event picks up the NEXT click's value.
    "join_asof_forward" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
      val clicks = ev.where(col("event_type") === "click")
      Joins.asofForward(errors, clicks, Seq("user_id"), "ts", "ts",
          "event_id", Seq("value"), rightTieCols = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("r_value").as("next_click_value"))
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
    // AQE skew join: ~75% of lineitem rows collapse onto one hot key; the
    // query runs on the shared skew-tuned session. The oracle replays the
    // join; AqeSkewSpec asserts the plan split and equality with the
    // explicit saltedJoin.
    "join_aqe_skew" -> { (s, dir) =>
      val s2 = skewTunedSession(s)
      val (li, o) = (Tables.load(s2, dir, "lineitem"), Tables.load(s2, dir, "orders"))
      JoinQueries.skewedPair(li, o) match { case (l, r) =>
        l.join(r, "k")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
      }
    },
    // Interval-OVERLAP join (interval × interval — rangeJoin's point side
    // generalized): per-user daily activity spans × high-error incident
    // hours, binned to an hour-keyed equi-join with the first-shared-bin
    // rule (each overlapping pair emitted exactly once, no distinct).
    "join_interval_overlap" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val sessions = ev.groupBy(col("user_id"),
          to_date(col("ts")).cast("string").as("day"))
        .agg(min(unix_timestamp(col("ts"))).as("s_lo"),
          max(unix_timestamp(col("ts"))).as("s_hi"))
      val incidents = ev.where(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n_err"))
        .where(col("n_err") >= 5)
        .select(unix_timestamp(col("h")).as("i_lo"),
          (unix_timestamp(col("h")) + 3599L).as("i_hi"), col("n_err"))
      Joins.intervalOverlapJoin(sessions, "s_lo", "s_hi",
          incidents, "i_lo", "i_hi", 3600.0)
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_incidents"),
          sum(col("n_err")).as("err_vol"))
    },
    // Binned range join: overlapping value buckets vs event values —
    // an equi-join plan (no nested loop), exact BETWEEN refilter.
    "join_range_bins" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events").select(col("event_id"), col("value"))
      val ranges = s.range(0, 13).select(col("id").as("bucket_id"),
        (col("id") * 40.0).as("lo"), (col("id") * 40.0 + 80.0).as("hi"))
      Joins.rangeJoin(ev, "value", ranges, "lo", "hi", 40.0)
        .groupBy("bucket_id")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
    },
    // The SAME range join written as a plain inequality join, planned fast
    // by the RangeJoinRewrite optimizer rule (installed session-wide, as
    // GraftExtensions would on a cluster) — users keep declarative SQL and
    // the nested loop disappears.
    "join_range_rewrite" -> { (s, dir) =>
      import graft.plans.RangeJoinRewrite
      // Install the rule + conf on an isolated child session (shared
      // SparkContext, own SessionState): the returned DataFrame optimizes
      // lazily, so the rule must be live when the caller runs it, but the
      // parent session's planner must stay untouched.
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ RangeJoinRewrite
      s2.conf.set(RangeJoinRewrite.ConfKey, "40.0")
      val ev = Tables.load(s2, dir, "events").select(col("event_id"), col("value"))
      val ranges = s2.range(0, 13).select(col("id").as("bucket_id"),
        (col("id") * 40.0).as("lo"), (col("id") * 40.0 + 80.0).as("hi"))
      ev.join(ranges, col("value") >= col("lo") && col("value") <= col("hi"))
        .groupBy("bucket_id")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
    },
    // Bloom-prefiltered join: a selective dim (urgent orders, ~20%) builds
    // a Bloom filter probed on lineitem BEFORE the join — the explicit
    // runtime-filter pattern. False positives die in the join; the oracle
    // is the plain join.
    "join_bloom_prune" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.load(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderstatus"))
      Joins.bloomPrefilteredJoin(li, "l_orderkey", dim, "o_orderkey",
          expectedItems = 50000L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
    },
    // Blocked fuzzy join: distinct part names self-matched at edit
    // distance <= 3, blocking on the last token (the noun) — a linear
    // equi-join, never a cross product.
    "join_fuzzy_names" -> { (s, dir) =>
      val names = Tables.load(s, dir, "part").select(col("p_name")).distinct()
      Joins.fuzzyJoin(names, "p_name", names, "p_name", 3,
          c => element_at(split(col(c), " "), -1))
        .where(col("name_a") < col("name_b"))
    },
    // Point-in-time (feature-store) join: each order picks up the
    // customer-dimension VERSION valid at order date — the leak-proof
    // way to attach dimension features to historical facts. The SCD2
    // fixture gives every customer two versions split at a
    // key-deterministic cutover date.
    "join_point_in_time" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val cut = date_add(lit("1994-01-01").cast("date"),
        (col("c_custkey") % 365).cast("int"))
      val dims = cust.select(col("c_custkey"),
          col("c_mktsegment").as("segment"),
          lit("1992-01-01").cast("date").as("eff_start"),
          cut.as("eff_end"))
        .unionByName(cust.select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("_v2")).as("segment"),
          cut.as("eff_start"),
          lit("9999-12-31").cast("date").as("eff_end")))
      val facts = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          to_date(col("o_orderdate")).as("od"))
      Joins.pointInTimeJoin(facts, "od", dims, "c_custkey",
          "eff_start", "eff_end")
        .select(col("o_orderkey"), col("c_custkey"),
          // ISO string: DATE round-trips differently through the two
          // engines' parquet/pandas paths; text is unambiguous.
          col("od").cast("string").as("od"), col("segment"))
    },
    // STREAMING point-in-time enrichment: fact micro-batches PIT-join
    // the versioned dimension as they arrive (each row sees the version
    // effective AT ITS OWN date — no leakage from later versions),
    // landing idempotently per batch. PIT attachment is per-row, so the
    // accumulated output equals the batch join — same oracle verbatim.
    "stream_pit_enrich" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val cut = date_add(lit("1994-01-01").cast("date"),
        (col("c_custkey") % 365).cast("int"))
      val dims = cust.select(col("c_custkey"),
          col("c_mktsegment").as("segment"),
          lit("1992-01-01").cast("date").as("eff_start"),
          cut.as("eff_end"))
        .unionByName(cust.select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("_v2")).as("segment"),
          cut.as("eff_start"),
          lit("9999-12-31").cast("date").as("eff_end")))
      val facts = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          to_date(col("o_orderdate")).as("od"))
      val days = Seq(facts.where(col("o_orderkey") % 2 === 0),
        facts.where(col("o_orderkey") % 2 === 1))
      val logDir = Staging.batchLog("spit", dir, "b", days)
      val root = Staging.freshStateRoot("graft_spit")
      val stream = s.readStream.schema(days.head.schema)
        .option("maxFilesPerTrigger", 1).parquet(logDir)
      graft.streaming.EventStream.runForeachBatch(s, stream, (batch, id) =>
        Joins.pointInTimeJoin(batch, "od", dims, "c_custkey",
            "eff_start", "eff_end")
          .select(col("o_orderkey"), col("c_custkey"),
            col("od").cast("string").as("od"), col("segment"))
          .write.mode("overwrite").parquet(s"$root/out/batch_id=$id"))
      s.read.parquet(s"$root/out")
        .select("o_orderkey", "c_custkey", "od", "segment")
    },
    // Count-min sketch: build over lineitem part keys, probe 8 keys.
    "agg_cms_estimate" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      // The fixture is one row group -> one split; spread the CPU-bound
      // hashing across the cluster's cores.
      val sketch = Sketches.cmsBuild(li, "l_partkey",
        spreadPartitions = s.sparkContext.defaultParallelism)
      Sketches.cmsEstimate(sketch, s.range(1, 9).select(col("id").as("k")), "k")
    },
    // STREAMING CMS fold: key batches merge into the accumulated d x w
    // grid by counter addition; the estimate over the folded state must
    // equal the one-pass sketch over everything (the oracle builds it
    // directly over all rows — the mergeable-sketch streaming contract).
    "stream_cms_fold" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_linenumber"))
      val history = li.where(col("l_linenumber") === 1)
        .select("l_partkey")
      val days = Seq(
        li.where(col("l_linenumber") % 2 === 0).select("l_partkey"),
        li.where(col("l_linenumber") % 2 === 1 && col("l_linenumber") > 1)
          .select("l_partkey"))
      val logDir = Staging.batchLog("scms", dir, "b", days)
      val sketch = graft.streaming.SketchStream.incrementalCms(
        s, history, logDir, days.head.schema,
        s"${Staging.freshStateRoot("graft_scms")}/state", "l_partkey")
      Sketches.cmsEstimate(sketch, s.range(1, 9).select(col("id").as("k")),
        "k")
    },
    // Mergeable quantile sketch: per-event-type histogram sketches merged
    // to a global one (merge == count addition, lossless), quantiles read
    // from the merged sketch. The oracle builds the global histogram
    // DIRECTLY — equality proves merge-then-query == query-everything.
    "agg_quantile_sketch" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val perType = Sketches.histBuild(ev,
        round(col("value") * 100).cast("long"), 500L, Seq("event_type"))
      val merged = Sketches.histMerge(perType)
      Sketches.histQuantiles(merged, Seq(0.1, 0.5, 0.9, 0.99), 500L)
    },
    // KLL quantile sketch (DataSketches, randomized): per-partition build,
    // per-event-type sketches merged, both checked against EXACT ranks
    // within the k=200 error bound (property gate — KLL's compaction
    // coin-flips make an exact hash impossible by design).
    "agg_kll_quantiles" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val direct = Sketches.kllFromValues(
        ev.select(col("value").cast("double")).as[java.lang.Double], 200)
      val groupBytes = ev
        .select(col("event_type"), col("value").cast("double"))
        .as[(String, Double)]
        .groupByKey(_._1)
        .mapGroups { (_, it) =>
          val sk = org.apache.datasketches.kll.KllDoublesSketch
            .newHeapInstance(200)
          it.foreach(r => sk.update(r._2))
          sk.toByteArray
        }.collect()
      val merged = Sketches.kllMergeBytes(groupBytes.toSeq, 200)
      val qs = Seq(0.1, 0.5, 0.9, 0.99)
      val ests = qs.map(q => (q, direct.getQuantile(q), merged.getQuantile(q)))
      val estDf = ests.toDF("q", "est_d", "est_m")
      ev.crossJoin(broadcast(estDf))
        .groupBy("q")
        .agg(
          (sum(when(col("value") <= col("est_d"), 1.0).otherwise(0.0)) /
            count(lit(1))).as("rd"),
          (sum(when(col("value") <= col("est_m"), 1.0).otherwise(0.0)) /
            count(lit(1))).as("rm"))
        .select(col("q"),
          (abs(col("rd") - col("q")) <= 0.05).as("ok_direct"),
          (abs(col("rm") - col("q")) <= 0.05).as("ok_merged"))
    },
    // Theta-sketch set algebra: per-segment customer-key sketches
    // intersected / differenced against the "has orders" key sketch —
    // the cross-corpus overlap estimator (HLL can only union). Below the
    // 4096 nominal the sketches are exact, but theta estimation is
    // randomized above it, so the gate is a property: estimates within
    // max(2, 5%) of the exact joins, per segment.
    // EXACT heavy hitters: tokens covering >= 0.5% of the word stream,
    // via a bounded Misra-Gries candidate pass + exact recount — the
    // output provably equals the plain GROUP BY ... HAVING oracle, but
    // never materializes the full vocabulary.
    "agg_heavy_hitters" -> { (s, dir) =>
      val toks = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
      Sketches.exactHeavyHitters(toks, "w", 0.005)
    },
    "agg_theta_intersect" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_mktsegment").as("seg"),
          col("c_custkey").cast("long").as("k"))
      val buyers = Tables.load(s, dir, "orders")
        .select(lit("all").as("seg"), col("o_custkey").cast("long").as("k"))
      val segSk = Sketches.thetaPerGroup(cust, "seg", "k")
      val buySk = Sketches.thetaPerGroup(buyers, "seg", "k")("all")
      val ests = segSk.toSeq.map { case (g, sk) =>
        (g, math.rint(Sketches.thetaIntersect(sk, buySk).getEstimate).toLong,
          math.rint(Sketches.thetaANotB(sk, buySk).getEstimate).toLong)
      }
      val estDf = ests.toDF("seg", "est_inter", "est_diff")
      val exact = cust
        .join(buyers.select(col("k")).distinct()
          .withColumn("buyer", lit(1)), Seq("k"), "left")
        .groupBy("seg")
        .agg(countDistinct(when(col("buyer").isNotNull, col("k")))
            .as("x_inter"),
          countDistinct(when(col("buyer").isNull, col("k"))).as("x_diff"))
      estDf.join(exact, Seq("seg"))
        .select(col("seg"),
          (abs(col("est_inter") - col("x_inter")) <=
            greatest(lit(2.0), col("x_inter") * 0.05)).as("ok_inter"),
          (abs(col("est_diff") - col("x_diff")) <=
            greatest(lit(2.0), col("x_diff") * 0.05)).as("ok_diff"))
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
    // Window-ranked instead of DuckDB's native ASOF JOIN: ASOF picks an
    // UNSPECIFIED row among right rows tied on the minimal/maximal ts,
    // while the Spark operator breaks ties on event_id — the oracle must
    // pin the same total order or (user_id, ts) click collisions make the
    // exact-hash gate engine-dependent.
    "join_asof_events" ->
      """WITH ranked AS (
        |  SELECT e.event_id, e.user_id, c.value,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'error') e
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON e.user_id = c.user_id AND c.ts <= e.ts)
        |SELECT event_id, user_id, value AS prev_click_value
        |FROM ranked WHERE rn = 1""".stripMargin,
    "join_asof_forward" ->
      """WITH ranked AS (
        |  SELECT e.event_id, e.user_id, c.value,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                       ORDER BY c.ts ASC, c.event_id ASC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'error') e
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON e.user_id = c.user_id AND c.ts >= e.ts)
        |SELECT event_id, user_id, value AS next_click_value
        |FROM ranked WHERE rn = 1""".stripMargin,
    "join_interval_overlap" ->
      """WITH sess AS (SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |    CAST(floor(epoch(min(ts))) AS BIGINT) AS s_lo,
        |    CAST(floor(epoch(max(ts))) AS BIGINT) AS s_hi
        |  FROM events GROUP BY 1, 2),
        |  inc AS (SELECT
        |    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS i_lo,
        |    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) + 3599
        |      AS i_hi,
        |    CAST(COUNT(*) AS BIGINT) AS n_err
        |  FROM events WHERE event_type = 'error'
        |  GROUP BY date_trunc('hour', ts) HAVING COUNT(*) >= 5)
        |SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_incidents,
        |  CAST(SUM(n_err) AS BIGINT) AS err_vol
        |FROM sess JOIN inc ON s_lo <= i_hi AND i_lo <= s_hi
        |GROUP BY 1, 2""".stripMargin,
    "join_range_bins" ->
      """SELECT bucket_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events, (SELECT k AS bucket_id, k * 40.0 AS lo,
        |              k * 40.0 + 80.0 AS hi
        |              FROM unnest(range(13)) AS t(k)) r
        |WHERE value >= lo AND value <= hi
        |GROUP BY bucket_id""".stripMargin,
    "join_range_rewrite" ->
      """SELECT bucket_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events, (SELECT k AS bucket_id, k * 40.0 AS lo,
        |              k * 40.0 + 80.0 AS hi
        |              FROM unnest(range(13)) AS t(k)) r
        |WHERE value >= lo AND value <= hi
        |GROUP BY bucket_id""".stripMargin,
    // Folded state == one-pass sketch, so the oracle is identical.
    "stream_cms_fold" ->
      """WITH ht AS (SELECT i,
        |    ('0x' || substr(md5('cms' || i || ':' ||
        |       CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT % 1024 AS c,
        |    COUNT(*) AS cnt
        |  FROM lineitem, unnest(range(4)) AS u(i) GROUP BY 1, 2),
        |probe AS (SELECT k, i,
        |    ('0x' || substr(md5('cms' || i || ':' ||
        |       CAST(k AS VARCHAR)), 1, 15))::BIGINT % 1024 AS c
        |  FROM unnest(range(1, 9)) AS t(k), unnest(range(4)) AS u(i))
        |SELECT k AS key, CAST(MIN(coalesce(cnt, 0)) AS BIGINT) AS est
        |FROM probe LEFT JOIN ht USING (i, c)
        |GROUP BY k""".stripMargin,
    "agg_cms_estimate" ->
      """WITH ht AS (SELECT i,
        |    ('0x' || substr(md5('cms' || i || ':' ||
        |       CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT % 1024 AS c,
        |    COUNT(*) AS cnt
        |  FROM lineitem, unnest(range(4)) AS u(i) GROUP BY 1, 2),
        |probe AS (SELECT k, i,
        |    ('0x' || substr(md5('cms' || i || ':' ||
        |       CAST(k AS VARCHAR)), 1, 15))::BIGINT % 1024 AS c
        |  FROM unnest(range(1, 9)) AS t(k), unnest(range(4)) AS u(i))
        |SELECT k AS key, CAST(MIN(coalesce(cnt, 0)) AS BIGINT) AS est
        |FROM probe LEFT JOIN ht USING (i, c)
        |GROUP BY k""".stripMargin,
    "join_aqe_skew" ->
      """WITH l AS (SELECT CASE WHEN l_orderkey % 4 < 3 THEN 1
        |                       ELSE l_orderkey END AS k, l_quantity
        |           FROM lineitem),
        |r AS (SELECT o_orderkey AS k, o_orderstatus FROM orders)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM l JOIN r USING (k)
        |GROUP BY o_orderstatus""".stripMargin,
    "agg_kll_quantiles" ->
      """SELECT q, TRUE AS ok_direct, TRUE AS ok_merged
        |FROM unnest([0.1, 0.5, 0.9, 0.99]) t(q)""".stripMargin,
    "agg_theta_intersect" ->
      """SELECT DISTINCT c_mktsegment AS seg, TRUE AS ok_inter,
        |  TRUE AS ok_diff FROM customer""".stripMargin,
    "agg_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS item
        |             FROM documents),
        |t AS (SELECT COUNT(*) AS n FROM tok)
        |SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM tok, t GROUP BY item, n
        |HAVING COUNT(*) >= CAST(ceil(0.005 * n) AS BIGINT)""".stripMargin,
    "agg_quantile_sketch" ->
      """WITH cents AS (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |b AS (SELECT (c - ((c % 500 + 500) % 500)) // 500 AS bucket,
        |             COUNT(*) AS cnt FROM cents GROUP BY 1),
        |cum AS (SELECT bucket, cnt,
        |    SUM(cnt) OVER (ORDER BY bucket) AS cum,
        |    SUM(cnt) OVER () AS n FROM b),
        |qs AS (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q)
        |SELECT q, CAST((MIN(bucket) + 1) * 500 AS BIGINT) AS est_cents,
        |  CAST(MAX(n) AS BIGINT) AS n
        |FROM qs JOIN cum ON cum >= ceil(q * n)
        |GROUP BY q""".stripMargin,
    "join_fuzzy_names" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM n)
        |SELECT a.p_name AS name_a, c.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, c.p_name) AS BIGINT) AS dist
        |FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
        |WHERE levenshtein(a.p_name, c.p_name) <= 3""".stripMargin,
    // Per-row PIT attachment: the streamed fold equals the batch join.
    "stream_pit_enrich" ->
      """WITH d AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |    DATE '1992-01-01' AS eff_start,
        |    DATE '1994-01-01' + CAST(c_custkey % 365 AS INTEGER) AS eff_end
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment || '_v2',
        |    DATE '1994-01-01' + CAST(c_custkey % 365 AS INTEGER),
        |    DATE '9999-12-31'
        |  FROM customer)
        |SELECT o.o_orderkey, o.o_custkey AS c_custkey,
        |  CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS od, d.segment
        |FROM orders o JOIN d ON o.o_custkey = d.c_custkey
        |WHERE CAST(o.o_orderdate AS DATE) >= d.eff_start
        |  AND CAST(o.o_orderdate AS DATE) < d.eff_end""".stripMargin,
    "join_point_in_time" ->
      """WITH d AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |    DATE '1992-01-01' AS eff_start,
        |    DATE '1994-01-01' + CAST(c_custkey % 365 AS INTEGER) AS eff_end
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment || '_v2',
        |    DATE '1994-01-01' + CAST(c_custkey % 365 AS INTEGER),
        |    DATE '9999-12-31'
        |  FROM customer)
        |SELECT o.o_orderkey, o.o_custkey AS c_custkey,
        |  CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS od, d.segment
        |FROM orders o JOIN d ON o.o_custkey = d.c_custkey
        |WHERE CAST(o.o_orderdate AS DATE) >= d.eff_start
        |  AND CAST(o.o_orderdate AS DATE) < d.eff_end""".stripMargin,
    "join_bloom_prune" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus""".stripMargin,
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
