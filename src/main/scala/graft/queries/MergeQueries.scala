package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Merge

/**
 * Correctness queries for the keyed-merge family (upsert, SCD2). The
 * change batches are derived deterministically from the fixture tables so
 * the DuckDB oracle replays the identical MERGE semantics in plain SQL.
 * Money stays in exact cents (BIGINT); validity bounds are BIGINT epochs.
 */
object MergeQueries {

  /** Shared changelog fixture: (base snapshot, out-of-order CDC log). */
  private def changelogFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val o = Tables.load(s, dir, "orders")
    val base = o.select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val log = o.where(col("o_orderkey") % 40 === 0)
      .select(col("o_orderkey").as("k"), lit("R").as("status"),
        lit(0L).as("cents"), lit(3L).as("seq"), lit("I").as("op"))
      .unionByName(o.where(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey").as("k"), lit("X").as("status"),
          lit(0L).as("cents"), lit(2L).as("seq"), lit("D").as("op")))
      .unionByName(o.where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("k"), lit("U").as("status"),
          round((col("o_totalprice") + 1000) * 100).cast("long").as("cents"),
          lit(1L).as("seq"), lit("U").as("op")))
      .unionByName(o.where(col("o_orderkey") % 100 === 0)
        .select((col("o_orderkey") + 2000000L).as("k"), lit("N").as("status"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          lit(1L).as("seq"), lit("I").as("op")))
    (base, log)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MERGE INTO: every 10th order is updated (status 'U', +1000 price);
    // every 100th arrives as a brand-new key. Output = merged snapshot.
    "merge_upsert" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val base = o.select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val upd = o.where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("k"), lit("U").as("status"),
          round((col("o_totalprice") + 1000) * 100).cast("long").as("cents"))
        .unionByName(o.where(col("o_orderkey") % 100 === 0)
          .select((col("o_orderkey") + 1000000L).as("k"), lit("N").as("status"),
            round(col("o_totalprice") * 100).cast("long").as("cents")))
      Merge.upsert(base, upd, Seq("k"))
    },
    // SCD2: open rows for every customer (valid_from 0); one change batch
    // at t=100 rewrites segment for key%7=0, no-ops key%13=0 (same
    // value), and inserts new keys (+100000 for key%50=0). Output = the
    // full new history with closed + open validity intervals.
    "merge_scd2" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val current = c.select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"),
        lit(0L).as("vf"), lit(null).cast("long").as("vt"))
      val changes = c.where(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("k"), lit("SEG_A").as("seg"))
        .unionByName(c.where(col("c_custkey") % 13 === 0 &&
            col("c_custkey") % 7 =!= 0)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg")))
        .unionByName(c.where(col("c_custkey") % 50 === 0)
          .select((col("c_custkey") + 100000L).as("k"),
            lit("SEG_NEW").as("seg")))
      Merge.scd2Apply(current, changes, Seq("k"), Seq("seg"),
        "vf", "vt", lit(100L))
    },
    // CDC changelog apply: an out-of-order log where key%10 gets an
    // update at seq 1, key%20 additionally a delete at seq 2, and key%40
    // a re-insert at seq 3 (which must beat the delete despite the union
    // order), plus brand-new keys at seq 1. Output = folded snapshot.
    "merge_changelog" -> { (s, dir) =>
      val (base, log) = changelogFixture(s, dir)
      Merge.applyChangelog(base, log, Seq("k"), "seq", "op")
    },
    // Time-travel: the table AS OF seq 2 — updates and deletes applied,
    // the seq-3 re-inserts NOT yet (those keys must still be absent).
    "merge_time_travel" -> { (s, dir) =>
      val (base, log) = changelogFixture(s, dir)
      Merge.snapshotAsOf(base, log, Seq("k"), "seq", "op", 2L)
    },
    // Version diff v1 -> v3: exactly the keys whose state changed between
    // the two time-travel reads, with I/U/D ops (the %40 re-inserts of
    // deleted keys surface as I; the seq-2 deletes of %20-but-not-%40
    // keys as D; nothing else changed between v1 and v3).
    "merge_snapshot_diff" -> { (s, dir) =>
      val (base, log) = changelogFixture(s, dir)
      Merge.snapshotDiff(
        Merge.snapshotAsOf(base, log, Seq("k"), "seq", "op", 1L),
        Merge.snapshotAsOf(base, log, Seq("k"), "seq", "op", 3L),
        Seq("k"))
    },
    // Streaming CDC materialization: the SAME changelog as
    // merge_changelog, delivered as three seq-ordered log files (one
    // micro-batch each — mtimes force file-source order, matching a
    // key-partitioned CDC log's per-key ordering), folded into versioned
    // snapshots by foreachBatch. Final snapshot == the batch fold, so it
    // shares merge_changelog's oracle.
    "stream_changelog_apply" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val base = o.select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val slices = Seq(
        o.where(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey").as("k"), lit("U").as("status"),
            round((col("o_totalprice") + 1000) * 100).cast("long").as("cents"),
            lit(1L).as("seq"), lit("U").as("op"))
          .unionByName(o.where(col("o_orderkey") % 100 === 0)
            .select((col("o_orderkey") + 2000000L).as("k"),
              lit("N").as("status"),
              round(col("o_totalprice") * 100).cast("long").as("cents"),
              lit(1L).as("seq"), lit("I").as("op"))),
        o.where(col("o_orderkey") % 20 === 0)
          .select(col("o_orderkey").as("k"), lit("X").as("status"),
            lit(0L).as("cents"), lit(2L).as("seq"), lit("D").as("op")),
        o.where(col("o_orderkey") % 40 === 0)
          .select(col("o_orderkey").as("k"), lit("R").as("status"),
            lit(0L).as("cents"), lit(3L).as("seq"), lit("I").as("op")))
      val logDir = Staging.batchLog("cdc", dir, "seq", slices)
      graft.streaming.ChangelogStream.materialize(s, base, logDir,
        slices.head.schema,
        s"${Staging.freshStateRoot("graft_cdc")}/state",
        Seq("k"), "seq", "op")
    },
  )

  val oracleSql: Map[String, String] = Map(
    "merge_upsert" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS status,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |upd AS (
        |  SELECT o_orderkey AS k, 'U' AS status,
        |    CAST(round((o_totalprice + 1000) * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000, 'N',
        |    CAST(round(o_totalprice * 100) AS BIGINT)
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT k, status, cents FROM base
        |WHERE k NOT IN (SELECT k FROM upd)
        |UNION ALL
        |SELECT k, status, cents FROM upd""".stripMargin,
    "merge_scd2" ->
      """WITH cur AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |    CAST(0 AS BIGINT) AS vf, CAST(NULL AS BIGINT) AS vt
        |  FROM customer),
        |chg AS (
        |  SELECT c_custkey AS k, 'SEG_A' AS seg FROM customer
        |  WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 13 = 0 AND c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 100000, 'SEG_NEW' FROM customer
        |  WHERE c_custkey % 50 = 0),
        |j AS (SELECT COALESCE(c.k, g.k) AS k, c.seg AS bseg, c.vf AS vf,
        |             g.seg AS cseg, c.k IS NOT NULL AS op,
        |             g.k IS NOT NULL AS ch
        |      FROM cur c FULL OUTER JOIN chg g ON c.k = g.k)
        |SELECT k, bseg AS seg, vf, CAST(NULL AS BIGINT) AS vt FROM j
        |WHERE op AND (NOT ch OR bseg IS NOT DISTINCT FROM cseg)
        |UNION ALL
        |SELECT k, bseg, vf, CAST(100 AS BIGINT) FROM j
        |WHERE op AND ch AND bseg IS DISTINCT FROM cseg
        |UNION ALL
        |SELECT k, cseg, CAST(100 AS BIGINT), CAST(NULL AS BIGINT) FROM j
        |WHERE ch AND (NOT op OR bseg IS DISTINCT FROM cseg)""".stripMargin,
    "merge_changelog" -> changelogOracle,
    // The streamed fold must land exactly where the batch fold does.
    "stream_changelog_apply" -> changelogOracle,
    "merge_time_travel" -> timeTravelOracle,
    "merge_snapshot_diff" -> snapshotDiffOracle,
  )

  /** base + log CTEs shared by every changelog replay. Lazy: the
    * oracleSql val above forces the oracles during object init, BEFORE
    * later plain vals assign — a plain val here would interpolate null. */
  private lazy val duckBaseLogCtes: String =
    """base AS (SELECT o_orderkey AS k, o_orderstatus AS status,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |log AS (
      |  SELECT o_orderkey AS k, 'R' AS status, CAST(0 AS BIGINT) AS cents,
      |    3 AS seq, 'I' AS op FROM orders WHERE o_orderkey % 40 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'X', CAST(0 AS BIGINT), 2, 'D'
      |  FROM orders WHERE o_orderkey % 20 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'U',
      |    CAST(round((o_totalprice + 1000) * 100) AS BIGINT), 1, 'U'
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 2000000, 'N',
      |    CAST(round(o_totalprice * 100) AS BIGINT), 1, 'I'
      |  FROM orders WHERE o_orderkey % 100 = 0)""".stripMargin

  /** Snapshot-as-of CTE pair (win{tag}, snap{tag}) folding log entries
    * with seq <= asOf. */
  private def duckSnapCtes(tag: String, asOf: Long): String =
    s"""win$tag AS (SELECT k, status, cents, op FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC)
       |      AS rn FROM log WHERE seq <= $asOf) WHERE rn = 1),
       |snap$tag AS (
       |  SELECT k, status, cents FROM base
       |  WHERE k NOT IN (SELECT k FROM win$tag)
       |  UNION ALL
       |  SELECT k, status, cents FROM win$tag WHERE op <> 'D')""".stripMargin

  private lazy val changelogOracle: String =
    s"""WITH $duckBaseLogCtes,
       |${duckSnapCtes("f", Long.MaxValue)}
       |SELECT k, status, cents FROM snapf""".stripMargin

  private lazy val timeTravelOracle: String =
    s"""WITH $duckBaseLogCtes,
       |${duckSnapCtes("v2", 2L)}
       |SELECT k, status, cents FROM snapv2""".stripMargin

  private lazy val snapshotDiffOracle: String =
    s"""WITH $duckBaseLogCtes,
       |${duckSnapCtes("v1", 1L)},
       |${duckSnapCtes("v3", 3L)},
       |d AS (SELECT COALESCE(a.k, b.k) AS k,
       |        CASE WHEN a.k IS NULL THEN 'D'
       |             WHEN b.k IS NULL THEN 'I'
       |             WHEN a.status IS DISTINCT FROM b.status
       |               OR a.cents IS DISTINCT FROM b.cents THEN 'U'
       |        END AS op
       |      FROM snapv3 a FULL OUTER JOIN snapv1 b ON a.k = b.k)
       |SELECT k, op FROM d WHERE op IS NOT NULL""".stripMargin
}
