package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{MediaRecord, Multimodal}
import graft.streaming.EventStream

/**
 * Correctness queries for the multimodal plumbing and the streaming
 * surface. `mm_decode_features` exercises the real mapPartitions batch
 * path (typed Dataset[MediaRecord] -> Dataset[MediaFeatures]); the stubbed
 * decode is md5-deterministic so DuckDB replays it exactly.
 * `stream_hourly` runs an actual Structured Streaming query (file source ->
 * memory sink, complete mode) and must equal the batch oracle.
 */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.fromDocuments(Tables.load(s, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_features" -> { (s, dir) =>
      import s.implicits._
      val typed = media(s, dir).select(
        col("media_id").as("mediaId"), col("kind"), col("payload"), col("meta"))
        .as[MediaRecord]
      Multimodal.decodeFeatures(typed).toDF()
        .select(col("mediaId").as("media_id"), col("nBytes").as("n_bytes"),
          col("payloadMd5").as("payload_md5"),
          col("embChecksum").as("emb_checksum"))
    },
    "mm_resize" -> { (s, dir) =>
      Multimodal.resizePlan(media(s, dir), 128)
    },
    "mm_frame_sample" -> { (s, dir) =>
      Multimodal.frameSamplePlan(media(s, dir), 500L)
    },
    "stream_hourly" -> { (s, dir) =>
      EventStream.runToMemory(s,
        EventStream.hourlyCounts(EventStream.eventsStream(s, dir)),
        s"stream_hourly_${System.nanoTime()}")
    },
    "stream_session_window" -> { (s, dir) =>
      // Batch execution of the same session_window transform the stream
      // uses (StreamingSpec asserts batch == streaming).
      EventStream.sessionWindows(Tables.load(s, dir, "events"))
    },
    // Streaming graftgen source (MicroBatchStream): 10 batches x 1000
    // generated rows, property-checked like the gen_* family.
    "stream_gen_source" -> { (s, dir) =>
      val stream = s.readStream.format("graftgen")
        .option("rows", 0).option("partitions", 8).option("seed", 21)
        .option("rowsPerBatch", 1000).option("maxBatches", 10)
        .option("columns", "id,v")
        .option("gen.id", "seq")
        .option("gen.v", "int64_uniform:1:100")
        .load()
      EventStream.runToMemory(s, stream,
          s"stream_gen_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .selectExpr("CAST(count(*) AS BIGINT) AS n",
          "CAST(count(distinct id) = 10000 AS BOOLEAN) AS ids_ok",
          "CAST(min(v) >= 1 AND max(v) <= 100 AS BOOLEAN) AS bounds_ok")
    },
    // flatMapGroupsWithState sessionizer == session_window oracle.
    "stream_state_sessions" -> { (s, dir) =>
      EventStream.sessionsViaState(Tables.load(s, dir, "events"))
        .select(col("userId").as("user_id"),
          timestamp_micros(col("sessionStartUs")).as("session_start"),
          col("nEvents").as("n_events"))
    },
    // Streaming dedup (append mode): first occurrence per key pair.
    "stream_dedup_pairs" -> { (s, dir) =>
      EventStream.runToMemory(s,
        EventStream.dedupUserType(EventStream.eventsStream(s, dir)),
        s"stream_dedup_${System.nanoTime()}",
        org.apache.spark.sql.streaming.OutputMode.Append())
    },
    // Stream-stream interval join (watermarked both sides, append mode).
    "stream_stream_join" -> { (s, dir) =>
      val errors = EventStream.eventsStream(s, dir)
        .where(col("event_type") === "error").withWatermark("ts", "1 hour")
      val clicks = EventStream.eventsStream(s, dir)
        .where(col("event_type") === "click").withWatermark("ts", "1 hour")
      EventStream.runToMemory(s,
        EventStream.errorClickPairs(errors, clicks),
        s"stream_ssj_${System.nanoTime()}",
        org.apache.spark.sql.streaming.OutputMode.Append())
    },
    // Custom-state operator: the state carries integer cents, so both the
    // count AND the sum hash-match the DuckDB oracle exactly.
    "stream_running_totals" -> { (s, dir) =>
      EventStream.runningTypeTotals(Tables.load(s, dir, "events"))
        .select(col("eventType").as("event_type"), col("n"),
          col("valueCents").as("value_cents"))
    },
  )

  val oracleSql: Map[String, String] = Map(
    "mm_decode_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT AS emb_checksum
        |FROM documents""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id AS media_id,
        |  CAST(n_chars % 640 + 64 AS INT) AS width,
        |  CAST(n_chars % 480 + 48 AS INT) AS height,
        |  CAST(floor((n_chars % 640 + 64) *
        |    least(1.0, 128.0 / greatest((n_chars % 640 + 64)::DOUBLE,
        |                                (n_chars % 480 + 48)::DOUBLE)))
        |    AS BIGINT) AS new_width,
        |  CAST(floor((n_chars % 480 + 48) *
        |    least(1.0, 128.0 / greatest((n_chars % 640 + 64)::DOUBLE,
        |                                (n_chars % 480 + 48)::DOUBLE)))
        |    AS BIGINT) AS new_height
        |FROM documents""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(t // 500 AS BIGINT) AS frame_idx,
        |  CAST(t AS BIGINT) AS ts_ms
        |FROM documents, unnest(range(0, n_chars * 10 + 1, 500)) AS u(t)""".stripMargin,
    "stream_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_session_window" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT user_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM e),
        |f AS (SELECT user_id, ts,
        |        CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS ns
        |      FROM g),
        |s AS (SELECT user_id, ts,
        |        SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM f)
        |SELECT user_id, MIN(ts) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "stream_gen_source" ->
      ("SELECT CAST(10000 AS BIGINT) AS n, TRUE AS ids_ok, " +
        "TRUE AS bounds_ok"),
    "stream_state_sessions" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT user_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM e),
        |f AS (SELECT user_id, ts,
        |        CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS ns
        |      FROM g),
        |s AS (SELECT user_id, ts,
        |        SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM f)
        |SELECT user_id, MIN(ts) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "stream_dedup_pairs" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "stream_stream_join" ->
      """SELECT e.user_id, CAST(e.ts AS TIMESTAMP) AS e_ts,
        |  CAST(c.ts AS TIMESTAMP) AS c_ts
        |FROM events e JOIN events c ON e.user_id = c.user_id
        |  AND e.event_type = 'error' AND c.event_type = 'click'
        |  AND c.ts BETWEEN e.ts - INTERVAL 10 MINUTE AND e.ts""".stripMargin,
    "stream_running_totals" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM events GROUP BY event_type""".stripMargin,
  )
}
