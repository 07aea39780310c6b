package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/**
 * Watermark semantics: append-mode windowed aggregation must drop events
 * arriving later than the watermark allows, and emit a window only once
 * it closes (SURVEY §2.3 streaming checklist: watermarks/windows/late
 * data).
 */
class StreamingLateDataSpec extends GraftSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("append mode with 10m watermark drops a too-late event") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("k"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_spec")
      .outputMode(OutputMode.Append()).start()
    try {
      // Batch 1: two events in the 10:00 window, one in 10:05.
      input.addData((ts(0), "a"), (ts(2), "a"), (ts(7), "a"))
      q.processAllAvailable()
      // Batch 2: advance event time far ahead -> watermark passes 10:10,
      // closing (and emitting) the earlier windows.
      input.addData((ts(40), "a"))
      q.processAllAvailable()
      val afterClose = spark.table("late_spec").collect()
        .map(r => (r.getTimestamp(0), r.getLong(2))).toMap
      assert(afterClose(ts(0)) == 2L, "10:00 window must emit n=2")
      assert(afterClose(ts(5)) == 1L, "10:05 window must emit n=1")
      // Batch 3: an event for the long-closed 10:00 window — later than
      // watermark (now ~10:30) allows — must be DROPPED, not re-emitted.
      input.addData((ts(1), "a"))
      q.processAllAvailable()
      val finalRows = spark.table("late_spec").collect()
      assert(finalRows.count(r => r.getTimestamp(0) == ts(0)) == 1,
        "late event must not re-open the closed 10:00 window")
      assert(finalRows.filter(r => r.getTimestamp(0) == ts(0))
        .head.getLong(2) == 2L, "closed window count must stay 2")
    } finally q.stop()
  }

  test("on-time event within watermark still lands in its open window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
    val q = agg.writeStream.format("memory").queryName("ontime_spec")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), "a"))
      q.processAllAvailable()
      // Watermark is only 09:50; a 10:01 "late-ish" event is still OK.
      input.addData((ts(1), "a"))
      q.processAllAvailable()
      input.addData((ts(59), "a")) // close everything
      q.processAllAvailable()
      val rows = spark.table("ontime_spec").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(rows(ts(0)) == 2L, "both events belong to the 10:00 window")
    } finally q.stop()
  }
}
