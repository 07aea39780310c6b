package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/**
 * Watermarked stream-stream LEFT OUTER interval join
 * (EventStream.errorClickPairsLeftOuter): matches emit immediately;
 * unmatched left rows emit their null exactly once, and only after the
 * watermark proves no match can arrive.
 */
class StreamStreamOuterJoinSpec extends GraftSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(LocalDateTime.of(2024, 1, 1, 10, 0).plusMinutes(minute))

  test("null rows emit only after the watermark passes the join bound") {
    implicit val sqlCtx = spark.sqlContext
    val errs = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = EventStream.errorClickPairsLeftOuter(
      errs.toDF().toDF("user_id", "ts").withWatermark("ts", "10 minutes"),
      clks.toDF().toDF("user_id", "ts").withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssjl_spec")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: error with a click 5 minutes earlier (a match);
      // user 2: error with no click at all.
      errs.addData((1L, ts(0)), (2L, ts(0)))
      clks.addData((1L, ts(-5)))
      q.processAllAvailable()
      val early = spark.table("ssjl_spec").collect()
      assert(early.exists(r => r.getLong(0) == 1L && !r.isNullAt(2)),
        "matched pair must emit immediately")
      assert(!early.exists(_.getLong(0) == 2L),
        "unmatched row must be HELD while the watermark allows a match")

      // Advance event time on both sides: watermark passes the bound,
      // user 2's null row must flush.
      errs.addData((99L, ts(120)))
      clks.addData((99L, ts(120)))
      q.processAllAvailable()
      val late = spark.table("ssjl_spec").collect()
      val u2 = late.filter(_.getLong(0) == 2L)
      assert(u2.length == 1 && u2.head.isNullAt(2),
        s"unmatched error must emit exactly one null row, got ${u2.toSeq}")
      assert(late.count(r => r.getLong(0) == 1L) == 1,
        "matched pair must not re-emit at flush time")
    } finally q.stop()
  }

  test("fixture run equals the batch left join (sentinel-flushed)") {
    val dir = SparkTestBase.sf0001
    val base = EventStream.eventsStreamWithSentinel(spark, dir)
      .withWatermark("ts", "1 hour")
    import org.apache.spark.sql.functions.col
    val streamed = EventStream.runToMemory(spark,
        EventStream.errorClickPairsLeftOuter(
          base.where(col("event_type") === "error"),
          base.where(col("event_type") === "click")),
        s"ssjl_fix_${System.nanoTime()}", OutputMode.Append())
      .where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)))).toSet
    val ev = Tables.load(spark, dir, "events")
    val batch = EventStream.errorClickPairsLeftOuter(
        ev.where(col("event_type") === "error"),
        ev.where(col("event_type") === "click"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)))).toSet
    assert(streamed == batch,
      s"stream/batch diff: ${(streamed diff batch).take(3)} | " +
        s"${(batch diff streamed).take(3)}")
  }
}
