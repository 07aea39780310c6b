package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{MediaRecord, Multimodal}
import graft.streaming.EventStream

/**
 * Correctness queries for the multimodal plumbing and the streaming
 * surface. `mm_decode_features` / `mm_resize_pixels` decode REAL PNG
 * payloads with javax.imageio and report exact pixel statistics; the
 * fixture images are deterministic gradients, so the oracle computes the
 * same statistics in closed form — a codec bug cannot hash-match.
 * `stream_hourly` runs an actual Structured Streaming query (file source ->
 * memory sink, complete mode) and must equal the batch oracle.
 */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.fromDocuments(Tables.load(s, dir, "documents"))

  private def typedMedia(s: SparkSession, dir: String) = {
    import s.implicits._
    media(s, dir).select(
      col("media_id").as("mediaId"), col("kind"), col("payload"), col("meta"))
      .as[MediaRecord]
  }

  /** 30-minute-gap sessionization oracle (lag/cumsum form) — shared by
    * the session_window gate, the batch custom-state sessionizer, and its
    * live streaming run. */
  private val duckSessionsSql: String =
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
      |FROM s GROUP BY user_id, sid""".stripMargin

  /** Shared oracle CTE: per-document gradient-image geometry. */
  private val duckDims =
    """dims AS (SELECT doc_id, n_chars % 33 + 16 AS w, n_chars % 24 + 8 AS h,
      |  doc_id % 150 AS d FROM documents)""".stripMargin

  /** Closed-form aHash replay: gray mass at gradient pixel (x, y) is
    * (d+x) + 3y + (100+x+y) = d + 100 + 2x + 4y; 8x8 nearest-neighbor
    * sample i reads x = (i%8)*w//8, y = (i//8)*h//8; bit i set iff
    * 64*v_i > total, packed into two 32-bit halves (no 64-bit shifts). */
  private lazy val duckAhashCtes: String =
    s"""$duckDims,
       |v AS (SELECT doc_id, list_transform(generate_series(0, 63), i ->
       |    (d + 100 + 2 * (((i % 8) * w) // 8)
       |       + 4 * (((i // 8) * h) // 8))::BIGINT) AS vals
       |  FROM dims),
       |t AS (SELECT doc_id, vals,
       |        list_reduce(vals, (a, b) -> a + b) AS total FROM v),
       |hh AS (SELECT doc_id AS media_id,
       |  CAST(list_reduce(list_transform(generate_series(0, 31), i ->
       |    CASE WHEN 64 * vals[i+1] > total THEN (1::BIGINT << i)
       |         ELSE 0::BIGINT END), (a, b) -> a + b) AS BIGINT) AS ahash_hi,
       |  CAST(list_reduce(list_transform(generate_series(32, 63), i ->
       |    CASE WHEN 64 * vals[i+1] > total THEN (1::BIGINT << (i - 32))
       |         ELSE 0::BIGINT END), (a, b) -> a + b) AS BIGINT) AS ahash_lo
       |  FROM t)""".stripMargin

  /** Shared oracle CTE family for the audio spectral gates: regenerate
    * the sawtooth (v_i = (i%p - p//2)*256, p = 64 + d%32), cut into full
    * 256-sample frames, replay every integer autocorrelation sum over
    * lags 32..95, and pick each frame's argmax (ties -> lowest lag). */
  private lazy val duckSpectralCtes: String =
    """a AS (SELECT doc_id, doc_id % 150 AS d,
      |        n_chars % 800 + 800 AS n FROM documents),
      |pp AS (SELECT doc_id, n, 64 + d % 32 AS p,
      |         (64 + d % 32) // 2 AS h FROM a),
      |fr AS (SELECT doc_id, p, h, u.f AS frame_idx, u.f * 256 AS lo
      |       FROM pp, unnest(range(n // 256)) u(f)),
      |cr AS (SELECT doc_id, frame_idx, l.lagv AS lagv,
      |        list_reduce(list_transform(range(256 - l.lagv), i ->
      |          CAST(((lo + i) % p - h) * 256 AS BIGINT)
      |          * CAST(((lo + i + l.lagv) % p - h) * 256 AS BIGINT)),
      |          (x, y) -> x + y) AS corr
      |       FROM fr, unnest(range(32, 96)) l(lagv)),
      |pk AS (SELECT doc_id, frame_idx, lagv, corr,
      |        ROW_NUMBER() OVER (PARTITION BY doc_id, frame_idx
      |          ORDER BY corr DESC, lagv) AS rn FROM cr)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_features" -> { (s, dir) =>
      Multimodal.decodeFeatures(typedMedia(s, dir)).toDF()
        .select(col("mediaId").as("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sumR").as("sum_r"), col("sumG").as("sum_g"),
          col("sumB").as("sum_b"), col("grayMean").as("gray_mean"))
    },
    // Metadata-only planning gates ride the payload-free shim: the
    // deployment shape is "read meta, never touch payload", and the
    // payload-synthesizing fixture was charging them a PNG encode per row.
    "mm_resize" -> { (s, dir) =>
      Multimodal.resizePlan(
        Multimodal.fromDocumentsMeta(Tables.load(s, dir, "documents")), 24)
    },
    // Real nearest-neighbor pixel resize; exact resampled red-channel sum.
    "mm_resize_pixels" -> { (s, dir) =>
      Multimodal.resizeDecoded(typedMedia(s, dir), 16).toDF()
        .select(col("mediaId").as("media_id"),
          col("newWidth").cast("long").as("new_width"),
          col("newHeight").cast("long").as("new_height"),
          col("sumR").as("sum_r"))
    },
    "mm_frame_sample" -> { (s, dir) =>
      Multimodal.frameSamplePlan(
        Multimodal.fromDocumentsMeta(Tables.load(s, dir, "documents")), 500L)
    },
    // A SECOND real codec through the same decode path: the gradient
    // encoded lossy (JPEG q=0.9). Dimensions survive decode exactly;
    // channel sums are held within 3 gray levels per pixel of the
    // closed-form source — a broken decode (wrong pixels, wrong image,
    // swapped channels) flips the booleans and cannot hash-match.
    "mm_decode_jpeg" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val m = Multimodal.fromDocumentsJpeg(docs).select(
          col("media_id").as("mediaId"), col("kind"), col("payload"),
          col("meta")).as[MediaRecord]
      val f = Multimodal.decodeFeatures(m).toDF()
      val exp = docs.select(col("doc_id"),
          (col("n_chars") % 33 + 16).cast("long").as("ew"),
          (col("n_chars") % 24 + 8).cast("long").as("eh"),
          (col("doc_id") % 150).cast("long").as("d"))
        .withColumn("er", col("eh") *
          (col("ew") * col("d") + (col("ew") * (col("ew") - 1) / 2).cast("long")))
        .withColumn("eg",
          col("ew") * 3 * (col("eh") * (col("eh") - 1) / 2).cast("long"))
        .withColumn("eb", lit(100L) * col("ew") * col("eh") +
          col("eh") * (col("ew") * (col("ew") - 1) / 2).cast("long") +
          col("ew") * (col("eh") * (col("eh") - 1) / 2).cast("long"))
        .withColumn("px", col("ew") * col("eh"))
      f.join(exp, f("mediaId") === exp("doc_id"))
        .select(col("mediaId").as("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          (abs(col("sumR") - col("er")) <= lit(3L) * col("px")).as("r_close"),
          (abs(col("sumG") - col("eg")) <= lit(3L) * col("px")).as("g_close"),
          (abs(col("sumB") - col("eb")) <= lit(3L) * col("px")).as("b_close"))
    },
    // REAL audio: a RIFF/WAVE container per doc (PCM16 mono sawtooth,
    // integer samples) decoded through the JDK's AudioSystem; the exact
    // |amplitude| sum and peak replay in closed form — a header-parse or
    // sample-decode bug cannot hash-match.
    "mm_decode_wav" -> { (s, dir) =>
      import s.implicits._
      val m = Multimodal.fromDocumentsWav(Tables.load(s, dir, "documents"))
        .select(col("media_id").as("mediaId"), col("kind"), col("payload"),
          col("meta")).as[MediaRecord]
      Multimodal.decodeAudioFeatures(m)
    },
    // Per-frame energy / voice-activity profile over the decoded PCM
    // stream (10 ms frames at 16 kHz): the silence-trim primitive. The
    // oracle regenerates the sawtooth sample-by-sample and re-aggregates
    // per frame — a frame-boundary or sum-of-squares bug cannot match.
    "mm_audio_energy" -> { (s, dir) =>
      import s.implicits._
      val m = Multimodal.fromDocumentsWav(Tables.load(s, dir, "documents"))
        .select(col("media_id").as("mediaId"), col("kind"), col("payload"),
          col("meta")).as[MediaRecord]
      Multimodal.audioFrameEnergy(m)
    },
    // TRUE multi-frame decode: every frame of a real animated GIF payload
    // is read back; row count, dimensions, and per-frame colors all come
    // from the container's bytes and replay in closed form.
    "mm_frame_decode" -> { (s, dir) =>
      import s.implicits._
      val m = Multimodal.fromDocumentsGif(Tables.load(s, dir, "documents"))
        .select(col("media_id").as("mediaId"), col("kind"), col("payload"),
          col("meta")).as[MediaRecord]
      Multimodal.decodeFrames(m)
    },
    // Perceptual average-hash from REAL decoded pixels; the gradient
    // fixture's closed form (gray mass d+100+2x+4y) lets the oracle
    // replay every bit.
    "mm_ahash" -> { (s, dir) =>
      Multimodal.averageHash(typedMedia(s, dir))
    },
    // Per-frame dominant period by integer autocorrelation argmax over
    // lags 32..95 (full 256-sample frames only): the oracle regenerates
    // the sawtooth and replays every correlation sum — a framing,
    // decode, or tie-break bug cannot match.
    "mm_audio_spectral" -> { (s, dir) =>
      import s.implicits._
      val m = Multimodal.fromDocumentsWav(Tables.load(s, dir, "documents"))
        .select(col("media_id").as("mediaId"), col("kind"), col("payload"),
          col("meta")).as[MediaRecord]
      Multimodal.audioSpectralProfile(m)
    },
    // STREAMING media-signature index: clip batches decode + fingerprint
    // once on arrival, only 16-byte signatures enter the versioned
    // state; the accumulated table must equal the batch fingerprint pass
    // over everything ingested (the oracle is mm_audio_fingerprint's
    // replay verbatim — fingerprints are pure per-clip functions).
    "stream_audio_index" -> { (s, dir) =>
      val m = Multimodal.fromDocumentsWav(Tables.load(s, dir, "documents"))
      val history = m.where(col("media_id") < 100)
      val days = Seq(
        m.where(col("media_id") >= 100 && col("media_id") < 300),
        m.where(col("media_id") >= 300))
      val logDir = Staging.batchLog("saudio", dir, "day", days)
      graft.streaming.MediaIndexStream.incrementalAudioFingerprints(
        s, history, logDir, days.head.schema,
        s"${Staging.freshStateRoot("graft_saudio")}/state")
    },
    // 64-bit period-class bitmap per clip (bit = peak_lag - 32 seen in
    // some frame), packed as two 32-bit halves like mm_ahash. The
    // amplitude-invariant signature audioNearDup pairs on.
    "mm_audio_fingerprint" -> { (s, dir) =>
      import s.implicits._
      val m = Multimodal.fromDocumentsWav(Tables.load(s, dir, "documents"))
        .select(col("media_id").as("mediaId"), col("kind"), col("payload"),
          col("meta")).as[MediaRecord]
      Multimodal.audioFingerprint(m)
    },
    // (perceptualNearDup is spec-gated with constructed discriminative
    // images — the fixture's gradients are all brightness-variants of one
    // pattern, so an all-pairs fixture gate would be degenerate: ~31% of
    // pairs fall within Hamming 3 and the count explodes quadratically
    // with corpus growth.)
    "stream_hourly" -> { (s, dir) =>
      EventStream.runToMemory(s,
        EventStream.hourlyCounts(EventStream.eventsStream(s, dir)),
        s"stream_hourly_${System.nanoTime()}")
    },
    // Overlapping sliding windows (2h every 1h) run as a live stream —
    // every event lands in exactly two windows; sums in exact cents.
    "stream_sliding" -> { (s, dir) =>
      EventStream.runToMemory(s,
        EventStream.slidingCounts(EventStream.eventsStream(s, dir)),
        s"stream_sliding_${System.nanoTime()}")
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
    // The STREAMING sessionizer run live: GroupState + event-time timeout,
    // flushed by the far-future sentinel advancing the watermark — must
    // equal the same batch session oracle.
    "stream_state_sessions_live" -> { (s, dir) =>
      EventStream.runToMemory(s,
          EventStream.sessionsViaStateStream(
            EventStream.eventsStreamWithSentinel(s, dir), "1 minute"),
          s"stream_sess_live_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .where(col("userId") >= 0)
        .select(col("userId").as("user_id"),
          timestamp_micros(col("sessionStartUs")).as("session_start"),
          col("nEvents").as("n_events"))
    },
    // Stream-static broadcast join: the events stream enriched per
    // micro-batch with the customer dimension (no shuffle, no join
    // state), then rolled up per market segment from the sink.
    "stream_static_join" -> { (s, dir) =>
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      EventStream.runToMemory(s,
          EventStream.enrichWithStatic(
              EventStream.eventsStream(s, dir), dim, "user_id", "c_custkey")
            .select(col("user_id"), col("c_mktsegment"), col("value")),
          s"stream_static_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
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
    // Stream-stream LEFT OUTER interval join: matched pairs emit
    // immediately; unmatched errors emit (c_ts null) only after the
    // watermark proves no click can arrive. Watermark is applied BEFORE
    // the type filters so the far-future sentinel advances BOTH sides
    // (filtering first would starve the error side's watermark and hold
    // the tail's null rows forever); sentinel user filtered from output.
    "stream_stream_left_join" -> { (s, dir) =>
      val base = EventStream.eventsStreamWithSentinel(s, dir)
        .withWatermark("ts", "1 hour")
      EventStream.runToMemory(s,
          EventStream.errorClickPairsLeftOuter(
            base.where(col("event_type") === "error"),
            base.where(col("event_type") === "click")),
          s"stream_ssjl_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .where(col("user_id") >= 0)
        // null-free witness of the outer semantics: the matched flag
        // carries the null/not-null bit, c_ts coalesces to epoch so the
        // exact-hash gate never compares engine-specific null encodings
        .select(col("user_id"), col("e_ts"),
          col("c_ts").isNotNull.as("matched"),
          coalesce(col("c_ts"), to_timestamp(lit("1970-01-01")))
            .as("c_ts_or_epoch"))
    },
    // Stream-stream FULL OUTER interval join: every error AND every click
    // accounted for exactly once — matched pairs immediately, unmatched
    // rows of EITHER side once the watermark proves no partner can
    // arrive. Same sentinel/watermark-before-filter discipline as the
    // left-outer gate; null timestamps witnessed via flags + epoch
    // coalesce so the hash compare never sees engine null encodings.
    "stream_stream_full_join" -> { (s, dir) =>
      val base = EventStream.eventsStreamWithSentinel(s, dir)
        .withWatermark("ts", "1 hour")
      EventStream.runToMemory(s,
          EventStream.errorClickPairsFullOuter(
            base.where(col("event_type") === "error"),
            base.where(col("event_type") === "click")),
          s"stream_ssjf_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .where(col("user_id") >= 0)
        .select(col("user_id"),
          col("e_ts").isNotNull.as("has_error"),
          coalesce(col("e_ts"), to_timestamp(lit("1970-01-01")))
            .as("e_ts_or_epoch"),
          col("c_ts").isNotNull.as("has_click"),
          coalesce(col("c_ts"), to_timestamp(lit("1970-01-01")))
            .as("c_ts_or_epoch"))
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
    // Closed-form channel sums of the gradient image (r=d+x, g=3y,
    // b=100+x+y over w x h) — equals the decoded-pixel sums iff the PNG
    // encode/decode round-trip is faithful.
    "mm_decode_features" ->
      s"""WITH $duckDims
        |SELECT doc_id AS media_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(h * (w*d + (w*(w-1))//2) AS BIGINT) AS sum_r,
        |  CAST(w * 3 * ((h*(h-1))//2) AS BIGINT) AS sum_g,
        |  CAST(100*w*h + h*((w*(w-1))//2) + w*((h*(h-1))//2) AS BIGINT)
        |    AS sum_b,
        |  (h*(w*d + (w*(w-1))//2) + w*3*((h*(h-1))//2)
        |   + 100*w*h + h*((w*(w-1))//2) + w*((h*(h-1))//2))
        |    / (3.0 * w * h) AS gray_mean
        |FROM dims""".stripMargin,
    "mm_resize" ->
      s"""WITH $duckDims
        |SELECT doc_id AS media_id,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(floor(w * least(1.0, 24.0 / greatest(w::DOUBLE, h::DOUBLE)))
        |    AS BIGINT) AS new_width,
        |  CAST(floor(h * least(1.0, 24.0 / greatest(w::DOUBLE, h::DOUBLE)))
        |    AS BIGINT) AS new_height
        |FROM dims""".stripMargin,
    // Nearest-neighbor replay: source column of resampled pixel (nx, ny)
    // is nx*w//nw, so the red sum is nh * sum over nx of (d + nx*w//nw).
    "mm_resize_pixels" ->
      s"""WITH $duckDims,
        |nd AS (SELECT doc_id, w, h, d,
        |    CAST(floor(w * least(1.0, 16.0 / greatest(w::DOUBLE, h::DOUBLE)))
        |      AS BIGINT) AS nw,
        |    CAST(floor(h * least(1.0, 16.0 / greatest(w::DOUBLE, h::DOUBLE)))
        |      AS BIGINT) AS nh
        |  FROM dims),
        |xs AS (SELECT doc_id, nw, nh,
        |    SUM(d + (u.nx * w) // nw) AS row_sum
        |  FROM nd CROSS JOIN unnest(range(48)) u(nx)
        |  WHERE u.nx < nw GROUP BY doc_id, nw, nh)
        |SELECT doc_id AS media_id, nw AS new_width, nh AS new_height,
        |  CAST(nh * row_sum AS BIGINT) AS sum_r
        |FROM xs""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(t // 500 AS BIGINT) AS frame_idx,
        |  CAST(t AS BIGINT) AS ts_ms
        |FROM documents, unnest(range(0, n_chars * 10 + 1, 500)) AS u(t)""".stripMargin,
    "mm_decode_jpeg" ->
      s"""WITH $duckDims
        |SELECT doc_id AS media_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  TRUE AS r_close, TRUE AS g_close, TRUE AS b_close
        |FROM dims""".stripMargin,
    // Sawtooth closed form: sample i = (i%p - p//2)*256 with period
    // p = 64 + d%32 over n = n_chars%800 + 800 samples; |sum| decomposes
    // into q full cycles plus an m-sample partial ramp, peak = 256*(p//2).
    "mm_decode_wav" ->
      """WITH a AS (SELECT doc_id, doc_id % 150 AS d,
        |            n_chars % 800 + 800 AS n FROM documents),
        |pp AS (SELECT doc_id, n, 64 + d % 32 AS p,
        |         (64 + d % 32) // 2 AS h FROM a),
        |c AS (SELECT doc_id, n, p, h, n // p AS q, n % p AS m,
        |        (h*(h+1))//2 + ((p-1-h)*(p-h))//2 AS cyc FROM pp)
        |SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(16000 AS BIGINT) AS sample_rate,
        |  CAST(256 * (q * cyc +
        |    CASE WHEN m <= h THEN (h*(h+1) - (h-m)*(h-m+1))//2
        |         ELSE (h*(h+1))//2 + ((m-1-h)*(m-h))//2 END) AS BIGINT)
        |    AS abs_sum,
        |  CAST(256 * h AS BIGINT) AS peak
        |FROM c""".stripMargin,
    // Sample-by-sample replay of the sawtooth (v_i = (i%p - p//2)*256),
    // re-cut into 160-sample frames; active iff sq_sum > n*16384.
    "mm_audio_energy" ->
      """WITH a AS (SELECT doc_id, doc_id % 150 AS d,
        |            n_chars % 800 + 800 AS n FROM documents),
        |pp AS (SELECT doc_id, n, 64 + d % 32 AS p,
        |         (64 + d % 32) // 2 AS h FROM a),
        |s AS (SELECT doc_id, u.i AS i, ((u.i % p) - h) * 256 AS v
        |      FROM pp, unnest(range(n)) u(i)),
        |f AS (SELECT doc_id, i // 160 AS frame_idx,
        |        CAST(COUNT(*) AS BIGINT) AS n_samples,
        |        CAST(SUM(v * v) AS BIGINT) AS sq_sum
        |      FROM s GROUP BY 1, 2)
        |SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  n_samples, sq_sum, sq_sum > n_samples * 16384 AS active
        |FROM f""".stripMargin,
    // Frame f of doc d is the solid color (d+f, 3f, 100+f) on a 16x12
    // canvas, n = n_chars%4 + 2 frames per payload.
    "mm_frame_decode" ->
      """WITH f AS (SELECT doc_id, doc_id % 150 AS d, n_chars % 4 + 2 AS n
        |           FROM documents)
        |SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
        |  CAST(d + i AS BIGINT) AS r, CAST(3 * i AS BIGINT) AS g,
        |  CAST(100 + i AS BIGINT) AS b
        |FROM f, unnest(range(n)) u(i)""".stripMargin,
    "mm_ahash" -> s"WITH $duckAhashCtes SELECT media_id, ahash_hi, ahash_lo FROM hh",
    // Sawtooth autocorrelation replay: corr(frame, lag) = sum over the
    // frame's first 256-lag samples of v_i * v_{i+lag}; argmax with
    // ties -> lowest lag. Full frames only (n // 256 per doc).
    "mm_audio_spectral" -> (s"WITH $duckSpectralCtes" +
      """
        |SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(lagv AS BIGINT) AS peak_lag, CAST(corr AS BIGINT) AS peak_corr
        |FROM pk WHERE rn = 1""".stripMargin),
    // The streamed signature fold == the batch fingerprint replay.
    "stream_audio_index" -> (s"WITH $duckSpectralCtes," +
      """
        |pf AS (SELECT doc_id, frame_idx, lagv,
        |         COUNT(*) OVER (PARTITION BY doc_id) AS nf
        |       FROM pk WHERE rn = 1),
        |bx AS (SELECT doc_id,
        |         (frame_idx * 4) // nf * 16 + ((lagv - 32) % 16) AS bit_idx
        |       FROM pf)
        |SELECT doc_id AS media_id,
        |  CAST(bit_or(CASE WHEN bit_idx < 32
        |    THEN (1::BIGINT << bit_idx) ELSE 0::BIGINT END)
        |    AS BIGINT) AS fp_hi,
        |  CAST(bit_or(CASE WHEN bit_idx >= 32
        |    THEN (1::BIGINT << (bit_idx - 32)) ELSE 0::BIGINT END)
        |    AS BIGINT) AS fp_lo,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames
        |FROM bx GROUP BY doc_id""".stripMargin),
    "mm_audio_fingerprint" -> (s"WITH $duckSpectralCtes," +
      """
        |pf AS (SELECT doc_id, frame_idx, lagv,
        |         COUNT(*) OVER (PARTITION BY doc_id) AS nf
        |       FROM pk WHERE rn = 1),
        |bx AS (SELECT doc_id,
        |         (frame_idx * 4) // nf * 16 + ((lagv - 32) % 16) AS bit_idx
        |       FROM pf)
        |SELECT doc_id AS media_id,
        |  CAST(bit_or(CASE WHEN bit_idx < 32
        |    THEN (1::BIGINT << bit_idx) ELSE 0::BIGINT END)
        |    AS BIGINT) AS fp_hi,
        |  CAST(bit_or(CASE WHEN bit_idx >= 32
        |    THEN (1::BIGINT << (bit_idx - 32)) ELSE 0::BIGINT END)
        |    AS BIGINT) AS fp_lo,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames
        |FROM bx GROUP BY doc_id""".stripMargin),
    "stream_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_sliding" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))
        |    - k * INTERVAL 1 HOUR AS ws, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events, unnest(range(2)) AS u(k)
        |GROUP BY 1, 2""".stripMargin,
    "stream_session_window" -> duckSessionsSql,
    "stream_gen_source" ->
      ("SELECT CAST(10000 AS BIGINT) AS n, TRUE AS ids_ok, " +
        "TRUE AS bounds_ok"),
    "stream_state_sessions" -> duckSessionsSql,
    // Identical oracle: the live streaming run (state + timeout flush)
    // must reproduce the batch sessionization exactly.
    "stream_state_sessions_live" -> duckSessionsSql,
    "stream_dedup_pairs" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "stream_static_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "stream_stream_join" ->
      """SELECT e.user_id, CAST(e.ts AS TIMESTAMP) AS e_ts,
        |  CAST(c.ts AS TIMESTAMP) AS c_ts
        |FROM events e JOIN events c ON e.user_id = c.user_id
        |  AND e.event_type = 'error' AND c.event_type = 'click'
        |  AND c.ts BETWEEN e.ts - INTERVAL 10 MINUTE AND e.ts""".stripMargin,
    "stream_stream_left_join" ->
      """SELECT e.user_id, CAST(e.ts AS TIMESTAMP) AS e_ts,
        |  c.ts IS NOT NULL AS matched,
        |  COALESCE(CAST(c.ts AS TIMESTAMP), TIMESTAMP '1970-01-01')
        |    AS c_ts_or_epoch
        |FROM events e LEFT JOIN events c ON e.user_id = c.user_id
        |  AND c.event_type = 'click'
        |  AND c.ts BETWEEN e.ts - INTERVAL 10 MINUTE AND e.ts
        |WHERE e.event_type = 'error'""".stripMargin,
    "stream_stream_full_join" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click')
        |SELECT COALESCE(e.user_id, c.user_id) AS user_id,
        |  e.ts IS NOT NULL AS has_error,
        |  COALESCE(e.ts, TIMESTAMP '1970-01-01') AS e_ts_or_epoch,
        |  c.ts IS NOT NULL AS has_click,
        |  COALESCE(c.ts, TIMESTAMP '1970-01-01') AS c_ts_or_epoch
        |FROM e FULL OUTER JOIN c ON e.user_id = c.user_id
        |  AND c.ts BETWEEN e.ts - INTERVAL 10 MINUTE AND e.ts""".stripMargin,
    "stream_running_totals" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM events GROUP BY event_type""".stripMargin,
  )
}
