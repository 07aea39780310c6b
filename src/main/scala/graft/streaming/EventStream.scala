package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the events table (SURVEY.md §2.5 /
 * layer C): file-source stream, watermarked windowed aggregation,
 * session_window sessionization, and a custom mapGroupsWithState operator.
 *
 * All transforms are defined on an unbounded DataFrame, so the same code
 * runs in batch mode (events DataFrame) and streaming mode (readStream) —
 * the tests drive both and assert they agree. At cluster scale the file
 * source becomes Kafka; the transforms are unchanged.
 */
object EventStream {

  /** Footer schema of the events fixture as Spark's batch reader sees it
    * (with nanosAsLong so TIMESTAMP(NANOS)-era files surface as int64).
    * The file stream source needs a declared schema, and declaring the
    * wrong temporal type silently mis-scales event time — so ask the file
    * itself. */
  private def fixtureEventsSchema(
      spark: SparkSession, src: java.nio.file.Path): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(src.toString).schema
  }

  /** 2100-01-01 in whatever type the fixture stores `ts` as. */
  private def sentinelTs(dt: DataType): org.apache.spark.sql.Column =
    dt match {
      case LongType => lit(4102444800L * 1000000000L) // nanos
      case _: TimestampNTZType => expr("timestamp_ntz'2100-01-01 00:00:00'")
      case _ => expr("timestamp'2100-01-01 00:00:00'")
    }

  /** Builds a cached stream directory ATOMICALLY: the content is staged in
    * a scratch dir and renamed into place in one move, so a crash or a
    * failed build step can never leave a half-populated directory that
    * every later JVM would skip-but-trust (the cache guard is
    * exists-check-only). Losing an atomic-move race to a concurrent
    * builder is fine — the winner's dir has identical content. */
  private def ensureStreamDir(name: String)(
      build: java.nio.file.Path => Unit): java.nio.file.Path = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val target = Paths.get(sys.props("java.io.tmpdir"), name)
    if (!Files.exists(target)) {
      val stage = Files.createTempDirectory(
        Paths.get(sys.props("java.io.tmpdir")), s"${name}_stage")
      try {
        build(stage)
        try Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException => ()
          case _: java.nio.file.DirectoryNotEmptyException => ()
        }
      } finally deleteRecursively(stage)
    }
    target
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val st = Files.list(p)
        try st.forEach(c => deleteRecursively(c)) finally st.close()
      }
      Files.deleteIfExists(p)
    }
  }

  /** Unbounded events stream from the parquet fixture (file source). The
    * file source requires a *directory*, so the single fixture file is
    * exposed through a symlinked temp dir (fixture shim only — a real
    * deployment points at a landing directory or Kafka). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(dir, "events.parquet").toAbsolutePath
    val schema = fixtureEventsSchema(spark, src)
    val streamDir = ensureStreamDir(
      s"graft_stream_${(src.toString, schema.simpleString).hashCode.toHexString}") { stage =>
      Files.createSymbolicLink(stage.resolve("events.parquet"), src)
    }
    Tables.normalizeEvents(
      spark.readStream.schema(schema).parquet(streamDir.toString))
  }

  /** Like [[eventsStream]], plus one far-future SENTINEL event (user -1,
    * year 2100): after the fixture's rows are processed, the sentinel
    * advances the watermark past every open session's timeout, so an
    * event-time-timeout operator flushes ALL its state — the trick that
    * lets a finite fixture exercise the genuinely-streaming flush path
    * end to end (filter user_id >= 0 from results). */
  def eventsStreamWithSentinel(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(dir, "events.parquet").toAbsolutePath
    val schema = fixtureEventsSchema(spark, src)
    val streamDir = ensureStreamDir(
      s"graft_stream_sent_${(src.toString, schema.simpleString).hashCode.toHexString}") { stage =>
      Files.createSymbolicLink(stage.resolve("events.parquet"), src)
      val tmp = Files.createTempDirectory("graft_sentinel")
      try {
        // Sentinel row in the SAME ts type as the fixture, so the
        // declared stream schema reads both files identically.
        spark.range(1).select(
          lit(-1L).as("event_id"),
          sentinelTs(schema("ts").dataType).as("ts"),
          lit(-1L).as("user_id"), lit("click").as("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val ls = Files.list(tmp)
        val part =
          try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally ls.close()
        Files.copy(part, stage.resolve("z_sentinel.parquet"))
      } finally deleteRecursively(tmp)
    }
    Tables.normalizeEvents(
      spark.readStream.schema(schema).parquet(streamDir.toString))
  }

  /** Hourly tumbling-window counts + value sums per event type. Works on
    * both batch and streaming inputs; with a stream, pair with the
    * `complete`/`update` output mode (or `append` + watermark). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("window.start").as("h"), col("event_type"),
        col("n"), col("value_sum"))

  /** Sliding-window counts: overlapping `size`-wide windows every
    * `slide`, per event type — each event lands in size/slide windows.
    * Exact cents keep the overlap sums oracle-portable. Works on batch
    * and streaming inputs alike. */
  def slidingCounts(events: DataFrame, size: String = "2 hours",
      slide: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("cents"))

  /** Built-in session windows: 30-minute-gap sessions per user. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Per-type running state for the custom-state operator. The sum is
    * carried as integer cents so it is exact and order-independent —
    * a Double accumulator would make the result depend on per-group
    * iteration order and defeat any cross-engine oracle. */
  case class TypeState(n: Long, valueCents: Long)
  case class TypeCount(eventType: String, n: Long, valueCents: Long,
      valueSum: Double)

  /** Custom stateful operator: running per-event-type totals via
    * mapGroupsWithState (the KeyValueGroupedDataset state API). */
  def runningTypeTotals(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.select(col("event_type"),
        round(col("value") * 100).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[TypeState]) =>
          val prev = state.getOption.getOrElse(TypeState(0L, 0L))
          var n = prev.n
          var s = prev.valueCents
          rows.foreach { r => n += 1; s += r._2 }
          state.update(TypeState(n, s))
          TypeCount(key, n, s, s / 100.0)
      }.toDF()
  }

  /** One emitted row per closed session for the custom-state sessionizer.
    * The start is carried as epoch MICROseconds — java.sql.Timestamp
    * round-trips would silently truncate to millis. */
  case class SessionOut(userId: Long, sessionStartUs: Long, nEvents: Long)

  /** The still-open trailing session carried in GroupState between
    * micro-batches: (session start, last event seen, events so far), all
    * timestamps in epoch microseconds. */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  private val SessionGapUs = 30L * 60 * 1000000
  private val SessionGapMs = 30L * 60 * 1000

  /** Core of the custom sessionizer, shared by the batch and streaming
    * entry points: folds this invocation's (sorted) event times into the
    * open session carried over from previous batches, returning the
    * sessions CLOSED by this data plus the new open tail. An event that
    * arrives late (older than the carried `lastUs`) is absorbed into the
    * open session — its gap is negative, so it can never close one; late
    * data for an already-emitted session is a correction append-mode
    * output cannot retract, the same contract `session_window` has. */
  private def foldSessions(user: Long, sortedTs: Array[Long],
      carried: Option[OpenSession])
      : (Seq[SessionOut], OpenSession) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var open = carried.getOrElse(OpenSession(sortedTs.head, sortedTs.head, 0L))
    sortedTs.foreach { t =>
      if (t - open.lastUs >= SessionGapUs) {
        out += SessionOut(user, open.startUs, open.n)
        open = OpenSession(t, t, 0L)
      }
      open = OpenSession(open.startUs, math.max(open.lastUs, t), open.n + 1)
    }
    (out.toSeq, open)
  }

  /**
   * Custom sessionizer on flatMapGroupsWithState (the 0..N-rows-per-group
   * state API, complementing mapGroupsWithState's exactly-1): groups by
   * user and emits one row per 30-minute-gap session — the hand-rolled
   * equivalent of `session_window`, gated against the same oracle.
   *
   * BATCH entry point: a batch query invokes the function exactly once per
   * group with all of the group's rows, so after folding there is nothing
   * left to wait for and the trailing open session is emitted too. For an
   * unbounded stream use [[sessionsViaStateStream]], which carries the
   * open session in GroupState across micro-batches and flushes it on
   * event-time timeout instead.
   *
   * Scale note: state per group is one (start, last, count) triple; the
   * in-group sort buffers one user's one-batch events, the same bound the
   * built-in session window's state store carries.
   */
  def sessionsViaState(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)],
            state: GroupState[OpenSession]) =>
          val ts = rows.map(_._2).toArray.sorted
          val (closed, open) = foldSessions(user, ts, state.getOption)
          state.update(open)
          (closed :+ SessionOut(user, open.startUs, open.n)).iterator
      }.toDF()
  }

  /** All not-yet-final sessions of one user, carried in GroupState between
    * micro-batches. Pending sessions are pairwise >= gap apart by
    * construction; the list length is bounded by
    * (watermark delay / session gap) + 1, so state stays O(1) per user. */
  case class PendingSessions(sessions: List[OpenSession])

  /** Merges new event times into a user's pending-session set: each event
    * becomes a singleton interval, then adjacent intervals closer than the
    * session gap merge (a late event can bridge — and thereby merge — two
    * previously separate pending sessions, and extend a session's start
    * downward). Equivalent to re-sessionizing the full event multiset,
    * because inside a recorded session every consecutive gap was already
    * `< gap` when it was folded. */
  private def mergeSessions(existing: Seq[OpenSession],
      ts: Array[Long]): List[OpenSession] = {
    val all = (existing ++ ts.map(t => OpenSession(t, t, 1L)))
      .sortBy(s => (s.startUs, s.lastUs))
    val out = scala.collection.mutable.ListBuffer.empty[OpenSession]
    all.foreach { s =>
      if (out.nonEmpty && s.startUs - out.last.lastUs < SessionGapUs) {
        val p = out.remove(out.size - 1)
        out += OpenSession(p.startUs, math.max(p.lastUs, s.lastUs), p.n + s.n)
      } else out += s
    }
    out.toList
  }

  /**
   * STREAMING entry point of the custom sessionizer: every not-yet-final
   * session is persisted in GroupState across micro-batches, and a session
   * is emitted ONLY once the watermark passes its last event + the session
   * gap — the moment no admissible future event can extend it (the same
   * hold-until-watermark contract as the built-in `session_window` in
   * append mode). An in-batch gap alone is NOT emission evidence: a later
   * micro-batch may deliver an out-of-order event above the watermark that
   * bridges or back-extends the session, which [[mergeSessions]] handles
   * by interval-merging. Requires `delay` of watermark slack.
   */
  def sessionsViaStateStream(events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    // The event-time column must survive into the grouped Dataset with its
    // watermark metadata intact (converting to a long would strip it and
    // fail the event-time-timeout analysis), so it rides along as an
    // Instant — the encoder that keeps microsecond precision, unlike
    // java.sql.Timestamp whose getTime truncates to millis.
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.time.Instant)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.time.Instant)],
            state: GroupState[PendingSessions]) =>
          val existing =
            if (state.exists) state.get.sessions else List.empty[OpenSession]
          val ts = rows.map { r =>
            r._2.getEpochSecond * 1000000L + r._2.getNano / 1000L
          }.toArray.sorted
          val merged = mergeSessions(existing, ts)
          // Final = the watermark has passed last event + gap; anything
          // else stays in state (even if an in-batch gap follows it).
          val wmMs = state.getCurrentWatermarkMs()
          val (done, pending) =
            merged.partition(s => s.lastUs / 1000 + SessionGapMs <= wmMs)
          if (pending.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(PendingSessions(pending))
            // Wake when the earliest pending session becomes final; its
            // last+gap is > current watermark by the partition above, as
            // setTimeoutTimestamp requires.
            state.setTimeoutTimestamp(
              pending.map(_.lastUs / 1000 + SessionGapMs).min)
          }
          done.map(s => SessionOut(user, s.startUs, s.n)).iterator
      }.toDF()
  }

  /** Streaming dedup: first occurrence of each (user_id, event_type) pair.
    * On a stream this keeps per-key state and emits in append mode; the
    * same transform in batch is a plain distinct (both modes are gated
    * against the one DuckDB oracle). At scale pair it with a watermark +
    * dropDuplicatesWithinWatermark so the key state ages out. */
  def dedupUserType(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")

  /** Watermark-bounded streaming dedup: like dedupUserType but the per-key
    * state ages out once the key falls behind the watermark — the variant
    * an unbounded key space (event ids forever) requires, trading "dedup
    * across all time" for bounded state. */
  def dedupWithinWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * a bounded dimension table — the canonical streaming-ETL enrichment
    * (clicks x user profile, events x geo table). The static side is
    * broadcast, so the stream never shuffles and no join state accrues
    * (unlike stream-stream joins, the static side is re-readable per
    * batch — Spark even picks up some source updates between batches). */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey))

  /** Stream-stream interval join: every error event joined to the same
    * user's clicks in the preceding 10 minutes. With watermarks on both
    * sides the time bound makes the join state bounded (Spark drops a
    * side's rows once they can no longer match future input). Emits raw
    * pairs (append-mode compatible — a post-join aggregation would need
    * its own watermarked window). */
  def errorClickPairs(errors: DataFrame, clicks: DataFrame): DataFrame =
    errorClickJoin(errors, clicks, "inner")

  /** LEFT OUTER form of [[errorClickPairs]] — the semantics users trip
    * on: a matched pair emits as soon as both rows arrive, but an
    * UNMATCHED error emits (with a null `c_ts`) only once the watermark
    * proves no qualifying click can still arrive (the error's join state
    * ages past the interval's upper bound plus the click side's
    * watermark delay). Until then the row is held in state — so on a
    * finite input the watermark must be advanced past the data (see
    * `eventsStreamWithSentinel`) or the tail's nulls stay unflushed. */
  def errorClickPairsLeftOuter(errors: DataFrame,
      clicks: DataFrame): DataFrame =
    errorClickJoin(errors, clicks, "left_outer")

  /** FULL OUTER form: additionally emits clicks no error followed within
    * the interval (e_ts null) once the watermark proves none can — the
    * "both sides audited" shape (every error AND every click accounted
    * for exactly once). Same state-flush caveat as the left-outer form. */
  def errorClickPairsFullOuter(errors: DataFrame,
      clicks: DataFrame): DataFrame =
    errorClickJoin(errors, clicks, "full_outer")

  private def errorClickJoin(errors: DataFrame, clicks: DataFrame,
      joinType: String): DataFrame = {
    val e = errors.select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    e.join(c, expr(
        """e_user = c_user AND
          |c_ts BETWEEN e_ts - INTERVAL 10 MINUTES AND e_ts""".stripMargin),
        joinType)
      // coalesce carries the key through outer rows of EITHER side
      .select(coalesce(col("e_user"), col("c_user")).as("user_id"),
        col("e_ts"), col("c_ts"))
  }

  /** Fully-qualified class name of Spark's RocksDB state-store provider —
    * the scale-safe store for large streaming state: per-partition state
    * lives off-heap/on-disk in RocksDB instead of the default in-memory
    * HashMap provider, so 100 TB-scale key spaces (dedup keys, join rows,
    * session state) stop being bounded by executor heap. */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** THE state-store switch for every streaming gate: resolves the
    * provider from `SPARK_GRAFT_STATE_STORE` (`rocksdb` or a
    * fully-qualified provider class; unset = Spark's default), applies it
    * for the duration of `body`, and restores the previous session conf
    * after. All query-start helpers below route through this, so one env
    * var flips the whole streaming suite between providers — results must
    * be identical either way (StateStoreProviderSpec proves it on the
    * dedup and transition-matrix folds). */
  def withConfiguredStateStore[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    sys.env.get("SPARK_GRAFT_STATE_STORE") match {
      case None => body
      case Some(p) =>
        val provider = if (p.equalsIgnoreCase("rocksdb")) RocksDbProvider else p
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, provider)
        try body
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
    }
  }

  /** Spreads a CPU-dense micro-batch across the session's parallelism
    * when the file-source split leaves it on a handful of tasks: a
    * maxFilesPerTrigger=1 batch arrives as ONE small file — one or two
    * input splits — so a narrow, compute-heavy assign (per-token
    * hashing, shingling, vector-distance assignment, scoring) runs at
    * 1-3/N core utilization while the rest of the machine idles (guide
    * §2.5's "one huge unsplittable file" shape, §2.6 idle capacity).
    * ADAPTIVE, not a local[32] constant: when the incoming batch already
    * carries >= defaultParallelism partitions (a real deployment's
    * many-file or Kafka batch), this is the identity — no extra
    * exchange. The repartition shuffles only the batch's own bytes
    * (O(batch), tiny next to the compute it unblocks), and every fold
    * that uses it aggregates order-insensitively (exact integer sums /
    * per-row maps), so results are partitioning-independent.
    *
    * Used ONLY where A/B family boards showed a real win — the merge
    * folds, whose per-batch map-side partial aggregation (CMS
    * explode×hash, DSIR featurize, per-dim moments) is the heavy term
    * (stream_cms_fold 4.7 → 2.6 s). The append folds' assigns (IVF
    * nprobe=1 projections, PQ encodes, shingling a few hundred docs)
    * measured cheaper than the extra exchange, so they keep the raw
    * batch (r18 samples A–C: spreading them cost +0.5–2.6 s/gate). */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** foreachBatch sink: the operational pattern for pushing a stream into
    * a non-streaming store. Each micro-batch arrives as a plain batch
    * DataFrame plus its batchId — idempotent handlers key their writes on
    * the id (e.g. overwrite a per-batch directory) so a replayed batch
    * after failure lands exactly once. Runs to completion on the static
    * fixture, like runToMemory. */
  def runForeachBatch(spark: SparkSession, streaming: DataFrame,
      handle: (DataFrame, Long) => Unit): Unit =
    withConfiguredStateStore(spark) {
      // Measured note (r18): Trigger.AvailableNow was A/B'd here and ran
      // mildly SLOWER than processAllAvailable on the 45-gate stream
      // family board (109.2 vs 104.0 s) with no per-gate winner, so the
      // continuous-trigger drain stays.
      val q = streaming.writeStream
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) => handle(df, id))
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }

  /** Drives a streaming DataFrame to completion against the static fixture
    * via the memory sink; returns the materialized result table.
    *
    * Stateful streaming operators create one state-store instance per
    * shuffle partition per operator; the fixture's state fits a handful of
    * partitions, so the query runs with 8 instead of inheriting the batch
    * setting (a real deployment sizes this to state volume — it is fixed
    * at first checkpoint). The session conf is restored afterwards. */
  def runToMemory(spark: SparkSession, streaming: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try withConfiguredStateStore(spark) {
      val q = streaming.writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set(key, prev)
    spark.table(name)
  }
}
