package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TimeSeries}

/**
 * Hand-checked contracts for the time-series z-scores and the IR
 * operators (inverted index, TF-IDF) on tiny literal fixtures.
 */
class TimeSeriesSpec extends GraftSuite {
  import spark.implicits._

  test("gapFillHourly: grid spans first..last hour, gaps carry last value") {
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (1L, 10L, ts(10, 5), 1.0), (2L, 10L, ts(10, 40), 2.0),
      (3L, 10L, ts(13, 10), 3.0),
      (4L, 20L, ts(11, 20), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.gapFillHourly(rows, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        ((r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.size == 5, "4-hour grid for user 10 + 1 hour for user 20")
    // Hour 10 has two events: the LATER one (ts 10:40) is the representative.
    assert(out((10L, "2024-01-01 10:00:00.0")) == ((2.0, 2L, false)))
    assert(out((10L, "2024-01-01 11:00:00.0")) == ((2.0, 0L, true)),
      "gap hour forward-fills the last observed value")
    assert(out((10L, "2024-01-01 12:00:00.0")) == ((2.0, 0L, true)))
    assert(out((10L, "2024-01-01 13:00:00.0")) == ((3.0, 1L, false)))
    assert(out((20L, "2024-01-01 11:00:00.0")) == ((5.0, 1L, false)),
      "singleton key gets a single-row grid (no fabricated span)")
  }

  test("rolling z-score: trailing baseline excludes the current row") {
    // Key a: baseline [2,2,2,2] then a spike of 10 -> mean 2, var 0 (null
    // z); key b: [1,3] then 5 -> mean 2, var 2, z = (5-2)/sqrt(2).
    val rows = Seq(
      ("a", 1L, 2L), ("a", 2L, 2L), ("a", 3L, 2L), ("a", 4L, 2L),
      ("a", 5L, 10L),
      ("b", 1L, 1L), ("b", 2L, 3L), ("b", 3L, 5L))
      .toDF("k", "t", "n")
    val out = TimeSeries.rollingZScores(rows, Seq("k"), "t", "n", 24)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    assert(out(("a", 1L)) == ((0L, None)), "no baseline on the first row")
    assert(out(("a", 5L)) == ((4L, None)),
      "zero-variance baseline must yield null z, not a division blowup")
    assert(out(("b", 3L)) ==
      ((2L, Some(math.rint(3.0 / math.sqrt(2.0) * 1e6) / 1e6))),
      s"got ${out(("b", 3L))}")
  }

  test("inverted index: postings sorted by doc_id, df/cf consistent") {
    val docs = Seq((3L, "b a b"), (1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          r.getSeq[org.apache.spark.sql.Row](3)
            .map(p => (p.getLong(0), p.getLong(1))))).toMap
    assert(idx("a") == ((2L, 2L, Seq((1L, 1L), (3L, 1L)))))
    assert(idx("b") == ((2L, 3L, Seq((1L, 1L), (3L, 2L)))))
    assert(idx("c") == ((1L, 1L, Seq((2L, 1L)))))
    assert(TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf = 2L)
      .count() == 2, "minDf must drop singleton terms")
  }

  test("tf-idf: rare terms outrank common ones; ranks are 1..k") {
    // 'rare' appears in 1 of 3 docs, 'the' in all 3: for doc 1 (tf equal)
    // the rare term must rank first.
    val docs = Seq((1L, "the rare"), (2L, "the the"), (3L, "the"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(top.count(_._1 == 1L) == 2)
    assert(top.find(t => t._1 == 1L && t._2 == 1L).get._3 == "rare")
    assert(top.find(t => t._1 == 1L && t._2 == 2L).get._3 == "the")
  }

  test("transitionMatrix: exact counts and fixed-point row probabilities") {
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (2L, 1L, "B"), (2L, 2L, "B"))
      .toDF("user_id", "seq", "event_type")
    val got = TimeSeries.transitionMatrix(ev, "user_id", "event_type",
        "seq", "seq").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      ("A", "B") -> (1L, 1L, 1000000L),
      ("B", "A") -> (1L, 2L, 500000L),
      ("B", "B") -> (1L, 2L, 500000L)))
  }

  test("sequenceLikelihood: exact fixed-point NLL under the trained matrix") {
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (2L, 1L, "B"), (2L, 2L, "B"))
      .toDF("user_id", "seq", "event_type")
    val got = TimeSeries.sequenceLikelihood(ev, "user_id", "event_type",
        "seq", "seq").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // P(A->B)=1, P(B->A)=P(B->B)=1/2; floor(ln(0.5)*1e6) = -693148.
    val half = math.floor(math.log(0.5) * 1e6).toLong
    assert(got == Map(1L -> (2L, -half), 2L -> (1L, -half)))
  }

  test("keyedSequences: total order, partition-independent") {
    val ev = Seq(
      (1L, 3L, "C"), (1L, 1L, "A"), (1L, 2L, "B"),
      (2L, 1L, "X"))
      .toDF("user_id", "seq", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.keyedSequences(df, "user_id", "event_type", "seq", "seq")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
    val got = run(ev)
    assert(got == Map(1L -> (3L, "A>B>C"), 2L -> (1L, "X")))
    assert(run(ev.repartition(7)) == got, "must not depend on partitioning")
  }

  test("wordPmi: collocation beats coincidence, exact fixed-point values") {
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val got = TextAnalysis.wordPmi(docs, "text", minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // T=6 tokens, P=9 pairs, c_x=c_y=3; e.g. pmi(x,y)=ln(3*36/(9*9)).
    def pmi(cab: Long) =
      math.floor(math.log(cab * 36.0 / (9.0 * 9.0)) * 1e6).toLong
    assert(got(("x", "y")) == (3L, pmi(3)))
    assert(got(("y", "x")) == (2L, pmi(2)))
    assert(got(("x", "x")) == (2L, pmi(2)))
    assert(got(("y", "y")) == (2L, pmi(2)))
    // The adjacent collocation outranks the coincidental same-word pair.
    assert(got(("x", "y"))._2 > got(("x", "x"))._2)
  }

  test("incrementalTransitions: boundary stitch makes the fold equal the batch matrix") {
    import spark.implicits._
    // User 1 straddles the batch cut with a -> b | c -> d (the ONLY a->...
    // after the boundary is the stitched b -> c pair); user 2 sits
    // entirely in batch 0.
    val rows = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), // batch 0
      (2L, 15L, 3L, "a"), (2L, 25L, 4L, "a"),
      (1L, 30L, 5L, "c"), (1L, 40L, 6L, "d")) // batch 1
    val all = rows.toDF("user_id", "o", "event_id", "event_type")
    val days = Seq(all.where(col("o") < 30), all.where(col("o") >= 30))
    val root = java.nio.file.Files.createTempDirectory("graft_transpec")
    val logDir = root.resolve("days")
    java.nio.file.Files.createDirectories(logDir)
    days.zipWithIndex.foreach { case (slice, i) =>
      val stage = root.resolve(s"stage$i").toString
      slice.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      java.nio.file.Files.copy(part, logDir.resolve(f"day$i%03d.parquet"))
      java.nio.file.Files.setLastModifiedTime(
        logDir.resolve(f"day$i%03d.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val folded = graft.streaming.TimeSeriesStream.incrementalTransitions(
        spark, logDir.toString, days.head.schema,
        root.resolve("state").toString, "user_id", "event_type", "o",
        "event_id")
      .select("cur", "nxt", "cnt", "cur_total", "p_scaled")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val batch = TimeSeries.transitionMatrix(all, "user_id", "event_type",
        "o", "event_id")
      .select("cur", "nxt", "cnt", "cur_total", "p_scaled")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(folded == batch)
    // The b -> c pair exists ONLY across the boundary: its presence
    // proves the stitch ran; without it the fold would lose one of the
    // four transitions (6 events, 2 users).
    assert(folded.exists { case (cur, nxt, _, _, _) => cur == "b" && nxt == "c" })
    assert(folded.toSeq.map(_._3).sum == 4L)
  }
}
