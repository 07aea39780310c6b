package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, TextAnalysis}

/**
 * Sequence-packing invariants: full coverage (every doc packed exactly
 * once), within-shard contiguity (doc order preserved inside a
 * sequence), capacity discipline (a sequence only overflows via its
 * straddling tail document), and determinism across repartitionings.
 */
class PackingSpec extends GraftSuite {
  private lazy val docs = Tables.load(spark, SparkTestBase.sf001, "documents")
  private val cap = 256L

  private def packed = Packing.packSequences(
    docs, "doc_id", TextAnalysis.tokenCount(col("text")), cap, 8)

  test("every document lands in exactly one sequence; offsets in range") {
    val rows = packed.collect()
    assert(rows.length == docs.count())
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val off = r.getLong(3)
      assert(off >= 0 && off < cap, s"offset $off outside [0, $cap)")
    }
  }

  test("sequence fill only exceeds capacity by the straddling tail doc") {
    val stats = Packing.sequenceStats(packed, cap).collect()
    val byId = packed.collect().groupBy(_.getLong(2))
    stats.foreach { s =>
      val seqId = s.getLong(0)
      val tokens = s.getLong(2)
      val maxDoc = byId(seqId).map(_.getLong(4)).max
      assert(tokens < cap + maxDoc,
        s"seq $seqId tokens=$tokens exceeds capacity + largest doc $maxDoc")
    }
    // Conservation: sequence totals add up to the corpus token total.
    val corpusTokens = docs
      .agg(sum(TextAnalysis.tokenCount(col("text")))).collect()(0).getLong(0)
    assert(stats.map(_.getLong(2)).sum == corpusTokens)
  }

  test("docs are contiguous within a sequence, in id order per shard") {
    val rows = packed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      val ordered = shardRows.sortBy(_._1)
      ordered.sliding(2).foreach {
        case Array((_, _, s1, o1, n1), (_, _, s2, o2, _)) =>
          if (s1 == s2)
            assert(o2 == o1 + n1,
              s"within-seq offsets must be contiguous: $o1+$n1 != $o2")
          else assert(s2 > s1, "sequence ids must increase with doc order")
        case _ => ()
      }
    }
  }

  test("packing is a pure function of the data, not the partitioning") {
    val a = packed.collect().map(_.toSeq).toSet
    val b = Packing.packSequences(docs.repartition(13), "doc_id",
      TextAnalysis.tokenCount(col("text")), cap, 8).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }

  test("FFD packing: capacity strict, oversized docs isolated, pads <= greedy") {
    import spark.implicits._
    val tc = TextAnalysis.tokenCount(col("text"))
    val ffd = Packing.packSequencesFfd(docs, "doc_id", tc, cap, 8)
    // Exactly-once coverage.
    assert(ffd.count() == docs.count())
    assert(ffd.select("doc_id").distinct().count() == docs.count())
    // No multi-doc bin over capacity; an oversized doc sits alone.
    val fills = ffd.groupBy("seq_id").agg(sum("n_tokens").as("t"),
      count(lit(1)).as("nd"), max("n_tokens").as("mx"))
    assert(fills.where(col("t") > cap &&
      !(col("nd") === 1 && col("mx") > cap)).count() == 0)
    // Pad mass (capacity-padded bins minus real tokens) never exceeds
    // the greedy contiguous fill's — the reason FFD exists.
    def padMass(p: org.apache.spark.sql.DataFrame): Long = {
      val r = p.groupBy("seq_id").agg(sum("n_tokens").as("t"))
        .agg(sum(greatest(lit(cap), col("t"))).as("pad"), sum("t").as("tt"))
        .collect()(0)
      r.getLong(0) - r.getLong(1)
    }
    val (fp, gp) = (padMass(ffd), padMass(packed))
    assert(fp <= gp, s"FFD pad $fp should not exceed greedy pad $gp")
    // Deterministic under repartitioning.
    val again = Packing.packSequencesFfd(docs.repartition(13), "doc_id",
      tc, cap, 8)
    assert(ffd.exceptAll(again).isEmpty && again.exceptAll(ffd).isEmpty)
    // Constructed oversized doc: lands alone in its own bin.
    val tiny = Seq((0L, 10L), (8L, 300L), (16L, 20L))
      .toDF("doc_id", "nt") // all shard 0 with 8 shards
    val p2 = Packing.packSequencesFfd(tiny, "doc_id", col("nt"), cap, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 300-token doc is first (largest) -> bin 0 alone; 10 and 20 share bin 1.
    assert(p2(8L) != p2(0L) && p2(0L) == p2(16L))
  }

  test("repetition signals: hand-checked degenerate vs diverse docs") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "spam spam spam spam"),
      (2L, "one two three four"),
      (3L, "a b a b a b"),
      (4L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out(1L) == ((4L, 1L, 0.75, 1.0, 1.0)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 4L, 0.0, 0.25, 1.0 / 3)), s"got ${out(2L)}")
    val (n3, d3, dup3, top3, big3) = out(3L)
    assert(n3 == 6L && d3 == 2L && dup3 > 0.6 && top3 == 0.5 && big3 == 0.6,
      s"got ${out(3L)}")
    assert(out(4L) == ((1L, 1L, 0.0, 1.0, 0.0)),
      s"single-token doc has no bigrams: ${out(4L)}")
  }
}
