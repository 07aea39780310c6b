package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Incremental NEAR-dedup vs a historical MinHash band index
 * (Dedup.minhashBandIndex / incrementalMinhashKeepFirst): cross-day
 * near-dups are caught through the index alone (no historical text),
 * in-batch near-dups resolve keep-first, and genuinely new docs survive.
 */
class IncrementalMinhashSpec extends GraftSuite {
  import spark.implicits._

  // 30-token docs: ~28 distinct 3-shingles, so a one-word append keeps
  // jaccard ~0.93 — with 8 bands x 4 rows the planted near-dups collide
  // on some band deterministically (asserted below, not assumed).
  private val baseA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val baseB = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val baseC = (1 to 30).map(i => s"gamma$i").mkString(" ")

  private lazy val history = Seq((1L, baseA), (2L, baseB))
    .toDF("doc_id", "text")
  private lazy val index = Dedup.minhashBandIndex(history, "doc_id", "text")

  private lazy val incoming = Seq(
    10L -> (baseA + " update"),  // near-re-crawl of history doc 1
    11L -> baseC,                // genuinely new, survives
    12L -> (baseC + " extra"),   // in-batch near-dup of 11 (loses: 12 > 11)
    13L -> (1 to 30).map(i => s"delta$i").mkString(" ") // new, survives
  ).toDF("doc_id", "text")

  test("planted near-dups actually collide on a band (fixture sanity)") {
    val incBands = Dedup.minhashBandIndex(incoming, "doc_id", "text")
    val hist10 = incBands.where(col("doc_id") === 10)
      .join(index, Seq("band", "band_hash"), "left_semi").count()
    assert(hist10 > 0, "doc 10 must share a band with historical doc 1")
    val pair = incBands.where(col("doc_id") === 11).as("x")
      .join(incBands.where(col("doc_id") === 12).as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash")).count()
    assert(pair > 0, "docs 11/12 must share a band")
  }

  test("history screen + in-batch keep-first produce the right survivors") {
    val out = Dedup.incrementalMinhashKeepFirst(
      incoming, "doc_id", "text", index)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(11L, 13L))
  }

  test("unrelated docs never collide: empty index keeps everything new") {
    val out = Dedup.incrementalMinhashKeepFirst(
      Seq(21L -> baseA, 22L -> baseB).toDF("doc_id", "text"),
      "doc_id", "text", index.limit(0))
    assert(out.count() == 2)
  }

  test("a doc dropped as historical cannot eliminate an in-batch peer") {
    // Construct the index surgically: exactly the bands doc 30 does NOT
    // share with its in-batch near-dup 31. Then 30 hits history, 31
    // does not, and 31's only collision partner (30) was already
    // removed by the history screen — so 31 survives despite 30 < 31.
    val batch = Seq(30L -> baseA, 31L -> (baseA + " zz yy xx"))
      .toDF("doc_id", "text")
    val bAll = Dedup.minhashBandIndex(batch, "doc_id", "text")
    val b30 = bAll.where(col("doc_id") === 30)
    val b31 = bAll.where(col("doc_id") === 31)
    val onlyIn30 = b30.join(b31, Seq("band", "band_hash"), "left_anti")
    val shared = b30.join(b31, Seq("band", "band_hash"), "left_semi")
    assert(onlyIn30.count() > 0, "fixture: 30 needs a band 31 lacks")
    assert(shared.count() > 0, "fixture: 30 and 31 must share a band")
    val out = Dedup.incrementalMinhashKeepFirst(
      batch, "doc_id", "text", onlyIn30)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(31L))
  }
}
