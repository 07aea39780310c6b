package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Incremental NEAR-dedup vs a historical SimHash band index
 * (Dedup.simhashBandIndex / incrementalSimhashKeepFirst): cross-day
 * near-dups are caught through the index (band candidate + Hamming
 * verify against the indexed signature), in-batch near-dups resolve
 * keep-first, and genuinely new docs survive. Verification matters here:
 * SimHash's 12-bit bands random-collide at 2^-12 per band pair, unlike
 * MinHash's ~60-bit band hashes.
 */
class IncrementalSimhashSpec extends GraftSuite {
  import spark.implicits._

  private val baseA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val baseC = (1 to 30).map(i => s"gamma$i").mkString(" ")

  private lazy val history = Seq(
    (1L, baseA), (2L, (1 to 30).map(i => s"beta$i").mkString(" ")))
    .toDF("doc_id", "text")
  private lazy val index = Dedup.simhashBandIndex(history, "doc_id", "text")

  private lazy val incoming = Seq(
    10L -> (baseA + " update"),  // near-re-crawl of history doc 1
    11L -> baseC,                // genuinely new, survives
    12L -> (baseC + " extra"),   // in-batch near-dup of 11 (loses: 12 > 11)
    13L -> (1 to 30).map(i => s"delta$i").mkString(" ") // new, survives
  ).toDF("doc_id", "text")

  test("planted near-dups are within Hamming 3 of their source (sanity)") {
    val sigs = Dedup.simhash(
      history.unionAll(incoming), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(10L)) <= 3,
      "re-crawl must stay within the Hamming radius")
    assert(java.lang.Long.bitCount(sigs(11L) ^ sigs(12L)) <= 3,
      "in-batch pair must stay within the Hamming radius")
    // distinct docs are far apart — the verification has teeth
    assert(java.lang.Long.bitCount(sigs(11L) ^ sigs(13L)) > 3)
  }

  test("history screen + in-batch keep-first produce the right survivors") {
    val out = Dedup.incrementalSimhashKeepFirst(
      incoming, "doc_id", "text", index)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(11L, 13L))
  }

  test("band collision alone is NOT enough — Hamming verify must pass") {
    // An index row sharing band 0's nib with doc 11 but with a far
    // signature must not knock doc 11 out.
    val sig11 = Dedup.simhash(incoming, "doc_id", "text")
      .where(col("doc_id") === 11).collect()(0).getLong(1)
    val nib0 = sig11 & 4095L
    val farSig = sig11 ^ (~4095L & ((1L << 48) - 1)) // same band 0, rest flipped
    val fakeIndex = Seq((99L, 0, nib0, farSig))
      .toDF("doc_id", "band", "nib", "simhash")
    val out = Dedup.incrementalSimhashKeepFirst(
      incoming, "doc_id", "text", fakeIndex)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out.contains(11L),
      s"band-only collision wrongly dropped doc 11: survivors $out")
  }
}
