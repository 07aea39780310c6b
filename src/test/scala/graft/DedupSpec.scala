package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends GraftSuite {
  private val dir = SparkTestBase.sf001 // sf0.01: 500 docs, 25 planted pairs
  private lazy val docs = Tables.load(spark, dir, "documents")

  test("exact dedup: 500 docs, all unique in this corpus") {
    val kept = Dedup.exactKeepFirst(docs, "doc_id", "text")
    assert(kept.count() == 500)
    assert(Dedup.exact(docs, Seq("text")).count() == 500)
  }

  test("duplicatedSpans: exact interval union, catches copies at ANY offset") {
    import spark.implicits._
    // doc 1: 12 unique tokens + an 8-token passage; doc 2 carries the SAME
    // passage at a different offset (3 leading tokens) — aligned-block
    // paragraph dedup would miss it, stride-1 windows must not.
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    val fixture = Seq(
      (1L, (1 to 12).map(i => s"u$i").mkString(" ") + " " + passage),
      (2L, "x1 x2 x3 " + passage + " y1 y2"),
      (3L, (1 to 10).map(i => s"z$i").mkString(" "))) // clean doc
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(fixture, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // Only the one 8-token window (the passage itself) is shared, so each
    // carrier flags exactly 1 dup window covering 8 tokens; doc 3 absent.
    assert(out.keySet == Set(1L, 2L), s"got $out")
    assert(out(1L) == ((20L, 1L, 8L)))
    assert(out(2L) == ((13L, 1L, 8L)))
    // Overlap union: two docs sharing a 10-token passage have 3
    // overlapping dup windows but only 10 covered tokens, not 24.
    val long = (1 to 10).map(i => s"q$i").mkString(" ")
    val f2 = Seq((1L, long + " a b c"), (2L, "k1 k2 " + long))
      .toDF("doc_id", "text")
    val o2 = Dedup.duplicatedSpans(f2, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(o2(1L) == ((3L, 10L)), s"got $o2")
    assert(o2(2L) == ((3L, 10L)))
  }

  test("removeDuplicatedSpans cuts exactly the covered tokens, rebuilds text") {
    import spark.implicits._
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    val fixture = Seq(
      (1L, (1 to 12).map(i => s"u$i").mkString(" ") + " " + passage),
      (2L, "x1 x2 x3 " + passage + " y1 y2"),
      (3L, (1 to 10).map(i => s"z$i").mkString(" "))) // clean doc
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(fixture, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // The shared passage vanishes from BOTH carriers; everything else —
    // including token order around the cut — survives verbatim.
    assert(out(1L) == ((20L, 12L, (1 to 12).map(i => s"u$i").mkString(" "))))
    assert(out(2L) == ((13L, 5L, "x1 x2 x3 y1 y2")))
    // A clean doc passes through untouched (and IS in the output).
    assert(out(3L) == ((10L, 10L, (1 to 10).map(i => s"z$i").mkString(" "))))
    // A short doc whose whole-text fallback window duplicates empties out.
    val f2 = Seq((1L, "a b c"), (2L, "a b c"), (3L, "d e f"))
      .toDF("doc_id", "text")
    val o2 = Dedup.removeDuplicatedSpans(f2, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(o2(1L) == ((0L, "")) && o2(2L) == ((0L, "")))
    assert(o2(3L) == ((3L, "d e f")))
    // Detector/remover agree: tokens cut == dup_tokens counted.
    val counted = Dedup.duplicatedSpans(fixture, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    counted.foreach { case (id, dupToks) =>
      val (n, kept, _) = out(id)
      assert(n - kept == dupToks, s"doc $id: cut ${n - kept} vs counted $dupToks")
    }
  }

  test("minhash LSH finds exactly the 25 planted near-dup pairs at j>=0.5") {
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.5).collect()
    assert(pairs.length == 25, s"expected 25 planted pairs, got ${pairs.length}")
    pairs.foreach { r =>
      val (inter, uni) = (r.getLong(2), r.getLong(3))
      assert(inter.toDouble / uni >= 0.5)
    }
  }

  test("minhash LSH recall: candidates cover every true j>=0.5 pair") {
    // Ground truth by brute-force jaccard on shingle sets.
    val sh = docs.select(col("doc_id"),
      graft.operators.TextHash.wordShingles(col("text"), 3).as("s"))
    val truth = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.s"), col("b.s"))))
      .withColumn("uni", size(col("a.s")) + size(col("b.s")) - col("inter"))
      .where(col("inter") >= col("uni") * 0.5)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth == found, s"missed=${truth -- found} extra=${found -- truth}")
  }

  test("simhash: near-dup pairs include the planted minhash pairs") {
    val planted = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashNearDuplicates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val covered = planted.intersect(sim)
    assert(covered.size >= (planted.size * 0.8).toInt,
      s"simhash covers ${covered.size}/${planted.size} planted pairs")
  }

  test("ngram jaccard pairs match minhash planted pairs") {
    val ng = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ng.size == 25)
  }

  test("embedding near-dup finds 14 pairs at cosine>=0.45") {
    val emb = Tables.load(spark, dir, "embeddings")
    val pairs = Dedup.embeddingNearDuplicates(emb, "vec_id", "embedding", 0.45)
    assert(pairs.count() == 14)
  }

  test("narrow SimhashBits == explode+aggregate simhash; narrow plan") {
    val a = Dedup.simhash(docs, "doc_id", "text")
    val b = Dedup.simhashAgg(docs, "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"simhash must be narrow:\n$plan")
  }

  test("narrow MinhashSig == explode+aggregate signatures") {
    val a = Dedup.minhashSignatures(docs, "doc_id", "text")
      .selectExpr("doc_id", "posexplode(sig)")
    val b = Dedup.minhashSignaturesAgg(docs, "doc_id", "text")
      .selectExpr("doc_id", "posexplode(sig)")
    assert(a.count() == 500 * 32)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("minhash signature computation is shuffle-free (narrow plan)") {
    val plan = Dedup.minhashSignatures(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signatures must be narrow:\n$plan")
  }

  test("minhash plan: no cartesian product, candidate join is equi-join") {
    val plan = Dedup.minhashCandidates(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH candidates must not be a cross join:\n$plan")
  }

  test("cleanCorpus pipeline: dedups planted pairs and applies both filters") {
    import graft.operators.{Pipeline, TextAnalysis}
    val kept = Pipeline.cleanCorpus(docs, "doc_id", "text")
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < docs.count())
    // Planted near-dup pair (8, 245): at most one representative survives.
    assert(!(ids.contains(8L) && ids.contains(245L)))
    // Every survivor passes the quality and language gates.
    val violating = kept.where(
      TextAnalysis.qualityScore(col("text")) < 0.7 ||
        TextAnalysis.languageId(col("text")) === "und").count()
    assert(violating == 0)
  }

  test("paragraphDedup edges: empty doc, all-boilerplate doc, keeper keeps one") {
    import spark.implicits._
    val d = Seq(
      (1L, "aaa bbb ccc"),          // unique paragraph
      (2L, "ddd eee fff"),          // duplicated across docs 2 and 3
      (3L, "ddd eee fff"),          // fully boilerplate, loses to doc 2
      (4L, ""),                     // empty text -> zero paragraphs
      (5L, "ddd eee fff ggg hhh")   // shares doc 2's window? (window=3: "ddd eee fff" + "ggg hh")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, "doc_id", "text",
        Dedup.paragraphizeByWindow(col("text"), 3))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // Empty doc yields no paragraphs, so it has no output row (posexplode
    // of an empty array) — callers needing it keep a left join.
    assert(!out.contains(4L))
    assert(out(1L) == ((1L, 0L, "aaa bbb ccc")))
    // Doc 2 is the keeper of the shared paragraph: dup-counted but kept.
    assert(out(2L) == ((1L, 1L, "ddd eee fff")))
    // Doc 3 is pure boilerplate and not the keeper: cleaned to empty.
    assert(out(3L) == ((1L, 1L, "")))
    // Doc 5 shares the "ddd eee fff" window too (window boundaries align
    // at multiples of 3): it drops that window, keeps its tail.
    assert(out(5L) == ((2L, 1L, "ggg hhh")))
  }

  test("docFreq cap: fraction-derived default == pinned cap at fixture scale") {
    // At 500 docs the floor (50) dominates, so the derived default must
    // reproduce the pinned-50 pair set exactly.
    assert(Dedup.effectiveDocFreqCap(500) == 50L)
    val derived = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pinned = Dedup.ngramJaccardPairs(docs, "doc_id", "text", maxDocFreq = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(derived == pinned && derived.nonEmpty)
    // As N grows the cap tracks the corpus fraction (recall does not decay
    // toward zero) while bounding every posting list to fraction*N.
    assert(Dedup.effectiveDocFreqCap(1000000) == 1000L)
    assert(Dedup.effectiveDocFreqCap(1000000000) == 1000000L)
    assert(Dedup.effectiveDocFreqCap(1000) == 50L, "floor wins on small corpora")
  }
}
