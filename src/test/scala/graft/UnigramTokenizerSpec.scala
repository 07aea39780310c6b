package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeTokenizer, UnigramTokenizer}

/**
 * Unigram-LM (SentencePiece-class) vocabulary trainer: hard-EM over
 * piece usage with a greedy priority cover, integer-exact and
 * deterministic (same replay discipline as the BPE trainer).
 */
class UnigramTokenizerSpec extends GraftSuite {

  private lazy val docs = Tables.load(spark, SparkTestBase.sf001, "documents")

  test("vocabulary respects the budget, ranks are dense, usage descends") {
    val v = UnigramTokenizer.trainUnigram(docs, "text", 16, 2).collect()
    assert(v.nonEmpty && v.length <= 16)
    assert(v.map(_.getLong(0)).toSeq == (1L to v.length))
    val usages = v.map(_.getLong(2))
    assert(usages.zip(usages.tail).forall { case (a, b) => a >= b })
    assert(usages.forall(_ > 0), "an unused piece survived the M-step")
    v.map(_.getString(1)).foreach { p =>
      assert(p.length >= 2 && p.length <= UnigramTokenizer.MaxPieceLen)
    }
  }

  test("training is deterministic under repartitioning") {
    val a = UnigramTokenizer.trainUnigram(docs, "text", 12, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val b = UnigramTokenizer.trainUnigram(docs.repartition(13), "text", 12, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("EM round 2 segments under the pruned vocab: usage comes from real tokens") {
    // Every trained piece must actually occur inside some corpus word —
    // usage counts token emissions, not raw substring frequency.
    val v = UnigramTokenizer.trainUnigram(docs, "text", 16, 2)
      .collect().map(_.getString(1))
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    v.foreach(p => assert(words.exists(_.contains(p)), s"piece '$p' unused"))
  }

  test("coverage: unigram compression >= BPE at equal extra-vocab budget") {
    // Both tokenizers get 8 learned multi-char units on the same corpus;
    // chars-per-piece (higher = better coverage) must not favor BPE —
    // the EM's usage-ranked pieces are chosen globally, while BPE greed
    // is pairwise-local.
    val bpeMerges = BpeTokenizer.trainBpeMerges(docs, "text", 8)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val bpe = BpeTokenizer.tokenizeStats(docs, "doc_id", "text", bpeMerges)
      .agg(avg(col("compression"))).collect()(0).getDouble(0)
    val uniVocab = UnigramTokenizer.trainUnigram(docs, "text", 8, 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val uni = UnigramTokenizer.tokenizeStats(docs, "doc_id", "text", uniVocab)
      .agg(avg(col("compression"))).collect()(0).getDouble(0)
    assert(uni >= bpe - 1e-9,
      s"unigram compression $uni must not trail BPE $bpe at equal budget")
  }

  test("tokenizeStats conserves characters and never inflates token count") {
    val vocab = UnigramTokenizer.trainUnigram(docs, "text", 8, 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val st = UnigramTokenizer.tokenizeStats(docs, "doc_id", "text", vocab)
    // chars per doc equal the raw word-character mass (segmentation is
    // lossless), and pieces never exceed chars (each piece >= 1 char).
    val raw = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "" && !col("w").contains("|"))
      .groupBy("doc_id").agg(sum(length(col("w"))).cast("long").as("c"))
    val joined = st.join(raw, "doc_id")
    assert(joined.where(col("n_chars") =!= col("c")).count() == 0)
    assert(joined.where(col("n_pieces") > col("n_chars")).count() == 0)
    assert(joined.where(col("n_pieces") < col("n_words")).count() == 0)
  }
}
