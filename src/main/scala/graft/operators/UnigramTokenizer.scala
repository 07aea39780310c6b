package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM-family (SentencePiece-class) subword vocabulary trainer,
 * IN-ENGINE (SURVEY.md §2.5 layer C) — the second tokenizer family real
 * pipelines train, next to [[BpeTokenizer]]: instead of growing a vocab
 * one merge at a time, it OVERGENERATES candidate pieces, segments the
 * corpus under the current vocabulary, and keeps the pieces the
 * segmentation actually uses — hard-EM over piece usage:
 *
 *  - E-step: every word is segmented by a deterministic greedy
 *    priority cover (longer pieces first, then higher weight, then
 *    lexicographic) and each piece's usage is the corpus-frequency-
 *    weighted count of tokens it produced;
 *  - M-step: the vocabulary is re-estimated as the top `extraPieces`
 *    pieces by usage (single characters always survive, so every word
 *    stays representable — the unigram "character fallback").
 *
 * Fixed `rounds` iterations, no early stop; likelihood surrogate is the
 * exact integer usage count (fixed-point discipline: no float enters
 * training, so the DuckDB oracle replays every round bit-for-bit).
 *
 * Engine-portable segmentation — the [[BpeTokenizer]] trick, inverted:
 * a word's tokenization is the string `|t1||t2|`; applying piece p is
 * the LITERAL replacement of p's character-split form `|c1||c2||c3|`
 * with `|p|`, and folding the vocabulary in priority order through
 * sequential left-to-right `replace()` (identical semantics in Spark
 * and DuckDB) IS the greedy cover. No recursion, no per-position DP,
 * no UDF.
 *
 * Scale shape: training runs on the DISTINCT-WORD table (vocabulary-
 * sized; the corpus is scanned once to build it). Per round: one narrow
 * chained-replace projection + one exact-integer token-count aggregate;
 * only the top-`extraPieces` (piece, weight) rows are collected — the
 * bounded-plan-constant discipline of the k-means/BPE/quality-model
 * trainers. Candidate generation explodes substrings of DISTINCT words
 * (short strings), never of the corpus.
 */
object UnigramTokenizer {

  /** Internal token separator; words containing it are dropped — same
    * contract as [[BpeTokenizer.Sep]]. */
  val Sep = "|"

  /** Longest candidate piece. */
  val MaxPieceLen = 4

  /** `|c1||c2||...|` character-split form of a word column. */
  private def charSeq(word: Column): Column =
    concat(lit(Sep),
      array_join(regexp_extract_all(word, lit("."), lit(0)), Sep + Sep),
      lit(Sep))

  /** Character-split form of a piece known at plan time. */
  private def charSplitOf(piece: String): String =
    Sep + piece.map(_.toString).mkString(Sep + Sep) + Sep

  /** Token array of a `|t1||t2|` string. */
  private def toksOf(s: Column): Column =
    split(substring(s, lit(2), length(s) - 2), "\\|\\|")

  /** Greedy priority cover: fold the pieces (already priority-ordered)
    * through literal char-split -> token replaces. */
  private def applyPieces(s: Column, pieces: Seq[String]): Column =
    pieces.foldLeft(s) { (acc, p) =>
      call_function("replace", acc, lit(charSplitOf(p)), lit(Sep + p + Sep))
    }

  /** Distinct-word table (word, freq, s = char-split form), persisted —
    * every round re-segments from this raw form. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "" && !col("word").contains(Sep))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), charSeq(col("word")).as("s"))

  /** Priority order of the greedy cover: longer pieces first, then
    * higher weight, then lexicographic — total and engine-replayable. */
  private def priority(pw: Seq[(String, Long)]): Seq[String] =
    pw.sortBy { case (p, wgt) => (-p.length, -wgt, p) }.map(_._1)

  /**
   * Trains the unigram vocabulary: `rounds` hard-EM iterations over the
   * corpus word table, vocabulary budget of `extraPieces` multi-char
   * pieces (characters are implicit and always kept — the unigram
   * character fallback). Round 1 segments under the overgenerated
   * candidate set; each M-step keeps the top `extraPieces` pieces by
   * usage, and the next round re-segments under them. Returns the last
   * M-step's vocabulary as (rank, piece, usage) — usage the exact
   * corpus-weighted token count of that round's segmentation, rank by
   * (usage desc, piece asc). Pieces a round's segmentation never used
   * drop out (shadowed by higher-priority pieces).
   */
  def trainUnigram(docs: DataFrame, textCol: String,
      extraPieces: Int = 16, rounds: Int = 2): DataFrame = {
    require(extraPieces >= 1 && rounds >= 1,
      "trainUnigram: extraPieces >= 1, rounds >= 1")
    val spark = docs.sparkSession
    val words = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Candidate pieces: every length-2..4 substring OCCURRENCE of every
      // distinct word, corpus-frequency weighted. Overgenerate 2x the
      // budget so the EM prune has real competition to resolve.
      val cands = (2 to MaxPieceLen).map { l =>
        words.where(length(col("word")) >= l)
          .select(col("freq"), explode(
            transform(sequence(lit(0), length(col("word")) - l),
              i => col("word").substr(i + 1, lit(l)))).as("piece"))
      }.reduce(_.unionAll(_))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("piece"))
        .limit(2 * extraPieces)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

      var vocab = cands // (piece, weight) — weight drives the priority
      for (_ <- 1 to rounds) {
        vocab = words.select(col("freq"),
            explode(toksOf(applyPieces(col("s"), priority(vocab)))).as("tok"))
          .where(length(col("tok")) >= 2)
          .groupBy("tok").agg(sum(col("freq")).as("usage"))
          .orderBy(col("usage").desc, col("tok"))
          .limit(extraPieces)
          .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
      }
      import spark.implicits._
      vocab.zipWithIndex
        .map { case ((p, u), i) => (i + 1L, p, u) }
        .toDF("rank", "piece", "usage")
    } finally { words.unpersist(); () }
  }

  /**
   * Per-document token statistics under a trained unigram vocabulary
   * (pieces applied in the given priority order): chars, pieces, words,
   * and the chars-per-piece compression ratio — the same health check as
   * [[BpeTokenizer.tokenizeStats]], so the two tokenizer families are
   * directly comparable at equal vocabulary budget.
   */
  def tokenizeStats(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[(String, Long)]): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "" && !col("word").contains(Sep))
    val applied = applyPieces(charSeq(col("word")), priority(pieces))
    words
      .select(col("doc_id"), length(col("word")).cast("long").as("chars"),
        size(toksOf(applied)).cast("long").as("pieces"))
      .groupBy("doc_id")
      .agg(sum(col("chars")).as("n_chars"), sum(col("pieces")).as("n_pieces"),
        count(lit(1)).as("n_words"))
      .withColumn("compression", round(
        col("n_chars").cast("double") / col("n_pieces").cast("double"), 6))
  }
}
