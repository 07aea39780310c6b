package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding vocabulary training, IN-ENGINE (SURVEY.md §2.5
 * layer C) — the third trained-in-the-engine component after the IVF
 * k-means (`Similarity.trainKMeans`) and the logistic quality model
 * (`QualityModel.trainLogReg`), with the same determinism discipline:
 * every aggregate is exact-integer, every argmax has a total tie order,
 * and the DuckDB oracle replays the full training unrolled.
 *
 * Algorithm (Sennrich et al., the standard subword-vocab build): start
 * from per-word character sequences weighted by corpus frequency; each
 * round counts adjacent token pairs, merges the most frequent pair
 * (ties: higher count first, then lexicographic left, then right) in
 * every word, and records it. K rounds produce the merge table a
 * tokenizer ships with.
 *
 * Engine-portable merge application: a word's tokenization is kept as
 * the string `|t1||t2||t3|`. Merging pair (A, B) is then the LITERAL
 * string replacement `|A||B|` -> `|AB|`, and sequential left-to-right
 * non-overlapping replace() — the exact semantics of both Spark's and
 * DuckDB's replace — IS BPE's greedy merge order ("aaa" + (a,a) ->
 * [aa, a]). No UDF, no per-engine fold semantics to reconcile.
 *
 * Scale shape: training runs on the DISTINCT-WORD table (vocabulary-
 * sized — persisted once; the corpus is scanned exactly once to build
 * it). Each round is one narrow pair-explode + one exact-integer count
 * aggregate over that table, with ONE (left, right, count) row collected
 * per round — the same bounded driver traffic as a k-means centroid
 * fetch. Merge application is a chained narrow replace(); nothing
 * corpus-sized moves after the word count.
 */
object BpeTokenizer {

  /** Internal token separator; words containing it are dropped (they
    * cannot be represented — real BPE uses byte vocabularies for the same
    * reason). */
  val Sep = "|"

  /** `|c1||c2||...|` character-split form of a word. */
  private def charSeq(word: org.apache.spark.sql.Column) =
    concat(lit(Sep),
      array_join(regexp_extract_all(word, lit("."), lit(0)), Sep + Sep),
      lit(Sep))

  /** Token array of a `|t1||t2|` string. */
  private def toksOf(s: org.apache.spark.sql.Column) =
    split(substring(s, lit(2), length(s) - 2), "\\|\\|")

  /**
   * Trains `rounds` BPE merges over the corpus and returns the merge
   * table: (round 1.., left, right, merged, pair_count) — `pair_count`
   * the exact corpus-weighted frequency that won the round. Training
   * stops early if no pair occurs twice.
   */
  def trainBpeMerges(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "trainBpeMerges: rounds >= 1")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "" && !col("word").contains(Sep))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), charSeq(col("word")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cur = words
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val toks = toksOf(col("s"))
        val best = cur
          .select(col("freq"), explode(
            zip_with(toks, slice(toks, 2, 1000000),
              (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .where(col("p.r").isNotNull)
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.isEmpty || best(0).getLong(2) < 2) done = true
        else {
          val (l, rt, c) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          merges += ((r, l, rt, l + rt, c))
          cur = cur.withColumn("s", overlayReplace(col("s"), l, rt))
          r += 1
        }
      }
      import spark.implicits._
      merges.result()
        .toDF("round", "left", "right", "merged", "pair_count")
        .select(col("round").cast("long"), col("left"), col("right"),
          col("merged"), col("pair_count"))
    } finally words.unpersist()
  }

  /** Literal `|A||B|` -> `|AB|` replacement (BPE greedy merge). */
  private def overlayReplace(s: org.apache.spark.sql.Column,
      a: String, b: String) = {
    val pattern = Sep + a + Sep + Sep + b + Sep
    val replacement = Sep + a + b + Sep
    call_function("replace", s, lit(pattern), lit(replacement))
  }

  /**
   * Tokenizes `textCol` words with a trained merge table (applied in
   * round order) and reports per-document token counts before/after —
   * the compression-ratio health check for a candidate vocab. Narrow
   * per-row maps only.
   */
  def tokenizeStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "" && !col("word").contains(Sep))
    val applied = merges.foldLeft(charSeq(col("word"))) {
      case (s, (a, b)) => overlayReplace(s, a, b)
    }
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
