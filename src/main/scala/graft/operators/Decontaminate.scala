package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextHash.wordShingles

/**
 * Benchmark decontamination (SURVEY.md §2.5 layer C): flag training-corpus
 * documents that overlap an evaluation/benchmark set at the word-n-gram
 * level — the standard guard against test-set leakage when assembling
 * training data.
 *
 * Scale design (the 100 TB story): the eval side is always tiny relative
 * to the corpus (benchmarks are thousands of documents; the corpus is
 * billions), so the distinct eval-gram set is BROADCAST and the corpus
 * never shuffles its gram stream — the per-document overlap count is a
 * narrow explode + broadcast semi-join + hash aggregate whose map-side
 * partials reduce to one row per document before the only exchange
 * (keyed by doc id). No corpus-vs-corpus join exists anywhere.
 *
 * Grams reuse the deterministic WordShingles codegen expression (distinct
 * word k-grams, whole-text fallback below k words), so the DuckDB oracle
 * replays the pipeline exactly.
 */
object Decontaminate {

  /**
   * Per-corpus-document overlap against `evalSet`: distinct gram count,
   * shared-with-eval gram count, and a contamination flag at threshold
   * `num/den` (integer arithmetic — no float drift).
   */
  def ngramOverlap(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, k: Int = 3, num: Int = 1, den: Int = 5): DataFrame = {
    require(den > 0 && num >= 0, s"threshold $num/$den must be non-negative")
    val evalGrams = evalSet
      .select(explode(wordShingles(col(textCol), k)).as("gram"))
      .distinct()
    val withGrams = corpus.select(col(idCol).as("doc_id"),
      wordShingles(col(textCol), k).as("grams"))
    val shared = withGrams
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    withGrams
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("contaminated",
        col("n_shared") * den >= col("n_grams") * num)
  }
}
