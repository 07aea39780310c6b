package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus-cleaning pipeline (SURVEY.md §2.5): the composition a
 * training-data run actually executes, built from the individually-gated
 * operators —
 *
 *   1. exact dedup        (content-hash groupBy, keep min id)
 *   2. near-dup dedup     (MinHash LSH pairs -> connected components ->
 *                          keep the min-id representative)
 *   3. quality filter     (TextAnalysis.qualityScore >= minQuality)
 *   4. language filter    (TextAnalysis.languageId != 'und')
 *
 * Scale: stages 1-2 are the dedup operators' shuffles (content hash, band
 * join, label propagation); stages 3-4 are narrow per-row maps that
 * Catalyst fuses into the surviving-rows scan. Order matters: dedup first
 * shrinks the rows the (cheap but per-row) scoring runs on, and near-dup
 * clustering sees each exact-duplicate group only once.
 */
object Pipeline {

  def cleanCorpus(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.7, jaccardThreshold: Double = 0.5): DataFrame = {
    // 1. Exact: one survivor (min id) per distinct content hash — the
    //    same keep-first contract as Dedup.exactKeepFirst (single source
    //    of truth for the hash/tie rule).
    val exactKeep = Dedup.exactKeepFirst(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exact = docs.join(exactKeep, Seq(idCol), "left_semi")
    // 2. Near-dup: LSH pairs on the exact-deduped set, components, keep
    //    the representative.
    val pairs = Dedup.minhashNearDuplicates(exact, idCol, textCol,
      jaccardThreshold).select("id_a", "id_b")
    val nearKept = Dedup.keepRepresentatives(exact, idCol, pairs)
    // 3-4. Per-row quality + language gates.
    nearKept
      .where(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .where(TextAnalysis.languageId(col(textCol)) =!= "und")
  }
}
