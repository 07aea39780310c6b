package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus-cleaning pipeline (SURVEY.md §2.5): the composition a
 * training-data run actually executes, built from the individually-gated
 * operators —
 *
 *   1. exact dedup        (content-hash groupBy, keep min id)
 *   2. boilerplate filter (paragraph-level: drop documents that are mostly
 *                          cross-corpus repeated windows)
 *   3. near-dup dedup     (MinHash LSH pairs -> connected components ->
 *                          keep the min-id representative)
 *   4. quality filter     (TextAnalysis.qualityScore >= minQuality)
 *   5. language filter    (TextAnalysis.languageId != 'und')
 *
 * Scale: stages 1-3 are the dedup operators' shuffles (content hash,
 * paragraph hash, band join, label propagation); stages 4-5 are narrow
 * per-row maps that Catalyst fuses into the surviving-rows scan. Order
 * matters: exact dedup first shrinks everything downstream; the
 * boilerplate filter runs before fuzzy dedup so minhash never wastes
 * band-join work on documents that are dropped anyway — the order
 * production corpus pipelines use.
 */
object Pipeline {

  def cleanCorpus(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.7, jaccardThreshold: Double = 0.5,
      maxBoilerplate: Double = 0.6, paraWindow: Int = 15): DataFrame = {
    // 1. Exact: one survivor (min id) per distinct content hash — the
    //    same keep-first contract as Dedup.exactKeepFirst (single source
    //    of truth for the hash/tie rule).
    val exactKeep = Dedup.exactKeepFirst(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exact = docs.join(exactKeep, Seq(idCol), "left_semi")
    // 2. Paragraph-level boilerplate: fraction measured across the
    //    exact-deduped corpus; mostly-duplicated documents drop here.
    val paraStats = Dedup.paragraphDedup(exact, idCol, textCol,
      Dedup.paragraphizeByWindow(col(textCol), paraWindow))
    val lowBoiler = paraStats
      .where(col("n_dup_paras").cast("double") <=
        col("n_paras") * maxBoilerplate)
      .select(col("doc_id").as(idCol))
    // Checkpoint the surviving corpus before fuzzy dedup: the minhash
    // band SELF-join (and its two shingle join-backs) would otherwise
    // recompute the exact+boilerplate stages once per branch. At cluster
    // scale this materialization is the inter-stage table a production
    // pipeline writes anyway. LAZY: it materializes with the first action
    // on the result, so plan-only consumers (plan audits, .explain) don't
    // execute the upstream dedup stages at construction time.
    val stage2 = exact.join(lowBoiler, Seq(idCol), "left_semi")
      .localCheckpoint(false)
    // 3. Near-dup: LSH pairs on the surviving set, components, keep the
    //    representative.
    val pairs = Dedup.minhashNearDuplicates(stage2, idCol, textCol,
      jaccardThreshold).select("id_a", "id_b")
    val nearKept = Dedup.keepRepresentatives(stage2, idCol, pairs)
    // 4-5. Per-row quality + language gates.
    nearKept
      .where(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .where(TextAnalysis.languageId(col(textCol)) =!= "und")
  }
}
