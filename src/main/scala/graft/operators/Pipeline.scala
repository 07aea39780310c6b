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

  /**
   * Web-corpus training-manifest pipeline — the raw-crawl-to-manifest
   * composition of the newer operator families, each individually gated:
   *
   *   1. HTML main-content extraction  (HtmlExtract: boilerplate blocks
   *                                     dropped by link density)
   *   2. URL canonicalization          (UrlOps.registeredDomain tag)
   *   3. exact dedup on the EXTRACTED  (crawl dups differ in chrome, not
   *      content                        content — dedup after extraction)
   *   4. heuristic quality floor       (TextAnalysis.qualityScore)
   *   5. benchmark decontamination     (n-gram overlap vs the eval set)
   *   6. EXACT mixture                 (largest-remainder quotas by
   *                                     domain column, hash-rank picks)
   *
   * Input `pages`: (idCol, htmlCol, urlCol, mixCol). Returns the
   * manifest: (idCol, mixCol, domain, n_tokens).
   *
   * Scale: extraction/URL/quality are narrow maps fused into the scan;
   * dedup is the content-hash shuffle; decontamination broadcasts the
   * eval gram set; the mixture rides the heap top-k operator. The
   * extracted corpus is lazily checkpointed once — every later stage
   * branches from the materialized table, as a production pipeline's
   * inter-stage storage would.
   */
  def webCorpusManifest(pages: DataFrame, idCol: String, htmlCol: String,
      urlCol: String, mixCol: String, evalIds: DataFrame,
      weights: Map[String, Double], totalN: Long,
      minQuality: Double = 0.5): DataFrame = {
    val content = HtmlExtract
      .extractMainContent(pages, idCol, htmlCol)
      .select(col("doc_id").as(idCol), col("content"))
    val doc = pages.join(content, Seq(idCol))
      .withColumn("domain", UrlOps.registeredDomain(col(urlCol)))
      .select(col(idCol), col(mixCol), col("domain"), col("content"))
      .localCheckpoint(false)
    val corpus = doc.join(evalIds, Seq(idCol), "left_anti")
    val keep = Dedup.exactKeepFirst(corpus, idCol, "content")
      .select(col("keep_id").as(idCol))
    val d1 = corpus.join(keep, Seq(idCol), "left_semi")
    // d2 feeds BOTH the decontamination gram explode and the final
    // semi-join; checkpoint the survivors once instead of re-running
    // extract->dedup->quality per consumer (exchange reuse does not
    // cross the two shapes).
    val d2 = d1.where(
      TextAnalysis.qualityScore(col("content")) >= minQuality)
      .localCheckpoint(false)
    val evalDocs = doc.join(evalIds, Seq(idCol), "left_semi")
      .select(col(idCol), col("content"))
    // 5-gram decontamination: 3-grams look fine on a 500-doc fixture but
    // are vocabulary-collision noise at 10x the corpus (97% of clean docs
    // crossed the 20% overlap bar at sf0.1); 5-gram overlap stays
    // proportional to genuinely shared passages as both sides grow.
    val clean = Decontaminate.ngramOverlap(
        d2.select(col(idCol), col("content")), evalDocs,
        idCol, "content", k = 5, num = 1, den = 5)
      .where(!col("contaminated"))
      .select(col("doc_id").as(idCol))
    val d3 = d2.join(clean, Seq(idCol), "left_semi")
    Sampling.exactMixture(d3, idCol, mixCol, weights, totalN)
      .select(col(idCol), col(mixCol), col("domain"),
        TextAnalysis.tokenCount(col("content")).as("n_tokens"))
  }
}
