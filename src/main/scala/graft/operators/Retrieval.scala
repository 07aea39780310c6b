package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid-retrieval fusion (SURVEY.md §2.5 layer C): combine a sparse
 * (lexical, e.g. [[TextAnalysis.bm25TopK]]) and a dense (embedding, e.g.
 * [[Similarity.bruteForceTopK]] / [[Similarity.ivfTopK]]) ranked list —
 * or any number of ranked lists — into one ranking with reciprocal-rank
 * fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
 *
 *   rrf(d) = sum over lists L containing d of 1 / (k0 + rank_L(d))
 *
 * RRF is the standard production hybrid because it needs no score
 * calibration: BM25 scores and cosine similarities live on incomparable
 * scales, but ranks are ranks.
 *
 * Scale (100 TB): fusion NEVER touches the corpus. Inputs are the
 * k-bounded result lists the retrieval operators already produce (each
 * at most perList rows), so every stage here — the rank windows, the
 * union, the grouped sum, the final ranking — runs over O(lists * k)
 * rows regardless of corpus size. The heavy lifting (scan, candidate
 * generation, top-k heaps) stays in the upstream operators, which are
 * the ones with distributed-scale designs.
 */
object Retrieval {

  /** Derive (id, rnk) from a k-bounded scored list: rank 1 = best, by
    * (scoreCol DESC, idCol ASC) — the same total order every graft
    * ranking tail uses. The unpartitioned window is safe ONLY because
    * the input is an already-trimmed top-k list (document-scale inputs
    * belong in TopK.perKey, not here). */
  def asRankList(list: DataFrame, idCol: String, scoreCol: String): DataFrame =
    list.select(col(idCol).as("id"),
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).as("rnk"))

  /** Fuse pre-ranked lists (columns: id, rnk) into the RRF top-k.
    * Output: (id, rnk, rrf, n_lists) — fused rank, the rounded fused
    * score, and how many input lists contained the id.
    *
    * Determinism: each id receives at most one contribution per list;
    * with the standard two-list (sparse + dense) hybrid the grouped sum
    * is a single IEEE addition, so the fused score is bit-identical
    * across engines and partitionings. Ties break on id. */
  def rrfFuse(rankLists: Seq[DataFrame], k0: Int = 60,
      k: Int = 20): DataFrame = {
    require(rankLists.nonEmpty, "rrfFuse: need at least one rank list")
    require(k0 > 0 && k > 0, "rrfFuse: k0 > 0 and k > 0")
    val contribs = rankLists.map(_.select(col("id"),
      (lit(1.0) / (col("rnk").cast("double") + lit(k0.toDouble)))
        .as("contrib")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy("id")
      .agg(sum(col("contrib")).as("rrf"),
        count(lit(1)).cast("long").as("n_lists"))
    fused
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rrf").desc, col("id"))).cast("long"))
      .where(col("rnk") <= k)
      .select(col("id"), col("rnk"), round(col("rrf"), 6).as("rrf"),
        col("n_lists"))
  }
}
