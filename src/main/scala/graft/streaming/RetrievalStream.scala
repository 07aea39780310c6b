package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.TextAnalysis

/**
 * Streaming retrieval-index maintenance: document batches fold into a
 * persisted (doc_id, term, tf) postings table, so ranked retrieval
 * (BM25 via [[TextAnalysis.bm25FromPostings]]) always runs against
 * everything ingested WITHOUT re-tokenizing history — the day-N search
 * index behind a RAG corpus. Postings are pure per-doc, so the fold is
 * an append (docs are unique across batches) and the accumulated table
 * equals one [[TextAnalysis.termPostings]] pass over the full corpus;
 * since every BM25 aggregate is an integer count in double, queries
 * against the folded state are BIT-IDENTICAL to the batch scan.
 *
 * Versioning/vacuum contract shared with every other fold. At 100 TB
 * the postings live bucketed by term, so a query's handful of term
 * probes co-locate with zero exchange on the index side.
 */
object RetrievalStream {

  /** Runs the document stream in `docDir` (parquet, `schema` with
    * id/text columns) to completion, starting from `history`, folding
    * postings under `stateDir`. Returns the final accumulated table. */
  def incrementalPostings(spark: SparkSession, history: DataFrame,
      docDir: String, schema: StructType, stateDir: String,
      idCol: String, textCol: String, retainVersions: Int = 3,
      compactEvery: Int = 256, packEvery: Int = 16): DataFrame =
    EmbeddingIndexStream.incrementalFold(spark, history, docDir, schema,
      stateDir, "post", retainVersions,
      batch => TextAnalysis.termPostings(batch, idCol, textCol),
      compactEvery, packEvery)

  /** Streaming DSIR model maintenance: document batches fold into the
    * persisted (b, cnt) hashed-ngram bucket counts
    * ([[graft.operators.DataSelection.bucketCounts]]) by lossless
    * per-bucket count addition — the raw-corpus language model stays
    * current as data lands, WITHOUT re-featurizing history, and because
    * every entry is an exact integer the folded model scores documents
    * ([[graft.operators.DataSelection.dsirScoresFromCounts]])
    * bit-identically to a one-pass scan. State is `buckets` rows —
    * constant-size at any corpus. Same versioning/vacuum contract as
    * every other fold. */
  def incrementalDsirCounts(spark: SparkSession, history: DataFrame,
      docDir: String, schema: StructType, stateDir: String,
      textCol: String, buckets: Int, retainVersions: Int = 3): DataFrame =
    EmbeddingIndexStream.mergedFold(spark, history, docDir, schema,
      stateDir, "dsir_v", retainVersions,
      batch => graft.operators.DataSelection.bucketCounts(batch, textCol,
        buckets),
      (prev, rows) => graft.operators.DataSelection.mergeCounts(prev, rows))

  /** STREAMING threshold selection — DSIR deployed as continuous
    * selection: documents are scored ON ARRIVAL against STATIC reference
    * models (`targetCounts` = the curated target's bucket LM,
    * `rawCounts` = the proposal model from the history sample — fixed,
    * like the IVF quantizer: importance weights against a fixed
    * proposal, the deployed simplification that makes per-batch scores
    * FINAL), and TWO states fold per batch under the changelog
    * versioning discipline:
    *
    *  - `dsel_v{n}`: the accumulated scored rows (doc_id, n_feats,
    *    lr_sum_scaled, score, __v) — an append, docs are unique across
    *    batches (the postings-fold shape);
    *  - `dhist_v{n}`: the mergeable histogram sketch of `__v` — merged
    *    by bucket-count addition, so the folded sketch EQUALS one
    *    histBuild over everything ingested, losslessly.
    *
    * The (1 - frac) cut is then read from FOLDED state — one collected
    * value — and filters the folded scores: because scoring is per-doc
    * against static models and the sketch merge is exact, the result is
    * BIT-IDENTICAL to [[graft.operators.DataSelection.dsirScoresFromCounts]]
    * + sketch + cut over the full corpus in one batch pass (the
    * stream_ngram_drift verbatim-oracle contract). Returns the kept
    * (doc_id, score) rows.
    *
    * Scale: per-batch cost is one narrow featurize + broadcast-join
    * score + a bucket-bounded sketch merge; no global sort, no window —
    * the deployed shape of "keep the top slice, continuously". */
  def incrementalDsirThreshold(spark: SparkSession, history: DataFrame,
      docDir: String, schema: StructType, stateDir: String,
      idCol: String, textCol: String, frac: Double, buckets: Int,
      widthMicros: Long, targetCounts: DataFrame, rawCounts: DataFrame,
      retainVersions: Int = 3, compactEvery: Int = 256,
      packEvery: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(retainVersions >= 2,
      "incrementalDsirThreshold: retainVersions >= 2")
    require(frac > 0.0 && frac < 1.0,
      "incrementalDsirThreshold: frac in (0, 1)")
    val ds = graft.operators.DataSelection
    val sk = graft.operators.Sketches
    // Materialize the static models once — the deployed artifact shape
    // (and each micro-batch re-reads a tiny parquet instead of
    // re-deriving the model lineage per batch).
    targetCounts.write.mode("overwrite").parquet(s"$stateDir/model_target")
    rawCounts.write.mode("overwrite").parquet(s"$stateDir/model_raw")
    val tc = spark.read.parquet(s"$stateDir/model_target")
    val rc = spark.read.parquet(s"$stateDir/model_raw")
    def score(df: DataFrame): DataFrame =
      ds.withMeanMicros(ds.dsirScoresFromCounts(
        df, idCol, textCol, buckets, tc, rc))
    // Scored rows GROW with the corpus, so they fold as a [[DeltaState]]
    // append chain (per-batch write = the batch's own scores only); the
    // histogram sketch is bucket-bounded, so it keeps the constant-size
    // rewrite discipline.
    DeltaState.writeBase(score(history), stateDir, "dsel", 0L)
    sk.histBuild(DeltaState.read(spark, stateDir, "dsel", 0L), col("__v"),
        widthMicros)
      .write.mode("overwrite").parquet(s"$stateDir/dhist_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(docDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val s = score(batch)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      DeltaState.writeDelta(s, stateDir, "dsel", id + 1)
      sk.histMerge(spark.read.parquet(s"$stateDir/dhist_v$id")
          .unionByName(sk.histBuild(s, col("__v"), widthMicros)))
        .write.mode("overwrite").parquet(s"$stateDir/dhist_v${id + 1}")
      s.unpersist(false)
      if (DeltaState.due(stateDir, "dsel", id + 1, compactEvery)) {
        DeltaState.compact(spark, stateDir, "dsel", id + 1)
        DeltaState.vacuum(stateDir, "dsel", retainVersions)
      } else if (DeltaState.packDue(stateDir, "dsel", id + 1, packEvery)) {
        DeltaState.pack(spark, stateDir, "dsel", id + 1)
        DeltaState.vacuum(stateDir, "dsel", retainVersions)
      }
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "dhist_v")
      last = id + 1
    })
    val scores = DeltaState.read(spark, stateDir, "dsel", last)
    val cut = ds.thresholdCutOf(
      spark.read.parquet(s"$stateDir/dhist_v$last"), frac, widthMicros)
    scores.where(col("__v") >= org.apache.spark.sql.functions.lit(cut))
      .select(col("doc_id"), col("score"))
  }
}
