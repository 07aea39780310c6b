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
      idCol: String, textCol: String, retainVersions: Int = 3): DataFrame =
    EmbeddingIndexStream.incrementalFold(spark, history, docDir, schema,
      stateDir, "post_v", retainVersions,
      batch => TextAnalysis.termPostings(batch, idCol, textCol))

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
    EmbeddingIndexStream.incrementalFold(spark, history, docDir, schema,
      stateDir, "dsir_v", retainVersions,
      batch => graft.operators.DataSelection.bucketCounts(batch, textCol,
        buckets),
      (prev, rows) => graft.operators.DataSelection.mergeCounts(prev, rows))
}
