package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.{MediaRecord, Multimodal}

/**
 * Streaming media-signature index maintenance — the multimodal twin of
 * [[EmbeddingIndexStream]]/[[DedupStream]]: clip batches arrive as a
 * stream, each clip is decoded and fingerprinted ONCE on arrival
 * ([[Multimodal.audioFingerprint]] — amplitude-invariant 64-bit
 * positional period bitmap), and only the 2x32-bit signature enters the
 * versioned state. Near-dup pairing ([[Multimodal.audioNearDup]]'s
 * banded-Hamming join) then runs against the ACCUMULATED signature table
 * without ever re-decoding history — day-N media dedup at O(batch)
 * decode cost.
 *
 * Because the fingerprint is a pure per-clip function, the folded state
 * equals one batch pass over everything ingested (the gate's oracle is
 * the batch fingerprint replay verbatim). Same versioning/vacuum
 * contract as every other fold.
 *
 * At 100 TB the payloads never move: decode happens in the scan
 * partition of each arriving batch, signatures are ~16 bytes/clip, and
 * the banded pairing joins signatures only.
 */
object MediaIndexStream {

  /**
   * Runs the clip stream in `mediaDir` (parquet MediaRecord rows,
   * `schema`) to completion, starting from `history` (fingerprinted as
   * v0), folding (media_id, fp_hi, fp_lo, n_frames) signature rows under
   * `stateDir`. Returns the final accumulated signature table.
   */
  def incrementalAudioFingerprints(spark: SparkSession,
      history: DataFrame, mediaDir: String, schema: StructType,
      stateDir: String, retainVersions: Int = 3): DataFrame = {
    import spark.implicits._
    def fingerprint(batch: DataFrame): DataFrame =
      Multimodal.audioFingerprint(
        batch.select(col("media_id").as("mediaId"), col("kind"),
          col("payload"), col("meta")).as[MediaRecord])
    EmbeddingIndexStream.incrementalFold(spark, history, mediaDir, schema,
      stateDir, "fp", retainVersions, fingerprint)
  }

  /**
   * [[incrementalAudioFingerprints]] under deletes (takedowns): the clip
   * changelog's D rows tombstone media ids out of the served signature
   * table through [[DeleteStream.deleteAwareFold]]'s chain — a deleted
   * clip's signature can never pair in [[Multimodal.audioNearDup]]
   * (absent from the table the banded join scans), a re-crawl of a
   * deleted clip is fingerprinted and served fresh, and compaction
   * physically drops tombstoned signatures. D rows need only `media_id`.
   */
  def incrementalAudioFingerprintsWithDeletes(spark: SparkSession,
      history: DataFrame, mediaDir: String, schema: StructType,
      stateDir: String, opCol: String,
      retainVersions: Int = 3, compactEvery: Int = 16): DataFrame = {
    import spark.implicits._
    def fingerprint(batch: DataFrame): DataFrame =
      Multimodal.audioFingerprint(
        batch.select(col("media_id").as("mediaId"), col("kind"),
          col("payload"), col("meta")).as[MediaRecord])
    DeleteStream.deleteAwareFold(spark, history, mediaDir, schema, stateDir,
      "fp", "media_id", "media_id", opCol, retainVersions, compactEvery,
      fingerprint)
  }
}
