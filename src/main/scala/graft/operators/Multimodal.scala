package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(width: Int, height: Int, sampleRate: Int,
    durationMs: Long, format: String)

/** One media row: opaque binary payload + typed metadata. */
case class MediaRecord(mediaId: Long, kind: String, payload: Array[Byte],
    meta: MediaMeta)

/** Decoded/extracted features for one media row. */
case class MediaFeatures(mediaId: Long, nBytes: Long, payloadMd5: String,
    embChecksum: Long, embedding: Array[Float])

/**
 * Multimodal column plumbing (SURVEY.md §2.5): image/audio/video as opaque
 * `binary` columns with typed metadata structs, plus
 * decode / feature-extract / resize / frame-sample operators.
 *
 * The DECODE step is a clearly-marked STUB — this container has no image or
 * audio codecs, so `decodeFeatures` derives deterministic fake features
 * from the payload bytes (md5-based). Everything AROUND the stub is real
 * and tested: the schema, the binary payload handling, the
 * `mapPartitions` batch shape (the Scala analog of `mapInPandas` — one
 * iterator per partition, constant memory, arbitrary per-row native calls),
 * the metadata arithmetic, and the frame-sampling explode.
 *
 * Scale: payloads dominate row size, so media tables should be written with
 * small `files.maxPartitionBytes` / row-group sizes and NEVER shuffled
 * whole — every operator here is a narrow map or an explode; joins against
 * features should happen on (mediaId, feature) projections, not payloads.
 */
object Multimodal {

  /** Builds a media table from the documents fixture: payload = UTF-8 bytes
    * of the text (a stand-in for encoded image bytes), metadata derived
    * deterministically from n_chars. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640 + 64).cast("int").as("width"),
        (col("n_chars") % 480 + 48).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") * 10).cast("long").as("durationMs"),
        lit("fake/raw").as("format")).as("meta"))

  /**
   * Feature extraction over payload bytes via `mapPartitions` — the real
   * batched-UDF plumbing; only the inner decode is stubbed.
   *
   * STUB: a real implementation would decode `payload` with an image/audio
   * library here (per-partition, so codec handles are reused across rows).
   * This container ships no codecs, so features are a deterministic
   * function of the bytes: md5 hex, a 16-dim pseudo-embedding from the
   * digest bytes, and a 32-bit checksum from the hex prefix.
   */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // one codec handle per batch
      it.map { m =>
        val digest = md.digest(m.payload)
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        val emb = digest.take(16).map(b => (b & 0xff) / 255.0f)
        MediaFeatures(m.mediaId, m.payload.length.toLong, hex,
          java.lang.Long.parseLong(hex.substring(0, 8), 16), emb)
      }
    }
  }

  /** Resize planning: new dimensions fitting `maxDim`, aspect preserved.
    * (The pixel transform itself would live in the stubbed decode step.) */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    media.select(col("media_id"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      floor(w * scale).cast("long").as("new_width"),
      floor(h * scale).cast("long").as("new_height"))
  }

  /** Frame sampling: one row per sampled frame timestamp
    * (0 <= ts_ms <= durationMs, step `everyMs`) — pure plan-side explode,
    * no decode needed to *plan* extraction at scale. */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.select(col("media_id"), col("meta.durationMs").as("duration_ms"),
        posexplode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs))))
      .select(col("media_id"), col("pos").cast("long").as("frame_idx"),
        col("col").as("ts_ms"))
}
