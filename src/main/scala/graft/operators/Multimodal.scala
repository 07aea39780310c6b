package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(width: Int, height: Int, sampleRate: Int,
    durationMs: Long, format: String)

/** One media row: opaque binary payload + typed metadata. */
case class MediaRecord(mediaId: Long, kind: String, payload: Array[Byte],
    meta: MediaMeta)

/** Decoded features for one media row: dimensions read from the decoded
  * image, exact per-channel pixel sums (integers — order-independent and
  * oracle-replayable), and the mean gray level. */
case class MediaFeatures(mediaId: Long, width: Int, height: Int,
    sumR: Long, sumG: Long, sumB: Long, grayMean: Double)

/** One resized row: new dimensions + exact red-channel sum of the
  * nearest-neighbor-resampled pixels. */
case class MediaResized(mediaId: Long, newWidth: Int, newHeight: Int,
    sumR: Long)

/**
 * Multimodal column plumbing (SURVEY.md §2.5): image/audio/video as opaque
 * `binary` columns with typed metadata structs, plus decode /
 * feature-extract / resize / frame-sample operators.
 *
 * The decode path is REAL: payloads are genuine PNG images (encoded with
 * `javax.imageio`, the JDK's built-in codec), [[decodeFeatures]] decodes
 * actual pixels and reports exact channel statistics, and
 * [[resizeDecoded]] resamples real pixels (nearest neighbor). The fixture
 * shim [[fromDocuments]] synthesizes each document's image as a
 * deterministic gradient, so the decoded statistics have closed forms the
 * DuckDB oracle computes analytically — a decoder bug cannot hash-match.
 *
 * Scale: payloads dominate row size, so media tables should be written with
 * small `files.maxPartitionBytes` / row-group sizes and NEVER shuffled
 * whole — every operator here is a narrow map or an explode (one codec
 * context per partition via `mapPartitions`, the Scala analog of
 * `mapInPandas` batches); joins against features should happen on
 * (mediaId, feature) projections, not payloads.
 */
object Multimodal {

  /** Gradient-image dimensions/values for a (doc_id, n_chars) pair. Kept
    * wrap-free (every channel value < 256 without a modulo) so the DuckDB
    * oracle's closed-form sums need no case analysis:
    * w in [16,48], h in [8,31], r = doc_id%150 + x, g = 3y, b = 100+x+y. */
  private[operators] def dims(nChars: Long): (Int, Int) =
    ((nChars % 33 + 16).toInt, (nChars % 24 + 8).toInt)

  private def rgbAt(d: Int, x: Int, y: Int): Int =
    ((d + x) << 16) | ((3 * y) << 8) | (100 + x + y)

  /** Fixture shim: builds a media table from the documents fixture with a
    * REAL deterministic-gradient PNG payload per document (encoded with
    * the JDK's ImageIO), metadata derived from (doc_id, n_chars). */
  def fromDocuments(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (did, nc) =>
          val (w, h) = dims(nc)
          val d = (did % 150).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgbAt(d, x, y)); x += 1 }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          MediaRecord(did, "image", out.toByteArray,
            MediaMeta(w, h, 16000, nc * 10, "image/png"))
        }
      }
      .toDF()
      .select(col("mediaId").as("media_id"), col("kind"), col("payload"),
        col("meta"))
  }

  /** Metadata-only fixture shim: the SAME (media_id, kind, meta) rows as
    * [[fromDocuments]] but with NO payload column — pure column
    * expressions, whole-stage codegen, no ImageIO. The shim for gates
    * that PLAN from metadata ([[resizePlan]], [[frameSamplePlan]]): at
    * deployment those read a media table's meta column without touching
    * payload bytes, and paying a per-row PNG encode in the fixture made
    * a metadata-only gate measure as a codec benchmark (the r9 sf1 run
    * clocked mm_resize at 27x for 10x data purely from encode + GC). */
  def fromDocumentsMeta(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("media_id"),
      lit("image").as("kind"),
      struct(
        (col("n_chars") % 33 + 16).cast("int").as("width"),
        (col("n_chars") % 24 + 8).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars").cast("long") * 10L).as("durationMs"),
        lit("image/png").as("format")).as("meta"))

  /** JPEG twin of [[fromDocuments]]: the SAME gradient pixels, encoded
    * lossy (explicit quality 0.9) through the JDK's JPEG writer. Exercises
    * a second real codec through the identical decode path — dimensions
    * survive exactly; channel statistics survive within a small tolerance
    * the mm_decode_jpeg gate bounds per image. */
  def fromDocumentsJpeg(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        // One writer per partition — the codec-handle reuse pattern a
        // payload-heavy scan needs (writer instances are not thread-safe
        // but partitions are single-threaded).
        val writer = ImageIO.getImageWritersByFormatName("jpg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(0.9f)
        it.map { case (did, nc) =>
          val (w, h) = dims(nc)
          val d = (did % 150).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgbAt(d, x, y)); x += 1 }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          val ios = ImageIO.createImageOutputStream(out)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
          ios.close()
          MediaRecord(did, "image", out.toByteArray,
            MediaMeta(w, h, 16000, nc * 10, "image/jpeg"))
        } ++ { writer.dispose(); Iterator.empty } // free the codec handle
      }
      .toDF()
      .select(col("mediaId").as("media_id"), col("kind"), col("payload"),
        col("meta"))
  }

  /** Per-frame solid color of the GIF fixture: frame f of doc d is
    * uniformly (d + f, 3f, 100 + f) — wrap-free and palette-exact (one
    * color per frame), so multi-frame decode is bit-replayable. */
  private[operators] def gifFrameColor(d: Int, f: Int): (Int, Int, Int) =
    (d + f, 3 * f, 100 + f)

  /** Frame count of the GIF fixture for a document: 2..5 frames. */
  private[operators] def gifFrames(nChars: Long): Int = (nChars % 4 + 2).toInt

  /** Multi-frame fixture shim: a REAL animated GIF per document — 2..5
    * solid-color 16x12 frames written through the JDK's sequence writer
    * (`prepareWriteSequence`/`writeToSequence`). Solid frames make the
    * palette lossless, so [[decodeFrames]]' per-frame pixels have exact
    * closed forms the oracle replays. */
  def fromDocumentsGif(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val (w, h) = (16, 12)
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val writer = ImageIO.getImageWritersByFormatName("gif").next()
        it.map { case (did, nc) =>
          val d = (did % 150).toInt
          val n = gifFrames(nc)
          val out = new ByteArrayOutputStream()
          val ios = ImageIO.createImageOutputStream(out)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < n) {
            val (r, g, b) = gifFrameColor(d, f)
            val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val rgb = (r << 16) | (g << 8) | b
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          MediaRecord(did, "video", out.toByteArray,
            MediaMeta(w, h, 0, n * 1000L, "image/gif"))
        } ++ { writer.dispose(); Iterator.empty } // free the codec handle
      }
      .toDF()
      .select(col("mediaId").as("media_id"), col("kind"), col("payload"),
        col("meta"))
  }

  /**
   * TRUE multi-frame decode: every frame of an animated payload is read
   * through a `javax.imageio` GIF reader (`getNumImages` + indexed
   * `read`), one output row per frame with the frame's top-left pixel
   * channels — the container's actual bytes drive the row count and the
   * values, unlike [[frameSamplePlan]] which only PLANS extraction from
   * metadata. One reader per partition; only (id, frame, 5 ints) moves
   * downstream, payloads never shuffle.
   */
  def decodeFrames(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { m =>
        require(m.payload.length >= 4 &&
          new String(m.payload, 0, 4, "US-ASCII").startsWith("GIF8"),
          s"media ${m.mediaId}: payload is not a GIF container (decodeFrames " +
            "reads multi-frame GIF; use decodeFeatures for still images)")
        val iis =
          ImageIO.createImageInputStream(new ByteArrayInputStream(m.payload))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        require(n > 0, s"media ${m.mediaId}: no decodable frames")
        val rows = (0 until n).map { f =>
          val img = reader.read(f)
          val rgb = img.getRGB(0, 0)
          (m.mediaId, f.toLong, img.getWidth.toLong, img.getHeight.toLong,
            ((rgb >> 16) & 0xff).toLong, ((rgb >> 8) & 0xff).toLong,
            (rgb & 0xff).toLong)
        }
        iis.close()
        rows
      } ++ { reader.dispose(); Iterator.empty } // free the codec handle
    }.toDF("media_id", "frame_idx", "width", "height", "r", "g", "b")
  }

  /**
   * Real image decode + feature extraction over payload bytes via
   * `mapPartitions`: each payload is decoded with `javax.imageio` and the
   * features are exact integer channel sums over the ACTUAL pixels —
   * deterministic, order-independent, and (for the gradient fixture)
   * analytically replayable by the oracle.
   */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        require(img != null, s"media ${m.mediaId}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        MediaFeatures(m.mediaId, w, h, sr, sg, sb,
          (sr + sg + sb) / (3.0 * w * h))
      }
    }
  }

  /** Real pixel resize: decode, nearest-neighbor resample to fit `maxDim`
    * (aspect preserved, floor dims — same arithmetic as [[resizePlan]]),
    * report the resampled red-channel sum as exact integer evidence. At
    * scale this is the narrow per-row transform the resize stage of a
    * media pipeline runs; only (id, evidence) leaves the operator here. */
  def resizeDecoded(media: Dataset[MediaRecord], maxDim: Int)
      : Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        require(img != null, s"media ${m.mediaId}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val s = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val (nw, nh) = (math.floor(w * s).toInt, math.floor(h * s).toInt)
        var sr = 0L
        var ny = 0
        while (ny < nh) {
          val sy = ny * h / nh
          var nx = 0
          while (nx < nw) {
            sr += (img.getRGB(nx * w / nw, sy) >> 16) & 0xff
            nx += 1
          }
          ny += 1
        }
        MediaResized(m.mediaId, nw, nh, sr)
      }
    }
  }

  /** Resize planning from metadata only: new dimensions fitting `maxDim`,
    * aspect preserved — the plan-side sibling of [[resizeDecoded]] (at
    * scale you plan/partition from metadata without touching payloads). */
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

  /** Deterministic PCM16 sample i of doc d's fixture waveform: a pure
    * integer sawtooth, period 64 + d%32 samples, amplitude scaled by 256
    * — wrap-free closed forms for the oracle, no trig, no floats. */
  private[operators] def wavSample(d: Int, i: Int): Int = {
    val period = 64 + d % 32
    (i % period - period / 2) * 256
  }

  /** Sample count of doc (d, nChars): 800..1599 samples. */
  private[operators] def wavSamples(nChars: Long): Int =
    (nChars % 800 + 800).toInt

  /**
   * Audio fixture shim: a REAL RIFF/WAVE container per document —
   * PCM16 mono, 16 kHz, a deterministic integer sawtooth — written
   * through `javax.sound.sampled.AudioSystem` (the JDK's audio codec).
   * Payload is genuine WAV bytes: any RIFF parser decodes it.
   */
  def fromDocumentsWav(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (did, nc) =>
          val d = (did % 150).toInt
          val n = wavSamples(nc)
          val pcm = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = wavSample(d, i)
            pcm(2 * i) = (s & 0xff).toByte         // little-endian PCM16
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1,
            true, false) // signed, little-endian
          val out = new ByteArrayOutputStream()
          val ais = new javax.sound.sampled.AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, n.toLong)
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          MediaRecord(did, "audio", out.toByteArray,
            MediaMeta(0, 0, 16000, n * 1000L / 16000, "audio/wav"))
        }
      }
      .toDF()
      .select(col("mediaId").as("media_id"), col("kind"), col("payload"),
        col("meta"))
  }

  /**
   * Real audio decode + feature extraction: each WAV payload is decoded
   * through `AudioSystem.getAudioInputStream` (header parse + PCM frame
   * stream) and the features are exact integers over the ACTUAL decoded
   * samples — count, sample rate, sum of |amplitude|, peak |amplitude| —
   * so the gradient-free fixture's closed forms replay in the oracle.
   * Same shape as the image path: one mapPartitions decode pass, only
   * (id, 4 ints) moves downstream.
   */
  def decodeAudioFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding
            .PCM_SIGNED && !fmt.isBigEndian,
          s"media ${m.mediaId}: expected little-endian signed PCM16 mono, got $fmt")
        val bytes = ais.readAllBytes()
        ais.close()
        val n = bytes.length / 2
        var absSum = 0L
        var peak = 0L
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1).toInt // sign-carrying high byte
          val s = (hi << 8) | lo
          val a = math.abs(s).toLong
          absSum += a
          if (a > peak) peak = a
          i += 1
        }
        (m.mediaId, n.toLong, fmt.getSampleRate.toLong, absSum, peak)
      }
    }.toDF("media_id", "n_samples", "sample_rate", "abs_sum", "peak")
  }

  /**
   * Per-frame audio energy / voice-activity profile from REAL decoded
   * PCM: each WAV payload is decoded through `AudioSystem`, samples are
   * cut into fixed `frameSize`-sample frames (the trailing partial frame
   * keeps its true length), and each frame reports its exact
   * sum-of-squares energy plus an activity flag
   * (`sq_sum > n_samples * sqThresholdPerSample`, i.e. RMS above a
   * threshold — the silence-trim / speech-segment primitive an audio
   * corpus pipeline runs before transcription).
   *
   * All-integer per-frame sums — order-independent, exact, and
   * replayable by an oracle that regenerates the fixture waveform
   * sample-by-sample. Scale shape: one mapPartitions decode pass;
   * payloads never shuffle; ~duration/frameSize rows of 4 ints each is
   * all that moves downstream.
   */
  def audioFrameEnergy(media: Dataset[MediaRecord], frameSize: Int = 160,
      sqThresholdPerSample: Long = 16384L): DataFrame = {
    require(frameSize > 0, "audioFrameEnergy: frameSize must be positive")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(m.payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding
          .PCM_SIGNED && !fmt.isBigEndian,
        s"media ${m.mediaId}: expected little-endian signed PCM16 mono, got $fmt")
      val bytes = ais.readAllBytes()
      ais.close()
      val n = bytes.length / 2
      val nFrames = (n + frameSize - 1) / frameSize
      (0 until nFrames).map { f =>
        val lo = f * frameSize
        val hi = math.min(lo + frameSize, n)
        var sq = 0L
        var i = lo
        while (i < hi) {
          val s = ((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)
          sq += s.toLong * s
          i += 1
        }
        val inFrame = (hi - lo).toLong
        (m.mediaId, f.toLong, inFrame, sq,
          sq > inFrame * sqThresholdPerSample)
      }
    }.toDF("media_id", "frame_idx", "n_samples", "sq_sum", "active")
  }

  /**
   * 8x8 average-hash (aHash) perceptual signature from REAL decoded
   * pixels: nearest-neighbor sample to an 8x8 grid, per-sample gray mass
   * r+g+b, bit i set iff 64*v_i > total (strict — ties to 0, integer
   * exact). Brightness-shift invariant by construction (a constant added
   * to every sample cancels in the comparison). Returned as two 32-bit
   * halves (rows 0-3 / 4-7) so downstream engines without 64-bit shifts
   * replay it exactly.
   *
   * Scale shape: one mapPartitions decode pass — payloads never shuffle,
   * 2x4 bytes of signature per image is all that moves downstream.
   */
  def averageHash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        require(img != null,
          s"media ${m.mediaId}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val vals = new Array[Long](64)
        var i = 0
        while (i < 64) {
          val rgb = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
          vals(i) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          i += 1
        }
        val total = vals.sum
        var hi = 0L
        var lo = 0L
        i = 0
        while (i < 64) {
          if (64L * vals(i) > total) {
            if (i < 32) hi |= 1L << i else lo |= 1L << (i - 32)
          }
          i += 1
        }
        (m.mediaId, hi, lo)
      }
    }.toDF("media_id", "ahash_hi", "ahash_lo")
  }

  /**
   * Perceptual near-duplicate pairs at Hamming distance <= `maxHamming`
   * over [[averageHash]] signatures: the 64 bits split into 4x16-bit
   * bands, so by pigeonhole any pair within Hamming 3 shares at least one
   * band EXACTLY — candidates come from a (band, value) equi-join (linear
   * shuffle, never all-pairs), then the true bit distance verifies.
   * Same banded shape as the SimHash text path, lifted to images.
   */
  def perceptualNearDup(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedHamming64(hashes, "ahash_hi", "ahash_lo", maxHamming)

  /** Banded-Hamming near-dup pairing over a 64-bit signature stored as
    * two 32-bit halves: split into 4x16-bit bands, equi-join on any
    * shared band (pigeonhole: Hamming <= 3 differs in at most 3 bands,
    * so at least one matches — exact recall, no signature ever compares
    * against the whole corpus), then exact-Hamming refilter. The shape
    * both [[perceptualNearDup]] (images) and [[audioNearDup]] ride. */
  private def bandedHamming64(sigs: DataFrame, hiCol: String, loCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding guarantees recall only for maxHamming <= 3, got $maxHamming")
    val banded = sigs.select(col("media_id"),
        col(hiCol), col(loCol),
        posexplode(array(
          col(hiCol) % 65536L, floor(col(hiCol) / 65536L),
          col(loCol) % 65536L, floor(col(loCol) / 65536L))))
      .select(col("media_id"), col(hiCol), col(loCol),
        col("pos").as("band"), col("col").cast("long").as("bval"))
    val ham =
      bit_count(col(s"x.$hiCol").bitwiseXOR(col(s"y.$hiCol"))) +
        bit_count(col(s"x.$loCol").bitwiseXOR(col(s"y.$loCol")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.media_id") < col("y.media_id"))
      .where(ham <= maxHamming)
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        ham.cast("long").as("hamming"))
      .distinct()
  }

  /** Decodes a little-endian PCM16 mono payload to its sample array via
    * the JDK audio codec (header parse + frame stream). */
  private def decodePcm16(m: MediaRecord): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(m.payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding
        .PCM_SIGNED && !fmt.isBigEndian,
      s"media ${m.mediaId}: expected little-endian signed PCM16 mono, got $fmt")
    val bytes = ais.readAllBytes()
    ais.close()
    val n = bytes.length / 2
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      samples(i) = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
      i += 1
    }
    samples
  }

  /**
   * Integer spectral profile of the decoded PCM: each FULL
   * `frameSize`-sample frame reports the autocorrelation lag in
   * [`minLag`, `maxLag`] with the highest integer correlation sum
   * (ties -> lowest lag) — the frame's dominant period, i.e. its pitch
   * class. All-integer Long sums (|s| < 2^15, frameSize <= 2^12 keeps
   * every sum far from overflow), so an oracle regenerating the fixture
   * waveform replays every value exactly; and because argmax is
   * amplitude-invariant, volume-rescaled copies of a clip produce the
   * SAME profile — the property [[audioFingerprint]] near-dup rides on.
   *
   * Trailing partial frames (shorter than a full autocorrelation
   * window) are dropped: profile grain is floor(n / frameSize) rows.
   * Scale shape: one mapPartitions decode pass, payloads never shuffle,
   * 3 longs per frame move downstream.
   */
  def audioSpectralProfile(media: Dataset[MediaRecord], frameSize: Int = 256,
      minLag: Int = 32, maxLag: Int = 95): DataFrame = {
    require(0 < minLag && minLag < maxLag && maxLag < frameSize,
      s"audioSpectralProfile: need 0 < minLag < maxLag < frameSize, " +
        s"got ($minLag, $maxLag, $frameSize)")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val samples = decodePcm16(m)
      val nFrames = samples.length / frameSize
      (0 until nFrames).map { f =>
        val lo = f * frameSize
        var bestLag = -1L
        var bestCorr = Long.MinValue
        var lg = minLag
        while (lg <= maxLag) {
          var c = 0L
          var i = 0
          while (i < frameSize - lg) {
            c += samples(lo + i).toLong * samples(lo + i + lg)
            i += 1
          }
          if (c > bestCorr) { bestCorr = c; bestLag = lg.toLong }
          lg += 1
        }
        (m.mediaId, f.toLong, bestLag, bestCorr)
      }
    }.toDF("media_id", "frame_idx", "peak_lag", "peak_corr")
  }

  /**
   * 64-bit positional audio fingerprint: the clip is split into 4
   * temporal quarters (by frame index), and each frame sets bit
   * `quarter*16 + (peak_lag - minLag) mod 16` — WHERE in the clip each
   * period class occurs, not just whether it occurs, so two unrelated
   * single-pitch clips differ in ~8 bits (not the degenerate 2 a pure
   * presence bitmap would give) while a locally-edited copy moves only
   * the touched quarter's bits. Packed as two 32-bit halves like
   * [[averageHash]]. Amplitude-invariant (inherits the argmax invariance
   * of [[audioSpectralProfile]]): a volume-rescaled clip fingerprints
   * IDENTICALLY — pair with [[audioNearDup]].
   */
  def audioFingerprint(media: Dataset[MediaRecord], frameSize: Int = 256,
      minLag: Int = 32, maxLag: Int = 95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prof = audioSpectralProfile(media, frameSize, minLag, maxLag)
      .withColumn("nf", count(lit(1)).over(
        Window.partitionBy("media_id")))
      .withColumn("bitIdx",
        expr("(frame_idx * 4) div nf") * 16L +
          pmod(col("peak_lag") - lit(minLag.toLong), lit(16L)))
    prof.groupBy("media_id")
      .agg(
        expr("bit_or(CASE WHEN bitIdx < 32 THEN shiftleft(CAST(1 AS " +
          "BIGINT), CAST(bitIdx AS INT)) ELSE CAST(0 AS BIGINT) END)")
          .as("fp_hi"),
        expr("bit_or(CASE WHEN bitIdx >= 32 THEN shiftleft(CAST(1 AS " +
          "BIGINT), CAST(bitIdx - 32 AS INT)) ELSE CAST(0 AS BIGINT) END)")
          .as("fp_lo"),
        count(lit(1)).as("n_frames"))
  }

  /** Near-duplicate audio pairing over [[audioFingerprint]] signatures:
    * 4x16-bit banded candidate join + exact Hamming refilter (recall
    * exact for maxHamming <= 3). Same scale shape as the image twin:
    * no all-pairs comparison, signatures only. */
  def audioNearDup(fingerprints: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedHamming64(fingerprints, "fp_hi", "fp_lo", maxHamming)
}
