package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.functions._

import graft.operators.{MediaMeta, MediaRecord, Multimodal}

/**
 * Audio spectral fingerprint + near-dup over CONSTRUCTED clips, where the
 * ground truth is known by design:
 *  - a volume-rescaled copy must fingerprint identically (argmax
 *    amplitude invariance),
 *  - a copy with one edited quarter must land within the banded-Hamming
 *    near-dup radius,
 *  - a different-pitch clip must NOT pair (the positional bitmap puts
 *    ~8 bits between unrelated single-pitch clips).
 */
class AudioFingerprintSpec extends GraftSuite {
  import spark.implicits._

  /** Real RIFF/WAVE bytes (PCM16 mono 16 kHz) for sample function `f`. */
  private def wav(id: Long, n: Int, f: Int => Int): MediaRecord = {
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = f(i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val out = new ByteArrayOutputStream()
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    MediaRecord(id, "audio", out.toByteArray,
      MediaMeta(0, 0, 16000, n * 1000L / 16000, "audio/wav"))
  }

  private def saw(period: Int)(i: Int): Int =
    (i % period - period / 2) * 256

  private val n = 1280 // 5 full 256-sample frames
  private lazy val clips = spark.createDataset(Seq(
    wav(1L, n, saw(70)),                       // A: pitch-70 sawtooth
    wav(2L, n, i => saw(70)(i) / 2),           // B: same clip, half volume
    wav(3L, n, i => if (i < 1024) saw(70)(i) else saw(80)(i)), // C: last
                                               // quarter re-pitched
    wav(4L, n, saw(85))))                      // D: unrelated pitch

  test("spectral profile finds the true period in every frame") {
    val prof = Multimodal.audioSpectralProfile(clips)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(prof.size == 20) // 4 clips x 5 full frames
    for (f <- 0L until 5L) {
      assert(prof((1L, f)) == 70L, s"clip A frame $f: ${prof((1L, f))}")
      assert(prof((2L, f)) == 70L, s"clip B frame $f: ${prof((2L, f))}")
      assert(prof((4L, f)) == 85L, s"clip D frame $f: ${prof((4L, f))}")
    }
    assert(prof((3L, 4L)) == 80L, "clip C's edited frame must re-pitch")
    for (f <- 0L until 4L) assert(prof((3L, f)) == 70L)
  }

  test("volume-rescaled copy fingerprints identically; edit = near-dup; other pitch = not") {
    val fp = Multimodal.audioFingerprint(clips)
    val rows = fp.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == rows(2L), "amplitude must not change the fingerprint")
    assert(rows(1L) != rows(4L), "different pitch must differ")
    val pairs = Multimodal.audioNearDup(fp, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L, "exact rescale pairs at Hamming 0")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3L,
      "one edited quarter stays within the near-dup radius")
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      s"unrelated pitch must not pair: $pairs")
  }

  test("streamed fingerprint fold == batch fingerprints; near-dup over accumulated state") {
    import org.apache.spark.sql.functions._
    val all = clips.toDF()
      .select(col("mediaId").as("media_id"), col("kind"), col("payload"),
        col("meta"))
    val history = all.where(col("media_id") === 1L)
    val days = Seq(all.where(col("media_id").isin(2L, 3L)),
      all.where(col("media_id") === 4L))
    val root = java.nio.file.Files.createTempDirectory("graft_saudiospec")
    val logDir = root.resolve("days")
    java.nio.file.Files.createDirectories(logDir)
    days.zipWithIndex.foreach { case (slice, i) =>
      val stage = root.resolve(s"stage$i").toString
      slice.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = logDir.resolve(f"day$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val folded = graft.streaming.MediaIndexStream
      .incrementalAudioFingerprints(spark, history, logDir.toString,
        days.head.schema, root.resolve("state").toString)
    val streamed = folded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = Multimodal.audioFingerprint(clips).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == batch)
    // Pairing against the accumulated state finds the same near-dups the
    // batch pass does — without ever re-decoding history.
    val pairs = Multimodal.audioNearDup(folded, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      !pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("media signatures under deletes (takedown): a deleted clip's " +
    "signature is unservable and stops pairing; compaction hard-deletes") {
    import org.apache.spark.sql.functions._
    val all = clips.toDF()
      .select(col("mediaId").as("media_id"), col("kind"), col("payload"),
        col("meta"))
    val history = all.where(col("media_id") === 1L)
    // b1: insert clips 2 (rescaled copy of 1) and 3 (edited near-dup).
    // b2: TAKEDOWN of clip 2; insert clip 4 (unrelated pitch).
    val b1 = all.where(col("media_id").isin(2L, 3L))
      .withColumn("op", lit("I"))
    val b2 = all.where(col("media_id") === 4L).withColumn("op", lit("I"))
      .unionByName(all.where(col("media_id") === 2L)
        .withColumn("payload", lit(null).cast("binary"))
        .withColumn("op", lit("D")))
    val root = java.nio.file.Files.createTempDirectory("graft_deldmedia")
    val logDir = root.resolve("days")
    java.nio.file.Files.createDirectories(logDir)
    Seq(b1, b2).zipWithIndex.foreach { case (slice, i) =>
      val stage = root.resolve(s"stage$i").toString
      slice.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = logDir.resolve(f"day$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val state = root.resolve("state").toString
    val served = graft.streaming.MediaIndexStream
      .incrementalAudioFingerprintsWithDeletes(spark, history,
        logDir.toString, b1.schema, state, "op", compactEvery = 2)
    val servedIds = served.select("media_id").as[Long].collect().toSet
    assert(servedIds == Set(1L, 3L, 4L), s"served: $servedIds")
    // Served signatures equal a fresh fingerprint pass over survivors.
    val fresh = Multimodal.audioFingerprint(
      clips.filter(_.mediaId != 2L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = served.select("media_id", "fp_hi", "fp_lo", "n_frames")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == fresh)
    // The deleted clip can no longer pair: (1,2) gone, (1,3) remains.
    val pairs = Multimodal.audioNearDup(served, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)) &&
      !pairs.exists { case (a, b) => a == 2L || b == 2L }, s"pairs: $pairs")
    // compactEvery=2 fired at batch 2: baked base excludes clip 2.
    val baked = spark.read.parquet(s"$state/fp_base2")
      .select("media_id").as[Long].collect().toSet
    assert(!baked.contains(2L),
      "tombstoned signature still physically present after compaction")
    assert(spark.read.parquet(s"$state/fptmb_base2").count() == 0)
  }
}
