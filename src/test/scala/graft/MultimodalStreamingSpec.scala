package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaMeta, MediaRecord, Multimodal}
import graft.streaming.EventStream

class MultimodalStreamingSpec extends GraftSuite {
  private val dir = SparkTestBase.sf001

  test("media table schema: binary payload + typed metadata struct") {
    val m = Multimodal.fromDocuments(Tables.load(spark, dir, "documents"))
    val f = m.schema.map(x => x.name -> x.dataType.typeName).toMap
    assert(f("payload") == "binary" && f("meta") == "struct")
    assert(m.count() == 500)
  }

  test("dropDuplicatesWithinWatermark dedups within the delay, bounded state") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.dedupWithinWatermark(EventStream.eventsStream(spark, dir)),
      "spec_stream_dedup_wm",
      org.apache.spark.sql.streaming.OutputMode.Append())
    // event_id is unique in the fixture, so within-watermark dedup must
    // pass every row through exactly once.
    val n = Tables.load(spark, dir, "events").count()
    assert(streamed.count() == n)
    assert(streamed.select("event_id").distinct().count() == n)
  }

  test("foreachBatch sink: idempotent per-batch writes land every row once") {
    val out = java.nio.file.Files.createTempDirectory("graft_feb").toString
    val stream = spark.readStream.format("graftgen")
      .option("rows", 0).option("partitions", 2).option("seed", 5)
      .option("rowsPerBatch", 200).option("maxBatches", 4)
      .option("columns", "id").option("gen.id", "seq").load()
    EventStream.runForeachBatch(spark, stream, (df, id) =>
      // Idempotence pattern: key the write on batchId (a replayed batch
      // overwrites its own directory instead of appending duplicates).
      df.write.mode("overwrite").parquet(s"$out/batch_id=$id"))
    val ids = spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(ids.sameElements(0L until 800L),
      s"got ${ids.length} rows, range [${ids.headOption}, ${ids.lastOption}]")
  }

  test("binaryFile source ingests opaque media files with correct bytes") {
    // The cluster ingestion path for real media: files land in a
    // directory, spark.read.format("binaryFile") exposes (path, length,
    // content) — here 3 fixture payloads written out and read back.
    val tmp = java.nio.file.Files.createTempDirectory("graft_binfile")
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").orderBy("doc_id").limit(3).collect()
    docs.foreach { r =>
      java.nio.file.Files.write(tmp.resolve(s"doc_${r.getLong(0)}.bin"),
        r.getString(1).getBytes("UTF-8"))
    }
    val read = spark.read.format("binaryFile").load(tmp.toString)
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long")
          .as("doc_id"),
        col("length"), md5(col("content")).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(read.size == 3)
    docs.foreach { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      val (len, h) = read(r.getLong(0))
      assert(len == bytes.length)
      val want = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"${b & 0xff}%02x").mkString
      assert(h == want)
    }
  }

  private def typedMedia = {
    import spark.implicits._
    Multimodal.fromDocuments(Tables.load(spark, dir, "documents"))
      .select(col("media_id").as("mediaId"), col("kind"), col("payload"), col("meta"))
      .as[MediaRecord]
  }

  test("averageHash + perceptualNearDup: banding finds exactly the brute-force pairs") {
    import spark.implicits._
    import graft.operators.MediaMeta
    // 8x8 images where each pixel IS one aHash sample: full bit control.
    // Pattern = set of bright pixels (r=250, rest black).
    def img(bright: Set[Int]): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (i <- 0 until 64)
        bi.setRGB(i % 8, i / 8, if (bright(i)) 250 << 16 else 0)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", out)
      out.toByteArray
    }
    val base = (0 until 20).toSet // top 20 pixels bright
    val near = base - 3 + 45 // Hamming 2 from base
    val far = (40 until 64).toSet // very different pattern
    val media = Seq(
      MediaRecord(1L, "image", img(base), MediaMeta(8, 8, 0, 0, "image/png")),
      MediaRecord(2L, "image", img(near), MediaMeta(8, 8, 0, 0, "image/png")),
      MediaRecord(3L, "image", img(far), MediaMeta(8, 8, 0, 0, "image/png")),
      MediaRecord(4L, "image", img(base), MediaMeta(8, 8, 0, 0, "image/png"))
    ).toDS()
    val hashes = Multimodal.averageHash(media)
    val got = Multimodal.perceptualNearDup(hashes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force ground truth from the hashes themselves
    val hs = hashes.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) = {
      val (ah, al) = hs(a); val (bh, bl) = hs(b)
      java.lang.Long.bitCount(ah ^ bh) + java.lang.Long.bitCount(al ^ bl)
    }
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b && ham(a, b) <= 3
    } yield (a, b) -> ham(a, b).toLong).toMap
    assert(got == want, s"got $got want $want")
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 2L) // the planted near pair
    assert(got.contains((1L, 4L)) && got((1L, 4L)) == 0L) // exact dup
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L))) // far stays out
  }

  test("decodeFeatures decodes real PNG pixels: closed-form gradient sums") {
    val nChars = Tables.load(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = Multimodal.decodeFeatures(typedMedia).collect()
    assert(feats.length == 500)
    // Independent re-derivation of the gradient sums from (doc_id,
    // n_chars) — equality proves the PNG encode/decode round-trip touched
    // every pixel faithfully.
    feats.foreach { f =>
      val nc = nChars(f.mediaId)
      val (w, h) = ((nc % 33 + 16).toInt, (nc % 24 + 8).toInt)
      val d = f.mediaId % 150
      assert(f.width == w && f.height == h)
      assert(f.sumR == h.toLong * (w.toLong * d + w.toLong * (w - 1) / 2))
      assert(f.sumG == w.toLong * 3 * (h.toLong * (h - 1) / 2))
      assert(f.sumB == 100L * w * h + h.toLong * (w.toLong * (w - 1) / 2) +
        w.toLong * (h.toLong * (h - 1) / 2))
      assert(f.grayMean > 0.0 && f.grayMean < 255.0)
    }
  }

  test("JPEG decode: exact dimensions, channel means within 3 gray levels") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val m = Multimodal.fromDocumentsJpeg(docs).select(
        col("media_id").as("mediaId"), col("kind"), col("payload"),
        col("meta")).as[MediaRecord]
    val nChars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = Multimodal.decodeFeatures(m).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      val nc = nChars(f.mediaId)
      val (w, h) = ((nc % 33 + 16).toInt, (nc % 24 + 8).toInt)
      val d = f.mediaId % 150
      // Lossy codec, lossless geometry.
      assert(f.width == w && f.height == h)
      // Channel MEANS survive a q=0.9 encode of a smooth gradient well
      // within 3 gray levels — a decode bug (swapped channels, wrong
      // image, garbage pixels) lands far outside.
      val px = w.toLong * h
      val er = h.toLong * (w.toLong * d + w.toLong * (w - 1) / 2)
      val eg = w.toLong * 3 * (h.toLong * (h - 1) / 2)
      val eb = 100L * w * h + h.toLong * (w.toLong * (w - 1) / 2) +
        w.toLong * (h.toLong * (h - 1) / 2)
      assert(math.abs(f.sumR - er) <= 3L * px, s"media ${f.mediaId} R drift")
      assert(math.abs(f.sumG - eg) <= 3L * px, s"media ${f.mediaId} G drift")
      assert(math.abs(f.sumB - eb) <= 3L * px, s"media ${f.mediaId} B drift")
    }
  }

  test("GIF multi-frame decode: true frame count and bit-exact solid colors") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val m = Multimodal.fromDocumentsGif(docs).select(
        col("media_id").as("mediaId"), col("kind"), col("payload"),
        col("meta")).as[MediaRecord]
    val frames = Multimodal.decodeFrames(m).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val nChars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Row count comes from the CONTAINER, not metadata arithmetic.
    assert(frames.size == nChars.values.map(nc => nc % 4 + 2).sum)
    nChars.foreach { case (did, nc) =>
      val d = did % 150
      (0 until (nc % 4 + 2).toInt).foreach { f =>
        val (w, h, r, g, b) = frames((did, f.toLong))
        assert(w == 16 && h == 12)
        assert(r == d + f && g == 3L * f && b == 100L + f,
          s"doc $did frame $f: got ($r,$g,$b)")
      }
    }
  }

  test("WAV decode: real RIFF container, exact integer sample statistics") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val m = Multimodal.fromDocumentsWav(docs).select(
        col("media_id").as("mediaId"), col("kind"), col("payload"),
        col("meta")).as[MediaRecord]
    // Payloads are genuine WAV: RIFF....WAVE magic at the right offsets.
    val heads = m.select(col("payload")).limit(5).collect()
      .map(_.getAs[Array[Byte]](0))
    heads.foreach { b =>
      assert(new String(b, 0, 4, "US-ASCII") == "RIFF" &&
        new String(b, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
    }
    val nChars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = Multimodal.decodeAudioFeatures(m).collect()
    assert(feats.length == 500)
    feats.foreach { r =>
      val (did, n, sr, absSum, peak) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val d = (did % 150).toInt
      // Independent re-derivation of the fixture waveform: sawtooth of
      // period 64 + d%32, amplitude x256, n_chars%800 + 800 samples.
      val en = (nChars(did) % 800 + 800).toInt
      assert(n == en && sr == 16000L)
      val period = 64 + d % 32
      val samples = (0 until en).map(i => (i % period - period / 2) * 256)
      assert(absSum == samples.map(s => math.abs(s).toLong).sum,
        s"doc $did abs_sum")
      assert(peak == samples.map(s => math.abs(s).toLong).max, s"doc $did peak")
    }
  }

  test("audioFrameEnergy: frame cuts, exact sq sums, trailing partial frame") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").where(col("doc_id") < 50)
    val m = Multimodal.fromDocumentsWav(docs).select(
        col("media_id").as("mediaId"), col("kind"), col("payload"),
        col("meta")).as[MediaRecord]
    val nChars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frames = Multimodal.audioFrameEnergy(m, 160, 16384L).collect()
      .groupBy(_.getLong(0))
    assert(frames.keySet == nChars.keySet)
    frames.foreach { case (did, rows) =>
      val n = (nChars(did) % 800 + 800).toInt
      val period = 64 + (did % 150).toInt % 32
      val samples = (0 until n).map(i => (i % period - period / 2) * 256)
      assert(rows.length == (n + 159) / 160, s"doc $did frame count")
      rows.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, f) =>
        val chunk = samples.slice(f * 160, math.min((f + 1) * 160, n))
        val sq = chunk.map(s => s.toLong * s).sum
        assert(r.getLong(2) == chunk.length && r.getLong(3) == sq,
          s"doc $did frame $f")
        assert(r.getBoolean(4) == (sq > chunk.length * 16384L))
      }
    }
  }

  test("audio decode rejects big-endian / non-PCM-signed payloads loudly") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    import javax.sound.sampled.AudioFileFormat
    // A genuine AIFF container: 16-bit mono but BIG-endian — decoding its
    // bytes little-endian would produce garbage energies silently.
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 16000f, 16,
      1, 2, 16000f, true)
    val pcm = Array.tabulate(400)(i => ((i % 50 - 25) * 256).toShort)
    val raw = new Array[Byte](pcm.length * 2)
    pcm.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s >> 8).toByte // big-endian
      raw(2 * i + 1) = (s & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, pcm.length.toLong),
      AudioFileFormat.Type.AIFF, out)
    val media = Seq(MediaRecord(1L, "audio", out.toByteArray,
      MediaMeta(0, 0, 16000, 25L, "aiff"))).toDS()
    val ex = intercept[Exception] {
      Multimodal.audioFrameEnergy(media).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("little-endian signed PCM16 mono")),
      s"expected format require to fire, got: $ex")
  }

  test("resizeDecoded resamples real pixels: nearest-neighbor red sums") {
    val nChars = Tables.load(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rs = Multimodal.resizeDecoded(typedMedia, 16).collect()
    assert(rs.length == 500)
    rs.foreach { r =>
      val nc = nChars(r.mediaId)
      val (w, h) = ((nc % 33 + 16).toInt, (nc % 24 + 8).toInt)
      val d = r.mediaId % 150
      val s = math.min(1.0, 16.0 / math.max(w, h))
      val (nw, nh) = (math.floor(w * s).toInt, math.floor(h * s).toInt)
      assert(r.newWidth == nw && r.newHeight == nh)
      assert(r.newWidth <= 16 && r.newHeight <= 16 && r.newHeight >= 1)
      val rowSum = (0 until nw).map(nx => d + nx * w / nw).sum
      assert(r.sumR == nh.toLong * rowSum)
    }
  }

  test("frame sampling: count = durationMs/500 + 1 per media row") {
    val m = Multimodal.fromDocuments(Tables.load(spark, dir, "documents"))
    val fs = Multimodal.frameSamplePlan(m, 500L)
    val bad = fs.groupBy("media_id").agg(count(lit(1)).as("n"), max("ts_ms").as("mx"))
      .join(m.select(col("media_id"), col("meta.durationMs").as("d")), "media_id")
      .where(col("n") =!= (col("d") / 500 + 1).cast("long"))
    assert(bad.count() == 0)
  }

  test("resize plan fits maxDim and preserves aspect within rounding") {
    val m = Multimodal.fromDocuments(Tables.load(spark, dir, "documents"))
    val r = Multimodal.resizePlan(m, 128)
    assert(r.where(col("new_width") > 128 || col("new_height") > 128).count() == 0)
    assert(r.where(col("new_width") <= 0 || col("new_height") <= 0).count() == 0)
  }

  test("streaming hourly counts == batch hourly counts") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.hourlyCounts(EventStream.eventsStream(spark, dir)),
      "spec_stream_hourly")
    val batch = EventStream.hourlyCounts(Tables.load(spark, dir, "events"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming session windows == batch session windows") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.sessionWindows(
        EventStream.eventsStream(spark, dir).withWatermark("ts", "1 hour")),
      "spec_stream_sessions")
    val batch = EventStream.sessionWindows(Tables.load(spark, dir, "events"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("mapGroupsWithState running totals match groupBy counts") {
    val ev = Tables.load(spark, dir, "events")
    val st = EventStream.runningTypeTotals(ev)
      .select(col("eventType"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st == expected)
  }
}
