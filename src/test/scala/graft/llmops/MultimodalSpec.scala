package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal plumbing is real even though the codec is a stub:
  * schema, batch shape, determinism, and frame explosion are asserted.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = MultimodalOps.syntheticMedia(spark, 30).cache()

  test("synthetic media table matches the declared schema") {
    assert(media.schema == MultimodalOps.mediaSchema)
    assert(media.count() == 30)
    assert(media.select("kind").distinct().as[String].collect().toSet ==
      Set("image", "audio", "video"))
  }

  test("feature extraction appends fixed-dim vectors, deterministically") {
    val f1 = MultimodalOps.extractFeatures(media, dim = 8)
    assert(f1.schema.fieldNames.last == "features")
    val dims = f1.select(size(col("features"))).distinct().as[Int].collect()
    assert(dims.toSeq == Seq(8))
    // same payload → same features across runs (stub is deterministic)
    val a = f1.orderBy("media_id").select("features").as[Seq[Float]].collect()
    val b = MultimodalOps.extractFeatures(media, dim = 8)
      .orderBy("media_id").select("features").as[Seq[Float]].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("batch size does not change results (only amortization)") {
    val big = MultimodalOps.extractFeatures(media, 8, batchSize = 64)
      .orderBy("media_id").select("features").as[Seq[Float]].collect()
    val tiny = MultimodalOps.extractFeatures(media, 8, batchSize = 1)
      .orderBy("media_id").select("features").as[Seq[Float]].collect()
    assert(big.toSeq == tiny.toSeq)
  }

  test("resize updates image meta + payload, leaves audio/video untouched") {
    val out = MultimodalOps.resizeImages(media, 32, 32)
    val img = out.filter(col("kind") === "image")
    assert(img.select("meta.width").distinct().as[Int].collect().toSeq == Seq(32))
    val aud = out.filter(col("kind") === "audio").select("meta.sample_rate")
    assert(aud.distinct().as[Int].collect().toSeq == Seq(16000))
  }

  test("ImageCodec: PNG round-trip recovers exact pixel statistics") {
    // 3x2 image with hand-picked channel values
    val px = Map(
      (0, 0) -> (10, 20, 30), (1, 0) -> (40, 50, 60), (2, 0) -> (70, 80, 90),
      (0, 1) -> (255, 0, 128), (1, 1) -> (0, 255, 1), (2, 1) -> (5, 6, 7))
    val bytes = MultimodalOps.ImageCodec.encodePng(3, 2) { (x, y) =>
      val (r, g, b) = px((x, y)); (r << 16) | (g << 8) | b
    }
    // a real PNG came out (magic header), not a stub payload
    assert(bytes.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
    val s = MultimodalOps.ImageCodec.decodeStats(bytes)
    assert(s.width == 3 && s.height == 2)
    assert(s.rMean == px.values.map(_._1).sum / 6.0)
    assert(s.gMean == px.values.map(_._2).sum / 6.0)
    assert(s.bMean == px.values.map(_._3).sum / 6.0)
  }

  test("decodeImageStats decodes real PNG payloads distributed, matching the formula") {
    val imgs = MultimodalOps.syntheticImages(spark, 12)
    val got = MultimodalOps.decodeImageStats(imgs, batchSize = 5)
      .orderBy("media_id")
      .select("media_id", "width", "height", "r_mean").collect()
    assert(got.length == 12)
    got.foreach { r =>
      val i = r.getLong(0).toInt
      val (w, h) = (16 + (i % 5) * 8, 12 + (i % 3) * 10)
      assert(r.getInt(1) == w && r.getInt(2) == h, s"id=$i")
      val rSum = (for (x <- 0 until w; y <- 0 until h)
        yield (x * 7 + y * 13 + i * 31) % 256).map(_.toLong).sum
      assert(r.getDouble(3) == rSum.toDouble / (w.toLong * h), s"id=$i")
    }
  }

  test("real PNG payloads resize through the real codec, dims + means preserved") {
    // constant-color image: area-averaging must preserve the exact means
    val imgs = MultimodalOps.syntheticImages(spark, 1)
    val constPng = MultimodalOps.ImageCodec.encodePng(40, 30)((_, _) => (100 << 16) | (150 << 8) | 200)
    val row = imgs.collect().head
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, "image", constPng, row.getStruct(3)))),
      MultimodalOps.mediaSchema)
    val out = MultimodalOps.resizeImages(df, 16, 12).collect().head
    val stats = MultimodalOps.ImageCodec.decodeStats(out.getAs[Array[Byte]](2))
    assert(stats.width == 16 && stats.height == 12)
    assert(stats.rMean == 100.0 && stats.gMean == 150.0 && stats.bMean == 200.0)
    assert(out.getStruct(3).getInt(1) == 16 && out.getStruct(3).getInt(2) == 12)
    // opaque payloads still take the stub (no decode attempt)
    val stubbed = MultimodalOps.resizeImages(media, 32, 32)
    assert(stubbed.filter(col("kind") === "image").count() > 0)
  }

  test("decodeImageStats rejects undecodable payloads loudly") {
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.decodeImageStats(media.filter(col("kind") === "image")).collect()
    }
  }

  test("AudioCodec: WAV round-trip recovers exact waveform statistics") {
    val rate = 16000
    val samples = Array.tabulate[Short](3000)(j => ((j * 17) % 20001 - 10000).toShort)
    val wav = MultimodalOps.AudioCodec.encodeWav(rate, samples)
    // genuine RIFF/WAVE container
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val s = MultimodalOps.AudioCodec.decodeStats(wav)
    assert(s.sampleRate == rate && s.channels == 1 && s.frames == 3000L)
    assert(s.durationMs == 3000L * 1000L / rate)
    val sumSq = samples.map(v => v.toLong * v).sum
    assert(s.rms == math.sqrt(sumSq.toDouble / 3000))
    assert(s.peak == samples.map(v => math.abs(v.toInt)).max)
  }

  test("decodeAudioStats decodes real WAV payloads distributed, matching the formula") {
    val stats = MultimodalOps.decodeAudioStats(MultimodalOps.syntheticAudio(spark, 9))
      .select("media_id", "sample_rate", "frames", "duration_ms", "rms", "peak")
      .orderBy("media_id").collect()
    assert(stats.length == 9)
    stats.zipWithIndex.foreach { case (r, i) =>
      val rate = 8000 + (i % 3) * 4000
      val frames = 2000 + (i % 5) * 500
      assert(r.getInt(1) == rate && r.getLong(2) == frames)
      val sumSq = (0 until frames).map { j =>
        val s = ((j.toLong * (i + 3) * 2731L) % 20001L) - 10000L; s * s
      }.sum
      assert(r.getDouble(4) == math.sqrt(sumSq.toDouble / frames), s"rms mismatch at $i")
    }
  }

  test("decodeAudioStats rejects undecodable payloads loudly") {
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.decodeAudioStats(media.filter(col("kind") === "audio")).collect()
    }
  }

  test("VideoContainer: MP4 and AVI header round-trips recover exact fields") {
    import MultimodalOps.VideoContainer
    val mp4 = VideoContainer.parse(
      VideoContainer.encodeMp4Header(timescale = 600, duration = 4500L,
        tracks = 2, width = 1920, height = 1080))
    assert(mp4 == MultimodalOps.VideoInfo("mp4", 7500L, 2, 1920, 1080))
    val avi = VideoContainer.parse(
      VideoContainer.encodeAviHeader(usPerFrame = 40000, totalFrames = 250,
        streams = 3, width = 640, height = 480))
    assert(avi == MultimodalOps.VideoInfo("avi", 10000L, 3, 640, 480))
    // neither magic: loud failure, not a garbage parse
    intercept[IllegalArgumentException](
      VideoContainer.parse(Array.tabulate[Byte](32)(_.toByte)))
  }

  test("decodeVideoStats walks real container bytes distributed, matching the formula") {
    val stats = MultimodalOps.decodeVideoStats(MultimodalOps.syntheticVideo(spark, 12))
      .select("media_id", "container", "duration_ms", "tracks", "width", "height")
      .orderBy("media_id").collect()
    assert(stats.length == 12)
    stats.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(1) == (if (i % 2 == 0) "mp4" else "avi"))
      val expectMs = if (i % 2 == 0) 2000L + i * 500L else (100L + i * 25L) * 40L
      assert(r.getLong(2) == expectMs, s"duration mismatch at $i")
      assert(r.getInt(3) == 1 + i % 3)
      assert(r.getInt(4) == 320 + (i % 4) * 160)
      assert(r.getInt(5) == 240 + (i % 3) * 120)
    }
    // plan pin: the container walk is per-partition work — no shuffle
    val plan = MultimodalOps.decodeVideoStats(MultimodalOps.syntheticVideo(spark, 6))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("AVI frame encode/decode round-trip recovers exact pixel means") {
    import MultimodalOps.VideoContainer
    // non-multiple-of-4 width exercises the DIB row padding math
    val bytes = VideoContainer.encodeAvi(40000, width = 10, height = 6, frames = 3) {
      (x, y, f) => (((x * 2 + f) % 256) << 16) | (((y * 3) % 256) << 8) | ((x + y + f) % 256)
    }
    // the header walk still reads the full file (frames don't break it)
    assert(VideoContainer.parse(bytes) ==
      MultimodalOps.VideoInfo("avi", 120L, 1, 10, 6))
    val frames = VideoContainer.decodeAviFrames(bytes)
    assert(frames.map(_.frameIdx) == Seq(0, 1, 2))
    frames.foreach { fr =>
      val n = 10 * 6
      val rSum = (for (x <- 0 until 10; y <- 0 until 6) yield (x * 2 + fr.frameIdx) % 256).sum
      val gSum = (for (x <- 0 until 10; y <- 0 until 6) yield (y * 3) % 256).sum
      val bSum = (for (x <- 0 until 10; y <- 0 until 6) yield (x + y + fr.frameIdx) % 256).sum
      assert(fr.width == 10 && fr.height == 6)
      assert(fr.rMean == rSum.toDouble / n)
      assert(fr.gMean == gSum.toDouble / n)
      assert(fr.bMean == bSum.toDouble / n)
    }
    // header-only payload (no movi): loud, specific failure
    val headerOnly = VideoContainer.encodeAviHeader(40000, 10, 1, 64, 48)
    val e1 = intercept[IllegalArgumentException](
      VideoContainer.decodeAviFrames(headerOnly))
    assert(e1.getMessage.contains("movi"))
  }

  test("MJPEG AVI: real JPEG frames decode deterministically, close to source colors") {
    import MultimodalOps.VideoContainer
    // flat per-frame colors: JPEG keeps flat fields nearly exact, so
    // closeness is a strong check without a lossless claim
    def color(f: Int) = (60 + 40 * f, 90 + 10 * f, 30 + 25 * f)
    val bytes = VideoContainer.encodeAviMjpeg(40000, width = 48, height = 32, frames = 3) {
      (_, _, f) => val (r, g, b) = color(f); (r << 16) | (g << 8) | b
    }
    // container walk still parses the MJPEG file's header
    assert(MultimodalOps.VideoContainer.parse(bytes) ==
      MultimodalOps.VideoInfo("avi", 120L, 1, 48, 32))
    val frames = VideoContainer.decodeAviFrames(bytes)
    assert(frames.map(_.frameIdx) == Seq(0, 1, 2))
    frames.foreach { fr =>
      val (r, g, b) = color(fr.frameIdx)
      assert(fr.width == 48 && fr.height == 32)
      assert(math.abs(fr.rMean - r) < 3.0, s"r ${fr.rMean} vs $r")
      assert(math.abs(fr.gMean - g) < 3.0, s"g ${fr.gMean} vs $g")
      assert(math.abs(fr.bMean - b) < 3.0, s"b ${fr.bMean} vs $b")
    }
    // bit-identical across decode runs (same JRE decoder)
    assert(VideoContainer.decodeAviFrames(bytes) == frames)
    // a non-MJPG compressed stream still fails loudly toward the stub
    val fake = bytes.clone()
    // corrupt biCompression ('MJPG' -> 'XVID') wherever strf holds it:
    // rebuild instead — encode with a DIB file then inject 00dc is
    // overkill; simpler: flip the fourcc bytes in place
    val idx = fake.indexOfSlice("MJPG".getBytes("US-ASCII"),
      fake.indexOfSlice("strf".getBytes("US-ASCII")))
    fake(idx) = 'X'; fake(idx + 1) = 'V'; fake(idx + 2) = 'I'; fake(idx + 3) = 'D'
    val e = intercept[IllegalArgumentException](VideoContainer.decodeAviFrames(fake))
    assert(e.getMessage.contains("StubCodec"))
  }

  test("decodeVideoFrames handles MJPEG assets distributed") {
    val out = MultimodalOps.decodeVideoFrames(MultimodalOps.syntheticMjpegVideos(spark, 6))
      .orderBy("media_id", "frame_idx").collect()
    assert(out.length == (0 until 6).map(i => 2 + i % 3).sum)
    // extents recovered from the REAL decoded images, not the header
    out.foreach { r =>
      val i = r.getLong(0).toInt
      assert(r.getInt(2) == 32 + (i % 3) * 16 && r.getInt(3) == 16 + (i % 2) * 16)
    }
  }

  test("decodeVideoFrames decodes real DIB frames distributed, matching the formula") {
    val out = MultimodalOps.decodeVideoFrames(MultimodalOps.syntheticVideoFrames(spark, 12))
      .orderBy("media_id", "frame_idx").collect()
    assert(out.length == (0 until 12).map(i => 2 + i % 3).sum)
    out.foreach { r =>
      val i = r.getLong(0).toInt; val f = r.getInt(1)
      val w = 16 + (i % 3) * 8; val h = 8 + (i % 2) * 4
      assert(r.getInt(2) == w && r.getInt(3) == h)
      val rSum = (for (x <- 0 until w; y <- 0 until h)
        yield (x * 7 + y * 13 + f * 11 + i * 31) % 256).sum
      assert(r.getDouble(4) == rSum.toDouble / (w * h), s"r_mean mismatch id=$i f=$f")
    }
    // plan pin: frame decode + explosion is per-partition — no shuffle
    val plan = MultimodalOps.decodeVideoFrames(MultimodalOps.syntheticVideoFrames(spark, 3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("frame sampling explodes one row per interval within duration") {
    val frames = MultimodalOps.sampleFrames(media, everyMs = 250)
    val perAsset = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .join(media.filter(col("kind") === "video").select(col("media_id"), col("meta.duration_ms")), "media_id")
    val bad = perAsset.filter(col("n") =!= ceil(col("duration_ms") / 250.0)).count()
    assert(bad == 0)
    assert(frames.select(length(col("frame_bytes"))).distinct().as[Int].collect().toSeq == Seq(16))
  }

  test("aHash64: brightness-invariant, locally recomputable, rejects off-grid dims") {
    // local reference recomputation from the same pixel formula
    def refHash(base: Int, lift: Int): Long = {
      val sums = new Array[Long](64); var total = 0L
      for (y <- 0 until 24; x <- 0 until 32) {
        val l = 299L * ((x * 7 + y * 13 + base * 31) % 200 + lift) +
          587L * ((x * 3 + y * 5 + base * 17) % 200 + lift) +
          114L * ((x * 11 + y * 2 + base * 23) % 200 + lift)
        sums((y / 3) * 8 + (x / 4)) += l; total += l
      }
      (0 until 64).foldLeft(0L)((h, j) =>
        if (64L * sums(j) > total) h | (1L << j) else h)
    }
    def png(base: Int, lift: Int) = MultimodalOps.ImageCodec.encodePng(32, 24) { (x, y) =>
      (((x * 7 + y * 13 + base * 31) % 200 + lift) << 16) |
        (((x * 3 + y * 5 + base * 17) % 200 + lift) << 8) |
        ((x * 11 + y * 2 + base * 23) % 200 + lift)
    }
    val h0 = MultimodalOps.ImageCodec.aHash64(png(5, 0))
    assert(h0 == refHash(5, 0))
    // constant brightness lift cancels in the block-vs-global compare
    assert(MultimodalOps.ImageCodec.aHash64(png(5, 7)) == h0)
    // a different base pattern hashes differently
    assert(MultimodalOps.ImageCodec.aHash64(png(6, 0)) != h0)
    val off = MultimodalOps.ImageCodec.encodePng(30, 24)((_, _) => 0x808080)
    intercept[IllegalArgumentException] {
      MultimodalOps.ImageCodec.aHash64(off)
    }
  }

  test("aHashPairs: pigeonhole chunk join equals brute-force Hamming") {
    val imgs = MultimodalOps.syntheticImageDups(spark, 24)
    val hashes = MultimodalOps.imageAHash(imgs)
      .select(col("media_id").as("id"), col("phash"))
    val hs = hashes.as[(Long, Long)].collect().toMap
    // planted duplicates: i and i+12 hash identically
    for (i <- 0L until 12L) assert(hs(i) == hs(i + 12))
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      hd = java.lang.Long.bitCount(hs(a) ^ hs(b)) if hd <= 3
    } yield (a, b, hd)).toSet
    val got = MultimodalOps.aHashPairs(hashes, 3)
      .as[(Long, Long, Int)].collect().map { case (a, b, h) => (a, b, h) }.toSet
    assert(got == brute && got.size >= 12)
  }
}
