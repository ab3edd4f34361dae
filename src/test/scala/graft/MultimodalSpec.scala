package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing: schema, decode batch shape, determinism") {
    val media = Multimodal.asMediaTable(
      Seq((1L, "abc"), (2L, "defgh"), (3L, "")).toDF("id", "txt")
        .withColumn("payload", col("txt").cast("binary")),
      "id", "payload", kind = "image", mime = "image/png")
    assert(media.columns.toSeq ==
      Seq("media_id", "kind", "payload", "mime", "width", "height", "duration_ms"))

    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(feats(1L).getAs[Int]("n_bytes") == 3)
    assert(feats(3L).getAs[Int]("n_bytes") == 0)
    assert(feats(1L).getAs[scala.collection.Seq[Float]]("features").length == 8)
    // deterministic: same payload → same checksum
    val again = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("checksum")).toMap
    assert(again(1L) == feats(1L).getAs[Long]("checksum"))
  }

  test("real javax.imageio decode: synthetic PNGs yield true dimensions and pixel stats") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val red = png(4, 2, 0xFF0000)     // solid red 4x2
    val blue = png(3, 5, 0x0000FF)    // solid blue 3x5
    val rows = Seq(
      (1L, "image", red), (2L, "image", blue),
      (3L, "image", "not an image".getBytes("UTF-8")), // corrupt: fallback
      (4L, "audio", red))                              // wrong kind: fallback
      .toDF("id", "kind", "payload")
    val media = rows.select(col("id").as("media_id"), col("kind"),
      col("payload"), lit("x").as("mime"), lit(0).as("width"),
      lit(0).as("height"), lit(0L).as("duration_ms"))
    val out = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap

    assert(out(1L).getAs[Boolean]("decoded"))
    assert(out(1L).getAs[Int]("decoded_width") == 4 &&
      out(1L).getAs[Int]("decoded_height") == 2)
    val f1 = out(1L).getAs[scala.collection.Seq[Float]]("features")
    assert(f1(0) == 1.0f && f1(1) == -1.0f && f1(2) == -1.0f) // pure red channel means
    assert(f1.length == 8)

    assert(out(2L).getAs[Boolean]("decoded"))
    assert(out(2L).getAs[Int]("decoded_width") == 3 &&
      out(2L).getAs[Int]("decoded_height") == 5)
    val f2 = out(2L).getAs[scala.collection.Seq[Float]]("features")
    assert(f2(0) == -1.0f && f2(1) == -1.0f && f2(2) == 1.0f)

    // undecodable payloads and non-image kinds fall back, never fail
    assert(!out(3L).getAs[Boolean]("decoded") &&
      out(3L).getAs[Int]("decoded_width") == 0)
    assert(!out(4L).getAs[Boolean]("decoded"))
    // checksum is payload-derived regardless of decode path
    assert(out(4L).getAs[Long]("checksum") == out(1L).getAs[Long]("checksum"))
  }

  test("real javax.sound.sampled decode: synthetic WAVs yield exact PCM stats") {
    val seed = 7L
    val nf = 16
    val wav = Multimodal.synthWavPcm16(seed, nf, 8000)
    val samples = (0 until nf).map(i => (((seed * 31 + i * 7919L) % 65536L) - 32768L).toInt)
    val media = Seq((1L, "audio", wav),
        (2L, "audio", "not audio".getBytes("UTF-8")),   // corrupt: fallback
        (3L, "video", wav))                             // wrong kind: fallback
      .toDF("id", "kind", "payload")
      .select(col("id").as("media_id"), col("kind"), col("payload"),
        lit("audio/wav").as("mime"), lit(0).as("width"), lit(0).as("height"),
        lit(0L).as("duration_ms"))
    val out = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap

    assert(out(1L).getAs[Boolean]("decoded"))
    assert(out(1L).getAs[Int]("sample_rate") == 8000)
    assert(out(1L).getAs[Int]("channels") == 1)
    assert(out(1L).getAs[Long]("duration_ms") == nf * 1000L / 8000)
    val f = out(1L).getAs[scala.collection.Seq[Float]]("features")
    assert(f(0) == ((samples.map(_.toLong).sum.toDouble / nf) / 32768.0).toFloat)
    assert(f(2) == (samples.min / 32768.0).toFloat)
    assert(f(3) == (samples.max / 32768.0).toFloat)
    assert(f.length == 8)

    assert(!out(2L).getAs[Boolean]("decoded") && out(2L).getAs[Int]("sample_rate") == 0)
    assert(!out(3L).getAs[Boolean]("decoded"))
    // checksum is payload-derived regardless of decode path
    assert(out(3L).getAs[Long]("checksum") == out(1L).getAs[Long]("checksum"))
  }

  test("pluggable decoder: user codec rides the kernel, wins over built-ins, falls back cleanly") {
    // A synthetic "video codec": decodes any video-kind payload whose
    // first byte is 'V' into deterministic byte-derived features —
    // the stand-in for an ffmpeg frame grabber. Everything else → None.
    object FakeVideoDecoder extends Multimodal.MediaDecoder {
      override def decode(kind: String, payload: Array[Byte], dim: Int)
          : Option[Multimodal.Decoded] =
        if (kind == "video" && payload.nonEmpty && payload(0) == 'V')
          Some(Multimodal.Decoded(
            width = 640, height = 480, sampleRate = 0, channels = 0,
            durationMs = payload.length.toLong * 40,
            features = Array.tabulate(dim)(i =>
              payload(i % payload.length).toFloat / 127f)))
        else None
    }
    val wav = Multimodal.synthWavPcm16(seed = 7L, nFrames = 800, sampleRate = 8000)
    val rows = Seq(
      (1L, "video", "Vabc".getBytes("UTF-8")),   // plugged decoder handles
      (2L, "video", "Xabc".getBytes("UTF-8")),   // no decoder → hash fallback
      (3L, "audio", wav))                        // built-in still wins for audio
      .toDF("id", "kind", "payload")
    val media = rows.select(
      col("id").as("media_id"), col("kind"), col("payload"),
      lit("application/octet-stream").as("mime"),
      lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))
    val out = Multimodal.extractFeatures(spark, media,
      decoder = Some(FakeVideoDecoder)).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // plugged path: decoded=true with the codec's metadata
    assert(out(1L).getAs[Boolean]("decoded"))
    assert(out(1L).getAs[Int]("decoded_width") == 640 &&
      out(1L).getAs[Int]("decoded_height") == 480 &&
      out(1L).getAs[Long]("duration_ms") == 160L)
    // unhandled payload: clean fallback, never a failure
    assert(!out(2L).getAs[Boolean]("decoded"))
    // built-in audio decode unaffected by the plug
    assert(out(3L).getAs[Boolean]("decoded") &&
      out(3L).getAs[Int]("sample_rate") == 8000)
    // determinism: a second run yields identical feature vectors
    val again = Multimodal.extractFeatures(spark, media,
      decoder = Some(FakeVideoDecoder)).collect()
      .map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Float]]("features")).toMap
    assert(again(1L) == out(1L).getAs[scala.collection.Seq[Float]]("features"))
    // and the plugged features feed the same downstream near-dup
    // machinery: identical plugged payloads collapse in dedupExact
    val dupes = Multimodal.dedupExact(media.union(media
      .withColumn("media_id", col("media_id") + 10)))
    assert(dupes.count() == 3) // 3 distinct payloads across 6 rows
  }

  test("frame sampling explodes one row per sampled frame") {
    val vid = Seq((1L, "video", Array[Byte](1), "video/mp4", 0, 0, 1000L))
      .toDF("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")
    val frames = Multimodal.sampleFrames(vid, everyMs = 250)
    assert(frames.select("frame_ms").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 250L, 500L, 750L))
  }

  test("dHash: brightness-invariant, structure-sensitive, exact on the seeded fixture") {
    def hashOf(px: (Int, Int) => Int) =
      Multimodal.dHash(Multimodal.synthBmp24(18, 16)(px))
    val base = (x: Int, y: Int) => (x * 3 + y * 5) % 100
    val brighter = (x: Int, y: Int) => base(x, y) + 100   // +100, no wrap
    val flipped = (x: Int, y: Int) => base(17 - x, y)
    assert(hashOf(base).isDefined)
    // a uniform brightness shift preserves every adjacent-cell compare
    assert(hashOf(base) == hashOf(brighter))
    // mirroring reverses the gradients — bits must change
    assert(hashOf(base) != hashOf(flipped))
    // the real decode reproduces the gate's pure-arithmetic oracle
    val id = 7L
    def cell(cx: Int, cy: Int): Long =
      (for (dx <- 0 to 1; dy <- 0 to 1)
        yield (id * 31 + (2 * cx + dx) * 7L + (2 * cy + dy) * 131L) % 256L).sum
    var (lo, hi) = (0L, 0L)
    for (b <- 0 until 64) {
      if (cell(b % 8, b / 8) < cell(b % 8 + 1, b / 8)) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
    }
    assert(Multimodal.dHash(Multimodal.synthBmpSeeded(id, 18, 16)).contains((lo, hi)))
    // non-tiling dimensions and corrupt bytes refuse rather than interpolate
    assert(Multimodal.dHash(Multimodal.synthBmp24(17, 16)(base)).isEmpty)
    assert(Multimodal.dHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("videoNearDup: aligned-frame matching, threshold, and the hot-frame cap") {
    import spark.implicits._
    def bmp(seed: Long, shift: Int): Array[Byte] =
      Multimodal.synthBmp24(18, 16)((x, y) =>
        ((((seed % 9973L) * (x + 3) + (seed % 9949L) * (y + 7) + x * y * 31L) % 199L)
          + shift).toInt)
    // video 1: frames s1..s4; video 2: 3 of 4 frames = video 1's at
    // +20 brightness (match, 0.75 >= 0.6); video 3: 1 of 4 shared
    // (0.25 < 0.6 -> no pair); videos 4-7: all frames one CONSTANT
    // image (the degenerate common frame — title card / black frame)
    val flat = (0 until 4).map(k => (k, bmp(0L, 0)))
    val frames = (
      (0 until 4).map(k => (1L, k, bmp(100 + k, 0))) ++
      ((0 until 3).map(k => (2L, k, bmp(100 + k, 20))) :+ ((2L, 3, bmp(999L, 0)))) ++
      ((3L, 0, bmp(100, 0)) +: (1 until 4).map(k => (3L, k, bmp(500 + k, 0)))) ++
      (4L to 7L).flatMap(v => flat.map { case (k, b) => (v, k, b) })
    ).toDF("video_id", "frame_idx", "payload")
    val pairs = Multimodal.videoNearDup(frames, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 3L) // brightness-shifted twin
    assert(!pairs.contains((1L, 3L)))                         // below threshold
    assert(pairs.contains((4L, 5L)) && pairs((4L, 5L)) == 4L) // identical videos
    assert(pairs.contains((6L, 7L)))                          // the full flat clique
    // hot-frame cap: the constant frame is held by 4 videos (> cap 3),
    // so it is dropped from pairing — the flat clique vanishes while
    // the content-distinct pair (1,2) (frame freq 2) survives
    val capped = Multimodal.videoNearDup(frames, 0.6, maxFrameFreq = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
  }
}
