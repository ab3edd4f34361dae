package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, PpmDecoder}

/** The MediaDecoder seam carrying a REAL non-built-in codec (Netpbm)
  * end-to-end: parser correctness, plugged-vs-fallback features on the
  * same bytes, codec-independent dHash, and video near-dup over PPM
  * frames (VERDICT r12 next-round #5). */
class PpmDecoderSpec extends SparkSpec {
  import spark.implicits._

  private def px3(x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y * 131) % 256, (x * 13 + y * 17) % 256, (x * 3 + y * 101) % 256)

  test("P6/P5 binary and P3/P2 ASCII parse to the exact pixels; malformed refuse") {
    val p6 = PpmDecoder.readImage(PpmDecoder.encodeP6(4, 3)(px3)).get
    assert(p6.getWidth == 4 && p6.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 4) {
      val (r, g, b) = px3(x, y)
      assert(p6.getRGB(x, y) == ((0xFF << 24) | (r << 16) | (g << 8) | b))
    }
    val p5 = PpmDecoder.readImage(PpmDecoder.encodeP5(5, 2)((x, y) => (x * 31 + y * 7) % 256)).get
    for (y <- 0 until 2; x <- 0 until 5) {
      val v = (x * 31 + y * 7) % 256
      assert(p5.getRGB(x, y) == ((0xFF << 24) | (v << 16) | (v << 8) | v))
    }
    // ASCII P3 with comments between header tokens, and ASCII P2
    val p3 = PpmDecoder.readImage(
      "P3 # c\n2 # w\n1\n255\n10 20 30   40 50 60\n".getBytes("US-ASCII")).get
    assert(p3.getRGB(0, 0) == 0xFF0A141E && p3.getRGB(1, 0) == 0xFF28323C)
    assert(PpmDecoder.readImage("P2\n2 1\n255\n7 250\n".getBytes("US-ASCII"))
      .get.getRGB(1, 0) == 0xFFFAFAFA)
    // maxval rescale: 3/3 → 255, 1/3 → 85
    val scaled = PpmDecoder.readImage("P2\n2 1\n3\n3 1\n".getBytes("US-ASCII")).get
    assert(scaled.getRGB(0, 0) == 0xFFFFFFFF && scaled.getRGB(1, 0) == 0xFF555555)
    // refusals: 16-bit maxval, truncated raster, sample > maxval, alien magic
    assert(PpmDecoder.readImage("P2\n1 1\n65535\n300\n".getBytes("US-ASCII")).isEmpty)
    assert(PpmDecoder.readImage("P6\n4 4\n255\nxy".getBytes("US-ASCII")).isEmpty)
    assert(PpmDecoder.readImage("P2\n1 1\n100\n200\n".getBytes("US-ASCII")).isEmpty)
    assert(PpmDecoder.readImage("P7\n1 1\n255\n0".getBytes("US-ASCII")).isEmpty)
    assert(PpmDecoder.readImage(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("mapBatches: plugged PPM decoder turns the fallback row into real pixel features") {
    val ppm = PpmDecoder.encodeP6(4, 2)((_, _) => (255, 0, 0)) // solid red
    val media = Multimodal.asMediaTable(
      Seq((1L, ppm)).toDF("id", "payload"), "id", "payload",
      kind = "image", mime = "image/x-portable-pixmap")

    // built-ins alone: ImageIO can't read PPM → deterministic fallback
    val fallback = Multimodal.extractFeatures(spark, media).collect().head
    assert(!fallback.getAs[Boolean]("decoded"))
    assert(fallback.getAs[Int]("decoded_width") == 0)

    // plugged: REAL decode, real dimensions, real channel means —
    // different features than the fallback on the SAME bytes
    val real = Multimodal.extractFeatures(spark, media, Some(PpmDecoder))
      .collect().head
    assert(real.getAs[Boolean]("decoded"))
    assert(real.getAs[Int]("decoded_width") == 4 &&
      real.getAs[Int]("decoded_height") == 2)
    val f = real.getAs[scala.collection.Seq[Float]]("features")
    assert(f(0) == 1.0f && f(1) == -1.0f && f(2) == -1.0f) // means: r=255, g=b=0
    assert(f != fallback.getAs[scala.collection.Seq[Float]]("features"))
    // checksum oracle unchanged by the decode path
    assert(real.getAs[Long]("checksum") == fallback.getAs[Long]("checksum"))

    // and a plugged PNG row still prefers the plug only when it handles
    // the bytes: PpmDecoder returns None on PNG → built-in decodes it
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, 0x00FF00)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val png = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(Seq((2L, out.toByteArray)).toDF("id", "payload"),
        "id", "payload", kind = "image", mime = "image/png"),
      Some(PpmDecoder)).collect().head
    assert(png.getAs[Boolean]("decoded") && png.getAs[Int]("decoded_width") == 4)
  }

  test("dHash is codec-independent: PPM and BMP of the same pixels hash identically") {
    def gray(seed: Long)(x: Int, y: Int): Int =
      ((seed * 31 + x * 7L + y * 131L) % 256L).toInt
    val seed = 42L
    val bmp = Multimodal.synthBmpSeeded(seed, 18, 16)
    val ppm = PpmDecoder.encodeP6(18, 16)((x, y) =>
      { val v = gray(seed)(x, y); (v, v, v) })
    val viaBmp = Multimodal.dHash(bmp)
    val viaPpm = Multimodal.dHash(ppm, read = PpmDecoder.readOrImageIO)
    assert(viaBmp.isDefined && viaBmp == viaPpm)
    // the default reader cannot decode the PPM at all
    assert(Multimodal.dHash(ppm).isEmpty)
    // and the combined reader still reads BMP (ImageIO fallback intact)
    assert(Multimodal.dHash(bmp, read = PpmDecoder.readOrImageIO) == viaBmp)
  }

  test("videoNearDup over PPM frames matches the BMP result exactly") {
    def frame(seed: Long): Array[Byte] =
      PpmDecoder.encodeP6(18, 16)((x, y) =>
        { val v = ((seed * 31 + x * 7L + y * 131L) % 256L).toInt; (v, v, v) })
    def bmpFrame(seed: Long): Array[Byte] = Multimodal.synthBmpSeeded(seed, 18, 16)
    // videos A and B share 3 of 4 aligned frames; C is disjoint
    val layout = Seq(
      (1L, 0, 10L), (1L, 1, 11L), (1L, 2, 12L), (1L, 3, 13L),
      (2L, 0, 10L), (2L, 1, 11L), (2L, 2, 12L), (2L, 3, 99L),
      (3L, 0, 50L), (3L, 1, 51L), (3L, 2, 52L), (3L, 3, 53L))
    val ppmFrames = layout.map { case (v, k, s) => (v, k, frame(s)) }
      .toDF("video_id", "frame_idx", "payload")
    val bmpFrames = layout.map { case (v, k, s) => (v, k, bmpFrame(s)) }
      .toDF("video_id", "frame_idx", "payload")
    val viaPpm = Multimodal.videoNearDup(ppmFrames, 0.6,
        read = PpmDecoder.readOrImageIO)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaBmp = Multimodal.videoNearDup(bmpFrames, 0.6)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaPpm == Seq((1L, 2L, 3L)))
    assert(viaPpm == viaBmp)
  }
}
