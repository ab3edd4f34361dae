package graft.operators

import java.awt.image.BufferedImage

/** Pure-JVM Netpbm image decoder (PPM/PGM: `P2`/`P3` ASCII, `P5`/`P6`
  * binary, maxval ≤ 255) — the worked example of the
  * [[Multimodal.MediaDecoder]] codec seam: a REAL image format the
  * JRE's ImageIO does NOT ship a reader for, carried through the same
  * decode kernel, fallback discipline, dHash grid and video near-dup
  * machinery as the built-in codecs. Format per the public Netpbm
  * specification (magic, whitespace/#-comment-separated width, height,
  * maxval header; raster as bytes or ASCII ints).
  *
  * What this proves about the seam: `Multimodal.mapBatches(decoder =
  * Some(PpmDecoder))` turns a payload the built-ins classify as
  * undecodable (hash-derived fallback features, `decoded = false`)
  * into REAL pixel statistics (`decoded = true`) with the exact
  * arithmetic of the built-in image path ([[Multimodal.pixelFeatures]]
  * is shared, not duplicated), and `dHash(bytes, read =
  * PpmDecoder.readOrImageIO)` hashes a PPM byte-for-byte identically
  * to the same pixels in a BMP — the perceptual hash is
  * codec-independent, so a mixed-codec corpus dedups correctly.
  * A heavier codec (JNI libjpeg, an ffmpeg frame grabber) plugs in
  * through the identical two entry points.
  *
  * Stateless and serializable (an `object` ships as a singleton ref),
  * deterministic per payload, `None` on anything that is not a
  * well-formed ≤8-bit Netpbm image — exactly the [[Multimodal.MediaDecoder]]
  * contract. */
object PpmDecoder extends Multimodal.MediaDecoder {

  /** Decode P2/P3/P5/P6 bytes to a BufferedImage; None when the bytes
    * are not well-formed Netpbm with maxval in [1, 255] (16-bit
    * samples, truncated rasters, other magics all refuse). */
  def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    try {
      if (bytes.length < 2 || bytes(0) != 'P') return None
      val magic = bytes(1) - '0'
      if (magic != 2 && magic != 3 && magic != 5 && magic != 6) return None
      val gray = magic == 2 || magic == 5
      val binary = magic == 5 || magic == 6

      var pos = 2
      // skip whitespace and #-comments (comments run to end of line and
      // may appear anywhere in the header per the spec)
      def skipSpace(): Unit = {
        var go = true
        while (go && pos < bytes.length) {
          val b = bytes(pos)
          if (b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c) pos += 1
          else if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else go = false
        }
      }
      def nextInt(): Int = {
        skipSpace()
        var v = 0; var any = false
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); any = true; pos += 1
          if (v > 0xFFFFFF) throw new NumberFormatException("header value overflow")
        }
        if (!any) throw new NumberFormatException("expected integer")
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      // binary rasters begin after EXACTLY one whitespace byte
      if (binary) {
        if (pos >= bytes.length || !Character.isWhitespace(bytes(pos))) return None
        pos += 1
      }
      val nPx = w.toLong * h
      if (nPx > 64L * 1024 * 1024) return None // refuse absurd headers
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      // scale a sample to 8 bits with correct rounding for maxval < 255
      def s8(v: Int): Int =
        if (v < 0 || v > maxval) throw new NumberFormatException("sample out of range")
        else if (maxval == 255) v else (v * 255 + maxval / 2) / maxval
      def sample(): Int = if (binary) {
        if (pos >= bytes.length) throw new java.io.EOFException("truncated raster")
        val v = bytes(pos) & 0xFF; pos += 1; s8(v)
      } else s8(nextInt())
      var i = 0
      while (i < nPx) {
        val (r, g, b) =
          if (gray) { val v = sample(); (v, v, v) }
          else (sample(), sample(), sample())
        img.setRGB((i % w).toInt, (i / w).toInt, (r << 16) | (g << 8) | b)
        i += 1
      }
      Some(img)
    } catch { case _: Throwable => None }

  /** The [[Multimodal.dHash]]/[[Multimodal.videoNearDup]] reader seam:
    * Netpbm first, every ImageIO format as the fallback — a
    * mixed-codec corpus hashes through one reader. */
  val readOrImageIO: Array[Byte] => Option[BufferedImage] =
    bytes => readImage(bytes).orElse(Multimodal.imageIoRead(bytes))

  /** [[Multimodal.MediaDecoder]] contract: real pixel features for
    * Netpbm image payloads via the SAME statistic kernel as the
    * built-in ImageIO path; None for everything else (falls through
    * to the built-ins, then the deterministic fallback). */
  override def decode(kind: String, payload: Array[Byte], dim: Int)
      : Option[Multimodal.Decoded] =
    if (kind != "image") None
    else readImage(payload).map { img =>
      val (w, h, feats) = Multimodal.pixelFeatures(img, dim)
      Multimodal.Decoded(w, h, 0, 0, 0L, feats)
    }

  /** Deterministic binary-PPM (P6) fixture encoder — the Netpbm
    * analogue of [[Multimodal.synthBmp24]], with a header comment to
    * exercise the parser's comment handling. */
  def encodeP6(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n# graft fixture\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        out(header.length + i) = r.toByte
        out(header.length + i + 1) = g.toByte
        out(header.length + i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Deterministic binary-PGM (P5) grayscale fixture encoder. */
  def encodeP5(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(header.length + y * w + x) = px(x, y).toByte; x += 1 }
      y += 1
    }
    out
  }
}
