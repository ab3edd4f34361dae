package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media travels as an opaque `binary` column plus typed metadata.
  * IMAGE payloads are decoded for real via `javax.imageio` (PNG/JPEG/
  * GIF/BMP in any JRE): decoded width/height and deterministic
  * channel-statistic features come from actual pixels. Payloads
  * ImageIO cannot decode — audio/video (no JRE codecs), or image rows
  * whose bytes aren't an image — fall back to deterministic
  * hash-derived features, so plans, shuffles and joins behave
  * identically either way and the whole path stays oracle-checkable
  * through the md5 checksum column.
  *
  * Scale design: decode work is per-row and embarrassingly parallel —
  * `mapPartitions` over the binary column keeps each media blob on one
  * executor, no shuffle; downstream feature columns are small, so the
  * wide binary column should be dropped (column pruning) before any
  * join or aggregation.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,            // image | audio | video
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      decoded: Boolean,        // true iff a real decoder produced the row
      decoded_width: Int,      // 0 when not decodable
      decoded_height: Int,
      features: Array[Float])  // fixed-dim feature vector

  /** Build a media table from any binary source column. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      kind: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"),
      lit(mime).as("mime"),
      lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))

  /** Real image decode: `javax.imageio` over the payload bytes.
    * Returns (width, height, pixel-statistic features): per-channel
    * means and a luma mean (exact integer accumulation, one IEEE
    * division each, scaled to [-1, 1]) followed by
    * dimension-normalized width/height — the feature shape a CLIP-ish
    * embedder would fill with the same plumbing. None when the bytes
    * are not a decodable image (wrong kind, corrupt file, or a codec
    * the JRE lacks).
    *
    * Determinism scope: features from LOSSLESS formats (PNG, BMP) are
    * bit-stable everywhere; JPEG pixel output may differ by a ULP-ish
    * amount across JRE versions/platforms (color management), so
    * cross-environment gates should pin the `checksum` column (pure
    * md5 of the payload — always stable), not JPEG-derived features. */
  private[operators] def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var (rs, gs, bs) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              rs += (p >>> 16) & 0xFF; gs += (p >>> 8) & 0xFF; bs += p & 0xFF
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          def mean(s: Long) = ((s.toDouble / n) / 255.0 * 2 - 1).toFloat
          val base = Array(mean(rs), mean(gs), mean(bs),
            mean((rs * 299 + gs * 587 + bs * 114) / 1000),
            math.min(w, 4096).toFloat / 4096 * 2 - 1,
            math.min(h, 4096).toFloat / 4096 * 2 - 1)
          (w, h, Array.tabulate(dim)(i => if (i < base.length) base(i) else 0f))
        }
    } catch { case _: Throwable => None }

  /** The batched decode shape: partition-local iteration, one output
    * row per media row. Image rows go through the REAL
    * [[decodeImage]] kernel; undecodable payloads fall back to
    * deterministic hash-derived features so the batch never fails and
    * downstream plans are identical either way. */
  def mapBatches(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one digest instance per partition, reset per row
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
        // checksum = first 56 bits of md5(payload) — the same value any
        // SQL engine derives as ('0x' || substr(md5(payload),1,14))::BIGINT,
        // so the decode output is oracle-checkable end to end
        md.reset()
        val checksum = md.digest(bytes).take(7)
          .foldLeft(0L)((a, b) => (a << 8) | (b & 0xFFL))
        val real = if (r.kind == "image") decodeImage(bytes, dim) else None
        real match {
          case Some((w, h, feats)) =>
            MediaFeatures(r.media_id, r.kind, bytes.length, checksum,
              decoded = true, w, h, feats)
          case None =>
            val feats = Array.tabulate(dim)(i =>
              (((checksum >>> (i * 8)) & 0xFF).toFloat / 255.0f) * 2 - 1)
            MediaFeatures(r.media_id, r.kind, bytes.length, checksum,
              decoded = false, 0, 0, feats)
        }
      }
    }
  }

  /** Resize metadata transform (stub: real pixel work happens in the
    * decode kernel; this maintains the metadata contract). */
  def resizeMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Frame sampling plan for video rows: one output row per sampled
    * frame index — an explode, so it parallelizes with the data. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("kind") === "video" && col("duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))

  /** End-to-end feature extraction from a DataFrame with a binary
    * payload: schema in, schema out, binary dropped after decode. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    mapBatches(media.as[MediaRow]).toDF()
  }

  /** Exact media dedup by content hash — byte-identical payloads
    * (re-ingested files, mirrored URLs) collapse to the lowest id.
    * The shuffle key is the 128-bit md5 of the payload, never the
    * payload itself: at 100 TB of media the wide binary column stays
    * in the scan and only ~24 bytes + id travel. The length component
    * closes the md5 chosen-prefix-collision hole: practical collision
    * constructions pad, so an adversarial different-bytes pair rarely
    * shares the composite (md5, length) key, and honest payloads
    * never collide on it in practice. Perceptual (near-dup)
    * media hashing slots into the same shape with the SimHash banding
    * of [[Dedup]] over decoder-derived features. */
  def dedupExact(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.groupBy(md5(col(payloadCol)).as("content_hash"),
        length(col(payloadCol)).as("n_bytes"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      // n_bytes stays in the output: it is PART of the dedup key, and
      // projecting it away would let an adversarial equal-md5 pair
      // surface as two rows with an identical-looking content_hash —
      // downstream joins must key on (content_hash, n_bytes)
      .select("content_hash", "n_bytes", "keep_id", "dup_count")
}
