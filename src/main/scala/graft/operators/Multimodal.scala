package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media travels as an opaque `binary` column plus typed metadata —
  * the schema, partitioning and batch shape are the real, tested part.
  * The decode kernels are STUBBED with deterministic fakes (this
  * container has no image/audio libraries): `decodeStub` derives
  * "features" from a hash of the bytes, so plans, shuffles and joins
  * behave exactly as they would with a real decoder plugged into
  * [[mapBatches]].
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

  /** The batched decode shape: partition-local iteration, one output
    * row per media row. A real decoder (JNI/OpenCV/ffmpeg) drops in
    * here; the stub derives a deterministic 8-dim feature vector from
    * the payload hash so downstream plans are fully exercisable. */
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
        // ??? real decode goes here — deterministic fake features:
        val feats = Array.tabulate(dim)(i =>
          (((checksum >>> (i * 8)) & 0xFF).toFloat / 255.0f) * 2 - 1)
        MediaFeatures(r.media_id, r.kind, bytes.length, checksum, feats)
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
      .select("content_hash", "keep_id", "dup_count")
}
