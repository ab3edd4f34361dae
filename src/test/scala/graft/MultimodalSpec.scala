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

  test("frame sampling explodes one row per sampled frame") {
    val vid = Seq((1L, "video", Array[Byte](1), "video/mp4", 0, 0, 1000L))
      .toDF("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")
    val frames = Multimodal.sampleFrames(vid, everyMs = 250)
    assert(frames.select("frame_ms").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 250L, 500L, 750L))
  }
}
