package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** Streaming scale measurement (VERDICT r13 next-round #4): the one
  * operator family whose 100 TB posture was asserted, never measured.
  * Drives the windowed-sketch aggregations and sessionization over a
  * REAL multi-micro-batch file stream (one parquet chunk per
  * micro-batch via `maxFilesPerTrigger`) and reads sustained
  * throughput, state-store rows/bytes, and watermark lag OUT OF THE
  * ENGINE's own `StreamingQueryProgress` — the same numbers a
  * production monitor scrapes.
  *
  * What the claims under test are:
  *  - `windowedHistogram`: state per open (window, type) group is
  *    `nBuckets + 2` longs regardless of event volume;
  *  - `windowedQuantiles` (KLL): `O(k·log(n/k))` doubles per group;
  *  - `windowedDistinct` (KMV): ≤ k longs per group;
  *  - `sessionWindows`: state rows track OPEN sessions (user-gap
  *    bounded), not events.
  * If any of those held only on paper, state bytes would scale with
  * rows-per-window and this tool would show it.
  *
  * Burst mode: the chunking is time-ordered and one mid-stream chunk
  * carries ~half of all rows (a firehose spike). Watermark lag (max
  * observed event time minus watermark) must stay bounded by the
  * configured delay plus one micro-batch — the lag column makes the
  * recovery visible batch by batch.
  *
  * Usage: `runMain graft.tools.ProfileStreaming <sfDir> [nChunks]`
  * (chunks default 16; stderr gets per-batch lines, stdout one
  * summary line per operator).
  */
object ProfileStreaming {

  private case class RunStats(
      rows: Long, wallSec: Double, batches: Int, sustainedRowsPerSec: Double,
      stateRowsMax: Long, stateBytesMax: Long, lagMaxSec: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val nChunks = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- stage the time-ordered chunk files (one per micro-batch) ----
    // ntile over the ts order splits rows evenly; the BURST layout
    // folds the middle ~half of the deciles into ONE chunk file, so a
    // single micro-batch carries ~50% of the stream.
    val ev = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val total = ev.count()
    def stage(dir: String, burst: Boolean): String = {
      val base = ev.withColumn("_c", ntile(nChunks).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
      val chunked =
        if (!burst) base
        else base.withColumn("_c",
          when(col("_c").between(nChunks / 4 + 1, nChunks / 4 + nChunks / 2),
            lit(nChunks / 4 + 1)).otherwise(col("_c")))
      // one file per chunk id, named so the file stream reads them in
      // time order (FileStreamSource sorts by path within a batch but
      // maxFilesPerTrigger=1 takes oldest-first by modification time;
      // write sequentially to pin both)
      val ids = chunked.select("_c").distinct()
        .orderBy("_c").collect().map(_.getInt(0)) // ≤ nChunks rows
      ids.foreach { i =>
        chunked.filter(col("_c") === i).drop("_c")
          .coalesce(1).write.mode("append").parquet(dir)
        Thread.sleep(15) // distinct mtimes => deterministic file order
      }
      dir
    }
    val steadyDir = stage(
      java.nio.file.Files.createTempDirectory("graft_stream_steady").toString +
        "/ev", burst = false)
    val burstDir = stage(
      java.nio.file.Files.createTempDirectory("graft_stream_burst").toString +
        "/ev", burst = true)
    val schema = spark.read.parquet(steadyDir).schema

    def run(name: String, dir: String,
        plan: DataFrame => DataFrame, outputMode: String): RunStats = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val t0 = System.nanoTime()
      val q = plan(src).writeStream
        .format("noop").outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"graft_ck_$name").toString)
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progresses = q.recentProgress.toSeq
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      def ts(s: String): Option[Long] =
        if (s == null || s.isEmpty) None
        else scala.util.Try(fmt.parse(s).getTime).toOption
      var (rows, stateRowsMax, stateBytesMax) = (0L, 0L, 0L)
      var lagMax = 0.0
      var maxEventMs = Long.MinValue
      progresses.foreach { p =>
        rows += p.numInputRows
        p.stateOperators.foreach { so =>
          stateRowsMax = math.max(stateRowsMax, so.numRowsTotal)
          stateBytesMax = math.max(stateBytesMax, so.memoryUsedBytes)
        }
        val et = p.eventTime
        ts(et.get("max")).foreach(m => maxEventMs = math.max(maxEventMs, m))
        ts(et.get("watermark")).foreach { w =>
          // w == 0 is Spark's "not yet initialized" watermark (batch 0
          // reports 1970-01-01) — diffing real event times against it
          // would report ~54 years of bogus lag
          if (maxEventMs != Long.MinValue && w > 0L)
            lagMax = math.max(lagMax, (maxEventMs - w) / 1000.0)
        }
        System.err.println(f"[stream-batch] op=$name batch=${p.batchId}%d " +
          f"rows=${p.numInputRows}%d proc_rows_per_s=${p.processedRowsPerSecond}%.0f " +
          s"state_rows=${p.stateOperators.map(_.numRowsTotal).sum} " +
          s"state_bytes=${p.stateOperators.map(_.memoryUsedBytes).sum} " +
          s"watermark=${p.eventTime.get("watermark")}")
      }
      q.stop()
      RunStats(rows, wall, progresses.length, rows / wall,
        stateRowsMax, stateBytesMax, lagMax)
    }

    def report(name: String, s: RunStats): Unit =
      println(f"[stream-scale] op=$name%-24s rows=${s.rows}%d wall=${s.wallSec}%.1fs " +
        f"batches=${s.batches}%d sustained_rows_per_s=${s.sustainedRowsPerSec}%.0f " +
        f"state_rows_max=${s.stateRowsMax}%d state_bytes_max=${s.stateBytesMax}%d " +
        f"bytes_per_state_row=${if (s.stateRowsMax > 0) s.stateBytesMax / s.stateRowsMax else 0}%d " +
        f"watermark_lag_max_s=${s.lagMaxSec}%.0f")

    println(s"[stream-scale] sf=$sfDir events=$total chunks=$nChunks " +
      "(burst layout: one chunk carries ~half the rows)")

    report("windowed_histogram", run("hist", steadyDir,
      df => EventStream.windowedHistogram(df, 0.0, 50.0, 20), "update"))
    report("windowed_quantiles_kll", run("kll", steadyDir,
      df => EventStream.windowedQuantiles(df, 128, Seq(0.5, 0.9)), "update"))
    report("windowed_distinct_kmv", run("kmv", steadyDir,
      df => EventStream.windowedDistinct(df, 64), "update"))
    // session windows stream only in append mode (watermark-closed)
    report("session_windows", run("sess", steadyDir,
      df => EventStream.sessionWindows(
        df.withWatermark("ts", "2 hours"), "30 minutes"), "append"))
    report("windowed_histogram_burst", run("hist_burst", burstDir,
      df => EventStream.windowedHistogram(df, 0.0, 50.0, 20), "update"))
    report("session_windows_burst", run("sess_burst", burstDir,
      df => EventStream.sessionWindows(
        df.withWatermark("ts", "2 hours"), "30 minutes"), "append"))

    spark.stop()
  }
}
