package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry, Tables}

/** Dev-only: structural fingerprint per query — Spark job count, stage
  * count, task count, shuffle read/write bytes and wall — for the named
  * queries (or the N slowest by a prior bench_full.json with no args).
  * Jobs/stages/bytes are host-noise-immune, which is what makes them
  * the right before/after evidence for job-count and shuffle-byte
  * optimizations (guide §1: measure what the change actually moves).
  */
object ProfileQueryJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same dev-only A/B hook as TimeQueries: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    val b0 = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32)
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(";").toSeq).getOrElse(Nil)
      .map(_.split("=", 2)).collect { case Array(k, v) => (k.trim, v.trim) }
      .foldLeft(b0) { case (bb, (k, v)) => bb.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufR = new AtomicLong(0)
    val shufW = new AtomicLong(0)
    val inBytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })

    Tables.lineitem(spark, sfDir).count() // warm-up

    val wanted =
      if (args.nonEmpty) SparkEntry.allDefs.filter(q => args.contains(q.name))
      else SparkEntry.allDefs
    println("query,wall_s,jobs,stages,tasks,shuffle_read_mb,shuffle_write_mb,input_mb")
    wanted.foreach { q =>
      // one untimed warm run so codegen/footers are primed, then the
      // measured run (counters reset after the warm run)
      try q.fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"${q.name},WARM_FAILED ${e.getClass.getSimpleName}") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      graft.Bench.drainListeners(spark)
      jobs.set(0); stages.set(0); tasks.set(0)
      shufR.set(0); shufW.set(0); inBytes.set(0)
      val t0 = System.nanoTime()
      val ok = try { q.fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.drainListeners(spark)
      if (ok) println(f"${q.name},$dt%.2f,${jobs.get()},${stages.get()},${tasks.get()}," +
        f"${shufR.get() / 1048576.0}%.1f,${shufW.get() / 1048576.0}%.1f," +
        f"${inBytes.get() / 1048576.0}%.1f")
      else println(s"${q.name},FAILED")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
