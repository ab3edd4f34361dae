package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev-side profiler for the two round-12 bench watch items
  * (VERDICT r12 "Next round" #2):
  *
  *  1. `q_dedup_collapse` median drifted 1.1→3.0 s across rounds with
  *     untouched code — log the phase decomposition (pair discovery,
  *     edge count, component solve path, final join) per rep so the
  *     variance pins to a phase, not a guess. At gate scale the pair
  *     set is far below `maxLocalEdges`, so the component solve is the
  *     driver union-find (NO iteration loop) — if the variance lives
  *     in `jaccardPairs`, the CC-loop hypothesis is dead.
  *
  *  2. `q_dedup_minhash_lsh` showed one 47.75 s rep against a 2.65 s
  *     median — record per-rep wall + JVM GC time delta + executor
  *     spill/shuffle bytes (task-metrics listener) to classify the
  *     stall as GC/memory pressure vs scheduling noise.
  *
  * Usage: runMain graft.tools.ProfileWatchItems [sfDir] [reps]
  * Prints one `[watch]` line per rep for SCALING.md.
  */
object ProfileWatchItems {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new AtomicLong(0); val diskSpill = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def mb(b: Long): String = f"${b / 1024.0 / 1024.0}%.0f"

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    val byName = graft.SparkEntry.allDefs.map(q => q.name -> q).toMap

    // ---- watch item 1: q_dedup_collapse phase decomposition ----------
    {
      val docs = graft.Tables.documents(spark, sfDir)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val pairs = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
          .localCheckpoint(false)
        val nEdges = pairs.count()
        val tPairs = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val n = graft.operators.Dedup
          .collapseNearDuplicates(docs.select("doc_id"), pairs, "doc_id").count()
        val tCollapse = (System.nanoTime() - t1) / 1e9
        println(f"[watch] collapse rep=$i%d pairs_wall=$tPairs%5.2fs " +
          f"collapse_wall=$tCollapse%5.2fs edges=$nEdges%d rows=$n%d " +
          s"path=${if (nEdges <= graft.operators.Dedup.DefaultMaxLocalEdges) "union-find" else "cc-loop"}")
        cleanup()
      }
    }

    // ---- watch item 2: q_dedup_minhash_lsh GC/spill per rep ----------
    {
      val q = byName("q_dedup_minhash_lsh")
      (1 to reps).foreach { i =>
        val (m0, d0, s0, g0) = (memSpill.get, diskSpill.get, shufWrite.get, gcMillis)
        val t0 = System.nanoTime()
        val n = q.fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800) // listener events drain asynchronously
        println(f"[watch] minhash_lsh rep=$i%d wall=$dt%6.2fs " +
          f"gc=${(gcMillis - g0) / 1000.0}%5.2fs " +
          s"spill_mem=${mb(memSpill.get - m0)}MB " +
          s"spill_disk=${mb(diskSpill.get - d0)}MB " +
          s"shuffle_write=${mb(shufWrite.get - s0)}MB rows=$n")
        cleanup()
      }
    }
    spark.stop()
  }
}
