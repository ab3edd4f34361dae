package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SemanticDedup

/** SemDeDup shuffle-byte accounting at scale (VERDICT r13 next-round
  * #6): the within-cluster pairwise join ships raw `_va`/`_vb`
  * vectors on BOTH sides of the cluster_id shuffle — bounded by
  * cluster size, but the question at 100 TB is whether vector bytes
  * dominate the wire enough to justify a PQ/SQ8-coded compare with
  * exact rerank. This tool MEASURES instead of arguing: it runs the
  * production shape (constant cluster occupancy, so nClusters grows
  * with the corpus — the paper's 50k-clusters-for-5B posture) and
  * prints per-stage shuffle-write bytes, total wall, and the
  * analytic vector-payload floor (rows × 2 sides × dim × 4 B), so
  * the coded-variant decision is a ratio read off a table.
  *
  * Usage: `runMain graft.tools.ProfileSemanticDedup <sfDir>
  * [occupancy] [tau] [maxCluster]` — defaults 256 / 0.9 / uncapped.
  */
object ProfileSemanticDedup {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf10"
    val occupancy = if (args.length > 1) args(1).toInt else 256
    val tau = if (args.length > 2) args(2).toDouble else 0.9
    val maxCluster = if (args.length > 3) args(3).toInt else Int.MaxValue
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.embeddings(spark, sfDir).localCheckpoint(false)
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).first().getInt(0)

    // medoid grid at the target occupancy: every occupancy-th id is a
    // centroid (GenScale shifts ids uniformly, so the grid spans all
    // copies); production swaps in a KMeans fit — same plan shape
    val centroidIds = emb.filter(col("vec_id") % occupancy === 0)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
    println(s"[semdedup] sf=$sfDir n=$n dim=$dim occupancy=$occupancy " +
      s"clusters=${centroidIds.length} tau=$tau maxCluster=" +
      (if (maxCluster == Int.MaxValue) "uncapped" else maxCluster.toString))

    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val stageRows = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          stageRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val w = si.taskMetrics.shuffleWriteMetrics.bytesWritten
        val r = si.taskMetrics.shuffleWriteMetrics.recordsWritten
        if (w > 0)
          System.err.println(f"[semdedup-stage] id=${si.stageId}%d " +
            f"shuffle_write_mb=${w / 1048576.0}%.1f records=$r%d " +
            s"name=${si.name.takeWhile(_ != '\n').take(90)}")
      }
    })

    val t0 = System.nanoTime()
    val out = SemanticDedup.semanticDedup(emb, centroidIds, tau,
      maxCluster = maxCluster)
    val dropped = out.filter(!col("kept")).count()
    val wall = (System.nanoTime() - t0) / 1e9
    graft.Bench.drainListeners(spark)

    // the floor the pairwise join cannot go below while it ships raw
    // vectors: every row's vector crosses the cluster_id exchange on
    // the b-side, and (capped) rank-eligible rows cross again on the
    // a-side — raw float payload only, excluding row/codec overhead
    val vecBytes = dim.toLong * 4
    val aSide = math.min(maxCluster.toLong * centroidIds.length, n)
    val floorMb = (n + aSide) * vecBytes / 1048576.0
    println(f"[semdedup] wall=$wall%.1fs dropped=$dropped%d " +
      f"shuffle_write_total_mb=${shufWrite.get() / 1048576.0}%.1f " +
      f"shuffle_records_total=${stageRows.get()}%d " +
      f"raw_vector_floor_mb=$floorMb%.1f " +
      f"(coded SQ8 floor would be ${floorMb / 4}%.1f, PQ m=8 ${ (n + aSide) * 8 / 1048576.0}%.1f)")
    spark.stop()
  }
}
