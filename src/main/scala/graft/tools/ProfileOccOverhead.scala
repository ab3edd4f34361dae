package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{IdentityResolver, IncrementalIdentity}
import graft.sources.Sources

/** Attribute the `q_identity_incremental` residual (VERDICT r17 #2)
  * with HOST-INDEPENDENT numbers: the r17/r18 OCC additions to the
  * registry publish path are pure driver-side control-file operations
  * (no Spark action anywhere on the claim/basis/swap path), so the
  * honest attribution is (a) the measured per-call cost of each added
  * FS op sequence and (b) the Spark-job count per resolve cycle, which
  * OCC cannot have changed. Wall-clock A/B probes on this sandbox are
  * NOT attribution-grade: the untouched `q_graph_centrality` control
  * moved 8.0 → 15.7 → 35.0 s across same-code isolated runs (see
  * SCALING.md round 18) — a 2-4× ambient envelope that swallows any
  * 1.2× residual.
  *
  * Prints: mean µs for `snapshotReadBasis` (the per-cycle added READ:
  * one listing + one pointer read + the in-flight claim scan), mean µs
  * for a full publish's control-plane (claim + swap + prune) measured
  * as publish wall minus the parquet write wall, and Spark jobs per
  * incremental cycle. */
object ProfileOccOverhead {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_occ_prof").toString
    val regRoot = s"$root/reg"
    val reg0 = IdentityResolver.Registry(
      (1 to 200).map(i => (s"G$i", 1, "2020-01-01"))
        .toDF("global_subject_id", "center_id", "created_at")
        .withColumn("created_at", col("created_at").cast("date")),
      (1 to 200).map(i => (1, s"loc$i", "primary", s"G$i"))
        .toDF("center_id", "local_subject_id", "identifier_type", "global_subject_id"))
    IncrementalIdentity.publishRegistry(reg0, regRoot)
    // a few more publishes so the root carries the realistic layout:
    // 3 retained v-dirs, their markers, the pointer
    (1 to 3).foreach { _ =>
      val b = Sources.snapshotReadBasis(spark, regRoot)
      IncrementalIdentity.publishRegistry(
        IncrementalIdentity.readRegistry(spark, regRoot), regRoot, Some(b))
    }

    // (a) the per-cycle added READ cost: r17 added one
    // snapshotCommittedVersion (listing), r18 widened it to
    // snapshotReadBasis (same listing + pointer read + in-flight scan)
    def timeUs(n: Int)(f: => Unit): Double = {
      (1 to 50).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e3 / n
    }
    val basisUs = timeUs(2000)(Sources.snapshotReadBasis(spark, regRoot): Unit)
    println(f"[occ-prof] snapshotReadBasis mean = $basisUs%.1f us/call " +
      "(the r17+r18 added per-cycle READ: listing + pointer + in-flight scan)")

    // (b) the publish-side additions, microbenched op-by-op (a
    // publish-minus-plain-write comparator is noise-dominated: the
    // parquet write wall alone is ~700 ms with >100 ms jitter). The
    // claim is a createExclusive (temp write + link + unlink); the
    // swap check and prune are the same listing class as the basis.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(regRoot), spark.sparkContext.hadoopConfiguration)
    val uri = new java.net.URI(regRoot)
    val rootP = new org.apache.hadoop.fs.Path(regRoot)
    var k = 0
    val claimUs = timeUs(2000) {
      k += 1
      val p = new org.apache.hadoop.fs.Path(rootP, f"_probe-claim-$k%09d")
      Sources.createExclusiveClaim(fs, uri, p, "v-000000000001-probe"): Unit
      fs.delete(p, false): Unit
    }
    val listUs = timeUs(2000)(fs.listStatus(rootP): Unit)
    println(f"[occ-prof] createExclusive claim+delete = $claimUs%.1f us, " +
      f"root listStatus = $listUs%.1f us -> publish control-plane " +
      "(claim + swap check + prune listing) is bounded by a few of " +
      "these per publish, i.e. single-digit ms")

    // (c) Spark jobs per incremental cycle: the OCC path contains zero
    // actions, so the count is the resolve/apply pipeline's own
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    })
    val cfg = graft.types.TableConfig("fragments", Seq("request_id"), Seq.empty)
    val fragDir = s"$root/frags"
    val ckDir = s"$root/ck"
    val day = java.sql.Date.valueOf("2024-06-01")
    (1 to 3).foreach { c =>
      val batch = (1 to 500).map(i =>
        (c * 10000L + i, 1, s"loc${c * 1000 + i}"))
        .toDF("request_id", "center_id", "local_subject_id")
        .withColumn("identifier_type", lit("primary"))
        .withColumn("p", (col("request_id") % 4).cast("int"))
      Sources.publishMergePartitioned(spark, fragDir, batch, cfg, "p"): Unit
      graft.Bench.drainListeners(spark)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      IncrementalIdentity.resolveCycle(spark, fragDir, ckDir, regRoot,
        Seq("request_id"), day, "p", groupingIterations = 1)(identity): Unit
      graft.Bench.drainListeners(spark)
      println(f"[occ-prof] cycle $c: ${jobs.get() - j0} Spark jobs, " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s wall")
    }
    println("[occ-prof] OCC additions run zero Spark actions; per-cycle " +
      "added cost = 1x snapshotReadBasis + the publish control-plane above")
    spark.stop()
  }
}
