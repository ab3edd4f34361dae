package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.IncrementalIdentity
import graft.queries.IdentityQueries
import graft.sources.Sources

/** Dev-only: job-count + wall attribution for q_identity_incremental's
  * phases (the round-18 top bench row, 101 jobs/gate at sf0.1). */
object ProfileIncrPhases {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    Tables.lineitem(spark, d).count()

    def phase[T](label: String)(f: => T): T = {
      graft.Bench.drainListeners(spark)
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      graft.Bench.drainListeners(spark)
      println(f"[phase] $label%-28s jobs=${jobs.get() - j0}%3d wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"===== round $round =====")
      val root = s"/root/repo/target/roundtrip/prof_incrid"
      val (fragDir, ckDir, regRoot) = (s"$root/frags", s"$root/ck", s"$root/registry")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      phase("publishRegistry(seed)") {
        IncrementalIdentity.publishRegistry(IdentityQueries.registry(spark, d), regRoot)
      }
      val cfg = graft.types.TableConfig("fragments", Seq("request_id"), Seq.empty)
      val frag1 = Tables.customer(spark, d).filter(col("c_custkey") % 2 === 0).select(
        col("c_custkey").as("request_id"),
        col("c_nationkey").cast("int").as("center_id"),
        concat(lit("EV-"), col("c_custkey").cast("string")).as("local_subject_id"),
        lit("primary").as("identifier_type"),
        expr("(c_custkey DIV 2) % 4").cast("int").as("p"))
      phase("publishMerge frag1") {
        Sources.publishMergePartitioned(spark, fragDir, frag1, cfg, "p")
      }
      phase("resolveCycle 1") {
        IncrementalIdentity.resolveCycle(spark, fragDir, ckDir, regRoot,
          Seq("request_id"), java.sql.Date.valueOf("2024-06-01"), "p",
          groupingIterations = 1)(identity)
      }
      val frag2 = Tables.customer(spark, d).filter(col("c_custkey") % 2 === 1).select(
        col("c_custkey").as("request_id"),
        col("c_nationkey").cast("int").as("center_id"),
        concat(lit("EV-"), (col("c_custkey") - 1).cast("string")).as("local_subject_id"),
        lit("primary").as("identifier_type"),
        expr("(c_custkey DIV 2) % 4").cast("int").as("p"))
      phase("publishMerge frag2") {
        Sources.publishMergePartitioned(spark, fragDir, frag2, cfg, "p")
      }
      phase("resolveCycle 2") {
        IncrementalIdentity.resolveCycle(spark, fragDir, ckDir, regRoot,
          Seq("request_id"), java.sql.Date.valueOf("2024-07-01"), "p",
          groupingIterations = 1)(identity)
      }
      phase("final anti-join count") {
        val baseGsids = IdentityQueries.registry(spark, d).subjects
          .select("global_subject_id")
        IncrementalIdentity.readRegistry(spark, regRoot).subjects
          .join(baseGsids, Seq("global_subject_id"), "left_anti")
          .count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
