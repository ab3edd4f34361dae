package graft.tools

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Dev-side, noise-immune probe for generated-class cache eviction.
  *
  * Wall-clock A/Bs on this sandbox are swamped by host-level CPU
  * steal (the r08 verdict's "sandbox contention"), so this measures
  * the mechanism directly: `CodegenMetrics.METRIC_COMPILATION_TIME`
  * counts janino compilations, which only happen on a codegen-cache
  * miss. Protocol: run a probe query, run the full suite (the cache
  * workload), run the probe again. If the second probe recompiles
  * as much as the first, the suite evicted its entries; if it
  * compiles ~nothing, the cache held.
  */
object CodegenCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val probeName = args.headOption.getOrElse("q_dedup_incremental")
    val b0 = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32)
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(";").toSeq).getOrElse(Nil)
      .map(_.split("=", 2)).collect { case Array(k, v) => (k.trim, v.trim) }
      .foldLeft(b0) { case (bb, (k, v)) => bb.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def compiles(): Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def compileMs(): Long = {
      val s = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot
      (s.getMean * CodegenMetrics.METRIC_COMPILATION_TIME.getCount).toLong
    }
    def runProbe(label: String): Unit = {
      val (c0, m0, t0) = (compiles(), compileMs(), System.nanoTime())
      SparkEntry.allDefs.find(_.name == probeName).get.fn(spark, sfDir).count()
      println(f"[probe] $label%-18s compiles=${compiles() - c0}%4d " +
        f"compileMs~${compileMs() - m0}%6d wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    println(s"[probe] codegen.cache.maxEntries=" +
      spark.conf.getOption("spark.sql.codegen.cache.maxEntries").getOrElse("(default 100)"))
    runProbe("probe cold")
    runProbe("probe repeat")
    val c0 = compiles()
    SparkEntry.allDefs.filter(_.name != probeName).foreach { q =>
      try q.fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    println(s"[probe] suite workload: ${compiles() - c0} compilations")
    runProbe("probe after suite")
    spark.stop()
  }
}
