package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.sources.Sources

/** Dev-only: print the formatted plan + job count of the row-level CDC
  * delta (`processMergeRowChangesWithDeletes`) over a two-publish merge
  * table — the plan-diff evidence for the round-18 fused-delta
  * optimization (plans/r18/cdc_delta_{before,after}.txt). */
object ExplainCdcDelta {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_explain").toString
    val (dir, ck) = (s"$root/table", s"$root/ck")
    val cfg = graft.types.TableConfig("docs", Seq("doc_id"), Seq.empty)
    val docs = Tables.documents(spark, d)
    val b1 = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text"), (col("doc_id") % 4).cast("int").as("p"))
    val b2 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
        (col("doc_id") % 4).cast("int").as("p"))
    Sources.publishMergePartitioned(spark, dir, b1, cfg, "p")
    // consume the first (full) delivery so the second is a true diff
    Sources.processMergeRowChangesWithDeletes(spark, dir, ck, Seq("doc_id"), "p") {
      (delta, _) => delta.delta.count()
    }
    Sources.publishMergePartitioned(spark, dir, b2, cfg, "p")
    Sources.processMergeRowChangesWithDeletes(spark, dir, ck, Seq("doc_id"), "p") {
      (delta, _) =>
        println("===== delta plan =====")
        delta.delta.explain("formatted")
        println("===== orphaned-keys plan =====")
        delta.orphanedKeys.explain("formatted")
        graft.Bench.drainListeners(spark)
        val j0 = jobs.get(); val t0 = System.nanoTime()
        val n = delta.delta.count()
        graft.Bench.drainListeners(spark)
        println(f"===== delta rows=$n jobs=${jobs.get() - j0} wall=${(System.nanoTime() - t0) / 1e9}%.2f s =====")
    }
    spark.stop()
  }
}
