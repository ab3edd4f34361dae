package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.IdentityResolver
import graft.queries.IdentityQueries

/** Dev-side stage profiler for the two-batch evolution fold. */
object ProfileEvolution {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val reg0 = IdentityQueries.registry(spark, sfDir)
    val customers = Tables.customer(spark, sfDir)
    val batch1 = customers.filter(col("c_custkey") % 2 === 0).select(
      col("c_custkey").as("request_id"),
      col("c_nationkey").cast("int").as("center_id"),
      concat(lit("EV-"), col("c_custkey").cast("string")).as("local_subject_id"),
      lit("primary").as("identifier_type"))
    time("resolve batch1 count only")(
      IdentityResolver.resolve(batch1, reg0).count())
    time("resolve batch1 groupIter=1")(
      IdentityResolver.resolve(batch1, reg0, deterministicMint = true,
        groupingIterations = 1).count())
    val res1 = time("resolve batch1 + ckpt")(
      IdentityResolver.resolve(batch1, reg0).localCheckpoint(true))
    val links1 = IdentityResolver.links(batch1, res1, reg0.localIds)
    val reg1raw = IdentityResolver.applyBatch(reg0, res1, links1,
      java.sql.Date.valueOf("2024-06-01"))
    val reg1 = time("applyBatch + 2 ckpts")(IdentityResolver.Registry(
      reg1raw.subjects.localCheckpoint(true), reg1raw.localIds.localCheckpoint(true)))
    val batch2 = customers.filter(col("c_custkey") % 2 === 1).select(
      col("c_custkey").as("request_id"),
      col("c_nationkey").cast("int").as("center_id"),
      concat(lit("EV-"), (col("c_custkey") - 1).cast("string")).as("local_subject_id"),
      lit("primary").as("identifier_type"))
    time("resolve batch2 count")(
      IdentityResolver.resolve(batch2, reg1).count())
    spark.stop()
  }
}
