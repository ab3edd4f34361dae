package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.IdentityResolver
import graft.queries.IdentityQueries

/** Dev-side phase profiler for the identity-resolution query. */
object ProfileIdentity {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, d).count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { round =>
      time(s"#$round full resolve count") {
        IdentityResolver.resolve(
          IdentityQueries.candidates(spark, d),
          IdentityQueries.registry(spark, d), deterministicMint = true).count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val cands = time("candidates build+count") {
      val c = IdentityQueries.candidates(spark, d).localCheckpoint(true)
      println("[prof] cands=" + c.count()); c
    }
    val reg = IdentityQueries.registry(spark, d)
    time("registry counts") {
      println("[prof] subj=" + reg.subjects.count() + " li=" + reg.localIds.count())
    }
    time("resolve from materialized") {
      IdentityResolver.resolve(cands, reg, deterministicMint = true).count()
    }
    spark.stop()
  }
}
