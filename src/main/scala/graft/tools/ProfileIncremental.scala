package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Dev-side stage profiler for incremental MinHash dedup (not driver-run). */
object ProfileIncremental {
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

    val docs = Tables.documents(spark, sfDir)
    (1 to 2).foreach { i =>
      val dir = java.nio.file.Files.createTempDirectory("graft_incprof").toString + "/sigs"
      time(s"pass1 (seed store) #$i") {
        Dedup.incrementalMinhashDedup(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", dir, threshold = 0.5, mode = Dedup.Portable)
      }
      time(s"pass2 (vs store) #$i") {
        Dedup.incrementalMinhashDedup(docs.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text", dir, threshold = 0.5, mode = Dedup.Portable)
      }
      time(s"survivors count #$i") {
        Dedup.incrementalMinhashDedup(docs.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text", dir, threshold = 0.5, mode = Dedup.Portable).count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
