package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Dev-side stage profiler for near-dup cluster collapse (not driver-run). */
object ProfileCollapse {
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
      val pairs = time(s"jaccardPairs #$i") {
        val p = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println("pairs=" + p.count()); p
      }
      time(s"collapse loop #$i") {
        Dedup.collapseNearDuplicates(docs.select("doc_id"), pairs, "doc_id").count()
      }
      pairs.unpersist()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // end-to-end as the bench sees it
    (1 to 2).foreach { i =>
      time(s"end-to-end #$i") {
        val p = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
        Dedup.collapseNearDuplicates(docs.select("doc_id"), p, "doc_id").count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
