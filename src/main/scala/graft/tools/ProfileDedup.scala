package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Dev-side stage profiler for the MinHash+LSH pipeline (not driver-run). */
object ProfileDedup {
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
    (1 to 3).foreach { i =>
      time(s"full minhashDedup #$i") {
        Dedup.minhashDedup(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
      }
      spark.catalog.clearCache()
    }

    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles materialize")(sh.count())
    val sig = time("signatures") {
      val s = Dedup.minhashSignatureFromShingles(sh, 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val cands = time("lsh candidates") {
      val c = Dedup.minhashCandidates(sig, 16, 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    time("verify")(Dedup.verifyPairsAgainstShingles(sh, cands, 0.5).count())
    spark.stop()
  }
}
