package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Dev-only probe main for stage timings (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val sig = time("signature") {
      val s = Dedup.minhashSignature(docs, "doc_id", "text", 3, 64).cache()
      println("[probe] sigs=" + s.count()); s
    }
    val cands = time("candidates") {
      val c = Dedup.minhashCandidates(sig, 16, 4).cache()
      println("[probe] cands=" + c.count()); c
    }
    time("verify") {
      println("[probe] verified=" + Dedup.verifyPairs(docs, cands, "doc_id", "text", 3, 0.5).count())
    }
    spark.stop()
  }
}
