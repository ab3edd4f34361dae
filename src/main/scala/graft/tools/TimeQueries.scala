package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry, Tables}

/** Dev-only: time named queries (or all, with no args) exactly like
  * Bench — count() + clearCache between queries — so driver bench
  * regressions can be reproduced and chased locally. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // dev-only A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" overrides
    // session defaults so config hypotheses can be tested without edits
    val b0 = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32)
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(";").toSeq).getOrElse(Nil)
      .map(_.split("=", 2)).collect { case Array(k, v) => (k.trim, v.trim) }
      .foldLeft(b0) { case (bb, (k, v)) => bb.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, sfDir).count() // warm-up

    val wanted = if (args.isEmpty) SparkEntry.allDefs
                 else SparkEntry.allDefs.filter(q => args.contains(q.name))
    var total = 0.0
    wanted.foreach { q =>
      val t0 = System.nanoTime()
      val n = try q.fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[time] ${q.name} FAILED: ${e.getMessage.take(200)}"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      total += dt
      spark.catalog.clearCache()
      println(f"[time] ${q.name}%-34s $dt%8.2f s  rows=$n")
    }
    println(f"[time] TOTAL $total%.2f s")
    spark.stop()
  }
}
