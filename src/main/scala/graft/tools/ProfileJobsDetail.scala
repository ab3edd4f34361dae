package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry, Tables}

/** Dev-only: run ONE named query and print every Spark job's call site
  * (first stage name) so job-count hot spots can be attributed to the
  * exact operator line that submits them. */
object ProfileJobsDetail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        println(f"[job] ${n.incrementAndGet()}%3d stages=${j.stageInfos.size} $site")
      }
    })
    Tables.lineitem(spark, sfDir).count()
    args.foreach { qn =>
      SparkEntry.allDefs.find(_.name == qn).foreach { q =>
        println(s"===== $qn (warm) =====")
        q.fn(spark, sfDir).count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        graft.Bench.drainListeners(spark)
        println(s"===== $qn (measured) =====")
        n.set(0)
        q.fn(spark, sfDir).count()
        graft.Bench.drainListeners(spark)
        println(s"===== $qn total jobs: ${n.get()} =====")
      }
    }
    spark.stop()
  }
}
