package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Dev-only: print the formatted plan of named queries. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.allDefs.find(_.name == n).foreach(q =>
        q.fn(spark, sfDir).explain("formatted"))
    }
    spark.stop()
  }
}
