package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev-side A/B for the ONE knob local[32] cannot default for a
  * cluster: `spark.sql.adaptive.coalescePartitions.initialPartitionNum`.
  *
  * The round-13 sf1→sf10 table showed the fixed-parallelism
  * superlinearity: with `spark.sql.shuffle.partitions = 32`, 10× the
  * rows makes every shuffle partition 10× larger, and sort-heavy
  * plans (PPJoin's df-ascending prefix sort, posting joins) go
  * superlinear once a partition outgrows cache/memory — measured
  * 15.3× wall for 10× rows on `q_dedup_jaccard_prefix`. On a real
  * cluster the fix is not a bigger static partition count (which
  * taxes every small query with empty-task overhead) but AQE's
  * initialPartitionNum: start every shuffle wide, let runtime
  * coalescing shrink small stages back to ~parallelism. This tool
  * measures that directly: same query, same data, same JVM shape,
  * initialPartitionNum ∈ {unset, N}.
  *
  * Usage: runMain graft.tools.ProfilePartitions <sfDir> <initialN> <reps> <q1,q2,...>
  * Prints one `[parts]` line per (query, config, rep).
  */
object ProfilePartitions {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val initialN = args(1).toInt
    val reps = args(2).toInt
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defs = graft.SparkEntry.allDefs.filter(q => names(q.name))
    require(defs.nonEmpty, s"no queries matched: $names")
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def run(q: graft.queries.QueryDef, label: String): Unit = {
      // one untimed warm-up per (query, config): JIT + codegen + AQE
      // plan shapes differ between configs, so each arm warms itself
      q.fn(spark, sfDir).count(); cleanup()
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = q.fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        println(f"[parts] q=${q.name} config=$label rep=$r wall=$dt%.2fs rows=$n")
      }
    }

    defs.foreach { q =>
      spark.conf.unset(key)
      run(q, "initialN=unset(32)")
      spark.conf.set(key, initialN.toString)
      run(q, s"initialN=$initialN")
      spark.conf.unset(key)
    }
    spark.stop()
  }
}
