package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the partitioned-index FAMILY apply wall (VERDICT r16 #5):
  * a full-fan-out delta against an N-partition BM25 family, applied
  * with the per-partition pool at parallelism 1 (the pre-r17 serial
  * driver loop) vs the default pool — the SCALING.md evidence that the
  * routed applies now overlap.
  *
  * Usage:
  * `runMain graft.tools.ProfileFamilyApply [sfDir] [nParts] [parCsv]`
  * (defaults sf0.01, 12 partitions, "1,<default>"). Builds the family
  * once per setting in a fresh temp dir, times one routed apply whose
  * delta touches every partition, prints one summary line per
  * setting. `parCsv` bounds the matrix at high partition counts — the
  * serial arm at 256 partitions is ~13 min of pure fixed overhead,
  * which is the point already proven at 12. */
object ProfileFamilyApply {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nParts = if (args.length > 1) args(1).toInt else 12
    val pars: Seq[Int] =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, graft.operators.IndexMaintenance.FamilyApplyParallelism)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        pmod(col("doc_id"), lit(nParts)).cast("int").as("route"))
      .localCheckpoint(false)
    val delta = docs.limit(4 * nParts)
      .withColumn("_change", lit("updated"))
      .localCheckpoint(false)
    println(s"[family-probe] corpus=${docs.count()} docs, " +
      s"delta=${delta.count()} rows over $nParts partitions")

    for (par <- pars) {
      System.setProperty("graft.index.familyParallelism", par.toString)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_famprobe_$par").toString + "/fam"
      val t0 = System.nanoTime()
      graft.operators.LexicalIndex.writePartitionedBm25Index(
        docs, root, "route", nBuckets = 8): Unit
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.operators.LexicalIndex.applyPartitionedBm25IndexChanges(
        spark, root, "route", delta, mode = "append"): Unit
      val tApply = (System.nanoTime() - t1) / 1e9
      println(f"[family-probe] parallelism=$par build=$tBuild%.1fs " +
        f"apply=$tApply%.1fs ($nParts partitions, full fan-out)")
    }
    spark.stop()
  }
}
