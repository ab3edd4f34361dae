package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{IdentityResolver, IncrementalIdentity}
import graft.sources.Sources

/** Dev-side measurement (not driver-run) of the VERDICT r10 ask:
  * drive `IncrementalIdentity.resolveCycle` over ≥20 cycles against a
  * LARGE seeded registry and measure per-cycle wall-time FLATNESS —
  * per-cycle cost must track the (constant) delta size, not the
  * (growing) registry size. Candidates derive from the sf table's
  * customer keys; every delta mints fresh identifiers so the registry
  * grows monotonically while the delta stays fixed.
  *
  * Usage: runMain graft.tools.ProfileIdentityCycles <sfDir> [cycles] [deltaRows]
  * Prints one line per cycle: cycle index, delta rows, registry
  * local-id rows BEFORE the cycle, wall seconds.
  */
object ProfileIdentityCycles {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val cycles = if (args.length > 1) args(1).toInt else 22
    val deltaRows = if (args.length > 2) args(2).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_idcycles").toString
    val (fragDir, ckDir, regRoot) = (s"$root/frags", s"$root/ck", s"$root/reg")
    val cfg = graft.types.TableConfig("fragments", Seq("request_id"), Seq.empty)
    val day = java.sql.Date.valueOf("2024-01-01")

    // empty seed registry with the resolver's schema
    val subjects0 = Seq.empty[(String, Int, String)]
      .toDF("global_subject_id", "center_id", "created_at")
      .withColumn("created_at", col("created_at").cast("date"))
    val localIds0 = Seq.empty[(Int, String, String, String)]
      .toDF("center_id", "local_subject_id", "identifier_type", "global_subject_id")
    IncrementalIdentity.publishRegistry(
      IdentityResolver.Registry(subjects0, localIds0), regRoot)

    /** Fragments batch [fromId, fromId+n): fresh identifiers each. */
    def frag(fromId: Long, n: Long): DataFrame =
      spark.range(fromId, fromId + n)
        .select(col("id").as("request_id"),
          (col("id") % 7).cast("int").as("center_id"),
          concat(lit("SUBJ-"), col("id")).as("local_subject_id"),
          lit("primary").as("identifier_type"),
          (col("id") % 8).cast("int").as("p"))

    def cycleOnce(label: String, fromId: Long, n: Long): Double = {
      Sources.publishMergePartitioned(spark, fragDir, frag(fromId, n), cfg, "p")
      val t0 = System.nanoTime()
      val c = IncrementalIdentity.resolveCycle(spark, fragDir, ckDir, regRoot,
        Seq("request_id"), day, "p", groupingIterations = 1)(identity)
      require(c.isDefined && c.get.resolutions.count() == n, s"$label bad cycle")
      (System.nanoTime() - t0) / 1e9
    }

    // SEED: one big batch sized to the sf table (sf1 customer =
    // 150k keys) so the registry starts large
    val seedN = spark.read.parquet(s"$sfDir/customer.parquet").count()
    val tSeed = cycleOnce("seed", 0L, seedN)
    println(f"[cycles] seed: delta=$seedN%d registry_before=0 wall=$tSeed%.2f s")

    var nextId = seedN
    (1 to cycles).foreach { i =>
      val regSize = IncrementalIdentity.readRegistry(spark, regRoot)
        .localIds.count()
      val t = cycleOnce(s"c$i", nextId, deltaRows.toLong)
      println(f"[cycles] c$i%02d: delta=$deltaRows%d registry_before=$regSize%d wall=$t%.2f s")
      nextId += deltaRows
    }
    spark.stop()
  }
}
