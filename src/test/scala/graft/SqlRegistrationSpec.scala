package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** SQL views over the engine's own table formats: a published
  * merge-partitioned table and a snapshot table register as temp
  * views with pointer-resolution (snapshot-isolation) semantics —
  * the SQL-first user's path onto engine-managed storage. */
class SqlRegistrationSpec extends SparkSpec {
  import spark.implicits._

  test("merge table registers as a SQL view; re-register picks up the next publish") {
    val dir = Files.createTempDirectory("graft_sqlreg").toString + "/t"
    val cfg = graft.types.TableConfig("t", Seq("k"), Seq.empty)
    def batch(lo: Long, hi: Long, tag: String) =
      (lo to hi).map(i => (i, tag)).toDF("k", "tag")
        .withColumn("p", (col("k") % 2).cast("int"))
    Sources.publishMergePartitioned(spark, dir, batch(1, 10, "v1"), cfg, "p")
    GraftSql.registerMergeTable(spark, "t_merge", dir, "p")
    val n1 = spark.sql("SELECT COUNT(*) AS n FROM t_merge").collect()(0).getLong(0)
    assert(n1 == 10L)
    // partition predicate prunes through the view
    val pruned = spark.sql("SELECT COUNT(*) AS n FROM t_merge WHERE p = 1")
      .collect()(0).getLong(0)
    assert(pruned == 5L)

    // a later publish is NOT visible to the registered view
    // (snapshot isolation at registration) until re-registered
    Sources.publishMergePartitioned(spark, dir, batch(11, 14, "v2"), cfg, "p")
    val still = spark.sql("SELECT COUNT(*) AS n FROM t_merge").collect()(0).getLong(0)
    assert(still == 10L)
    GraftSql.registerMergeTable(spark, "t_merge", dir, "p")
    val n2 = spark.sql("SELECT COUNT(*) AS n FROM t_merge").collect()(0).getLong(0)
    assert(n2 == 14L)
  }

  test("snapshot table registers as a SQL view over the live version") {
    val root = Files.createTempDirectory("graft_sqlsnap").toString + "/s"
    Sources.publishSnapshot(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    GraftSql.registerSnapshotTable(spark, "t_snap", root)
    assert(spark.sql("SELECT COUNT(*) AS n FROM t_snap").collect()(0).getLong(0) == 2L)
    Sources.publishSnapshot(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), root)
    GraftSql.registerSnapshotTable(spark, "t_snap", root)
    assert(spark.sql("SELECT COUNT(*) AS n FROM t_snap").collect()(0).getLong(0) == 3L)
  }
}
