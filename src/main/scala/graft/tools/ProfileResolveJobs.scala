package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.IdentityResolver
import graft.queries.IdentityQueries

/** Dev-only: time each materialization inside the flagship resolve. */
object ProfileResolveJobs {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, d).count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the whole path once
    IdentityResolver.resolve(IdentityQueries.candidates(spark, d),
      IdentityQueries.registry(spark, d), deterministicMint = true,
      groupingIterations = 1).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    val t0 = System.nanoTime()
    val cand = time("candidates (incl count job)") { IdentityQueries.candidates(spark, d) }
    val reg = IdentityQueries.registry(spark, d)
    // mirror resolve() internals
    val c = cand.select(col("request_id"), col("center_id"),
      col("local_subject_id"), col("identifier_type"),
      lower(col("local_subject_id")).as("_nid"))
    val li = reg.localIds.select(lower(col("local_subject_id")).as("_nid"),
      col("center_id").as("_id_center"), col("global_subject_id").as("_gsid"))
    val subj = reg.subjects.select(col("global_subject_id").as("_gsid"),
      col("created_at").as("_created_at"), lit(false).as("_withdrawn"))
    val matches = c.select(col("request_id"), col("center_id").as("_req_center"), col("_nid"))
      .join(li, "_nid").join(subj, "_gsid")
    // mirrors IdentityResolver's Expand-free shape (size of the
    // collected set, not countDistinct)
    val agg = matches.groupBy("request_id")
      .agg(collect_set(col("_gsid")).as("_mset"))
      .select(col("request_id"), size(col("_mset")).as("_n_matches"))
    val requests = c.groupBy("request_id").agg(max(col("center_id")).as("center_id"))
    val reqs = time("reqs checkpoint") {
      requests.join(agg, Seq("request_id"), "left")
        .withColumn("_n", coalesce(col("_n_matches"), lit(0))).localCheckpoint(true)
    }
    val unmatched = time("unmatchedCand checkpoint") {
      c.join(reqs.filter(col("_n") === 0).select("request_id"), Seq("request_id"), "left_semi")
        .localCheckpoint(true)
    }
    val idLeader = unmatched.select(col("request_id"), col("request_id").as("_leader"), col("_nid"))
    val hop = time("hop + final count") {
      val il = unmatched.join(
        unmatched.select(col("request_id"), col("request_id").as("_l")), "request_id")
        .groupBy("_nid").agg(min("_l").as("_id_leader"))
      unmatched.join(il, "_nid").groupBy("request_id")
        .agg(min("_id_leader").as("_leader"))
        .join(reqs, "request_id").count()
    }
    println(f"[prof] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
