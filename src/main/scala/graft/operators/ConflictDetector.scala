package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conflict detection (SURVEY.md §2.4 J5, §2.5 A2).
  *
  * Set-based re-expression of
  * `fragment-validator/services/conflict_detector.py:20-104`: the
  * incoming batch's distinct `(local_subject_id, identifier_type,
  * center_id, global_subject_id)` tuples join ALL existing registry
  * rows on `(local_subject_id, identifier_type)`; a differing center
  * emits `center_mismatch`, else a differing GSID emits `multi_gsid`
  * (reference checks center first — elif — so one existing row yields
  * at most one conflict).
  *
  * Scale: the registry side is the large one; this is a plain
  * shuffle hash join on the two-column key. The incoming side is a
  * batch (small) — Spark will broadcast it under AQE when it fits.
  */
object ConflictDetector {

  /** Both inputs need columns: local_subject_id, identifier_type,
    * center_id, global_subject_id. */
  def detect(incoming: DataFrame, existing: DataFrame, batchId: String): DataFrame = {
    val in = incoming
      .select("local_subject_id", "identifier_type", "center_id", "global_subject_id")
      .dropDuplicates("local_subject_id", "identifier_type", "center_id", "global_subject_id")
      .withColumnRenamed("center_id", "incoming_center_id")
      .withColumnRenamed("global_subject_id", "incoming_gsid")
    val ex = existing
      .select(
        col("local_subject_id"), col("identifier_type"),
        col("center_id").as("existing_center_id"),
        col("global_subject_id").as("existing_gsid"))

    in.join(ex, Seq("local_subject_id", "identifier_type"))
      .withColumn("conflict_type",
        when(!(col("existing_center_id") <=> col("incoming_center_id")), lit("center_mismatch"))
          .when(!(col("existing_gsid") <=> col("incoming_gsid")), lit("multi_gsid")))
      .filter(col("conflict_type").isNotNull)
      .select(
        lit(batchId).as("batch_id"),
        col("conflict_type"), col("local_subject_id"), col("identifier_type"),
        col("existing_center_id"), col("incoming_center_id"),
        col("existing_gsid"), col("incoming_gsid"),
        lit(null).cast("string").as("resolution_action"))
  }

  /** A2: conflict summary by type (`conflict_detector.py:184-198`). */
  def summary(conflicts: DataFrame): DataFrame =
    conflicts.groupBy("conflict_type").agg(count(lit(1)).as("n"))
}
