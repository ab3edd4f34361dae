package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.types.TableConfig

/** U8: `fragment_resolutions` load bookkeeping
  * (`table-loader/services/fragment_resolution.py:224-300`, schema
  * `database/init-scripts/01-schema.sql:210-242`).
  *
  * The reference records one row per (batch_id, table_name,
  * fragment_key) with INSERT … ON CONFLICT DO UPDATE — i.e. a keyed
  * MERGE, last write wins on the load statistics. Re-expressed here as
  * the same full-outer-join MERGE that backs U1 ([[UpsertWriter]]), so
  * at scale it shuffles on the three-part key exactly once.
  */
object LoadBookkeeping {

  /** Tables loaded with the upsert strategy
    * (`fragment_resolution.py:244-256`). */
  val UpsertTables: Set[String] = Set(
    "lcl", "enteroid", "specimen", "genotype", "sequence", "olink",
    "local_subject_ids")

  val ValidStatuses: Set[String] = Set("success", "partial", "failed", "skipped", "preview")

  private val Key = Seq("batch_id", "table_name", "fragment_key")

  /** Normalize raw per-load rows into fragment_resolutions shape:
    * derive fragment_key + load_strategy, default rows_attempted =
    * loaded + failed, coerce invalid statuses to 'success'
    * (`fragment_resolution.py:236-261`).
    *
    * `loads` columns: batch_id, table_name, rows_loaded, rows_failed
    * (optional, default 0), load_status (optional), error_message
    * (optional), rows_attempted (optional). */
  def normalize(loads: DataFrame, createdBy: String = "table_loader"): DataFrame = {
    val c = loads.columns.toSet
    val withDefaults = Seq(
      "rows_failed" -> lit(0L),
      "load_status" -> lit("success"),
      "error_message" -> lit(null).cast("string"),
      "rows_attempted" -> lit(null).cast("long"))
      .foldLeft(loads) { case (df, (name, default)) =>
        if (c(name)) df else df.withColumn(name, default)
      }
    withDefaults.select(
      col("batch_id"), col("table_name"),
      concat(lit("staging/validated/"), col("batch_id"), lit("/"),
        col("table_name"), lit(".csv")).as("fragment_key"),
      when(col("load_status").isin(ValidStatuses.toSeq.map(lit): _*), col("load_status"))
        .otherwise(lit("success")).as("load_status"),
      when(col("table_name").isin(UpsertTables.toSeq.map(lit): _*), lit("upsert"))
        .otherwise(lit("standard_insert")).as("load_strategy"),
      coalesce(col("rows_attempted"),
        col("rows_loaded").cast("long") + col("rows_failed").cast("long"))
        .as("rows_attempted"),
      col("rows_loaded").cast("long").as("rows_loaded"),
      col("rows_failed").cast("long").as("rows_failed"),
      col("error_message"),
      lit(createdBy).as("created_by"))
  }

  /** MERGE normalized load rows into the bookkeeping table: new keys
    * insert, existing keys take the incoming statistics (the reference's
    * ON CONFLICT DO UPDATE). */
  def record(bookkeeping: DataFrame, loads: DataFrame,
      createdBy: String = "table_loader"): DataFrame =
    UpsertWriter.merge(bookkeeping, normalize(loads, createdBy),
      TableConfig("fragment_resolutions", Key, Seq.empty)).merged
}
