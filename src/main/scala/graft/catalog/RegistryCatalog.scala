package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Registry table catalog (SURVEY.md §7.1 `catalog/`).
  *
  * The scale-bearing join in this engine is candidates ⋈
  * local_subject_ids on the normalized identifier (§2.9 J1). At 100 TB
  * the registry should be BUCKETED on that key so repeated resolution
  * batches never reshuffle the registry side: we persist
  * `local_subject_ids` with a precomputed `norm_id` column, bucketed
  * and sort-ordered by it. Readers then join on `norm_id` and Spark
  * plans the registry side without an Exchange (verified in
  * CatalogSpec by asserting the plan shape).
  */
object RegistryCatalog {

  val LocalIdsTable = "graft_local_subject_ids"
  val SubjectsTable = "graft_subjects"

  /** Persist the registry bucketed by the join keys. `buckets` should
    * scale with registry size (≈ one bucket per target partition). */
  def publish(spark: SparkSession, subjects: DataFrame, localIds: DataFrame,
      buckets: Int = 32): Unit = {
    localIds
      .withColumn("norm_id", lower(col("local_subject_id")))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "norm_id").sortBy("norm_id")
      .format("parquet")
      .saveAsTable(LocalIdsTable)
    subjects
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "global_subject_id").sortBy("global_subject_id")
      .format("parquet")
      .saveAsTable(SubjectsTable)
  }

  def localIds(spark: SparkSession): DataFrame = spark.table(LocalIdsTable)
  def subjects(spark: SparkSession): DataFrame = spark.table(SubjectsTable)

  /** Registry-side-shuffle-free candidate match: repartition the
    * (small) batch to the registry's bucketing, join on `norm_id`. */
  def matchCandidates(spark: SparkSession, candidates: DataFrame): DataFrame = {
    val li = localIds(spark)
    candidates
      .withColumn("norm_id", lower(col("local_subject_id")))
      .join(li.select(col("norm_id"), col("center_id").as("registry_center_id"),
        col("global_subject_id")), "norm_id")
  }
}
