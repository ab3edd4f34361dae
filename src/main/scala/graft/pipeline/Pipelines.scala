package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Sources
import graft.types.{MappingConfig, TableConfig}

/** End-to-end pipelines (SURVEY.md §3) wiring the operators into the
  * reference's three entry points. Each stage is a DataFrame
  * transformation; the whole pipeline is ONE lineage with a handful of
  * actions (writes), not the reference's eight process/REST boundaries.
  */
object Pipelines {

  final case class ValidateResult(
      mapped: DataFrame,
      schemaResult: SchemaValidator.ValidationResult,
      resolutions: DataFrame,
      localIds: DataFrame,
      conflicts: DataFrame,
      warnings: Seq[String])

  /** §3.1 fragment-validator: raw CSV → mapped → schema-validated →
    * GSID-resolved → conflicts detected → staged.
    *
    * The reference's stage 4 (a 20-worker REST fan-out per row) is the
    * IdentityResolver batch join; stage 5's NocoDB full-table scan is
    * the registry DataFrame the caller passes in.
    */
  def validate(
      spark: SparkSession,
      raw: DataFrame,
      mapping: MappingConfig,
      schemaSpecs: Seq[SchemaValidator.ColumnSpec],
      registry: IdentityResolver.Registry,
      batchId: String,
      deterministicMint: Boolean = true): ValidateResult = {

    // 1-2: mapping projection (P1-P3)
    val m = FieldMapper.applyMapping(raw, mapping)

    // 3: schema validation (V1-V2) — fail fast like the reference
    val sv = SchemaValidator.validate(m.df, schemaSpecs)
    if (!sv.isValid)
      return ValidateResult(m.df, sv, emptyResolutions(spark), emptyLocalIds(spark),
        emptyConflicts(spark), m.warnings)

    // 4: identity resolution (§2.9) — candidates from the configured
    // subject-id columns, one row per (row, candidate column)
    val withRow = m.df.withColumn("_row_id", monotonically_increasing_id())
    val centerCol = mapping.centerIdField
      .map(c => coalesce(col(c).cast("int"), lit(mapping.defaultCenterId)))
      .getOrElse(lit(mapping.defaultCenterId))
    val candidates = mapping.subjectIdCandidates.map { case (column, idType) =>
      withRow.filter(col(column).isNotNull && trim(col(column)) =!= "")
        .select(col("_row_id").as("request_id"), centerCol.as("center_id"),
          col(column).cast("string").as("local_subject_id"), lit(idType).as("identifier_type"))
    }.reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataFrame)

    val resolutions = IdentityResolver.resolve(candidates, registry, deterministicMint)
    val mapped = withRow.join(
      resolutions.select(col("request_id").as("_row_id"), col("gsid").as("global_subject_id")),
      Seq("_row_id"), "left")

    // side output: the local_subject_ids fragment (validator.py:111-115)
    val localIds = IdentityResolver.links(candidates, resolutions, registry.localIds)

    // 5: conflict detection (J5) vs the registry
    val conflicts = ConflictDetector.detect(
      localIds, registry.localIds, batchId)

    ValidateResult(mapped.drop("_row_id"), sv, resolutions, localIds, conflicts, m.warnings)
  }

  final case class LoadResult(
      merged: DataFrame,
      audit: DataFrame,
      preview: DataFrame)

  /** §3.3 table-loader: staged fragment → exclusions → type coercion →
    * schema projection → MERGE with audit. `dryRun` computes
    * everything but publishes nothing (U7). */
  def load(
      spark: SparkSession,
      current: DataFrame,
      fragment: DataFrame,
      cfg: TableConfig,
      columnTypes: Map[String, String],  // reference-style type names per column
      excluded: Seq[String] = Seq.empty,
      resolvedExclusions: Option[DataFrame] = None, // (local_subject_id, identifier_type)
      batchId: String = "",
      targetDir: Option[String] = None,
      dryRun: Boolean = true): LoadResult = {

    // exclusion filters (P7/U4): rows whose id was resolved away
    val afterExclusion = resolvedExclusions match {
      case Some(ex) if fragment.columns.contains("local_subject_id") =>
        fragment.join(ex, Seq("local_subject_id", "identifier_type"), "left_anti")
      case _ => fragment
    }

    // type coercion (F1-F7) + column exclusion (P4) + schema projection (P5)
    val coerced = afterExclusion.select(afterExclusion.columns.map { c =>
      columnTypes.get(c)
        .map(t => graft.functions.Coercions.coerceTo(col(c), t).as(c))
        .getOrElse(col(c))
    }: _*)
    val projected = FieldMapper.projectToSchema(
      FieldMapper.dropExcluded(coerced, excluded ++ TableConfig.systemColumns.toSeq),
      current.columns.toSeq)

    val result = UpsertWriter.merge(current, projected, cfg, batchId = batchId)
    if (!dryRun) targetDir.foreach(dir => Sources.publishSnapshot(result.merged, dir))
    LoadResult(result.merged, result.audit, result.preview)
  }

  private def emptyResolutions(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq.empty))
  private def emptyLocalIds(spark: SparkSession): DataFrame = emptyResolutions(spark)
  private def emptyConflicts(spark: SparkSession): DataFrame = emptyResolutions(spark)
}
