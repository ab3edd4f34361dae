package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema validation (SURVEY.md §2.10 V1-V3).
  *
  * Reproduces `fragment-validator/services/schema_validator.py:42-96`:
  * required-column presence (structural, driver-side) and NOT-NULL
  * counts (one aggregate job over the data — all required columns
  * counted in a single pass, not one scan per column).
  */
object SchemaValidator {

  /** A target-table column spec (the reference fetches these from
    * NocoDB metadata / information_schema at runtime). */
  final case class ColumnSpec(
      name: String,
      required: Boolean = false,
      primaryKey: Boolean = false,
      autoIncrement: Boolean = false)

  final case class ValidationError(errorType: String, column: String, message: String,
      nullCount: Long = 0L)
  final case class ValidationResult(isValid: Boolean, errors: Seq[ValidationError],
      warnings: Seq[String])

  /** Columns the reference always skips (`schema_validator.py:24-31`). */
  val SkipColumns: Set[String] = Set("created_at", "updated_at", "CreatedAt", "UpdatedAt", "Id")

  def validate(df: DataFrame, specs: Seq[ColumnSpec]): ValidationResult = {
    if (specs.isEmpty)
      return ValidationResult(isValid = true, Seq.empty,
        Seq("No columns found for table, skipping schema validation"))

    val checkable = specs.filterNot(c =>
      SkipColumns.contains(c.name) || c.primaryKey || c.autoIncrement)

    val present = df.columns.toSet
    val missing = checkable.filter(c => c.required && !present.contains(c.name)).map(c =>
      ValidationError("missing_required_column", c.name,
        s"Required column '${c.name}' not found in data"))

    // single-pass null counts for present required columns (V2)
    val toCount = checkable.filter(c => c.required && present.contains(c.name))
    val nullErrors =
      if (toCount.isEmpty) Seq.empty
      else {
        val aggs = toCount.map(c =>
          sum(when(col(c.name).isNull, 1L).otherwise(0L)).as(c.name))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        toCount.zipWithIndex.flatMap { case (c, i) =>
          val n = if (row.isNullAt(i)) 0L else row.getLong(i)
          if (n > 0)
            Some(ValidationError("null_in_required_column", c.name,
              s"Column '${c.name}' has $n null values but is NOT NULL", n))
          else None
        }
      }

    val errors = missing ++ nullErrors
    ValidationResult(errors.isEmpty, errors, Seq.empty)
  }

  /** V1/V2 as a data-shaped report (driver-gateable, unlike
    * [[validate]]'s driver-side bundle): one row per checked required
    * column — presence, null count (single-pass aggregate across ALL
    * columns), and the reference's error type when invalid. */
  def nullCountReport(df: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    val checkable = specs.filterNot(c =>
      SkipColumns.contains(c.name) || c.primaryKey || c.autoIncrement)
      .filter(_.required)
    val present = df.columns.toSet
    val (there, missing) = checkable.partition(c => present.contains(c.name))

    val spark = df.sparkSession
    import spark.implicits._
    val missingRows = missing.map(c => (c.name, false, 0L, "missing_required_column"))
      .toDF("column", "present", "null_count", "error_type")

    if (there.isEmpty) return missingRows
    val aggs = there.map(c => sum(when(col(c.name).isNull, 1L).otherwise(0L)).as(c.name))
    val counts = df.agg(aggs.head, aggs.tail: _*)
      .select(explode(map_from_arrays(
        array(there.map(c => lit(c.name)): _*),
        array(there.map(c => coalesce(col(c.name), lit(0L))): _*)))
        .as(Seq("column", "null_count")))
      .select(col("column"), lit(true).as("present"), col("null_count"),
        when(col("null_count") > 0, lit("null_in_required_column"))
          .cast("string").as("error_type"))
    counts.unionByName(missingRows)
  }

  /** V3: duplicate natural keys within a batch — returns offending key
    * groups with counts (`docs data-flow.md:836-846`). */
  def duplicateKeys(df: DataFrame, naturalKey: Seq[String]): DataFrame =
    df.groupBy(naturalKey.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
}
