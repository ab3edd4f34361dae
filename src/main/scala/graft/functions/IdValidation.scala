package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Subject-ID quality validation (SURVEY.md §2.3 F10, §2.10 V4).
  *
  * Faithful column-expression re-expression of the reference's severity
  * ladder (`gsid-service/services/id_validator.py:13-111`): error
  * patterns short-circuit to invalid; warning patterns accumulate in
  * reference order (including its duplicate short-ID message when both
  * the short-alpha pattern and the final length check fire).
  * Pure built-ins — codegen'd, no UDF.
  */
object IdValidation {

  /** Error patterns — case-insensitive search (`id_validator.py:13-21`). */
  val ErrorPatterns: Seq[String] =
    Seq("^test", "^demo", "^example", "^0+$", "^9+$", "^x+$")

  /** Identifier types for which numeric-only IDs are fine
    * (`id_validator.py:33-37`). */
  val NumericAllowedTypes: Seq[String] = Seq("niddk_no", "sample_id", "record_id")

  /** validate_id(id, type) → struct(valid, severity, warnings).
    * `idType` is a column so per-row identifier types (specimen
    * mapping's `subject_id_type_field`) work. */
  def validate(id: Column, idType: Column): Column = {
    val s = trim(id)
    val empty = id.isNull || s === ""
    // re.IGNORECASE re.search — anchor handled inside each pattern
    val errorPat = ErrorPatterns
      .map(p => s.rlike("(?i)" + p))
      .reduce(_ || _)
    val firstError = ErrorPatterns
      .foldLeft(lit(null).cast("string")) { (acc, p) =>
        coalesce(acc, when(s.rlike("(?i)" + p), lit(s"ID matches error pattern: $p")))
      }

    val n = length(s)
    val shortNumeric = s.rlike("^[0-9]{1,3}$")
    val shortAlpha   = s.rlike("^[a-z]{1,2}$") // case-sensitive, as in the reference
    val hasWs        = s.rlike("\\s")
    val hasSpecial   = s.rlike("[^a-zA-Z0-9_-]")
    val numericOnly  = s.rlike("^[0-9]+$") && !idType.isin(NumericAllowedTypes.map(lit): _*)
    val tooShort     = n < 3

    val warnings = filter(
      array(
        when(shortNumeric, concat(lit("ID is very short ("), n, lit(" digits)"))),
        when(shortAlpha, concat(lit("ID is very short ("), n, lit(" characters)"))),
        when(hasWs, lit("ID contains whitespace")),
        when(hasSpecial, lit("ID contains special characters")),
        when(numericOnly,
          concat(lit("ID is purely numeric for type '"), idType, lit("' (may be ambiguous)"))),
        when(tooShort, concat(lit("ID is very short ("), n, lit(" characters)")))),
      x => x.isNotNull)

    when(empty, struct(
        lit(false).as("valid"),
        lit("error").as("severity"),
        array(lit("ID is empty or whitespace")).as("warnings")))
      .when(errorPat, struct(
        lit(false).as("valid"),
        lit("error").as("severity"),
        array(firstError).as("warnings")))
      .otherwise(struct(
        lit(true).as("valid"),
        when(size(warnings) > 0, lit("warning")).otherwise(lit("info")).as("severity"),
        warnings.as("warnings")))
  }

  def validate(id: Column): Column = validate(id, lit("primary"))
}
