package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.types.MappingConfig

/** Mapping projection (SURVEY.md §2.2 P1-P5).
  *
  * One declarative `select` reproducing the reference's four mapping
  * steps (`fragment-validator/services/field_mapper.py:36-71`):
  * explicit target←source renames (missing sources skipped with a
  * warning), static literal columns, auto-included subject-ID candidate
  * columns, auto-included center column. Because it is a single
  * projection, Catalyst prunes the parquet scan to exactly the source
  * columns used — the 100 TB version reads only what the mapping names.
  */
object FieldMapper {

  final case class Result(df: DataFrame, warnings: Seq[String])

  def applyMapping(raw: DataFrame, cfg: MappingConfig): Result = {
    val available = raw.columns.toSet
    val warnings = Seq.newBuilder[String]
    // pandas assigns columns by name: a later assignment to the same
    // target overwrites in place (static over mapped) — model with an
    // insertion-ordered map.
    val cols = scala.collection.mutable.LinkedHashMap[String, Column]()

    // 1. explicit renames (field_mapper.py:36-44)
    for ((target, source) <- cfg.fieldMapping) {
      if (available.contains(source)) cols(target) = col(source).as(target)
      else warnings += s"Source field '$source' for target '$target' not found in data"
    }
    // 2. static literal columns (field_mapper.py:47-50) — overwrite wins
    for ((target, value) <- cfg.staticFields)
      cols(target) = lit(value).as(target)
    // 3. auto-include subject-ID candidates (field_mapper.py:53-64)
    for ((cand, _) <- cfg.subjectIdCandidates) {
      if (available.contains(cand)) {
        if (!cols.contains(cand)) cols(cand) = col(cand)
      } else warnings += s"Subject ID candidate '$cand' not found in source data"
    }
    // 4. auto-include center field (field_mapper.py:67-71)
    for (cf <- cfg.centerIdField if available.contains(cf) && !cols.contains(cf))
      cols(cf) = col(cf)

    Result(raw.select(cols.values.toSeq: _*), warnings.result())
  }

  /** P4: drop excluded/system columns before load
    * (`data_transformer.py:94-108`, `loader.py:83-86`). */
  def dropExcluded(df: DataFrame, exclude: Seq[String]): DataFrame =
    df.drop(exclude.filter(df.columns.contains): _*)

  /** P5: schema-intersection projection — keep only target-schema
    * columns (`data_transformer.py:100-107`). */
  def projectToSchema(df: DataFrame, schemaCols: Seq[String]): DataFrame = {
    val keep = df.columns.filter(schemaCols.contains(_))
    df.select(keep.map(col): _*)
  }
}
