package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CHECK-constraint validation with quarantine side-output
  * (SURVEY.md §1.2, §7.4: the reference's enum/CHECK constraints —
  * `01-schema.sql:93-112,231-256` — become validation filters that
  * route violating rows to a quarantine table instead of failing the
  * load).
  *
  * One pass computes per-rule verdicts; the two outputs are filters of
  * the same lineage, so Spark executes a single scan feeding both
  * writes (or two cheap scans — never a row-at-a-time validator).
  */
object Quarantine {

  final case class Rule(name: String, predicate: Column)

  final case class Split(valid: DataFrame, quarantined: DataFrame)

  /** Enum-membership rule (`status IN (…)` CHECK). */
  def enumRule(name: String, c: Column, allowed: Seq[String]): Rule =
    Rule(name, c.isin(allowed.map(lit): _*))

  def split(df: DataFrame, rules: Seq[Rule]): Split = {
    val violations = sort_array(filter(
      array(rules.map(r => when(!coalesce(r.predicate, lit(false)), lit(r.name))): _*),
      v => v.isNotNull))
    val flagged = df.withColumn("violations", violations)
    Split(
      valid = flagged.filter(size(col("violations")) === 0).drop("violations"),
      quarantined = flagged.filter(size(col("violations")) > 0))
  }
}
