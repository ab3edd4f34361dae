package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ-style check
  * battery a production pipeline runs before publishing a load; the
  * reference's per-load validation — `fragment-validator/services/
  * schema_validator.py:21-88` null/enum checks, `01-schema.sql`
  * UNIQUE/CHECK clauses — generalized into a one-pass audit).
  *
  * All row-level constraints compile into a SINGLE `agg` over one scan
  * — conditional sums plus exact count-distincts — so auditing a table
  * costs one job regardless of how many constraints are declared.
  * Scale note: every [[Constraints.Unique]] adds a distinct-aggregate,
  * and Spark plans multiple distinct aggregates via one Expand of the
  * scan (rows × distinct-groups); for audits with MANY uniqueness
  * checks over a 100 TB table, split them into separate passes or
  * pre-aggregate on the key. Everything else is a plain conditional
  * sum that partial-aggregates map-side.
  *
  * Result rows: (check_name, target, violations, passed) — exact
  * counts, so the whole audit is hash-gateable.
  */
object Constraints {

  sealed trait Constraint
  /** Column must have no nulls. */
  final case class NotNull(column: String) extends Constraint
  /** Column tuple must be unique across rows; violations = surplus
    * rows beyond one per distinct value (nulls count like values). */
  final case class Unique(columns: Seq[String]) extends Constraint
  /** Column must be one of `allowed` (nulls violate) — the CHECK-enum
    * shape. */
  final case class InSet(column: String, allowed: Seq[String]) extends Constraint
  /** Column must lie in [lo, hi] (nulls violate). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Constraint
  /** Table row count must lie in [lo, hi]; violations is 0 or 1. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Constraint

  private def describe(c: Constraint): (String, String) = c match {
    case NotNull(col)        => ("not_null", col)
    case Unique(cols)        => ("unique", cols.mkString(","))
    case InSet(col, allowed) => ("in_set", s"$col{${allowed.mkString("|")}}")
    case InRange(col, lo, hi) => ("in_range", s"$col[$lo,$hi]")
    case RowCountBetween(lo, hi) => ("row_count", s"[$lo,$hi]")
  }

  private def violations(df: DataFrame, c: Constraint): Column = c match {
    case NotNull(c0) =>
      sum(when(df(c0).isNull, 1L).otherwise(0L))
    case Unique(cols) =>
      // distinct over the STRUCT, not the bare columns: SQL's
      // count(DISTINCT a, b) silently drops rows where any column is
      // null, which would count every null-keyed row as a violation;
      // the struct wrapper is never null, so null field values compare
      // as values (the documented semantics)
      count(lit(1)) - countDistinct(struct(cols.map(df(_)): _*))
    case InSet(c0, allowed) =>
      sum(when(df(c0).isNull || !df(c0).isin(allowed.map(lit): _*), 1L).otherwise(0L))
    case InRange(c0, lo, hi) =>
      sum(when(df(c0).isNull || df(c0) < lo || df(c0) > hi, 1L).otherwise(0L))
    case RowCountBetween(lo, hi) =>
      when(count(lit(1)).between(lo, hi), 0L).otherwise(1L)
  }

  /** Run every constraint in one aggregation pass; one result row per
    * constraint, ordered (check_name, target) for stable output. */
  def check(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    require(cs.nonEmpty, "no constraints declared")
    val aggExprs = cs.zipWithIndex.map { case (c, i) =>
      coalesce(violations(df, c), lit(0L)).as(s"_v$i")
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = cs.zipWithIndex.map { case (c, i) =>
      val (name, target) = describe(c)
      struct(lit(name).as("check_name"), lit(target).as("target"),
        col(s"_v$i").cast("long").as("violations"),
        (col(s"_v$i") === 0L).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("_r"))
      .select(col("_r.check_name"), col("_r.target"),
        col("_r.violations"), col("_r.passed"))
      .orderBy("check_name", "target")
  }
}
