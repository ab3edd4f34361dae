package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, StringType}

/** Full-outer change detection (SURVEY.md §2.4 J4, §2.8 groundwork).
  *
  * Set-based re-expression of the reference's composite-key lookup
  * loops (`fragment-validator/services/update_detector.py:114-217`,
  * `table-loader/services/fragment_resolution.py:67-96`): one
  * full-outer shuffle join on the natural key classifies every row as
  * new / orphaned / updated / unchanged and carries a per-field change
  * map for the audit log. At scale both sides shuffle-partition on the
  * same key, so the join is co-located; no driver-side lookups exist.
  *
  * Value comparison matches `_records_differ` (`update_detector.py:219-241`):
  * system fields ignored, None/NaN/"" all normalize to null, then
  * null-safe equality.
  */
object ChangeDetector {

  /** `update_detector.py:26-32`. */
  val IgnoreFields: Set[String] = Set("Id", "created_at", "updated_at", "CreatedAt", "UpdatedAt")

  /** Normalize a value for comparison: "" → null (strings), NaN → null
    * (floating), otherwise unchanged. */
  private def norm(df: DataFrame, name: String): Column = {
    val c = df(name)
    df.schema(name).dataType match {
      case StringType => when(c === "", lit(null)).otherwise(c)
      case DoubleType | FloatType => when(isnan(c), lit(null)).otherwise(c)
      case _ => c
    }
  }

  /** Compare incoming vs existing on `naturalKey`.
    *
    * Output: natural-key columns, `change_status`
    * ('new'|'orphaned'|'updated'|'unchanged'), `changed_fields`
    * (name-sorted array), `changes` (map field → struct(old, new),
    * values stringified for a stable audit payload).
    */
  def compare(
      incoming: DataFrame,
      existing: DataFrame,
      naturalKey: Seq[String],
      ignore: Set[String] = IgnoreFields): DataFrame = {

    val compareCols = incoming.columns.intersect(existing.columns)
      .filterNot(naturalKey.contains).filterNot(ignore.contains).toSeq.sorted

    val inc = incoming.select(
      (naturalKey.map(incoming(_)) :+ lit(true).as("_in_present")) ++
        compareCols.map(c => norm(incoming, c).as(s"_in_$c")): _*)
    val exs = existing.select(
      (naturalKey.map(existing(_)) :+ lit(true).as("_ex_present")) ++
        compareCols.map(c => norm(existing, c).as(s"_ex_$c")): _*)

    // using-style full outer join coalesces the key columns
    val joined = inc.join(exs, naturalKey, "full_outer")

    val diffs: Seq[(String, Column)] =
      compareCols.map(c => c -> !(col(s"_in_$c") <=> col(s"_ex_$c")))

    val changedFields = sort_array(filter(
      array(diffs.map { case (name, d) => when(d, lit(name)) }: _*),
      x => x.isNotNull))

    val changes = map_filter(
      map_from_arrays(
        array(diffs.map { case (name, _) => lit(name) }: _*),
        array(diffs.map { case (name, d) =>
          when(d, struct(
            col(s"_ex_$name").cast("string").as("old"),
            col(s"_in_$name").cast("string").as("new")))
        }: _*)),
      (_, v) => v.isNotNull)

    val status = when(col("_ex_present").isNull, lit("new"))
      .when(col("_in_present").isNull, lit("orphaned"))
      .when(size(changedFields) > 0, lit("updated"))
      .otherwise(lit("unchanged"))

    joined.select(
      naturalKey.map(col) ++ Seq(
        status.as("change_status"),
        when(status === "updated", changedFields).otherwise(array().cast("array<string>"))
          .as("changed_fields"),
        when(status === "updated", changes).otherwise(
          map_from_arrays(array().cast("array<string>"),
            array().cast("array<struct<old:string,new:string>>"))).as("changes")): _*)
  }

  /** A3: counts of new/updated/unchanged/orphaned
    * (`update_detector.py:194-217`). */
  def summary(compared: DataFrame): DataFrame =
    compared.groupBy("change_status").agg(count(lit(1)).as("n"))

  /** SCD Type-2 history from a sequence of snapshots: collapse
    * per-key snapshot rows to the rows where any tracked column
    * CHANGED (null-safe), and stamp each surviving version with its
    * validity interval — `valid_from` = its snapshot timestamp,
    * `valid_to` = the next version's (null for the current version).
    * The dimension-history answer to "what was this row's state at
    * time T" that the reference approximates with its audit log
    * (`table-loader/services/loader.py` audit inserts), queryable by
    * a plain `valid_from <= T < coalesce(valid_to, inf)` predicate
    * (or the as-of join).
    *
    * Scale: both windows key on the natural key and order by snapshot
    * ts — ONE shuffle; the second window (lead over the filtered
    * change rows) reuses the first's partitioning, so Catalyst plans
    * no second exchange. Rows per key = versions, not snapshots. */
  def scd2History(snapshots: DataFrame, keys: Seq[String], tsCol: String,
      trackedCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val changed = trackedCols.map(c =>
      !(col(c) <=> lag(col(c), 1).over(w))).reduce(_ || _)
    snapshots
      .withColumn("_rn", row_number().over(w))
      .withColumn("_chg", col("_rn") === 1 || changed)
      .filter(col("_chg"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .drop("_rn", "_chg", tsCol)
  }
}
