package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-shape column statistics: one row per column with row count,
  * null count, exact distinct count, and min/max (computed on the
  * native type, then rendered as strings so heterogeneous columns
  * stack into one result).
  *
  * Scale shape: one aggregate job per column over a pruned single-
  * column scan, unioned — each aggregate is map-side partial, and
  * column pruning means a 100-column table scans only the requested
  * columns. Exact distinct counts shuffle the column values; swap in
  * approx_count_distinct when estimation suffices. */
object TableStats {

  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionByName _)
}
