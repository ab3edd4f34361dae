package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless point-in-interval (range) join via time binning.
  *
  * Spark plans a bare `p.ts BETWEEN i.start AND i.end` join as a
  * broadcast-nested-loop / cartesian — |points| x |intervals| work, the
  * classic scale cliff. Binning restores an equi-join: every point maps
  * to exactly ONE bin of width `binMicros`; every interval explodes to
  * the bins it overlaps (bounded by length/binWidth + 1 rows); the join
  * is hash-partitioned on the bin and the exact BETWEEN predicate
  * refines survivors. Each (point, interval) pair meets exactly once —
  * the point's bin is unique — so no dedup pass is needed. Shuffle
  * volume is |points| + Σ interval spans, never the cross product; a
  * hot bin (event burst) is ordinary AQE shuffle skew.
  *
  * Both timestamp columns are compared in epoch microseconds.
  */
object RangeJoin {

  /** Inner point-in-interval join: every (interval row, point row) pair
    * with startTs ≤ point ts ≤ endTs; all columns of both sides kept
    * (names must not collide). */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointTs: String, startTs: String, endTs: String,
      binMicros: Long = 3600L * 1000000L): DataFrame = {
    val pUs: Column = unix_micros(col(pointTs))
    val sUs: Column = unix_micros(col(startTs))
    val eUs: Column = unix_micros(col(endTs))

    val p = points.withColumn("_bin", floor(pUs / binMicros))
    val i = intervals.withColumn("_bin",
      explode(sequence(floor(sUs / binMicros), floor(eUs / binMicros))))
    p.join(i, Seq("_bin"))
      .filter(unix_micros(col(pointTs)).between(
        unix_micros(col(startTs)), unix_micros(col(endTs))))
      .drop("_bin")
  }
}
