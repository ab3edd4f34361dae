package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** EXACT heavy hitters at scale, two passes (the classic
  * sketch-then-verify composition):
  *
  *  1. a [[MisraGries]] sweep with `sketchK` counters per task —
  *     O(k) state, mergeable, no shuffle of values — yields ≤ sketchK
  *     candidates guaranteed to include every value with frequency
  *     > n/(sketchK+1);
  *  2. an exact recount of ONLY the candidates (broadcast semi-join
  *     prunes the scan's output before the aggregation, so the hash
  *     agg sees ≤ sketchK distinct keys), filtered to frequency
  *     > n/thresholdK against the broadcast one-row total.
  *
  * Because the threshold n/thresholdK ≥ n/(sketchK+1) (enforced), the
  * candidate set provably covers every qualifying value, and the exact
  * filter removes the sketch's order-dependent extras — the output is
  * EXACTLY {v : freq(v) * thresholdK > n}, deterministic and
  * oracle-comparable, with nothing resembling a full GROUP BY of the
  * value domain anywhere in the plan. Nulls are excluded from both
  * the counts and the total. */
object HeavyHitters {

  def exact(df: DataFrame, valueCol: String, sketchK: Int,
      thresholdK: Int): DataFrame = {
    require(thresholdK <= sketchK,
      s"threshold n/$thresholdK below the sketch guarantee n/${sketchK + 1}: " +
        "raise sketchK or lower thresholdK")
    val vals = df.select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
    // candidates and the exact total ride the SAME one-row aggregate
    // (genuinely two scans): the lazy localCheckpoint materializes that
    // row once, on first action — the operator stays lazy like every
    // other DataFrame-in/DataFrame-out operator here, both consumers
    // below share the single sketch job, and the checkpoint pins the
    // candidate set against a source that changes between passes
    val sketch = vals.agg(
      MisraGries.candidates(col("value"), sketchK).as("_c"),
      count(lit(1)).as("_total")).localCheckpoint(false)
    val cands = sketch.select(explode(col("_c")).as("value"))
    vals.join(broadcast(cands), Seq("value"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sketch.select("_total")))
      .filter(col("n") * thresholdK > col("_total"))
      .select("value", "n")
  }
}
