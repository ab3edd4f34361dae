package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a keyed aggregate snapshot — the
  * materialized-view delta merge a 100 TB nightly pipeline needs:
  * updating `GROUP BY` state from a day's delta must cost O(|delta| +
  * |touched keys|), never a rescan of the base facts (the same
  * snapshot-in/snapshot-out posture as [[UpsertWriter.merge]], applied
  * to aggregates; the reference recomputes its rollup views per load —
  * `01-schema.sql`'s summary views — which this replaces at scale).
  *
  * State rows carry the COMBINABLE components (count, exact DECIMAL
  * sum, min, max) keyed by the group columns; derived values (mean
  * etc.) are computed at read time from components. [[merge]] is one
  * map-side-combined partial aggregation of the delta plus one keyed
  * shuffle of (state ∪ delta-partials) — associativity of the
  * components makes merged-state ≡ full recompute, which is exactly
  * what the oracle gate checks. The DECIMAL sum keeps the equivalence
  * EXACT (a DOUBLE sum would drift with reduction order). Components
  * are re-normalized to DECIMAL(28,2) each cycle so repeated
  * maintenance rounds keep a fixed schema (capacity 1e26 — overflow
  * surfaces as null under ANSI rather than silent wrap).
  *
  * min/max are insert-only maintainable; retraction deltas (CDC
  * deletes) would need per-key re-aggregation of the base for the
  * touched keys — out of scope here, matching the insert-append shape
  * of the reference's load pipeline.
  */
object IncrementalAgg {

  /** Aggregate a fact slice into combinable components (the same
    * function initializes state and folds a delta). */
  def partial(facts: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    facts.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("agg_n"),
      sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(28,2)").as("agg_sum"),
      min(col(valueCol)).as("agg_min"),
      max(col(valueCol)).as("agg_max"))

  /** Fold a delta of new fact rows into existing component state. */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    state.unionByName(partial(delta, keys, valueCol))
      .groupBy(keys.map(col): _*).agg(
        sum(col("agg_n")).as("agg_n"),
        sum(col("agg_sum")).cast("decimal(28,2)").as("agg_sum"),
        min(col("agg_min")).as("agg_min"),
        max(col("agg_max")).as("agg_max"))
}
