package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKRows

/** Per-key top-k rows via the bounded [[TopKRows]] aggregate: keeps a
  * size-k heap per group with map-side partial aggregation, so the
  * shuffle carries at most k rows per key per map partition — vs the
  * `row_number()` window formulation, which shuffles and sorts the
  * ENTIRE input. Ranking is (score DESC, tie ASC), a total order, so
  * the output is deterministic and equals the window formulation
  * row-for-row (the oracle gate checks exactly that equivalence). */
object TopK {

  /** One output row per kept input row: keys, rank (1-based),
    * scoreCol, tieCol, then payloadCols. */
  def perKey(df: DataFrame, keys: Seq[String], scoreCol: String,
      tieCol: String, payloadCols: Seq[String], k: Int): DataFrame = {
    val s = struct(
      col(scoreCol).cast("double").as("_score") +:
        col(tieCol).cast("long").as("_tie") +:
        payloadCols.map(col): _*)
    // project the ranked struct BEFORE the aggregate: ObjectHashAggregate
    // is outside whole-stage codegen, so a computed child would be
    // re-evaluated INTERPRETED per row inside update(); as a plain
    // projected attribute it is built once in the codegen'd scan stage
    // and update() reads a bound reference (r18, guide §4 — measured
    // ~25% off the aggregate stage at sf0.1)
    df.select(keys.map(col) :+ s.as("_ranked"): _*)
      .groupBy(keys.map(col): _*)
      .agg(TopKRows.topK(col("_ranked"), k).as("_topk"))
      .select(keys.map(col) :+ posexplode(col("_topk")).as(Seq("_pos", "_row")): _*)
      .select(keys.map(col) ++ Seq(
        (col("_pos") + 1).cast("int").as("rank"),
        col("_row._score").as(scoreCol),
        col("_row._tie").as(tieCol)) ++
        payloadCols.map(c => col(s"_row.$c").as(c)): _*)
  }
}
