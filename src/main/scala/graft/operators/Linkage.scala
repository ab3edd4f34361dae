package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969) for the
  * identity-resolution family: where [[IdentityResolver]] links on
  * deterministic identifier rules (the reference's semantics), this
  * scores CANDIDATE pairs by summed field-agreement log-odds weights —
  * the standard upgrade path when identifiers are dirty and evidence
  * must be weighed, not matched.
  *
  * Design for exactness and scale:
  *  - weights are INTEGERS (ln(m/u) pre-scaled and rounded by the
  *    caller, as production linkers do) so a pair's score is an exact
  *    order-free sum — oracle-replayable, partitioning-invariant;
  *  - candidate generation is BLOCKING: pairs only within equal
  *    block-key groups, the classic way linkage avoids |n|² (compose
  *    with [[FuzzyJoin]] or LSH for fuzzier blocking);
  *  - agreement uses null-safe equality (two nulls agree — the F-S
  *    convention is configurable upstream by excluding null fields).
  */
object Linkage {

  /** A compare field: expression evaluated on each side, weight added
    * when the two sides agree, weight (usually negative) when not. */
  final case class CompareField(expr: Column => Column,
      wAgree: Int, wDisagree: Int)

  /** Blocking-scheme quality report — the two numbers every linkage
    * deployment tunes first (Christen, "Data Matching", ch. 4):
    * REDUCTION RATIO (how far below all-pairs the candidate count
    * falls) and PAIR COMPLETENESS (what fraction of true matches the
    * blocks still co-locate). The candidate count comes from block
    * SIZES alone — `Σ C(n_b, 2)` over a groupBy-count, no pair is
    * ever materialized, so evaluating a scheme on a 10⁹-row table
    * costs one aggregation — and completeness joins the (small)
    * truth set to the block keys twice. One output row; counts
    * exact, the two ratios one mirrored IEEE division each. */
  def blockingQuality(df: DataFrame, idCol: String, blockCols: Seq[String],
      truePairs: DataFrame): DataFrame = {
    val blocks = df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(expr("_n * (_n - 1) div 2")).as("candidate_pairs"),
        sum(col("_n")).as("n_records"))
    val keyed = df.select((idCol +: blockCols).map(col): _*)
    val caught = truePairs
      .join(keyed.toDF(("id_a" +: blockCols.map(_ + "_a")): _*), "id_a")
      .join(keyed.toDF(("id_b" +: blockCols.map(_ + "_b")): _*), "id_b")
      .filter(blockCols.map(c => col(c + "_a") <=> col(c + "_b")).reduce(_ && _))
      .agg(count(lit(1)).as("n_caught"))
    val truthN = truePairs.agg(count(lit(1)).as("n_truth"))
    blocks.crossJoin(broadcast(caught)).crossJoin(broadcast(truthN))
      .select(col("n_records"), col("n_blocks"), col("candidate_pairs"),
        expr("n_records * (n_records - 1) div 2").as("total_pairs"),
        (lit(1.0) - col("candidate_pairs").cast("double") /
          expr("n_records * (n_records - 1) div 2").cast("double"))
          .as("reduction_ratio"),
        col("n_truth"), col("n_caught"),
        when(col("n_truth") > 0,
          col("n_caught").cast("double") / col("n_truth").cast("double"))
          .otherwise(lit(0.0)).as("pair_completeness"))
  }

  /** Score all intra-block pairs of `df` (self-linkage — duplicate
    * detection): `(id_a, id_b, n_agree, score)` for every pair with
    * `score >= minScore`, ids ordered `id_a < id_b`. The block join
    * shuffles each row once on the block key; score and agreement
    * count are computed per pair with zero further shuffles. */
  def selfScore(df: DataFrame, idCol: String, blockCols: Seq[String],
      fields: Seq[CompareField], minScore: Int): DataFrame = {
    val keep = (c: String) => col(c)
    val a = df.select((idCol +: blockCols).map(keep) :+
      struct(df.columns.map(col): _*).as("_ra"): _*)
      .withColumnRenamed(idCol, "id_a")
    val b = df.select((idCol +: blockCols).map(keep) :+
      struct(df.columns.map(col): _*).as("_rb"): _*)
      .withColumnRenamed(idCol, "id_b")
    val paired = a.join(b, blockCols).filter(col("id_a") < col("id_b"))
    val agrees = fields.map(f =>
      f.expr(col("_ra")) <=> f.expr(col("_rb")))
    val score = fields.zip(agrees).map { case (f, ok) =>
      when(ok, lit(f.wAgree)).otherwise(lit(f.wDisagree))
    }.reduce(_ + _)
    val nAgree = agrees.map(ok => when(ok, lit(1)).otherwise(lit(0))).reduce(_ + _)
    paired
      .withColumn("n_agree", nAgree)
      .withColumn("score", score)
      .filter(col("score") >= minScore)
      .select("id_a", "id_b", "n_agree", "score")
  }
}
