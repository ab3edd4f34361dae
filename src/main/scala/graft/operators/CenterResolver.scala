package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Coercions, Similarity}

/** Fuzzy center-name resolution (SURVEY.md §2.4 J7, §2.6 W3).
  *
  * The reference resolves free-form center names through a ladder —
  * alias map → exact (case/underscore-normalized) → best fuzzy match ≥
  * threshold (`fragment-validator/services/center_resolver.py:41-120`)
  * — one Python loop per record against ~100 cached names. Here the
  * whole input column resolves in one plan: broadcast alias join,
  * broadcast exact join, then a broadcast nested-loop scoring join with
  * a per-input argmax window. The dimension side stays broadcast at any
  * fact scale, so no shuffle grows with the input.
  *
  * Tie-breaking: the reference keeps the FIRST strictly-best score in
  * center iteration order; we order by (score desc, center_id asc),
  * which is identical when center ids follow load order.
  *
  * The default scorer is the faithful Ratcliff-Obershelp UDF
  * ([[Similarity.ratio]]); pass [[Similarity.levenshteinRatio]] for a
  * codegen'd, ANSI-SQL-reproducible variant (documented deviation,
  * SURVEY.md §7.5.5).
  */
object CenterResolver {

  def resolve(
      inputs: DataFrame,
      idCol: String,
      nameCol: String,
      centers: DataFrame, // columns: center_id, name
      aliases: Seq[(String, String)] = Seq.empty,
      threshold: Double = 0.8,
      scorer: (Column, Column) => Column = (a, b) => Similarity.ratioUdf(a, b)): DataFrame = {

    val spark = inputs.sparkSession
    import spark.implicits._

    val in = inputs.select(col(idCol).as("_iid"), col(nameCol).as("_iname"))

    // 1) alias map (broadcast): key is lower(alias), probed with the
    //    fully-normalized input (`center_resolver.py:46-58`)
    val withAlias =
      if (aliases.isEmpty) in.withColumn("_eff", col("_iname"))
      else {
        val aliasDf = aliases.toDF("_alias", "_canonical")
          .withColumn("_akey", lower(col("_alias")))
        in.join(broadcast(aliasDf), Coercions.normalizeName(col("_iname")) === col("_akey"), "left")
          .withColumn("_eff", coalesce(col("_canonical"), col("_iname")))
          .select("_iid", "_iname", "_eff")
      }

    val cent = centers.select(col("center_id"), col("name"),
      lower(col("name")).as("_lname"),
      Coercions.normalizeName(col("name")).as("_nname"))

    // 2) exact: normalized-or-lower input vs lower(center name).
    //    Input-side keys are computed ONCE per row (the pre-r18 OR-
    //    condition join planned a nested loop that re-ran the regex
    //    normalization per (input × center) pair), and the OR splits
    //    into two broadcast HASH probes — min over the union of both
    //    match sets is the same minimum (r18, guide §3.1). The frame
    //    is lazily checkpointed: it feeds the fuzzy need-side AND the
    //    final join, and would otherwise compute twice.
    val withKeys = withAlias
      .withColumn("_neff", Coercions.normalizeName(col("_eff")))
      .withColumn("_leff", lower(col("_eff")))
    val exact = withKeys
      .join(broadcast(cent.select(col("_lname").as("_k1"), col("center_id").as("_id1"))),
        col("_neff") === col("_k1"), "left")
      .join(broadcast(cent.select(col("_lname").as("_k2"), col("center_id").as("_id2"))),
        col("_leff") === col("_k2"), "left")
      .groupBy("_iid", "_iname", "_eff", "_neff")
      .agg(min(least(col("_id1"), col("_id2"))).as("_exact_id"))
      .localCheckpoint(false)

    // 3) fuzzy argmax over the broadcast dimension for unresolved rows.
    //    Threshold filter BEFORE the argmax (identical winner: if the
    //    global max clears the threshold it survives the filter; if
    //    not, both forms emit nothing) and the argmax as a partial-
    //    aggregated max(struct) instead of a row_number window — the
    //    shuffle carries at most one pre-reduced row per input per map
    //    partition instead of every (input × center) scored row (r18,
    //    guide §2.3 "aggregate before you shuffle"). Tie order (score
    //    desc, center_id asc) is preserved lexicographically by
    //    max(struct(score, -center_id)). The input's normalized name
    //    rides in from `withKeys` — the pre-r18 plan re-ran the regex
    //    normalization per scored pair.
    val need = exact.filter(col("_exact_id").isNull).select("_iid", "_neff")
    val fuzzy = need.crossJoin(broadcast(cent))
      .withColumn("_score", scorer(col("_neff"), col("_nname")))
      .filter(col("_score") >= threshold)
      .groupBy("_iid")
      .agg(max(struct(col("_score"), (-col("center_id")).as("_negid"))).as("_best"))
      .select(col("_iid"), (-col("_best._negid")).cast(
        centers.schema("center_id").dataType).as("_fuzzy_id"))

    exact.join(fuzzy, Seq("_iid"), "left")
      .select(
        col("_iid").as(idCol),
        col("_iname").as(nameCol),
        coalesce(col("_exact_id"), col("_fuzzy_id")).as("center_id"),
        when(col("_exact_id").isNotNull, lit("exact"))
          .when(col("_fuzzy_id").isNotNull, lit("fuzzy"))
          .otherwise(lit("unresolved")).as("method"))
  }
}
