package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

    // 2) exact: normalized-or-lower input vs lower(center name)
    val exact = withAlias.join(broadcast(cent),
        Coercions.normalizeName(col("_eff")) === col("_lname") ||
          lower(col("_eff")) === col("_lname"), "left")
      .groupBy("_iid", "_iname", "_eff")
      .agg(min(col("center_id")).as("_exact_id"))

    // 3) fuzzy argmax over the broadcast dimension for unresolved rows
    val need = exact.filter(col("_exact_id").isNull).select("_iid", "_eff")
    val w = Window.partitionBy("_iid").orderBy(col("_score").desc, col("center_id").asc)
    val fuzzy = need.crossJoin(broadcast(cent))
      .withColumn("_score", scorer(Coercions.normalizeName(col("_eff")), col("_nname")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("_score") >= threshold)
      .select(col("_iid"), col("center_id").as("_fuzzy_id"))

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
