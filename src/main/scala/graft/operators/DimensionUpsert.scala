package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension get-or-create (SURVEY.md §2.8 U9).
  *
  * The reference resolves a center name and, on miss, INSERTs a new
  * row with the next id (`redcap-pipeline/services/center_resolver.py:
  * 93-160`, unique-violation retry). Batch form: resolve all names at
  * once, mint ids for the distinct unresolved names as
  * `max(existing_id) + dense_rank(name)` — deterministic, gap-free,
  * and expressible in ANSI SQL for the oracle. The window runs over
  * the *distinct new names* only (a tiny set), so no wide-partition
  * window appears at scale.
  */
object DimensionUpsert {

  /** `incoming` needs a `name` column; `dim` needs (center_id, name).
    * Returns (resolvedIncoming with center_id + is_new, updatedDim). */
  final case class Result(resolved: DataFrame, dim: DataFrame)

  def getOrCreate(dim: DataFrame, incoming: DataFrame): Result = {
    import graft.functions.{Coercions => F}
    val normIn = incoming.withColumn("_nname", F.normalizeName(col("name")))
    val normDim = dim.select(col("center_id"), col("name").as("_dim_name"),
      F.normalizeName(col("name")).as("_nname"))

    val joined = normIn.join(broadcast(normDim.drop("_dim_name")), Seq("_nname"), "left")

    val maxId = dim.agg(coalesce(max(col("center_id")), lit(0)).as("m"))
    val newNames = joined.filter(col("center_id").isNull)
      .select("_nname").distinct()
      .withColumn("_rk", dense_rank().over(Window.orderBy(col("_nname"))))
      .crossJoin(broadcast(maxId))
      .select(col("_nname"), (col("m") + col("_rk")).cast(dim.schema("center_id").dataType)
        .as("_new_id"))

    val resolved = joined.join(broadcast(newNames), Seq("_nname"), "left")
      .withColumn("is_new", col("center_id").isNull)
      .withColumn("center_id", coalesce(col("center_id"), col("_new_id")))
      .drop("_new_id")

    val newDimRows = resolved.filter(col("is_new"))
      .select(col("center_id"), col("_nname").as("name")).distinct()
    Result(resolved.drop("_nname"), dim.unionByName(newDimRows))
  }
}
