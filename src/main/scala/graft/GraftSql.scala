package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: register the testdata tables (and custom functions) so
  * users can drive the engine with `spark.sql` instead of the
  * DataFrame API — both compile to the same Catalyst plans. */
object GraftSql {

  /** Per-table fault isolation: one table failing to load (missing
    * file, schema drift the loader doesn't know yet) must not take
    * down the whole SQL surface — a query over orders should not die
    * because the events view could not register. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { t =>
      try {
        val df = if (t == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, t)
        df.createOrReplaceTempView(t)
      } catch {
        case scala.util.control.NonFatal(e) =>
          Console.err.println(s"graft: skipping SQL view '$t': ${e.getMessage}")
      }
    }

  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("gen_gsid",
      _ => graft.functions.GenerateGsid(), "built-in")
    reg.createOrReplaceTempFunction("base32_encode",
      graft.functions.SqlBuilders.base32Encode, "built-in")
    reg.createOrReplaceTempFunction("cosine_sim",
      args => graft.functions.CosineSim(args.head, args(1)), "built-in")
    reg.createOrReplaceTempFunction("top_k_rows",
      graft.functions.SqlBuilders.topKRows, "built-in")
    reg.createOrReplaceTempFunction("misra_gries",
      graft.functions.SqlBuilders.misraGries, "built-in")
    reg.createOrReplaceTempFunction("kmv_distinct",
      graft.functions.SqlBuilders.kmvDistinct, "built-in")
    reg.createOrReplaceTempFunction("hist_fixed",
      graft.functions.SqlBuilders.histFixed, "built-in")
    reg.createOrReplaceTempFunction("kll_quantiles",
      graft.functions.SqlBuilders.kllQuantiles, "built-in")
    graft.functions.Similarity.register(spark)
  }
}
