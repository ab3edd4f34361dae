package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Base32Encode, GenerateGsid}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql("SELECT
  * gen_gsid(), base32_encode(n, 5)")` works in any session built with
  * `.withExtensions(new GraftExtensions)` — or via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("gen_gsid"),
      new ExpressionInfo(classOf[GenerateGsid].getName, "gen_gsid"),
      (_: Seq[Expression]) => GenerateGsid()))
    e.injectFunction((
      FunctionIdentifier("base32_encode"),
      new ExpressionInfo(classOf[Base32Encode].getName, "base32_encode"),
      graft.functions.SqlBuilders.base32Encode))
    e.injectFunction((
      FunctionIdentifier("top_k_rows"),
      new ExpressionInfo(classOf[graft.functions.TopKRows].getName, "top_k_rows"),
      graft.functions.SqlBuilders.topKRows))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[graft.functions.MisraGries].getName, "misra_gries"),
      graft.functions.SqlBuilders.misraGries))
    e.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[graft.functions.KmvDistinct].getName, "kmv_distinct"),
      graft.functions.SqlBuilders.kmvDistinct))
    e.injectFunction((
      FunctionIdentifier("hist_fixed"),
      new ExpressionInfo(classOf[graft.functions.FixedHistogram].getName, "hist_fixed"),
      graft.functions.SqlBuilders.histFixed))
    e.injectFunction((
      FunctionIdentifier("kll_quantiles"),
      new ExpressionInfo(classOf[graft.functions.KllQuantiles].getName, "kll_quantiles"),
      graft.functions.SqlBuilders.kllQuantiles))
    e.injectFunction((
      FunctionIdentifier("kmv_minima"),
      new ExpressionInfo(classOf[graft.functions.KmvMinima].getName, "kmv_minima"),
      graft.functions.SqlBuilders.kmvMinima))
  }
}
