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
      (args: Seq[Expression]) => args match {
        case Seq(num, len) => Base32Encode(num,
          len.eval().asInstanceOf[Number].intValue())
        case other => throw new IllegalArgumentException(
          s"base32_encode(num, length) takes 2 arguments, got ${other.size}")
      }))
    e.injectFunction((
      FunctionIdentifier("top_k_rows"),
      new ExpressionInfo(classOf[graft.functions.TopKRows].getName, "top_k_rows"),
      (args: Seq[Expression]) => args match {
        case Seq(child, k) => graft.functions.TopKRows(child,
          k.eval().asInstanceOf[Number].intValue()).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"top_k_rows(struct, k) takes 2 arguments, got ${other.size}")
      }))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[graft.functions.MisraGries].getName, "misra_gries"),
      (args: Seq[Expression]) => args match {
        case Seq(child, k) => graft.functions.MisraGries(child,
          k.eval().asInstanceOf[Number].intValue()).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"misra_gries(value, k) takes 2 arguments, got ${other.size}")
      }))
  }
}
