package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryMinus}

/** The ONE place the engine's SQL-function builders live — used by
  * both the temp-function registry (`GraftSql.registerFunctions`) and
  * the `SparkSessionExtensions` injection path (`GraftExtensions`),
  * so argument parsing and error messages cannot drift between the
  * two registration surfaces. */
object SqlBuilders {

  /** A literal non-null integer argument, or a readable error — never
    * an NPE (NULL k) or ClassCastException (string k). A negative SQL
    * literal (`-5`) reaches the builder as `UnaryMinus(Literal)` —
    * function resolution runs BEFORE constant folding — so that shape
    * is folded here. */
  private def literalInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Number, _) if v != null => v.intValue()
    case UnaryMinus(inner, _) => -literalInt(inner, fn, arg)
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal integer, got ${other.sql}")
  }

  private def arity(fn: String, sig: String, n: Int)(
      args: Seq[Expression]): Seq[Expression] = {
    if (args.size != n) throw new IllegalArgumentException(
      s"$fn$sig takes $n arguments, got ${args.size}")
    args
  }

  val base32Encode: Seq[Expression] => Expression = args0 => {
    val args = arity("base32_encode", "(num, length)", 2)(args0)
    Base32Encode(args.head, literalInt(args(1), "base32_encode", "length"))
  }

  val topKRows: Seq[Expression] => Expression = args0 => {
    val args = arity("top_k_rows", "(struct, k)", 2)(args0)
    TopKRows(args.head, literalInt(args(1), "top_k_rows", "k"))
      .toAggregateExpression()
  }

  val misraGries: Seq[Expression] => Expression = args0 => {
    val args = arity("misra_gries", "(value, k)", 2)(args0)
    MisraGries(args.head, literalInt(args(1), "misra_gries", "k"))
      .toAggregateExpression()
  }

  val kmvDistinct: Seq[Expression] => Expression = args0 => {
    val args = arity("kmv_distinct", "(hash48, k)", 2)(args0)
    KmvDistinct(args.head, literalInt(args(1), "kmv_distinct", "k"))
      .toAggregateExpression()
  }

  // SQL `0.0` parses as a DECIMAL literal (spark Decimal, not
  // java.lang.Number), and a negative literal like `-100.0` parses as
  // UnaryMinus(Literal) at function-resolution time (before constant
  // folding) — all three shapes must be accepted or SQL-surface
  // hist_fixed cannot express a negative lo
  private def literalDouble(e: Expression, fn: String, arg: String): Double = e match {
    case Literal(v: Number, _) if v != null => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) if v != null => v.toDouble
    case UnaryMinus(inner, _) => -literalDouble(inner, fn, arg)
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal number, got ${other.sql}")
  }

  val histFixed: Seq[Expression] => Expression = args0 => {
    val args = arity("hist_fixed", "(value, lo, width, nBuckets)", 4)(args0)
    FixedHistogram(args.head,
      literalDouble(args(1), "hist_fixed", "lo"),
      literalDouble(args(2), "hist_fixed", "width"),
      literalInt(args(3), "hist_fixed", "nBuckets"))
      .toAggregateExpression()
  }

  val kmvMinima: Seq[Expression] => Expression = args0 => {
    val args = arity("kmv_minima", "(hash48, k)", 2)(args0)
    KmvMinima(args.head, literalInt(args(1), "kmv_minima", "k"))
      .toAggregateExpression()
  }

  /** Variadic: `kll_quantiles(value, k, p1 [, p2 ...])`. */
  val kllQuantiles: Seq[Expression] => Expression = args => {
    if (args.size < 3) throw new IllegalArgumentException(
      s"kll_quantiles(value, k, p1 [, p2 ...]) takes at least 3 arguments, got ${args.size}")
    KllQuantiles(args.head,
      literalInt(args(1), "kll_quantiles", "k"),
      args.drop(2).map(literalDouble(_, "kll_quantiles", "p")))
      .toAggregateExpression()
  }

  /** `kll_quantiles_exact(...)`: same surface with the exact-regime
    * precondition ENFORCED — throws if any group exceeds `k` (the
    * result would silently become approximate otherwise). */
  val kllQuantilesExact: Seq[Expression] => Expression = args => {
    if (args.size < 3) throw new IllegalArgumentException(
      s"kll_quantiles_exact(value, k, p1 [, p2 ...]) takes at least 3 arguments, got ${args.size}")
    KllQuantiles(args.head,
      literalInt(args(1), "kll_quantiles_exact", "k"),
      args.drop(2).map(literalDouble(_, "kll_quantiles_exact", "p")),
      requireExact = true)
      .toAggregateExpression()
  }
}
