package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense-vector kernels as native codegen'd Catalyst expressions.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is interpreted — ~1µs per element-step — which makes pairwise
  * similarity quadratic work unusable (measured: 2M candidate pairs ×
  * 64 dims ≈ 147 s at sf0.1). These expressions compile to a primitive
  * loop inside whole-stage codegen (~50 ns/pair for dim 64), the same
  * preference order the GSID expressions follow.
  *
  * Determinism contract: the loop accumulates dot/norms in ascending
  * index order in double precision — the exact fold order of the HOF
  * version and of the DuckDB oracle's `list_sum(list_transform(...))`,
  * so scores stay bit-identical to both. Array elements are assumed
  * non-null (embedding columns); mismatched lengths fold over the
  * common prefix.
  */
object VectorKernels {

  /** Static cosine kernel over float arrays (called from generated
    * code and from interpreted eval alike). */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** As [[cosineF]] for double arrays. */
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column API: cosine similarity of two float/double array columns. */
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Codegen'd cosine similarity of two `array<float>` (or
  * `array<double>`) columns. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs two float or double arrays, got ${l.catalogString} / ${r.catalogString}")
    }

  private def kernel: String =
    if (elemType == FloatType) "cosineF" else "cosineD"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (elemType == FloatType) VectorKernels.cosineF(x, y)
    else VectorKernels.cosineD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.$kernel($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
