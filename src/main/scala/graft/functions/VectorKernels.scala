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

  /** Static sign-bit LSH bucket kernel: bit j set iff v · planes(j) ≥ 0
    * (ascending-index dot fold — same arithmetic as the HOF form). */
  def lshBucket(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * p(i); i += 1 }
      if (dot >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** Static nearest-centroid kernel (squared L2, first-min index —
    * matches `array_position(d, array_min(d)) - 1`). */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var d = 0.0
      var i = 0
      while (i < n) { val x = v.getFloat(i).toDouble - c(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** Static min squared-L2 distance over centroids — [[nearestCentroid]]'s
    * loop returning the VALUE instead of the index. On WELL-FORMED input
    * (vector dim == centroid dim, finite components) it is bit-identical
    * to the HOF form `array_min(transform(cents, c -> aggregate(zip_with(v,
    * c, (x, cc) -> (x-cc)²), 0.0, acc+x)))`: per-element accumulation in
    * index order, min over centroids. On contract-violating input the two
    * diverge by design: a dim mismatch is truncated to the shorter length
    * (the HOF yields null), and all-NaN distances return Double.MaxValue
    * (array_min returns NaN) — callers own dim agreement, which every
    * in-repo call site gets from a single training pass. The win is one
    * codegen'd call against a task-shipped array instead of
    * nClusters×dim literal plan nodes,
    * which is what lets assignment scale to production cluster counts
    * (SemDeDup's paper posture is 50k clusters). */
  def minCentroidDist(v: ArrayData, cents: Array[Array[Double]]): Double = {
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var d = 0.0
      var i = 0
      while (i < n) { val x = v.getFloat(i).toDouble - c(i); d += x * x; i += 1 }
      if (d < bestD) bestD = d
      j += 1
    }
    bestD
  }

  /** Static per-plane dot products (multiprobe margins). */
  def planeDots(v: ArrayData, planes: Array[Array[Double]]): ArrayData = {
    val out = new Array[Double](planes.length)
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * p(i); i += 1 }
      out(j) = dot
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column API: LSH bucket of a float-array column against literal
    * planes. */
  def lshBucketCol(vec: Column, planes: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(LshBucket(
      ExpressionUtils.expression(vec), planes.map(_.toArray).toArray))

  /** Column API: per-plane dot products of a float-array column. */
  def planeDotsCol(vec: Column, planes: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(PlaneDots(
      ExpressionUtils.expression(vec), planes.map(_.toArray).toArray))

  /** Static dot-product kernel over float arrays (ascending-index
    * double accumulation — the same fold order as [[cosineF]]'s dot
    * term, so a prefix dot here plus a tail dot equals the full dot
    * up to ordinary double rounding). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  /** Static L2 norm of v[from, min(until, len)) for a float array —
    * `from = 0, until = MaxValue` is the full norm; `from = p` is the
    * tail norm the Cauchy-Schwarz rerank bound needs. */
  def normRangeF(v: ArrayData, from: Int, until: Int): Double = {
    val n = math.min(v.numElements(), until)
    var s = 0.0
    var i = math.max(from, 0)
    while (i < n) { val x = v.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Column API: dot product of two float-array columns. */
  def dotCol(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductF(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API: L2 norm of a float-array column over [from, until). */
  def normRangeCol(v: Column, from: Int, until: Int): Column =
    ExpressionUtils.column(NormRangeF(ExpressionUtils.expression(v), from, until))

  /** Static distinct word-n-gram kernel over a token array
    * (first-occurrence order, space-joined). */
  def wordShingles(tokens: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val count = tokens.numElements() - (n - 1)
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](count)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column API: distinct word n-gram shingles of a token-array column. */
  def wordShinglesCol(tokens: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(tokens), n))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Static winnowing kernel (Schleimer et al.): hash every character
    * k-gram (first 8 hex chars of md5 — exactly Spark/DuckDB
    * `substr(md5(gram),1,8)`), then collect the DISTINCT minimum of
    * every w-wide sliding window, first-occurrence order. Character
    * semantics use UTF8String.substringSQL, matching both dialects on
    * multi-byte text. Returns an empty array when there are fewer than
    * w k-grams (no complete window). */
  def winnow(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val m = text.numChars() - (k - 1)
    if (m < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    val hashes = new Array[String](m)
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(text.substringSQL(i + 1, k).getBytes)
      val cs = new Array[Char](8)
      var b = 0
      while (b < 4) {
        cs(2 * b) = hexDigits((d(b) >> 4) & 0xf)
        cs(2 * b + 1) = hexDigits(d(b) & 0xf)
        b += 1
      }
      hashes(i) = new String(cs)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j <= m - w) {
      var minH = hashes(j)
      var t = j + 1
      while (t < j + w) {
        if (hashes(t).compareTo(minH) < 0) minH = hashes(t)
        t += 1
      }
      seen.add(minH)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column API: winnowing fingerprints of a string column. */
  def winnowCol(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFps(ExpressionUtils.expression(text), k, w))

  /** Column API: nearest-centroid list index of a float-array column. */
  def nearestCentroidCol(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(NearestCentroid(
      ExpressionUtils.expression(vec), centroids.map(_.toArray).toArray))

  def minCentroidDistCol(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(MinCentroidDist(
      ExpressionUtils.expression(vec), centroids.map(_.toArray).toArray))
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

/** Codegen'd float-array dot product — the prefix-dot term of the
  * Cauchy-Schwarz rerank bound, evaluated once per candidate pair at
  * scale (same per-pair-at-100TB argument as [[CosineSim]]). */
case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f needs two float arrays, got ${l.catalogString} / ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.dotF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f"
}

/** Codegen'd ranged L2 norm of a float-array column (full norm at
  * from=0, tail norm at from=p — both per-ROW precomputes, so the
  * per-pair bound below touches only 3 doubles per side). */
case class NormRangeF(child: Expression, from: Int, until: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"norm_range needs array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.normRangeF(v.asInstanceOf[ArrayData], from, until)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.normRangeF($v, $from, $until)")

  override protected def withNewChildInternal(c: Expression): NormRangeF = copy(child = c)
  override def prettyName: String = "norm_range"
}

/** Codegen'd sign-bit LSH bucket of an `array<float>` column against a
  * fixed plane matrix (the table-side assignment that must touch every
  * row at 100 TB — an interpreted HOF here costs ~0.5 ms/row). The
  * planes ride along as a codegen reference object. */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket needs array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.lshBucket(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.lshBucket($v, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
  override def prettyName: String = "lsh_bucket"
}

/** Codegen'd nearest-centroid (squared-L2 argmin) list assignment for
  * IVF — same per-row-at-scale argument as [[LshBucket]]. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCentroid(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.nearestCentroid($v, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/** Codegen'd min squared-L2 distance to a static centroid set — see
  * [[VectorKernels.minCentroidDist]] for the bit-exactness contract
  * with the HOF/literal formulation it replaces. */
case class MinCentroidDist(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_centroid_dist needs array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.minCentroidDist(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.minCentroidDist($v, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): MinCentroidDist =
    copy(child = c)
  override def prettyName: String = "min_centroid_dist"
}

/** Codegen'd distinct word n-gram shingles from a token array — the
  * per-row step feeding MinHash/Jaccard dedup, where the HOF
  * formulation (`transform(sequence)` + n× `element_at` + `concat_ws`)
  * costs interpreted-lambda time on every document. First-occurrence
  * order, matching `array_distinct(transform(...))`. */
case class WordShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string> tokens, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.wordShingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.wordShingles($v, $n)")

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** Codegen'd winnowing fingerprint selection — the per-document step
  * is a tight two-pass loop (hash m k-grams, min over m-w+1 windows)
  * that the HOF formulation pays interpreted-lambda time for on every
  * position of every document (measured ~4.5 s vs ~1 s at sf0.1). */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps needs a string column, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.winnow(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.winnow($v, $k, $w)")

  override protected def withNewChildInternal(c: Expression): WinnowFps = copy(child = c)
  override def prettyName: String = "winnow_fps"
}

/** Codegen'd per-plane dot products (`array<double>` of margins) for
  * margin-guided multiprobe. */
case class PlaneDots(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"plane_dots needs array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.planeDots(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.planeDots($v, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PlaneDots = copy(child = c)
  override def prettyName: String = "plane_dots"
}
