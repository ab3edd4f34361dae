package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution union: reconcile heterogeneous batches of the
  * same logical table (a pipeline ingesting months of exports whose
  * schema drifted — columns added/dropped, ints widened to longs,
  * numerics to double) into ONE DataFrame on the WIDENED schema.
  *
  * Rules, applied column-by-column over the union of all column names
  * in first-seen order:
  *  - a column missing from a batch becomes typed nulls;
  *  - numeric types widen along byte < short < int < long < float <
  *    double, EXCEPT that int/long meeting float promote to double
  *    (a float mantissa silently rounds ints past 2^24; byte/short
  *    fit a float exactly so they stay float) — lossless except
  *    long→double, which is the standard SQL promotion;
  *  - DECIMAL widens by max(precision-scale) + max(scale), and throws
  *    rather than cap past 38 digits (a capped cast with ANSI off
  *    silently nulls overflowing values); DECIMAL meeting float/double
  *    goes to double (SQL's approximate-wins promotion); an integral
  *    meeting DECIMAL widens to the decimal that holds it exactly;
  *  - identical types pass through; anything else (string vs numeric,
  *    struct vs atomic) throws — silent coercion of INCOMPATIBLE
  *    drift is how bad loads disappear into a corpus.
  *
  * Purely a projection per batch + unionByName: zero shuffle, codegen
  * throughout, scale-independent. */
object SchemaEvolution {

  private val numericRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 4, DoubleType -> 5)

  // decimal digits needed to hold each integral type exactly
  private val intDigits: Map[DataType, Int] = Map(
    ByteType -> 3, ShortType -> 5, IntegerType -> 10, LongType -> 20)

  private[graft] def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case _ if a == b => a
    case (x: DecimalType, y: DecimalType) =>
      val scale = math.max(x.scale, y.scale)
      val whole = math.max(x.precision - x.scale, y.precision - y.scale)
      // loud, not lossy: silently capping precision would drop integer
      // digits and (with ANSI off) turn overflowing values into nulls
      require(whole + scale <= DecimalType.MAX_PRECISION,
        s"decimal union needs DECIMAL(${whole + scale},$scale), past the " +
          s"${DecimalType.MAX_PRECISION}-digit maximum — rescale the batches")
      DecimalType(whole + scale, scale)
    // DECIMAL meets float/double at double — the standard SQL
    // approximate-wins promotion
    case (_: DecimalType, FloatType | DoubleType) => DoubleType
    case (FloatType | DoubleType, _: DecimalType) => DoubleType
    // integral meets DECIMAL: widen to a decimal that holds the
    // integral exactly (lossless SQL promotion)
    case (d: DecimalType, i) if intDigits.contains(i) =>
      widen(d, DecimalType(intDigits(i), 0))
    case (i, d: DecimalType) if intDigits.contains(i) =>
      widen(DecimalType(intDigits(i), 0), d)
    // int/long meeting FLOAT go to DOUBLE, not float: a 24-bit float
    // mantissa silently rounds ints past 2^24 (double holds every int
    // exactly; long→double stays the one documented lossy promotion).
    // byte/short fit a float exactly, so plain rank-max keeps them.
    case (IntegerType | LongType, FloatType) => DoubleType
    case (FloatType, IntegerType | LongType) => DoubleType
    case _ if numericRank.contains(a) && numericRank.contains(b) =>
      if (numericRank(a) >= numericRank(b)) a else b
    case _ => throw new IllegalArgumentException(
      s"incompatible schema drift: ${a.simpleString} vs ${b.simpleString}")
  }

  def unionEvolved(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "no batches")
    // widened type per column name, names in first-seen order
    val order = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    batches.foreach(_.schema.fields.foreach { f =>
      order.update(f.name, order.get(f.name).map(widen(_, f.dataType)).getOrElse(f.dataType))
    })
    val cols = order.toSeq
    batches.map { b =>
      val present = b.columns.toSet
      b.select(cols.map { case (name, t) =>
        if (present.contains(name)) col(name).cast(t).as(name)
        else lit(null).cast(t).as(name)
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
