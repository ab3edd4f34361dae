package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Tables}

/** Dev-side A/B of the moments hot loop: the 2^31 hi/lo long-split
  * (longPath) vs the default DECIMAL(38,0) sums, repeated to wash
  * out JIT — the measurement that DECIDED the round-11 default
  * (decimal measured ~2x faster at sf0.1 and sf1; Spark Decimal is
  * long-backed, and the split doubles the aggregate buffer count). */
object ProfileMoments {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, sfDir)
    li.count() // warm the scan
    val cols = Seq("l_quantity" -> 2, "l_extendedprice" -> 2,
      "l_discount" -> 2, "l_tax" -> 2)
    def run(long: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.Stats.pearsonMatrix(li, cols, longPath = long).count()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { i =>
      val tLong = run(true)
      val tDec = run(false)
      println(f"[moments] rep $i: longPath=$tLong%.2f s decimal(default)=$tDec%.2f s")
    }
    spark.stop()
  }
}
