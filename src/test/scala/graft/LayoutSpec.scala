package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits (known points, monotone blocks)") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    // x bits at even positions, y bits at odd: (5,3)=0b101,0b011 ->
    // z = 1<<0 | 1<<4 | 1<<1 | 1<<3 = 0b11011 = 27
    assert(out == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("zValueN interleaves three dimensions round-robin") {
    import spark.implicits._
    // (1,0,0)->bit0, (0,1,0)->bit1, (0,0,1)->bit2, (2,0,0)->bit3(=1<<(1*3+0))
    val out = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (2L, 0L, 0L), (3L, 3L, 3L))
      .toDF("x", "y", "z")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("z")), 4).as("m"))
      .as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 4L, 8L, 63L))
  }

  test("z-ordered layout shrinks per-file envelopes in BOTH dimensions vs linear sort") {
    val orders = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).as("o_day"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val nFiles = 16

    // linear sort clusters o_custkey perfectly and scatters o_day
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$base/linear")
    Layout.writeZOrdered(orders, "o_custkey", "o_day", s"$base/zorder", nFiles)

    // mean fraction of the global range a per-file [min,max] envelope
    // spans = expected fraction of files a point predicate must read
    def meanFrac(dir: String, vcol: String): Double = {
      val df = spark.read.parquet(dir)
      val Array(lo, hi) = df.agg(min(col(vcol)), max(col(vcol))).collect()(0)
        .toSeq.map(_.toString.toDouble).toArray
      val env = Layout.fileEnvelopes(df, vcol)
        .agg(avg(col("hi").cast("double") - col("lo").cast("double")))
        .collect()(0).getDouble(0)
      env / (hi - lo)
    }

    val linCust = meanFrac(s"$base/linear", "o_custkey")
    val linDay = meanFrac(s"$base/linear", "o_day")
    val zCust = meanFrac(s"$base/zorder", "o_custkey")
    val zDay = meanFrac(s"$base/zorder", "o_day")

    // linear: near-perfect on the sort key, useless (~full range) on
    // the other dimension
    assert(linCust < 0.2, s"linear layout should cluster its sort key: $linCust")
    assert(linDay > 0.8, s"linear layout scatters the second dim: $linDay")
    // z-order: BOTH dimensions prunable — each envelope well under the
    // full range, and the envelope AREA (product) far below linear's
    assert(zCust < 0.6, s"z-order custkey envelope too wide: $zCust")
    assert(zDay < 0.6, s"z-order day envelope too wide: $zDay")
    assert(zCust * zDay < 0.5 * linCust * linDay ||
      zCust * zDay < 0.25,
      s"z-order area $zCust*$zDay should beat linear ${linCust * linDay}")
  }
}
