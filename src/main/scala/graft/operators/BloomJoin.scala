package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered semi-join: when the build side is too big to
  * broadcast as ROWS but its KEY SET fits a bloom filter (~1.2 GB per
  * billion keys at 1% fpp), ship the bloom instead and drop
  * non-matching probe rows BEFORE the shuffle — the probe side of a
  * selective join then shuffles sel + (1-sel)·fpp of its rows instead
  * of all of them. False positives survive the prefilter but are
  * removed by the exact join that follows, so the result is EXACTLY
  * the semi-join (the oracle pins that), regardless of the bloom's
  * bit-pattern — which is also why merge order / seeding of the
  * filter cannot affect output determinism: blooms have no false
  * negatives.
  *
  * This is the manual, always-on form of Spark's runtime row-level
  * filtering, built from the SAME Catalyst expressions that feature
  * uses: the filter bits come from a distributed
  * [[BloomFilterAggregate]] (partial/final, only the bits reach the
  * driver — the same driver footprint as `df.stat.bloomFilter`), and
  * the probe test is [[BloomFilterMightContain]] over those bits as a
  * BINARY literal. `might_contain` participates in whole-stage
  * codegen, so the probe filter sits fused with the scan instead of
  * breaking the stage at a UDF boundary. Keys are cast to LONG (every
  * join key in this engine's tables is integral).
  *
  * Sizing rides Spark's runtime-filter caps: `BloomFilterAggregate`
  * silently clamps to `spark.sql.optimizer.runtime.bloomFilter
  * .maxNumItems` / `.maxNumBits` (defaults 4M items / 8 MB) — raise
  * those confs for billion-key builds. */
object BloomJoin {

  def semiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val numBits =
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val bloomAgg = Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(build.col(buildKey).cast("long")),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    // one binary value (the serialized filter) comes to the driver;
    // null when the build side is empty — might_contain(null, k) is
    // null, so the prefilter then drops every probe row, which is the
    // correct empty semi-join
    val bits = build.agg(bloomAgg.as("bf")).head.getAs[Array[Byte]](0)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bits, BinaryType),
      Bridge.expression(col(probeKey).cast("long"))))
    probe.filter(mightContain)
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
