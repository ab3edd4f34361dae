package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * filtering; building it as an operator makes the prefilter
  * available to DSv1 sources and keeps the decision explicit. The
  * bloom itself is built distributed (treeAggregate under
  * `df.stat.bloomFilter`) and only the filter bits come to the
  * driver. The probe-side test is a deliberate UDF boundary: one
  * primitive call per row against broadcast bits. Keys are cast to
  * LONG (every join key in this engine's tables is integral); a
  * string-keyed variant would use `mightContainString` identically. */
object BloomJoin {

  def semiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    probe.filter(might(col(probeKey).cast("long")))
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
