package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (the manual fallback when AQE's
  * skew-join split isn't enough — e.g. one registry identifier shared
  * by millions of rows).
  *
  * The probe (large, skewed) side gets a deterministic salt in
  * [0, salt); the build side is exploded `salt`-fold so every
  * (key, salt) bucket finds its match. Equivalent to the plain join on
  * `key`, but the shuffle distributes each hot key over `salt`
  * partitions. Salt is derived from other columns via xxhash64 — no
  * rand(), so retries and the oracle stay deterministic.
  */
object SkewJoin {

  def saltedEquiJoin(
      probe: DataFrame, build: DataFrame, key: String, salt: Int,
      probeSaltSource: Column): DataFrame = {
    val p = probe.withColumn("_salt", pmod(xxhash64(probeSaltSource), lit(salt)).cast("int"))
    val b = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }
}
