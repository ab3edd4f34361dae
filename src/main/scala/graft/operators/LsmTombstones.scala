package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Seq-versioned tombstones for append-maintained index tables — the
  * retraction half of the LSM discipline
  * ([[graft.sources.Sources.publishMergeAppend]] is the insertion
  * half). A tombstone `(key, _ts_seq = n)` kills every row of `key`
  * written with `_seq < n`; rows the SAME apply re-inserts carry
  * `_seq = n` and survive (strict inequality), which is what lets one
  * feed retract-and-replace a key without reading its old rows at
  * all. The tombstone set is delta-scale between compactions and is
  * snapshot-published whole each apply; compaction folds the kills
  * into the data and clears it. */
private[operators] object LsmTombstones {

  private def dirOf(indexDir: String) = s"$indexDir/tombstones"

  def exists(spark: SparkSession, indexDir: String): Boolean = {
    val d = dirOf(indexDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(d, "_current"))
  }

  def read(spark: SparkSession, indexDir: String): Option[DataFrame] =
    if (exists(spark, indexDir)) Some(Sources.readSnapshot(spark, dirOf(indexDir)))
    else None

  def isEmpty(spark: SparkSession, indexDir: String): Boolean =
    read(spark, indexDir).forall(_.isEmpty)

  /** The apply sequence the NEXT append-apply should stamp:
    * max(live tombstone seq) + 1, or 1 on a clean index. */
  def nextSeq(spark: SparkSession, indexDir: String): Long =
    read(spark, indexDir)
      .flatMap(t => Option(t.agg(max(col("_ts_seq"))).first().get(0)))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(1L)

  /** Publish the union of the live tombstones and `keys` at `seq`.
    * `keys` must be a single-column frame named `keyCol`; re-deleting
    * a key keeps only its newest seq (the older one is subsumed). */
  def append(spark: SparkSession, indexDir: String, keys: DataFrame,
      keyCol: String, seq: Long): Unit = {
    val fresh = keys.select(col(keyCol)).distinct()
      .withColumn("_ts_seq", lit(seq))
    val all = read(spark, indexDir) match {
      case Some(old) => old.join(fresh.select(keyCol), Seq(keyCol), "left_anti")
        .unionByName(fresh)
      case None => fresh
    }
    // the snapshot swap deletes superseded versions while `all` still
    // reads from them — pin the rows first
    Sources.publishSnapshot(all.localCheckpoint(false), dirOf(indexDir))
  }

  def clear(spark: SparkSession, indexDir: String): Unit =
    read(spark, indexDir).foreach(t =>
      Sources.publishSnapshot(t.limit(0).localCheckpoint(false), dirOf(indexDir)))

  /** Drop dead rows: `rows` must carry `_seq`; a row survives iff no
    * tombstone for its key has `_ts_seq > _seq`. The tombstone set is
    * delta-scale, so the kill join broadcasts. */
  def filterLive(spark: SparkSession, indexDir: String, rows: DataFrame,
      keyCol: String): DataFrame =
    read(spark, indexDir) match {
      case None => rows
      case Some(t) =>
        val kills = t.groupBy(keyCol).agg(max(col("_ts_seq")).as("_ts_max"))
        rows.join(broadcast(kills), Seq(keyCol), "left")
          .filter(col("_ts_max").isNull || col("_seq") >= col("_ts_max"))
          .drop("_ts_max")
    }
}
