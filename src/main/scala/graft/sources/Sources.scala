package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY.md §2.1 S1-S12).
  *
  * The reference moves data as CSV/JSON "fragments" between S3, REST
  * services and Postgres. Spark-side these all collapse to reader/
  * writer configs: `s3a://`, `file://` and `hdfs://` URIs go through
  * the same code path, so the S3 operators are the same calls with a
  * different scheme. JDBC covers the Postgres/LabKey scans with
  * predicate pushdown (Catalyst pushes filters into the WHERE clause).
  */
object Sources {

  /** S1/S2: CSV fragment scan (header row, reference null tokens
    * preserved as raw strings for the coercion layer to normalize). */
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true").option("mode", "PERMISSIVE")
    schema.fold(r.option("inferSchema", "false"))(r.schema).csv(path)
  }

  /** S3 (operator): JSON document scan (validation reports, per-subject
    * fragments). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S3 (operator): line-delimited JSON scan — the format [[writeJson]]
    * and [[writePartitionedJson]] produce (one record per line, the
    * splittable-at-scale layout; `multiLine` documents are not). */
  def readJsonLines(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** S7/S6: JDBC table scan with pushdown. `table` may be a table name
    * or a `(SELECT …) alias` subquery — how the reference's keyed
    * lookups (S8) express server-side. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.option("pushDownPredicate", "true").jdbc(url, table, p)
  }

  /** S4/S5 stopgap: REST snapshot as a driver-side fetch wrapped in a
    * DataFrame. Prefer [[RestDataSource]] (DataSourceV2,
    * partition-per-page, executor-side fetch, column pruning) — this
    * form remains for one-page exports where a V2 scan is overkill. */
  def restSnapshot(spark: SparkSession, schema: StructType)(
      fetch: () => Seq[org.apache.spark.sql.Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(fetch(), math.max(1, spark.sparkContext.defaultParallelism / 4)),
      schema)

  /** S9/S11: bulk append sink (parquet/csv/json by extension of use). */
  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** S12: per-entity JSON documents, one directory partition per key
    * (`subjects/{gsid}/…` layout). */
  def writePartitionedJson(df: DataFrame, path: String, keyCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(keyCol).json(path)

  /** Partition-pruned MERGE publish — the 100 TB path the
    * whole-snapshot swap below cannot offer. Only the partitions the
    * incoming batch touches are read (partition-pruned scan) and
    * rewritten (dynamic partition overwrite); a batch touching 3 of
    * 10,000 date partitions reads and writes 3. The natural key must
    * functionally determine the partition column (true for the
    * reference's per-center / per-batch layouts), otherwise a key
    * could escape its old partition and survive as a duplicate.
    *
    * Returns the merged frame for the touched partitions (post-merge
    * state), mirroring [[graft.operators.UpsertWriter.merge]]. */
  def publishMergePartitioned(
      spark: SparkSession,
      tableDir: String,
      incoming: DataFrame,
      cfg: graft.types.TableConfig,
      partitionCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // touched partitions: bounded by the incoming batch, never by the
    // table — a driver-side collect of partition VALUES only
    val touched = incoming.select(partitionCol).distinct().collect().map(_.get(0))
    val current = spark.read.parquet(tableDir)
      .filter(col(partitionCol).isin(touched: _*)) // pruned scan
    val merged = graft.operators.UpsertWriter.merge(current, incoming, cfg).merged
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic") // replace ONLY written partitions
      .partitionBy(partitionCol)
      .parquet(tableDir)
    merged
  }

  /** Small-file compaction: rewrite a parquet table dir into
    * ceil(bytes / targetBytes) files via the snapshot swap. Streaming
    * sinks and per-batch MERGE publishes accrete small files; at scale
    * that degrades scan parallelism bookkeeping (footer reads, task
    * scheduling) long before data volume does — periodic compaction is
    * part of operating the table. Returns the output file count. */
  def compact(spark: SparkSession, tableDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val live = resolveSnapshot(spark, tableDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(live), spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(live)).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    publishSnapshot(spark.read.parquet(live).repartition(n), tableDir)
    n
  }

  /** Snapshot-table publish, ATOMIC for readers: versioned-directory
    * layout with a pointer-file swap — the plain-parquet stand-in for
    * the reference's Postgres transaction boundary
    * (`table-loader/services/loader.py:213-234`).
    *
    * Layout: `tableRoot/_current` (pointer, contains the live version
    * dir name) + `tableRoot/v-<stamp>/…parquet`. A publish writes a
    * NEW version dir, then swaps the pointer with
    * `FileContext.rename(OVERWRITE)` (atomic on HDFS and POSIX local
    * FS). Readers resolve the pointer first ([[readSnapshot]]), so
    * they observe either the old or the new version — never a missing
    * or partially-written table (the old delete-target-then-rename had
    * exactly that window). Live data is never deleted in-line: only
    * versions OLDER than the previous one are pruned, so a reader
    * mid-scan of the prior version keeps its files. Two concurrent
    * publishers each write distinct version dirs; the last pointer
    * swap wins whole — lost-update, never corruption (the reference
    * serializes through Postgres; a snapshot table has no lock to
    * take).
    *
    * Version stamp is a monotonic counter parsed from existing version
    * dirs (+1), not a wall-clock read, so publishes stay reproducible
    * and prune order is total. */
  def publishSnapshot(df: DataFrame, tableRoot: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableRoot)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val versions = listVersions(fs, root)
    val next = (versions.map(_._1) :+ 0L).max + 1
    val vdir = f"v-$next%012d"
    df.write.mode(SaveMode.Overwrite).parquet(s"$tableRoot/$vdir")
    // atomic pointer swap: write a temp pointer, rename OVER the live
    // one. BOTH steps go through FileContext: the FileSystem API on a
    // local FS is ChecksumFileSystem, whose create() leaves a .crc
    // sidecar that rename() (raw FS) does NOT move — a concurrent
    // reader then validates the new pointer against the stale sidecar
    // and fails with a checksum error. FileContext writes raw (no
    // sidecar); any sidecar left by an older writer is dropped first.
    val tmp = new org.apache.hadoop.fs.Path(root, s"_current.tmp-$next")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(uri, conf)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(vdir.getBytes("UTF-8")) finally out.close()
    fs.delete(new org.apache.hadoop.fs.Path(root, "._current.crc"), false)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(root, "_current"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // prune: keep the new version plus the TWO most recent previous
    // ones (a reader that resolved the pointer may still be scanning;
    // two publish cycles of slack is the retention window — the same
    // bounded-retention trade a table format's VACUUM makes); delete
    // older
    versions.map(_._1).sorted.dropRight(2).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, f"v-$v%012d"), true)
    }
  }

  /** Resolve a snapshot root to its live data directory: follow the
    * `_current` pointer if present; otherwise (pre-versioning layout,
    * or a plain parquet dir) the root itself. */
  def resolveSnapshot(spark: SparkSession, tableRoot: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tableRoot), conf)
    val ptr = new org.apache.hadoop.fs.Path(tableRoot, "_current")
    if (fs.exists(ptr)) {
      val in = fs.open(ptr)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
      s"$tableRoot/$v"
    } else tableRoot
  }

  /** Read the live version of a snapshot table published by
    * [[publishSnapshot]] (or a plain parquet dir — same call). */
  def readSnapshot(spark: SparkSession, tableRoot: String): DataFrame =
    spark.read.parquet(resolveSnapshot(spark, tableRoot))

  /** Retained snapshot versions, ascending — the live one plus up to
    * two priors (publishSnapshot's retention window). */
  def snapshotVersions(spark: SparkSession, tableRoot: String): Seq[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableRoot), spark.sparkContext.hadoopConfiguration)
    listVersions(fs, new org.apache.hadoop.fs.Path(tableRoot)).map(_._1).sorted
  }

  /** Time travel: read a specific RETAINED version (see
    * [[snapshotVersions]]) — what lets a long job pin the table state
    * it started from across concurrent publishes, and an audit re-read
    * the pre-load state. Fails loudly if the version was pruned. */
  def readSnapshotVersion(spark: SparkSession, tableRoot: String,
      version: Long): DataFrame = {
    val retained = snapshotVersions(spark, tableRoot)
    require(retained.contains(version),
      s"version $version not retained (have: ${retained.mkString(",")})")
    spark.read.parquet(f"$tableRoot/v-$version%012d")
  }

  /** True if the snapshot root has a live version (pointer or plain
    * parquet files) — the existence probe incremental consumers use. */
  def snapshotExists(spark: SparkSession, tableRoot: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    try {
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tableRoot), conf)
      val root = new org.apache.hadoop.fs.Path(tableRoot)
      fs.exists(new org.apache.hadoop.fs.Path(root, "_current")) || fs.exists(root)
    } catch { case _: Throwable => false }
  }

  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("v-") =>
        (java.lang.Long.parseLong(st.getPath.getName.stripPrefix("v-")), st.getPath)
    }
}
