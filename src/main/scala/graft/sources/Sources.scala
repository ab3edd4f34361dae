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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Upper bound on distinct partition values a single
    * [[publishMergeDeletes]] may touch. Touched-partition values are the
    * one driver-side collect in the merge-table metadata path; a delete
    * frame touching more partitions than this is a table rewrite
    * mis-spelled as a targeted delete (or the key column passed as the
    * partition column) and is refused loudly instead of materializing a
    * data-proportional set on the driver. Overridable via the
    * `graft.merge.maxTouchedPartitions` system property. */
  def MaxTouchedPartitions: Int =
    Option(System.getProperty("graft.merge.maxTouchedPartitions"))
      .map(_.toInt).getOrElse(10000)

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

  /** Partition-pruned MERGE publish, ATOMIC for readers — the 100 TB
    * path the whole-snapshot swap below cannot offer. Only the
    * partitions the incoming batch touches are read (Catalyst
    * partition-pruned scan over the manifest's live dirs) and
    * rewritten; a batch touching 3 of 10,000 date partitions reads and
    * writes 3. The natural key must functionally determine the
    * partition column (true for the reference's per-center / per-batch
    * layouts), otherwise a key could escape its old partition and
    * survive as a duplicate.
    *
    * Layout (the Iceberg/Delta idea reduced to plain parquet + one
    * pointer): data lives in IMMUTABLE batch dirs
    * `tableDir/b-<n>/<col>=<val>/…parquet` (one `partitionBy` write
    * per publish, never rewritten in place); a MANIFEST file
    * `tableDir/manifest-<n>` lists the live dir of every partition
    * (one relative path per line); `_current` points at the live
    * manifest and is swapped with the same raw-write + atomic-rename
    * mechanics as [[publishSnapshot]]. A reader ([[readMergePartitioned]])
    * resolves the pointer once and then scans a frozen, fully-written
    * set of dirs — it can never observe a partition mid-rewrite or a
    * mix of old and new partitions, the two windows the previous
    * in-place dynamic-partition-overwrite left open. Retention is
    * anchored to the live pointer (see [[pruneMergePartitioned]]):
    * the two manifests below the swapped-live one keep their dirs, so
    * a reader lagging up to two publishes keeps its files.
    *
    * Concurrent publishers serialize through the optimistic commit
    * protocol ([[commitMergeManifest]], round 16): each publish claims
    * its manifest number with an atomic put-if-absent marker; a loser
    * REBASES when the winner's partitions are disjoint from the ones
    * it read, and REFUSES with `ConcurrentModificationException` when
    * they overlap (its merged content derives from a stale read) — a
    * batch is never silently lost (the pre-r16 contract degraded
    * overlapping publishers to exactly that whole lost update).
    *
    * A pre-manifest table (plain `tableDir/<col>=<val>` dirs) is
    * adopted as the baseline manifest on first publish; its untouched
    * partition dirs are left byte-identical in place.
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
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    // Pre-manifest adoption must be DURABLE before the first rewrite:
    // materialize the legacy layout as its own baseline manifest, so
    // the legacy partition dirs are referenced by a retained manifest
    // and inherit the same two-publish retention slack as any other
    // version (otherwise the first publish would prune a dir a
    // concurrent reader of the pre-manifest layout is still scanning).
    adoptMergePartitioned(spark, tableDir, partitionCol): Unit
    val (_, entries) = latestCommitted(fs, root, partitionCol)
    // batch dirs and manifest files carry a per-publisher unique
    // suffix: two concurrent publishers that read the same max number
    // then write DISTINCT files instead of clobbering each other's
    // batch dir / manifest mid-write
    val uid = java.util.UUID.randomUUID().toString.take(8)
    // touched partitions: bounded by the incoming batch, never by the
    // table — a driver-side collect of partition VALUES only, probed
    // with a limit first (same guard as publishMergeDeletes) so a
    // mis-declared high-cardinality partition column refuses loudly
    // instead of funneling the driver
    val touchedProbe = incoming.select(partitionCol).distinct()
      .limit(MaxTouchedPartitions + 1).collect().map(_.get(0))
    require(touchedProbe.length <= MaxTouchedPartitions,
      s"publishMergePartitioned: incoming batch touches > " +
        s"$MaxTouchedPartitions distinct '$partitionCol' values — that is a " +
        "table rewrite, not a targeted merge; pick a coarser partition " +
        "column or split the publish")
    val touched = touchedProbe
    val current = assembleManifest(spark, tableDir, entries)
      .map(_.filter(col(partitionCol).isin(touched: _*)) // pruned scan
        .withColumn(partitionCol,
          col(partitionCol).cast(incoming.schema(partitionCol).dataType)))
      .getOrElse(incoming.limit(0))
    val merged = graft.operators.UpsertWriter.merge(current, incoming, cfg).merged

    val bnum = (manifestNumbers(fs, root) ++ batchNumbers(fs, root) ++
      commitNumbers(fs, root) :+ 0L).max + 1
    val bdir = f"b-$bnum%012d-$uid"
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(s"$tableDir/$bdir")
    // the segments Spark just wrote ARE the touched partitions, in its
    // own path encoding — so replacement matches old entries by name
    val written = fs.listStatus(new org.apache.hadoop.fs.Path(root, bdir))
      .collect { case st if st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol=") => st.getPath.getName }
      .toSeq
    // OCC commit: merged content was derived from `entries`' touched
    // partitions, so a rival commit to any of them refuses (stale
    // snapshot); disjoint rival commits rebase and retry.
    commitMergeManifestOrReclaim(fs, uri, conf, root, tableDir, partitionCol,
      entries, written.toSet, rebaseOnOverlap = false, uid, bdir) { es =>
      es.filterNot(e => written.contains(segmentOf(e))) ++
        written.map(s => s"$bdir/$s")
    }
    merged
  }

  /** Adopt a plain `<col>=<val>` partitioned parquet layout into the
    * manifest/pointer discipline WITHOUT rewriting any data: write a
    * baseline manifest referencing the existing partition dirs and
    * swap `_current` onto it. This is the adoption step
    * [[publishMergePartitioned]] performs implicitly on its first
    * publish, exposed for callers that need a manifest table BEFORE
    * their first merge — e.g. [[publishMergeDeletes]] (which refuses
    * pre-manifest tables) when the first delta against a bulk-written
    * table is a retraction. Idempotent: returns false (no-op) when the
    * table already has a live pointer or has no partition dirs to
    * adopt. The adopted dirs are left byte-identical in place. */
  def adoptMergePartitioned(spark: SparkSession, tableDir: String,
      partitionCol: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      if (fs.exists(new org.apache.hadoop.fs.Path(root, "_current"))) return false
      // a claimed-but-unswapped commit exists: the table IS adopted
      // (the first committed manifest embeds the baseline entries) —
      // the rival's swap just hasn't landed yet
      if (commitNames(fs, root).nonEmpty) return false
      val entries = manifestEntries(fs, root, partitionCol)
      if (entries.isEmpty) return false
      val uid = java.util.UUID.randomUUID().toString.take(8)
      val next = (manifestNumbers(fs, root) ++ batchNumbers(fs, root) ++
        commitNumbers(fs, root) :+ 0L).max + 1
      val mfile0 = f"manifest-$next%012d-$uid"
      writeRaw(uri, conf, new org.apache.hadoop.fs.Path(root, mfile0),
        entries.sorted.mkString("\n"))
      // adoption is a commit like any other (two racing adopters must
      // not both swap baselines): claim the number, loser re-checks
      if (createExclusive(fs, uri,
          new org.apache.hadoop.fs.Path(root, f"$CommitPrefix$next%012d"), mfile0)) {
        swapPointerForward(fs, uri, conf, root, mfile0, s"$next-$uid-0")
        return true
      }
    }
    throw new IllegalStateException(
      s"adoptMergePartitioned on $tableDir lost 20 consecutive claim races")
  }

  /** APPEND-ONLY publish for a [[publishMergePartitioned]] table: the
    * incoming rows land in a NEW batch dir and its partition segments
    * are ADDED to the manifest alongside the existing entries for the
    * same partitions — no current-content read, no partition rewrite.
    * This is the log-structured half of the merge-table story: a
    * high-fanout delta (e.g. one document batch touching every term
    * bucket of an inverted index) costs the DELTA's write, not the
    * touched partitions' rewrite — [[publishMergePartitioned]] would
    * rewrite them all, which at full fanout is a table rebuild per
    * batch (measured: SCALING.md round 14). The price is paid on READ
    * (a partition's rows now span several listed dirs — the reader
    * already unions multi-dir entries) and settled by periodic
    * compaction ([[publishMergeReplace]] folding a partition back to
    * one dir). APPEND has no keyed semantics: callers owning upsert
    * or delete meaning must pair it with their own tombstone
    * discipline (see `operators/LexicalIndex` / the IVF-PQ
    * maintenance) — raw appends of an existing key produce duplicate
    * rows by design, exactly like LSM segments before a merge. */
  def publishMergeAppend(
      spark: SparkSession,
      tableDir: String,
      incoming: DataFrame,
      partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    adoptMergePartitioned(spark, tableDir, partitionCol): Unit
    val (_, entries) = latestCommitted(fs, root, partitionCol)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val bnum = (manifestNumbers(fs, root) ++ batchNumbers(fs, root) ++
      commitNumbers(fs, root) :+ 0L).max + 1
    val bdir = f"b-$bnum%012d-$uid"
    // one segment file per partition per publish: without the
    // repartition, T tasks × P touched partitions emit T·P tiny files
    // and the serial job-commit rename dominates the apply wall
    // (measured 48 of 57 s at sf10 — the delta write itself is ~1 s)
    incoming.repartition(col(partitionCol)).write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(s"$tableDir/$bdir")
    val written = fs.listStatus(new org.apache.hadoop.fs.Path(root, bdir))
      .collect { case st if st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol=") => st.getPath.getName }
      .toSeq
    // OCC commit: an append never reads current content, so rival
    // commits — even to the same partitions — are just more segments;
    // always rebase, never refuse (rebaseOnOverlap). Both racing
    // appends' rows land (OccMergeSpec races this).
    commitMergeManifestOrReclaim(fs, uri, conf, root, tableDir, partitionCol,
      entries, Set.empty, rebaseOnOverlap = true, uid, bdir) { es =>
      es ++ written.map(s => s"$bdir/$s")
    }
  }

  /** Whole-partition REPLACEMENT publish: `content` becomes the entire
    * content of the named `partitions` — every live entry of those
    * partitions is dropped from the manifest and the new batch dir's
    * segments take their place (a partition with no rows in `content`
    * simply disappears). This is the compaction primitive for
    * append-maintained tables: fold a partition's multi-dir row set
    * (minus tombstoned rows, applied by the CALLER) back to one dir.
    * Unlike [[publishMergePartitioned]] there is NO merge with current
    * content — the caller asserts `content` is the truth for those
    * partitions. Same manifest/pointer/retention discipline. */
  /** `basisVersion`: the [[mergeCommittedVersion]] snapshotted BEFORE
    * reading the content being folded. With it, a rival commit to the
    * replaced partitions between that read and this commit REFUSES
    * (`ConcurrentModificationException`) instead of being silently
    * folded away — the transactional compaction contract. Without it
    * the basis defaults to commit time (correct only under the
    * single-logical-writer maintenance discipline, where no rival can
    * write between read and publish). */
  def publishMergeReplace(
      spark: SparkSession,
      tableDir: String,
      content: DataFrame,
      partitionCol: String,
      partitions: Seq[Any],
      basisVersion: Option[Long] = None): Unit = {
    import org.apache.spark.sql.functions.col
    require(partitions.nonEmpty, "publishMergeReplace: empty partition list")
    // Same guard as publishMergeDeletes: replaced partitions are matched
    // against manifest dir segments by VALUE STRING, and Spark
    // percent-encodes exotic partition values (and renders null/empty as
    // the default-partition sentinel) on write — a value that does not
    // round-trip escapePathName would silently match no live entry and
    // RETAIN the stale rows beside the replacement batch (duplicates
    // after compaction). Refuse loudly instead.
    locally {
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      partitions.foreach { v =>
        require(v != null,
          "publishMergeReplace: null partition value — republish the whole " +
            "table instead")
        val s = String.valueOf(v)
        require(s.nonEmpty,
          "publishMergeReplace: empty-string partition value — Spark writes " +
            "it as the default-partition sentinel; republish the whole table " +
            "instead")
        require(ExternalCatalogUtils.escapePathName(s) == s,
          s"publishMergeReplace: partition value '$s' does not round-trip " +
            "Spark's partition-path encoding — replace by a path-safe " +
            "partition value")
      }
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    adoptMergePartitioned(spark, tableDir, partitionCol): Unit
    val (_, entries) = latestCommitted(fs, root, partitionCol)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val bnum = (manifestNumbers(fs, root) ++ batchNumbers(fs, root) ++
      commitNumbers(fs, root) :+ 0L).max + 1
    val bdir = f"b-$bnum%012d-$uid"
    // compaction output: one folded file per partition (see the
    // small-file note in publishMergeAppend)
    content.repartition(col(partitionCol)).write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(s"$tableDir/$bdir")
    val written = fs.listStatus(new org.apache.hadoop.fs.Path(root, bdir))
      .collect { case st if st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol=") => st.getPath.getName }
      .toSeq
    val replacedStr = partitions.map(String.valueOf).toSet
    val valueOfSeg = (s: String) => s.split("=", 2).lift(1).getOrElse("")
    // OCC commit: `content` asserts the whole truth for the replaced
    // partitions, derived from a read of their current content
    // (compaction) — a rival commit touching any of them refuses.
    // Touched = the replaced values' canonical segment names (values
    // are guard-checked to round-trip Spark's path escaping above, so
    // name == s"$partitionCol=$value") plus whatever was written.
    val touchedSegs =
      replacedStr.map(v => s"$partitionCol=$v") ++ written
    val basisEntries = basisVersion match {
      case None => entries
      case Some(v) => committedEntriesAt(fs, root, v).getOrElse(
        throw new java.util.ConcurrentModificationException(
          s"publishMergeReplace on $tableDir: basis version $v is no longer " +
            "retained — the content read is older than the retention window; " +
            "re-read and retry"))
    }
    commitMergeManifestOrReclaim(fs, uri, conf, root, tableDir, partitionCol,
      basisEntries, touchedSegs, rebaseOnOverlap = false, uid, bdir) { es =>
      val newEntries =
        es.filterNot(e => replacedStr.contains(valueOfSeg(segmentOf(e)))) ++
          written.map(s => s"$bdir/$s")
      require(newEntries.nonEmpty,
        "publishMergeReplace would empty the table — republish it instead")
      newEntries
    }
  }

  /** Row-level DELETE publish for a [[publishMergePartitioned]] table —
    * the retraction half MERGE alone can't express (GDPR erasure,
    * eval-set eviction, takedowns): rewrite the touched partitions
    * WITHOUT the rows matching `deletes` on `cfg.naturalKey`, under
    * the exact same manifest/forward-pointer/retention discipline as
    * a merge publish. Deleted keys then surface as `orphaned` in
    * [[mergeRowChangesSince]], so keyed downstream state (e.g.
    * [[graft.operators.Dedup.decontaminateChanges]]'s status
    * snapshot) retracts them through the row-level change feed.
    *
    * `deletes` must carry the natural key AND `partitionCol` — the
    * partition values locate the touched partitions without a table
    * scan, so the cost is the touched partitions' size, never the
    * table. A partition emptied by the delete drops out of the
    * manifest entirely (its data dir is pruned on the standard
    * two-publish slack). Partition values must round-trip their
    * `toString` through Spark's partition-path encoding (true for
    * numeric/date/plain-string values; exotic strings and nulls would
    * be percent-/sentinel-encoded by Spark's `escapePathName` and are
    * refused loudly rather than silently kept — the guard round-trips
    * each value through the exact escaping Spark writes with). Deletes
    * touching more than [[MaxTouchedPartitions]] distinct partition
    * values are refused as table-rewrites-in-disguise. Returns the
    * number of rows deleted (0 = no key matched; no publish). */
  def publishMergeDeletes(
      spark: SparkSession,
      tableDir: String,
      deletes: DataFrame,
      cfg: graft.types.TableConfig,
      partitionCol: String): Long = {
    import org.apache.spark.sql.functions.col
    require(deletes.columns.contains(partitionCol),
      s"deletes frame must carry the partition column '$partitionCol'")
    cfg.naturalKey.foreach(k => require(deletes.columns.contains(k),
      s"deletes frame must carry natural-key column '$k'"))
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    require(fs.exists(new org.apache.hadoop.fs.Path(root, "_current")),
      s"publishMergeDeletes: '$tableDir' is not a manifest-published table")
    val (_, entries) = latestCommitted(fs, root, partitionCol)
    if (entries.isEmpty) return 0L
    // Bounded metadata collect: touched-partition cardinality is the ONLY
    // thing collected, and even that is probed with a limit first so a
    // mis-specified deletes frame (e.g. the key column passed as the
    // partition column) refuses loudly instead of materializing a
    // data-proportional set on the driver.
    val maxTouched = MaxTouchedPartitions
    val touchedProbe = deletes.select(partitionCol).distinct()
      .limit(maxTouched + 1).collect().map(_.get(0))
    require(touchedProbe.length <= maxTouched,
      s"publishMergeDeletes: deletes touch > $maxTouched distinct " +
        s"'$partitionCol' values — that is a table rewrite, not a targeted " +
        "delete; split the job or republish the table instead")
    val touched = touchedProbe
    // Spark percent-encodes far more than '/' and '%' on partition paths
    // (':', '=', '#', '*', '?', quotes, brackets, …) and renders null as
    // __HIVE_DEFAULT_PARTITION__. Guard with the SAME escaping Spark uses:
    // a value that does not round-trip identity through escapePathName
    // would silently match no manifest segment and retain rows meant for
    // erasure — refuse loudly instead.
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    touched.foreach { v =>
      require(v != null,
        "publishMergeDeletes: null partition value — delete null-partition " +
          "rows by republishing the table without them")
      val s = String.valueOf(v)
      // escapePathName("") == "" passes the round-trip, but the writer
      // renders empty (like null) as __HIVE_DEFAULT_PARTITION__
      // (ExternalCatalogUtils.getPartitionPathString) — an empty-string
      // delete would silently match no segment and RETAIN the rows
      require(s.nonEmpty,
        "publishMergeDeletes: empty-string partition value — Spark writes " +
          "it as the default-partition sentinel; delete those rows by " +
          "republishing the table without them")
      require(ExternalCatalogUtils.escapePathName(s) == s,
        s"partition value '$s' does not round-trip Spark's partition-path " +
          "encoding — delete by a path-safe partition value")
    }
    val touchedStr = touched.map(String.valueOf).toSet
    val valueOfSeg = (s: String) => s.split("=", 2).lift(1).getOrElse("")
    val liveVals = entries.map(e => valueOfSeg(segmentOf(e))).toSet
    val dropSegs = entries.map(segmentOf)
      .filter(s => touchedStr.contains(valueOfSeg(s))).toSet
    if (dropSegs.isEmpty) {
      // Every touched value missed the manifest. The escapePathName
      // round-trip guard above already rules out the silent-rendering
      // mismatch class, so this is genuinely "partition not live" —
      // e.g. an idempotent re-run after the delete emptied it. Keep the
      // no-op contract but say so loudly in the log.
      log.warn(
        s"publishMergeDeletes: none of the ${touchedStr.size} touched " +
          s"'$partitionCol' values match a live partition " +
          s"(live sample: ${liveVals.take(5).mkString(", ")}); no-op")
      return 0L
    }
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val bnum = (manifestNumbers(fs, root) ++ batchNumbers(fs, root) ++
      commitNumbers(fs, root) :+ 0L).max + 1
    val current = assembleManifest(spark, tableDir, entries).get
      .filter(col(partitionCol).isin(touched: _*))
      .withColumn(partitionCol,
        col(partitionCol).cast(deletes.schema(partitionCol).dataType))
    val delKeys = deletes.select(cfg.naturalKey.map(col): _*).distinct()
    val remaining = current.join(delKeys, cfg.naturalKey, "left_anti")
      .localCheckpoint(false) // count + write off one materialization
    val nDeleted = current.count() - remaining.count()
    if (nDeleted == 0L) return 0L
    val bdir = f"b-$bnum%012d-$uid"
    remaining.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(s"$tableDir/$bdir")
    val written =
      if (!fs.exists(new org.apache.hadoop.fs.Path(root, bdir))) Seq.empty[String]
      else fs.listStatus(new org.apache.hadoop.fs.Path(root, bdir))
        .collect { case st if st.isDirectory &&
          st.getPath.getName.startsWith(s"$partitionCol=") => st.getPath.getName }
        .toSeq
    // OCC commit: the rewrite was derived from the touched partitions'
    // current content — a rival commit to any of them refuses (a
    // silent stale-snapshot commit would RESURRECT the rival's deleted
    // rows or drop its merged ones). Disjoint rivals rebase.
    commitMergeManifestOrReclaim(fs, uri, conf, root, tableDir, partitionCol,
      entries, dropSegs ++ written, rebaseOnOverlap = false, uid, bdir) { es =>
      // drop EVERY old entry of a touched partition (including ones the
      // rewrite emptied — merge publishes never empty a partition, so
      // this is the one place entries vanish by value, not by name)
      es.filterNot(e => dropSegs.contains(segmentOf(e))) ++
        written.map(s => s"$bdir/$s")
    }
    nDeleted
  }

  /** Prune rotated manifests and the batch dirs only they reference.
    *
    * The retention contract is anchored to the LIVE POINTER, not the
    * file listing: a reader that resolved `_current` at manifest
    * number k keeps every dir k references until at least two newer
    * manifests have been SWAPPED live (the two-publish reader slack).
    * Written-but-not-yet-swapped manifests therefore cannot consume
    * the slack — the round-8 N×M stress failure was `takeRight(3)`
    * counting three in-flight publishers' manifests as the retained
    * set and rotating out a manifest a live reader had just resolved.
    * Protection set = every manifest numbered ≥ live−2 (the live one,
    * the two-publish slack below it, anything newer or pending) plus
    * any younger-than-grace candidate (a stalled publisher whose
    * number fell behind; past the grace it degrades to the documented
    * lost update).
    *
    * The pass is ABORT-ON-DOUBT: if any manifest in the ≥ live−2
    * protection set vanishes before its reference list is read (a
    * concurrent pruner won a race), this pass deletes NOTHING — the
    * round-8 failure's second ingredient was a vanished retained
    * manifest silently reading as an empty reference list, shrinking
    * the protection set. Deferral leaks nothing: the next publish
    * re-runs the prune. A vanished CANDIDATE (number < live−2,
    * whether aged or inside the grace) just drops out of both the
    * protection and the deletion sets — no in-window reader can be
    * holding it, by the pointer arithmetic above, and a concurrent
    * pruner deleting it means its dirs were already adjudicated.
    *
    * Deletion order is dirs-then-manifests: a crash between the two
    * leaves a still-readable rotated manifest whose next prune is
    * idempotent, never an orphan dir referenced by no manifest (which
    * the in-flight-batch rule would preserve forever). */
  private[sources] def pruneMergePartitioned(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, graceMs: Long = 10L * 60 * 1000): Unit = {
    val liveNum = currentPointer(fs, root) match {
      case Some(m) if m.startsWith("manifest-") => numberOf(m, "manifest-")
      case _ => return // unreadable/foreign pointer: nothing safe to do
    }
    val (protect, candidates) =
      manifestNames(fs, root).partition(m => numberOf(m, "manifest-") >= liveNum - 2)
    val now = System.currentTimeMillis()
    val aged = candidates.flatMap { m =>
      try Some(m -> (now - fs.getFileStatus(
        new org.apache.hadoop.fs.Path(root, m)).getModificationTime < graceMs))
      catch { case _: java.io.FileNotFoundException => None }
    }
    val young = aged.collect { case (m, true) => m }
    val old   = aged.collect { case (m, false) => m }
    if (old.isEmpty) return
    val protectRefs = protect.map(readManifestOpt(fs, root, _))
    if (protectRefs.exists(_.isEmpty)) return // abort-on-doubt
    val youngRefs = young.flatMap(readManifestOpt(fs, root, _)).flatten
    val referenced = (protectRefs.flatMap(_.get) ++ youngRefs).map(topSegmentOf).toSet
    val dead = old.flatMap(readManifest(fs, root, _))
      .map(topSegmentOf).toSet -- referenced
    dead.foreach(d =>
      deleteQuiet(fs, new org.apache.hadoop.fs.Path(root, d), recursive = true))
    old.foreach(m =>
      deleteQuiet(fs, new org.apache.hadoop.fs.Path(root, m), recursive = false))
    // retire the OCC commit markers alongside the manifests they claimed
    // (same retention floor; newer markers keep serving latestCommitted
    // and the monotonic-number max). Only numbers of deleted manifests —
    // a marker inside the protection window stays.
    old.map(numberOf(_, "manifest-")).distinct.foreach(n =>
      deleteQuiet(fs,
        new org.apache.hadoop.fs.Path(root, f"$CommitPrefix$n%012d"),
        recursive = false))
    // reclaim crashed-claimer litter: aged _claim-* temps (a completed
    // claim moves its temp away within milliseconds) and aged
    // claimed-DEAD markers below the protection floor (content never
    // names a manifest — a legacy crash's corpse; the commit loop
    // already numbers past them, this just stops the listing growing)
    fs.listStatus(root).toSeq.foreach { st =>
      val name = st.getPath.getName
      lazy val aged = now - st.getModificationTime >= graceMs
      if (st.isFile && name.startsWith(ClaimTmpPrefix) && aged)
        deleteQuiet(fs, st.getPath, recursive = false)
      else if (st.isFile && name.startsWith(CommitPrefix) &&
          numberOf(name, CommitPrefix) < liveNum - 2 && aged) {
        val valid =
          try {
            val in = fs.open(st.getPath)
            val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                    finally in.close()
            s.startsWith("manifest-")
          } catch { case _: java.io.FileNotFoundException => true }
        if (!valid) deleteQuiet(fs, st.getPath, recursive = false)
      }
    }
  }

  /** delete() tolerating concurrent-pruner races: on a vanished path
    * it returns false on most filesystems, but some object-store
    * shims throw FNF from the recursive listing instead. */
  private def deleteQuiet(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, recursive: Boolean): Unit =
    try { fs.delete(p, recursive); () }
    catch { case _: java.io.FileNotFoundException => () }

  private[sources] def currentPointer(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = fs.open(new org.apache.hadoop.fs.Path(root, "_current"))
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
      Some(s)
    } catch { case _: java.io.IOException => None }

  /** [[swapPointer]] guarded to never move the pointer BACKWARDS by
    * manifest number: with concurrent publishers, a slow swap landing
    * after a faster rival's would otherwise regress the pointer —
    * time travel for readers and a shrunk window for the
    * pointer-anchored retention math. Skipping the swap degrades this
    * publish to the same documented lost update as losing the swap
    * race. (read-then-rename is not a CAS; the residual regression
    * window is the gap between the two, which the abort-on-doubt
    * prune tolerates.) */
  private[sources] def swapPointerForward(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration,
      root: org.apache.hadoop.fs.Path, content: String, stamp: String,
      prefix: String = "manifest-"): Unit = {
    val newer = currentPointer(fs, root).exists(cur =>
      cur.startsWith(prefix) && content.startsWith(prefix) &&
        numberOf(cur, prefix) > numberOf(content, prefix))
    if (!newer) swapPointer(fs, uri, conf, root, content, stamp)
  }

  // ─────────────── optimistic-concurrency commit (round 16) ───────────────

  private val CommitPrefix = "commit-"

  private def commitNames(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isFile && st.getPath.getName.startsWith(CommitPrefix) =>
        st.getPath.getName
    }

  private def commitNumbers(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    commitNames(fs, root).map(numberOf(_, CommitPrefix))

  /** Atomic create-EXCLUSIVE of a small control file — the put-if-absent
    * the optimistic commit serializes on. True iff this caller created
    * it; false when a rival already owns the name.
    *
    * The claim's CONTENT must be atomic with the claim itself: a direct
    * create-then-write crashing between the two leaves an empty marker
    * that owns its number forever — every later publish re-derives the
    * same next number, loses the claim to the corpse, and wedges after
    * its retry budget (a PERMANENT publish wedge, since nothing ever
    * reclaimed the marker). So the content is written complete to a
    * sibling `_claim-*` temp first (a name the `commit-*` listings never
    * match) and the claim is the atomic no-replace move into the final
    * name: link(2) on file:// (EEXIST from a rival is the lost race;
    * POSIX rename would silently REPLACE, and NIO's no-replace move is
    * emulated exists-then-rename — a TOCTOU two racing publishers fall
    * straight into), HDFS rename elsewhere (single NameNode op, false
    * when the destination exists). Either way the final name appears
    * with its full content or not at all. */
  private def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, path: org.apache.hadoop.fs.Path,
      content: String): Boolean = {
    val tmpName = s"$ClaimTmpPrefix${path.getName}-" +
      java.util.UUID.randomUUID().toString.take(8)
    if (Option(uri.getScheme).forall(_ == "file")) {
      val target = java.nio.file.Paths.get(path.toUri.getPath)
      val tmp = target.resolveSibling(tmpName)
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8")): Unit
      try { java.nio.file.Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally { java.nio.file.Files.deleteIfExists(tmp): Unit }
    } else {
      val tmp = new org.apache.hadoop.fs.Path(path.getParent, tmpName)
      val out = fs.create(tmp, false)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      val won =
        try fs.rename(tmp, path)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      if (!won) deleteQuiet(fs, tmp, recursive = false)
      won
    }
  }

  /** [[createExclusive]] for claim protocols outside this file (the
    * index generation swap's dense slots,
    * [[graft.operators.IndexGenerations.swap]]). */
  private[graft] def createExclusiveClaim(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, path: org.apache.hadoop.fs.Path,
      content: String): Boolean = createExclusive(fs, uri, path, content)

  /** Temp-file prefix for in-flight [[createExclusive]] claims. Deliberately
    * outside every control-file namespace (`commit-*`, `manifest-*`, `b-*`,
    * `_current`); a crashed claimer's leftover is reclaimed by
    * [[pruneMergePartitioned]] once aged. */
  private val ClaimTmpPrefix = "_claim-"

  /** Deterministic tombstone a reclaimed corpse marker is renamed to —
    * see [[reclaimCorpseMarker]]. PERMANENT by design: its existence is
    * what makes a second reclaim of the same number impossible. */
  private val CorpseTombPrefix = "_corpse-"

  /** Exclusive reclaim of a content-less/garbage `commit-<n>` marker (a
    * pre-content-atomic crash corpse) — ADVICE r17 #2. The blind
    * read-then-delete it replaces was a TOCTOU on a shared name:
    * publisher A reads the corpse, pauses (GC, scheduler); rival B
    * reads the same corpse, deletes it, wins the number with a VALID
    * marker and swaps; A resumes and its delete destroys B's committed
    * marker, A re-claims the number and commits a manifest rebased on
    * the pre-B state — B's batch silently dropped (the forward-only
    * pointer guard does not block an equal-numbered swap). The
    * read-to-delete window is unbounded, so "unlikely" is not an
    * argument.
    *
    * The delete is therefore an atomic no-replace RENAME to the
    * deterministic tombstone `_corpse-<n>`:
    *  - exactly one renamer of a single source inode wins; the loser
    *    sees the source vanish (or the tombstone already present) and
    *    simply re-contests the number through the normal claim;
    *  - the tombstone is PERMANENT: a second reclaim of number n fails
    *    on dest-exists, so once n transitions corpse→valid nothing can
    *    ever rename the valid marker away — the exact hole the blind
    *    delete had. Corpses cannot re-form post-r17 ([[createExclusive]]
    *    links full content atomically), so the litter bound is one
    *    ~40-byte tombstone per LEGACY corpse, ever;
    *  - a crash after the rename leaves the number open (marker gone)
    *    for any publisher to contest normally — never a wedge.
    * Belt-and-braces: if the renamed content turns out VALID (a state
    * the tombstone discipline makes unreachable), it is restored via
    * the same atomic put-if-absent; a failed restore throws loudly —
    * never a silently dropped committed manifest. */
  private[sources] def reclaimCorpseMarker(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, root: org.apache.hadoop.fs.Path,
      markerPath: org.apache.hadoop.fs.Path, next: Long): Unit = {
    val tomb = new org.apache.hadoop.fs.Path(root, f"$CorpseTombPrefix$next%012d")
    val won =
      if (Option(uri.getScheme).forall(_ == "file"))
        try {
          java.nio.file.Files.move(
            java.nio.file.Paths.get(markerPath.toUri.getPath),
            java.nio.file.Paths.get(tomb.toUri.getPath)): Unit
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.nio.file.NoSuchFileException => false
        }
      else
        try fs.rename(markerPath, tomb)
        catch {
          case _: java.io.FileNotFoundException => false
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        }
    if (won) {
      val content = readControlQuiet(fs, tomb)
      if (content.startsWith("manifest-") &&
          !createExclusive(fs, uri, markerPath, content))
        throw new IllegalStateException(
          s"corpse reclaim on $markerPath renamed a marker that turned " +
            s"VALID and could not restore it ($content) — refusing loudly " +
            "rather than dropping a committed manifest reference")
    }
  }

  /** The highest COMMITTED state of a merge table: the manifest named by
    * the largest claimed commit marker, or by the pointer when that is
    * newer (legacy publishes swapped without claiming). This is the
    * publisher-side read — unlike the reader's pointer resolve it sees a
    * commit whose pointer swap has not landed yet (or whose publisher
    * crashed between claim and swap), so a rebase can never silently
    * drop a durably-claimed rival batch. Pre-manifest tables return the
    * adoption listing at number 0. */
  private def latestCommitted(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      partitionCol: String): (Long, Seq[String]) = {
    // walk DOWN from the largest marker past any with unreadable/invalid
    // content: a crashed legacy (pre-r17) claimer left content-less
    // markers, and those numbers are claimed-DEAD (a burned slot, no
    // manifest) — the newest marker that actually names a manifest is
    // the committed state
    val markerManifest = commitNames(fs, root)
      .sortBy(numberOf(_, CommitPrefix)).reverseIterator.map { c =>
        try {
          val in = fs.open(new org.apache.hadoop.fs.Path(root, c))
          val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                  finally in.close()
          if (s.startsWith("manifest-")) Some(s) else None
        } catch { case _: java.io.FileNotFoundException => None }
      }.collectFirst { case Some(m) => m }
    val ptrManifest = currentPointer(fs, root).filter(_.startsWith("manifest-"))
    (markerManifest.toSeq ++ ptrManifest.toSeq)
      .sortBy(numberOf(_, "manifest-")).lastOption match {
      case Some(m) => readManifestOpt(fs, root, m) match {
        case Some(es) => (numberOf(m, "manifest-"), es)
        case None =>
          // the named manifest vanished (pruned mid-read): the
          // pointer-resolved read retries / fails loudly
          (numberOf(m, "manifest-"), manifestEntries(fs, root, partitionCol))
      }
      case None => (0L, manifestEntries(fs, root, partitionCol))
    }
  }

  /** Segment names (`col=value`) whose live dir-set differs between two
    * manifest reference lists — the partitions rival commits changed
    * between a publisher's read and its claim. */
  private def changedSegments(a: Seq[String], b: Seq[String]): Set[String] = {
    def bySeg(es: Seq[String]) =
      es.groupBy(segmentOf).map { case (s, v) => s -> v.sorted }
    val ma = bySeg(a); val mb = bySeg(b)
    (ma.keySet ++ mb.keySet).filter(s => ma.get(s) != mb.get(s))
  }

  /** The committed version number of a merge table right now — the
    * READ BASIS a transactional caller snapshots BEFORE deriving
    * content it will publish with [[publishMergeReplace]]: passing it
    * back as `basisVersion` makes the commit refuse if any rival
    * committed to the same partitions after this moment (instead of
    * silently folding the rival's rows away). */
  def mergeCommittedVersion(spark: SparkSession, tableDir: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    latestCommitted(fs, new org.apache.hadoop.fs.Path(tableDir), "")._1
  }

  /** Reference list of the commit CLAIMED at `version` (marker first —
    * it names the one manifest that won the number; unclaimed legacy
    * manifests fall back to a unique name match). None when the
    * version is no longer resolvable (pruned past retention, or
    * ambiguous rivals). */
  private def committedEntriesAt(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, version: Long): Option[Seq[String]] = {
    val viaMarker =
      try {
        val in = fs.open(new org.apache.hadoop.fs.Path(root,
          f"$CommitPrefix$version%012d"))
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
        if (s.startsWith("manifest-")) Some(s) else None
      } catch { case _: java.io.FileNotFoundException => None }
    val name = viaMarker.orElse {
      manifestNames(fs, root).filter(numberOf(_, "manifest-") == version) match {
        case Seq(one) => Some(one)
        case _ => None
      }
    }
    name.flatMap(readManifestOpt(fs, root, _))
  }

  /** Optimistic-concurrency manifest commit — the engine's answer to the
    * reference's per-load Postgres transaction
    * (table-loader/services/loader.py:102 runs each load in one
    * connection/txn; a filesystem table gets no such server, so the
    * commit protocol has to build the serialization itself).
    *
    * Before r16 concurrent DATA publishers degraded to a silent whole
    * lost update: both read manifest N, both wrote a rival N+1 (distinct
    * uids), last pointer swap won and the loser's batch quietly fell out
    * of the reference list. Now every publish CLAIMS its manifest number
    * with [[createExclusive]] on `commit-<n>` (the Delta-on-HDFS
    * put-if-absent protocol): exactly one publisher owns each number, so
    * commits serialize. A publisher that loses its claim re-reads the
    * winner's committed reference list ([[latestCommitted]]) and either
    *
    *  - REBASES — recomputes its entry edit against the winner's list
    *    and retries at the next number — when the rival's changes are
    *    disjoint from the partitions this publish consumed, or when the
    *    caller's content never depended on current content at all
    *    (`rebaseOnOverlap`, the pure-append LSM path, where
    *    same-partition rival batches are semantically just more
    *    segments); or
    *  - REFUSES loudly (`ConcurrentModificationException`) when the
    *    winner changed a partition whose CURRENT content this publish
    *    read (merge / replace / delete derive their output from that
    *    read — committing it after a rival rewrite would publish state
    *    derived from a stale snapshot and silently drop the rival's
    *    rows: Delta's write-conflict semantics, refuse-and-recompute).
    *
    * Either way a claimed batch is never silently lost — the pre-r16
    * contract documented exactly that loss. A commit is durable at
    * marker creation: a publisher crashing between claim and pointer
    * swap is folded in by the next publisher's rebase (the marker names
    * its manifest; readers see it at that publisher's swap).
    *
    * `touchedSegs` = partition segments whose current content the caller
    * consumed or replaces (by Spark-escaped segment name). `mkEntries`
    * re-derives the new reference list from any base — it runs once per
    * attempt. */
  private def commitMergeManifest(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration,
      root: org.apache.hadoop.fs.Path, tableDir: String, partitionCol: String,
      basisEntries: Seq[String], touchedSegs: Set[String],
      rebaseOnOverlap: Boolean, uid: String)(
      mkEntries: Seq[String] => Seq[String]): Unit = {
    // conflicts are ALWAYS judged against the caller's read basis (the
    // reference list its content derives from), never a rebased view —
    // a commit landing between the basis read and the first claim is
    // exactly as stale-making as one landing mid-loop
    def refuseIfConflicting(committed: Seq[String]): Unit = {
      val conflict = changedSegments(basisEntries, committed) intersect touchedSegs
      if (conflict.nonEmpty && !rebaseOnOverlap)
        throw new java.util.ConcurrentModificationException(
          s"merge commit on $tableDir: a concurrent publisher committed " +
            s"changes to partition(s) ${conflict.take(5).mkString(", ")}" +
            (if (conflict.size > 5) s" (+${conflict.size - 5} more)" else "") +
            " after this publish read their current content — re-read and " +
            "re-derive the publish (stale-snapshot write refused, not lost)")
    }
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 20) throw new IllegalStateException(
        s"merge commit on $tableDir lost ${attempts - 1} consecutive claim " +
          "races — pathological publisher contention; back off and retry")
      // DENSE claim numbers — the load-bearing detail. The claim must
      // be EXACTLY lastCommitted + 1: winning it PROVES no rival
      // committed between this latestCommitted read and the claim (any
      // rival would have had to take the same number first). Numbering
      // past anything by a listing max — the first r16 cut, and
      // briefly an r17 corpse-skipping variant — leaves a gap a rival
      // can commit into without ever contesting our claim: its fresh
      // VALID marker lands between our latestCommitted read and the
      // listing, we claim past it uncontested, and the later
      // forward-guarded pointer swap silently drops whichever publish
      // holds the smaller number (OccMergeSpec's same-partition race
      // caught exactly this as "succeeded but silently lost").
      //
      // A crashed claimer's content-less marker at next would instead
      // wedge this loop forever (its number is owned by a corpse). r17
      // claims are content-ATOMIC (createExclusive links the full
      // content into place), so an existing marker with invalid
      // content can never be a rival mid-write — it is provably dead,
      // and the fix that preserves density is to RECLAIM the corpse
      // and contest its number, not to number past it.
      val (cNum, committed) = latestCommitted(fs, root, partitionCol)
      refuseIfConflicting(committed)
      val next = cNum + 1
      val markerPath = new org.apache.hadoop.fs.Path(root, f"$CommitPrefix$next%012d")
      val corpse =
        try {
          val in = fs.open(markerPath)
          val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                  finally in.close()
          !s.startsWith("manifest-")
        } catch { case _: java.io.FileNotFoundException => false }
      if (corpse) reclaimCorpseMarker(fs, uri, root, markerPath, next)
      val mfile = f"manifest-$next%012d-$uid"
      writeRaw(uri, conf, new org.apache.hadoop.fs.Path(root, mfile),
        mkEntries(committed).sorted.mkString("\n"))
      if (createExclusive(fs, uri, markerPath, mfile)) {
        swapPointerForward(fs, uri, conf, root, mfile, s"$next-$uid-1")
        pruneMergePartitioned(fs, root)
        return
      }
      // the lost attempt's manifest is claimed by nothing and referenced
      // by nothing — reclaim it now rather than leaking one file per
      // lost race (and keeping committedEntriesAt's unique-name
      // fallback unambiguous)
      deleteQuiet(fs, new org.apache.hadoop.fs.Path(root, mfile),
        recursive = false)
      log.info(s"merge commit on $tableDir: claim $next lost to a rival " +
        s"publisher; rebasing (attempt $attempts)")
    }
  }

  /** [[commitMergeManifest]] that reclaims the caller's just-written
    * batch dir when the commit throws — a stale-snapshot REFUSE
    * (`ConcurrentModificationException`) or claim-retry exhaustion
    * (`IllegalStateException`). On those paths no COMMITTED manifest
    * references the dir (loser-attempt manifests are deleted inside the
    * commit loop), and [[pruneMergePartitioned]] only reclaims dirs
    * referenced by deleted manifests — without this a first-attempt
    * refuse would orphan the full merged batch dir on disk forever. */
  private def commitMergeManifestOrReclaim(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration,
      root: org.apache.hadoop.fs.Path, tableDir: String, partitionCol: String,
      basisEntries: Seq[String], touchedSegs: Set[String],
      rebaseOnOverlap: Boolean, uid: String, bdir: String)(
      mkEntries: Seq[String] => Seq[String]): Unit =
    try commitMergeManifest(fs, uri, conf, root, tableDir, partitionCol,
      basisEntries, touchedSegs, rebaseOnOverlap, uid)(mkEntries)
    catch {
      case e @ (_: java.util.ConcurrentModificationException |
                _: IllegalStateException) =>
        deleteQuiet(fs, new org.apache.hadoop.fs.Path(root, bdir),
          recursive = true)
        throw e
    }

  /** Read the live state of a [[publishMergePartitioned]] table:
    * resolve the manifest pointer once, then scan exactly the dirs it
    * lists (grouped per batch dir so Spark's partition discovery
    * restores the partition column, and Catalyst partition pruning
    * still prunes reader-side filters to the touched dirs). A
    * pre-manifest or plain parquet dir reads as-is. */
  def readMergePartitioned(spark: SparkSession, tableDir: String,
      partitionCol: String = ""): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tableDir), conf)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    assembleManifest(spark, tableDir, manifestEntries(fs, root, partitionCol))
      .getOrElse(spark.read.parquet(tableDir))
  }

  /** Per-partition live GENERATION counts of a merge table: partition
    * dir segment (`col=value`) → number of distinct batch dirs the
    * live manifest stitches together for it. This is the LSM
    * read-amplification metric — every generation is one more parquet
    * dir a scan of that partition opens — and the signal the
    * index-maintenance trigger compacts on
    * ([[graft.operators.IndexMaintenance]]). Listing-only: resolves
    * the manifest pointer, no Spark job. */
  def mergeGenerations(spark: SparkSession, tableDir: String,
      partitionCol: String): Map[String, Int] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_current"))) {
      // pre-adoption plain layout: one top-level dir per partition =
      // one generation each
      if (!fs.exists(root)) Map.empty
      else fs.listStatus(root).toSeq.collect {
        case st if st.isDirectory &&
          st.getPath.getName.startsWith(s"$partitionCol=") =>
          st.getPath.getName -> 1
      }.toMap
    }
    else manifestEntries(fs, root, partitionCol)
      .groupBy(segmentOf)
      .view.mapValues(_.map(topSegmentOf).distinct.size).toMap
  }

  /** Distinct live top-level batch dirs of a merge table — the
    * table-wide commit/bookkeeping cost companion to
    * [[mergeGenerations]]. Listing-only. */
  def mergeBatchDirCount(spark: SparkSession, tableDir: String,
      partitionCol: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_current")))
      // pre-adoption plain layout: the table root is the one batch
      if (mergeGenerations(spark, tableDir, partitionCol).isEmpty) 0 else 1
    else manifestEntries(fs, root, partitionCol).map(topSegmentOf).distinct.size
  }

  /** Retained manifest versions of a [[publishMergePartitioned]]
    * table, ascending — the live-pointer number and the two-publish
    * slack below it (plus any pending/unpruned rivals). */
  def mergeVersions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    manifestNames(fs, new org.apache.hadoop.fs.Path(tableDir))
      .map(numberOf(_, "manifest-")).distinct.sorted
  }

  /** Time travel over a merge-partitioned table: read the table state
    * a specific RETAINED manifest number published (see
    * [[mergeVersions]]) — the merge-table twin of
    * [[readSnapshotVersion]], with the same pin-the-start-state /
    * audit-the-pre-load-state uses. Fails loudly if pruned. When
    * rival same-numbered manifests exist (lost swap races) the
    * pointer-named one wins, else the choice is name-deterministic. */
  def readMergePartitionedVersion(spark: SparkSession, tableDir: String,
      version: Long): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val named = manifestNames(fs, root).filter(numberOf(_, "manifest-") == version)
    require(named.nonEmpty,
      s"manifest $version not retained (have: ${mergeVersions(spark, tableDir).mkString(",")})")
    val chosen = currentPointer(fs, root)
      .filter(named.contains).getOrElse(named.min)
    assembleManifest(spark, tableDir, readManifest(fs, root, chosen))
      .getOrElse(spark.emptyDataFrame)
  }

  /** A retained manifest's reference list, chosen with the same
    * rival-resolution rule as [[readMergePartitionedVersion]]; fails
    * loudly when `version` was pruned (the incremental consumer
    * lagged past retention — it must fall back to a full re-read, and
    * silently diffing against an empty list would report the whole
    * table as changed without saying so). */
  private def retainedEntries(spark: SparkSession, tableDir: String,
      version: Long): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val named = manifestNames(fs, root).filter(numberOf(_, "manifest-") == version)
    require(named.nonEmpty,
      s"manifest $version not retained (have: ${mergeVersions(spark, tableDir).mkString(",")})")
    val chosen = currentPointer(fs, root)
      .filter(named.contains).getOrElse(named.min)
    readManifestOpt(fs, root, chosen).getOrElse(throw new IllegalStateException(
      s"manifest $chosen vanished mid-read — pruned during the changes scan"))
  }

  /** Changed-partition feed (partition-level CDC) over a
    * [[publishMergePartitioned]] table: the CURRENT state of every
    * partition whose live dir is not referenced by retained manifest
    * `sinceVersion` — i.e. everything rewritten by publishes after it.
    * This is the incremental-consumer primitive that matters at
    * 100 TB: batch dirs are immutable and a publish rewrites only the
    * partitions its batch touches, so the entry-list set-diff names
    * exactly the changed partitions WITHOUT READING ANY DATA, and the
    * scan is bounded by changed data, never table size. After a
    * compaction every partition's dir is new, so the feed degrades to
    * a full (still-correct) read; the row-level
    * [[mergeRowChangesSince]] stays exact even then, because
    * compaction is content-identical and the row diff sees no change.
    * Fails loudly when `sinceVersion` was pruned — the caller's
    * fallback is a full re-read, never a silent whole-table "delta". */
  def readMergePartitionedChanges(spark: SparkSession, tableDir: String,
      sinceVersion: Long, partitionCol: String = ""): DataFrame = {
    val from = retainedEntries(spark, tableDir, sinceVersion).toSet
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tableDir), conf)
    val live = manifestEntries(fs, new org.apache.hadoop.fs.Path(tableDir), partitionCol)
    assembleManifest(spark, tableDir, live.filterNot(from))
      .getOrElse(spark.emptyDataFrame)
  }

  /** Row-level change feed between retained manifest `sinceVersion`
    * and the live table state: full-outer diff (via
    * [[graft.operators.ChangeDetector.compare]]) of the OLD vs NEW
    * state of only the partitions rewritten since, classifying every
    * key as `new` / `updated` / `orphaned` (plus the dropped
    * `unchanged`), with the per-field old/new audit payload.
    *
    * Scale shape: both sides are pruned BY DIR NAME before any scan —
    * the new side is the changed dirs from
    * [[readMergePartitionedChanges]], the old side is `sinceVersion`'s
    * dirs for the same partition segments — so the join is bounded by
    * the touched partitions' size. Untouched partitions contribute
    * zero I/O and zero shuffle. Content-identical rewrites
    * (compaction) diff to `unchanged` and are dropped. */
  def mergeRowChangesSince(spark: SparkSession, tableDir: String,
      sinceVersion: Long, naturalKey: Seq[String],
      partitionCol: String = ""): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (changed, oldDirs) = changeDirSets(spark, tableDir, sinceVersion, partitionCol)
    (assembleManifest(spark, tableDir, changed),
        assembleManifest(spark, tableDir, oldDirs)) match {
      case (Some(newState), Some(oldState)) =>
        graft.operators.ChangeDetector.compare(newState, oldState, naturalKey)
          .filter(col("change_status") =!= "unchanged")
      case (Some(newState), None) => // all-new partitions: every row inserts
        graft.operators.ChangeDetector.compare(newState, newState.limit(0), naturalKey)
      case (None, Some(oldState)) => // only whole-partition drops: all orphaned
        graft.operators.ChangeDetector.compare(oldState.limit(0), oldState, naturalKey)
      case _ => spark.emptyDataFrame
    }
  }

  /** Changed-dir / old-dir entry sets between retained `sinceVersion`
    * and the live manifest (shared by [[mergeRowChangesSince]] and the
    * fused row-level delta): `changed` = live entries absent from
    * `sinceVersion`'s manifest; `oldDirs` = `sinceVersion`'s entries
    * for the same partition segments, plus segments DROPPED from the
    * live manifest entirely (emptied by a delete publish — their old
    * state must still enter the diff, where every row classifies
    * `orphaned`). */
  private def changeDirSets(spark: SparkSession, tableDir: String,
      sinceVersion: Long, partitionCol: String): (Seq[String], Seq[String]) = {
    val from = retainedEntries(spark, tableDir, sinceVersion)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tableDir), conf)
    val live = manifestEntries(fs, new org.apache.hadoop.fs.Path(tableDir), partitionCol)
    val changed = live.filterNot(from.toSet)
    val changedSegs = changed.map(segmentOf).toSet
    val liveSegs = live.map(segmentOf).toSet
    val oldDirs = from.filter(e =>
      changedSegs.contains(segmentOf(e)) || !liveSegs.contains(segmentOf(e)))
    (changed, oldDirs)
  }

  /** The row-level delta FUSED into one anti-join (r18, guide §2.4):
    * the changed rows' current state = new-state rows with NO old-state
    * row that matches on the natural key AND on every compared column
    * under [[graft.operators.ChangeDetector]]'s normalization (""/NaN
    * → null, null-safe equality, system fields ignored). Equivalent to
    * the classify-then-rejoin formulation (full-outer diff → changed
    * keys → re-scan changed dirs → semi-join) the consumer used before
    * — `new` rows have no key match, `updated` rows have a key match
    * that fails column equality, `unchanged` rows match fully and drop
    * — but with ONE join and ONE scan of each side instead of a
    * full-outer join + a second scan of the changed dirs + a semi-join
    * (measured at sf0.1: 4 Exchanges → 2, 3 scans → 2; at 100 TB the
    * saved scan and shuffle are proportional to the touched
    * partitions). Null-keyed rows drop, exactly as the old semi-join
    * (null keys never equi-match) — merge-table keys are non-null by
    * contract. Assumes unique keys per state side, the
    * [[publishMergePartitioned]] invariant. */
  private def changedRowsOnly(newState: DataFrame, oldState: DataFrame,
      naturalKey: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, isnan, lit, when}
    import org.apache.spark.sql.types.{DoubleType, FloatType, StringType}
    val compareCols = newState.columns.intersect(oldState.columns)
      .filterNot(naturalKey.contains)
      .filterNot(graft.operators.ChangeDetector.IgnoreFields.contains)
      .toSeq.sorted
    def norm(df: DataFrame, name: String): org.apache.spark.sql.Column = {
      val c = df(name)
      df.schema(name).dataType match {
        case StringType => when(c === "", lit(null)).otherwise(c)
        case DoubleType | FloatType => when(isnan(c), lit(null)).otherwise(c)
        case _ => c
      }
    }
    val keyEq = naturalKey.map(k => newState(k) === oldState(k))
      .reduce(_ && _)
    val cond = compareCols
      .map(c => norm(newState, c) <=> norm(oldState, c))
      .foldLeft(keyEq)(_ && _)
    newState.join(oldState, cond, "left_anti")
      .filter(naturalKey.map(col(_).isNotNull).reduce(_ && _))
  }

  /** At-least-once incremental consumer over a
    * [[publishMergePartitioned]] table: feed `f` only what changed
    * since the durable checkpoint, then advance the checkpoint — the
    * batch-incremental loop (nightly delta jobs, downstream index
    * refresh) that at 100 TB replaces "rescan the table and diff".
    *
    * Semantics:
    *   - first run (no checkpoint): `f` gets the full table state;
    *   - steady state: `f` gets [[readMergePartitionedChanges]]
    *     (current state of partitions rewritten since the checkpoint);
    *   - no publishes since the checkpoint: `f` is NOT called (None);
    *   - consumer lagged past retention (checkpoint version pruned) or
    *     an unreadable checkpoint file: documented degrade to a full
    *     re-read, never a silent partial delta.
    *
    * The checkpoint (`<checkpointDir>/_version`) is written AFTER `f`
    * returns, with the same atomic rename-over as the table pointer: a
    * crash inside `f` re-delivers the delta next run (at-least-once —
    * `f` must be idempotent, which every MERGE-shaped sink here is).
    * Publishes landing between the version resolution and the read
    * are delivered again next cycle for the same reason. The table
    * must be manifest-published; `live` is its pointer version. */
  def processMergeChanges[T](spark: SparkSession, tableDir: String,
      checkpointDir: String, partitionCol: String = "")
      (f: (DataFrame, Long) => T): Option[T] =
    processCheckpointed(spark, tableDir, checkpointDir, f) {
      case Some(v) =>
        try readMergePartitionedChanges(spark, tableDir, v, partitionCol)
        catch { case _: IllegalArgumentException => // lagged past retention
          readMergePartitioned(spark, tableDir, partitionCol)
        }
      case None => readMergePartitioned(spark, tableDir, partitionCol)
    }

  /** Row-level at-least-once incremental consumer: as
    * [[processMergeChanges]], but `f` receives ONLY the rows whose
    * state actually changed since the checkpoint — the current state
    * of every key the row diff ([[mergeRowChangesSince]]) classifies
    * `new` or `updated`. Partition-level delivery hands the consumer
    * whole rewritten partitions, so already-processed rows ride along
    * beside the new ones; that is fine for a MERGE-shaped sink, but a
    * consumer whose batch semantics are ORDER-SENSITIVE across rows
    * sharing a key (identity resolution: two centers presenting one
    * identifier in one batch is a different statement than one center
    * re-presenting it) needs the row-level feed to make incremental ≡
    * sequential exact. Deleted keys are NOT delivered (no retraction
    * downstream); first run and lagged-past-retention degrade to the
    * full table, every row as-new — the same documented fallbacks.
    *
    * Scale shape: the row diff prunes both sides BY DIR NAME to the
    * touched partitions, and the delta is a key-semi-join of the
    * changed partitions' current state — cost bounded by changed
    * data, never table size. */
  def processMergeRowChanges[T](spark: SparkSession, tableDir: String,
      checkpointDir: String, naturalKey: Seq[String], partitionCol: String = "")
      (f: (DataFrame, Long) => T): Option[T] =
    processMergeRowChangesWithDeletes(spark, tableDir, checkpointDir,
      naturalKey, partitionCol)((d, v) => f(d.delta, v))

  /** Row-level delivery WITH retractions, for consumers maintaining a
    * keyed downstream state that must track deletes (a status
    * snapshot, a materialized index): alongside the changed rows, `f`
    * receives the `orphaned` keys from the same row diff (keys
    * present in the checkpointed version, absent from the live state
    * of the rewritten partitions) and a `fullResync` flag for the
    * documented degrade paths (first run / lagged past retention /
    * unreadable checkpoint), where the delta is the FULL table and
    * the orphan set cannot be derived from a diff — a consumer seeing
    * `fullResync` must rebuild its state from the delta alone, which
    * is exactly what makes those paths safe. Same at-least-once
    * checkpoint loop as [[processMergeRowChanges]]. */
  def processMergeRowChangesWithDeletes[T](spark: SparkSession,
      tableDir: String, checkpointDir: String, naturalKey: Seq[String],
      partitionCol: String = "")
      (f: (RowDelta, Long) => T): Option[T] = {
    import org.apache.spark.sql.functions.col
    val emptyKeys = () => readMergePartitioned(spark, tableDir, partitionCol)
      .select(naturalKey.map(col): _*).limit(0)
    processCheckpointed(spark, tableDir, checkpointDir,
        (d: RowDelta, v: Long) => f(d, v)) {
      case Some(v) =>
        try {
          // fused delta (r18): one anti-join over one scan of each
          // side replaces full-outer diff → changed keys → re-scan →
          // semi-join; see [[changedRowsOnly]] for the equivalence
          // argument (rows identical by construction, spec-pinned)
          val (changed, oldDirs) = changeDirSets(spark, tableDir, v, partitionCol)
          (assembleManifest(spark, tableDir, changed),
              assembleManifest(spark, tableDir, oldDirs)) match {
            case (Some(newState), Some(oldState)) =>
              val orphaned = oldState.select(naturalKey.map(col): _*)
                .join(newState.select(naturalKey.map(col): _*), naturalKey, "left_anti")
              RowDelta(changedRowsOnly(newState, oldState, naturalKey),
                orphaned, fullResync = false)
            case (Some(newState), None) => // all-new partitions: every row inserts
              RowDelta(newState.filter(
                  naturalKey.map(col(_).isNotNull).reduce(_ && _)),
                emptyKeys(), fullResync = false)
            case (None, Some(oldState)) => // only whole-partition drops
              RowDelta(oldState.limit(0),
                oldState.select(naturalKey.map(col): _*), fullResync = false)
            case _ =>
              RowDelta(readMergePartitioned(spark, tableDir, partitionCol).limit(0),
                emptyKeys(), fullResync = false)
          }
        } catch { case _: IllegalArgumentException => // lagged past retention
          RowDelta(readMergePartitioned(spark, tableDir, partitionCol),
            emptyKeys(), fullResync = true)
        }
      case None =>
        RowDelta(readMergePartitioned(spark, tableDir, partitionCol),
          emptyKeys(), fullResync = true)
    }
  }

  /** One row-level change delivery: the changed rows' current state,
    * the retracted (orphaned) keys, and whether this delivery is a
    * full resync (orphan set underivable — rebuild from `delta`). */
  final case class RowDelta(delta: DataFrame, orphanedKeys: DataFrame,
      fullResync: Boolean)

  /** The shared checkpoint loop under both incremental consumers:
    * resolve the live pointer, read the durable checkpoint, build the
    * delta for the gap, run `f`, then advance the checkpoint with the
    * same atomic rename-over as the table pointer (crash inside `f`
    * ⇒ redelivery next run; `f` must be idempotent). */
  private def processCheckpointed[D, T](spark: SparkSession, tableDir: String,
      checkpointDir: String, f: (D, Long) => T)
      (deltaOf: Option[Long] => D): Option[T] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tFs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tableDir), conf)
    val live = currentPointer(tFs, new org.apache.hadoop.fs.Path(tableDir))
      .map(numberOf(_, "manifest-"))
      .getOrElse(return None) // nothing published yet
    val ckUri = new java.net.URI(checkpointDir)
    val ckFs = org.apache.hadoop.fs.FileSystem.get(ckUri, conf)
    val ckRoot = new org.apache.hadoop.fs.Path(checkpointDir)
    val ckFile = new org.apache.hadoop.fs.Path(ckRoot, "_version")
    val last: Option[Long] =
      if (!ckFs.exists(ckFile)) None
      else {
        val in = ckFs.open(ckFile)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
        s.toLongOption // unreadable checkpoint → full re-read
      }
    if (last.contains(live)) return None
    val out = f(deltaOf(last), live)
    atomicReplace(ckFs, ckUri, conf, ckRoot, "_version", live.toString,
      java.util.UUID.randomUUID().toString.take(8))
    Some(out)
  }

  /** Build per-dir Bloom key filters for a
    * [[publishMergePartitioned]] table: every immutable top-level dir
    * (`b-*` batch dirs AND adopted `col=val` partition dirs — round
    * 15) lacking one gets a `_keybloom-<keyCol>` sidecar built
    * from a scan of ONLY the key column (column-pruned parquet read).
    * Idempotent and safe to run any time — referenced dirs never
    * change after publish/adoption, so a sidecar is built once and
    * stays valid for the dir's lifetime; the prune/vacuum deletes it
    * with its dir.
    * Underscore-prefixed sidecars are invisible to Spark's file
    * listing, so normal reads are unaffected. Concurrent indexers
    * write identical bits (Bloom insertion is order-independent and
    * Spark's sketch hashes are fixed-seed), so the tmp+rename race is
    * benign. At 100 TB this is the off-critical-path index build: the
    * publish stays lean, and a nightly indexer touches only the new
    * batch dirs' key columns. Returns the number of filters built. */
  /** Sidecar fpp for BATCH-shaped keyed reads (an index apply's
    * ~feed-sized id set): dir-skipping needs the whole KEY SET to
    * miss, so the per-dir read probability is 1-(1-fpp)^keys — at the
    * default 0.01 a 500-key lookup reads ~every dir (99.3%), at 1e-4
    * it reads ~5% of non-matching dirs. Costs 2× the sidecar bytes
    * (~19 vs ~10 bits/key — still KBs for doclen, tens of MB for a
    * postings-sized table at sf10). The index maintenance layers
    * build with this; single-key point lookups are fine either way. */
  val BatchLookupFpp: Double = 1e-4

  def indexBatchKeys(spark: SparkSession, tableDir: String, keyCol: String,
      fpp: Double = 0.01): Int = {
    import org.apache.spark.sql.functions.{col, input_file_name, regexp_extract, when, lit}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(root)) return 0
    val todo = unindexedBatchDirs(fs, root, s"_keybloom-$keyCol")
    if (todo.isEmpty) return 0
    // sizing WITHOUT a count job: parquet footer row counts, read
    // driver-side from metadata only — the old shape scanned each
    // dir's key column once to COUNT and once more to build, plus one
    // driver-serialized Spark job pair per dir
    val conf = spark.sparkContext.hadoopConfiguration
    val counted = todo.map { dir =>
      footerStats(fs, conf, new org.apache.hadoop.fs.Path(root, dir))
    }
    val sized = todo.zip(counted.map(_._1))
    // schema-evolution guard: a dir whose files LACK the key column
    // must fail LOUDLY like the per-dir build would (the bulk scan's
    // union schema would otherwise read it as null and write an empty
    // bloom — keyed lookups would then silently SKIP that dir's rows)
    requireColumnEverywhere(todo, counted, keyCol, "indexBatchKeys")
    // ONE Spark job builds every filter: a single scan of the
    // un-indexed dirs with one bloom_filter_agg PER DIR (each sized
    // exactly as the per-dir build would be, each fed only its dir's
    // rows via a null-gated child — aggregate updates skip nulls).
    // Insertion is commutative, so the bits are byte-identical to the
    // serial per-dir stat.bloomFilter build, which rides the SAME
    // BloomFilterAggregate expression underneath. The scan carries
    // the footer-derived schema (no inference job) and a recursive
    // file lookup (no partition discovery — the partition column is
    // not needed, underscore sidecars are filtered by Spark's listing
    // rules), so the WHOLE build is one non-adaptive aggregation job.
    val scan = bulkScan(spark, tableDir, todo,
      counted.collectFirst { case (_, ms) if ms.nonEmpty => ms.head }, keyCol)
    val aggs: Seq[org.apache.spark.sql.Column] = sized.map { case (dir, n) =>
      val items = math.max(n, 1L)
      val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp)
      org.apache.spark.sql.graftbridge.Bridge.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          org.apache.spark.sql.graftbridge.Bridge.expression(
            when(col("_bdir") === lit(dir), col(keyCol))),
          org.apache.spark.sql.catalyst.expressions.Literal(items),
          org.apache.spark.sql.catalyst.expressions.Literal(numBits), 0, 0)
          .toAggregateExpression()).as(dir)
    }
    val row = withoutAqe(spark) { scan.agg(aggs.head, aggs.tail: _*).head() }
    sized.zipWithIndex.foreach { case ((dir, n), i) =>
      val bloom =
        if (row.isNullAt(i)) // zero-row dir: aggregate saw no input
          org.apache.spark.util.sketch.BloomFilter.create(math.max(n, 1L), fpp)
        else
          org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](i)))
      writeSidecar(fs, new org.apache.hadoop.fs.Path(root, dir),
        s"_keybloom-$keyCol")(out => bloom.writeTo(out))
    }
    sized.size
  }

  /** Round-9 shape of [[indexBatchKeys]] (serial driver loop, one
    * count + one build job per dir) — kept for the differential spec
    * that pins the bulk build byte-identical. */
  private[sources] def indexBatchKeysSerial(spark: SparkSession, tableDir: String,
      keyCol: String, fpp: Double = 0.01): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(root)) return 0
    val referenced: Option[Set[String]] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_current"))) None
      else Some(manifestEntries(fs, root, "").map(topSegmentOf).toSet)
    var built = 0
    fs.listStatus(root).foreach { st =>
      if (st.isDirectory && indexableDir(st.getPath.getName) &&
          referenced.forall(_.contains(st.getPath.getName))) {
        val sidecar = new org.apache.hadoop.fs.Path(st.getPath, s"_keybloom-$keyCol")
        if (!fs.exists(sidecar)) {
          val keyed = spark.read.parquet(st.getPath.toString).select(keyCol)
          val bloom = keyed.stat.bloomFilter(keyCol,
            math.max(keyed.count(), 1L), fpp)
          writeSidecar(fs, st.getPath, s"_keybloom-$keyCol")(out => bloom.writeTo(out))
          built += 1
        }
      }
    }
    built
  }

  /** True for top-level dirs the key index covers: `b-*` batch dirs
    * AND adopted plain partition dirs (`col=val`). Both are immutable
    * under the manifest discipline — every mutation writes a NEW
    * batch dir and at most drops entries; nothing rewrites a
    * referenced dir in place — so a sidecar built once stays valid
    * for the dir's lifetime. Covering the adopted dirs is what lets a
    * keyed lookup of NEW keys skip the (usually dominant) base table
    * entirely, not just the delta generations (round 15). */
  private def indexableDir(name: String): Boolean =
    name.startsWith("b-") || (name.contains("=") && !name.startsWith("."))

  /** Un-indexed batch/adopted dirs under `root` (no `sidecarName`),
    * restricted to dirs the LIVE manifest references when one exists —
    * a replaced/retired dir awaiting prune is unreachable to readers,
    * so a sidecar for it is a wasted full scan (a compaction that
    * re-sidecared the just-dropped base measured 72 s vs 23 s). A
    * pre-manifest plain layout indexes all its partition dirs. */
  private def unindexedBatchDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, sidecarName: String): Seq[String] = {
    val referenced: Option[Set[String]] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_current"))) None
      else Some(manifestEntries(fs, root, "").map(topSegmentOf).toSet)
    fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && indexableDir(st.getPath.getName) &&
        referenced.forall(_.contains(st.getPath.getName)) &&
        !fs.exists(new org.apache.hadoop.fs.Path(st.getPath, sidecarName)) =>
        st.getPath.getName
    }.sorted
  }

  /** Exact row count (and EVERY file's parquet schema) of every
    * parquet file under `dir` (recursive, hidden/sidecar files
    * skipped) from FOOTER METADATA only — no Spark job, no data read.
    * The count equals the count() the serial builder paid a scan for.
    * All schemas are kept (not just the first file's) so the
    * schema-evolution guard can catch INTRA-dir drift: a dir whose
    * later files lack the indexed column must fail as loudly as one
    * whose first file does. */
  private def footerStats(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      dir: org.apache.hadoop.fs.Path): (Long, Seq[org.apache.parquet.schema.MessageType]) = {
    var total = 0L
    val schemas = scala.collection.mutable.ArrayBuffer.empty[org.apache.parquet.schema.MessageType]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith(".")) {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try {
          total += reader.getRecordCount
          schemas += reader.getFileMetaData.getSchema
        } finally reader.close()
      }
    }
    (total, schemas.toSeq)
  }

  /** One tagged scan over all `dirs`: footer-derived schema (no
    * inference job), recursive file lookup (no partition discovery —
    * dirs with k=v subdirs read fine because only `wantedCol` is
    * selected), dir tag parsed from the file path. */
  private def bulkScan(spark: SparkSession, tableDir: String, dirs: Seq[String],
      firstSchema: Option[org.apache.parquet.schema.MessageType],
      wantedCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name, regexp_extract}
    val reader = spark.read.option("recursiveFileLookup", "true")
    val withSchema = firstSchema.map { m =>
      reader.schema(
        new org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter()
          .convert(m))
    }.getOrElse(reader)
    // tag = which of `dirs` the file lives under. An alternation of
    // the QUOTED dir names (leftmost path match wins, so a b-dir's
    // nested `col=val` subdir can never shadow its batch dir; the
    // trailing '/' stops prefix-name shadowing) — works for both b-*
    // batch dirs and adopted `col=val` partition dirs.
    val dirAlt = dirs.map(java.util.regex.Pattern.quote).mkString("|")
    withSchema.parquet(dirs.map(d => s"$tableDir/$d"): _*)
      .select(regexp_extract(input_file_name(), s"/($dirAlt)/", 1).as("_bdir"),
        col(wantedCol))
  }

  /** Run `action` with adaptive execution OFF (restored after): AQE
    * splits a single aggregation into per-stage jobs; the bulk index
    * builders promise ONE job regardless of dir count. */
  private def withoutAqe[T](spark: SparkSession)(action: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try action finally spark.conf.set(key, prev)
  }

  /** Loud schema-evolution check for the bulk index builders: EVERY
    * parquet file of every dir that HAS data must carry `colName`,
    * and carry it at ONE parquet type across all files and dirs —
    * otherwise the union scan would read nulls (missing column) or
    * coerced values (type drift) where the serial per-dir build
    * fails, and the resulting sidecar would make pruned reads
    * silently skip or mis-prune real rows. Checks all footers
    * already opened by [[footerStats]], so intra-dir drift (a LATER
    * file missing the column) is caught, not just the first file. */
  private def requireColumnEverywhere(dirs: Seq[String],
      stats: Seq[(Long, Seq[org.apache.parquet.schema.MessageType])],
      colName: String, caller: String): Unit = {
    var refType: Option[String] = None
    dirs.zip(stats).foreach { case (dir, (rows, schemas)) =>
      if (rows > 0) schemas.foreach { m =>
        val idx = (0 until m.getFieldCount).find(i => m.getType(i).getName == colName)
        require(idx.isDefined,
          s"$caller: a parquet file in batch dir '$dir' has no column '$colName' " +
            "(schema evolution?) — refusing to write a sidecar that would " +
            "make pruned reads skip its rows")
        // repetition (required vs optional) is benign nullability, not
        // drift — compare the physical type + logical annotation only
        val ft = m.getType(idx.get)
        val t =
          if (ft.isPrimitive)
            ft.asPrimitiveType().getPrimitiveTypeName.toString +
              Option(ft.getLogicalTypeAnnotation).map(":" + _.toString).getOrElse("")
          else ft.toString.replaceFirst("^(required|optional|repeated) ", "")
        refType match {
          case None => refType = Some(t)
          case Some(r) => require(r == t,
            s"$caller: column '$colName' changes parquet type across files " +
              s"(saw '$r', then '$t' in batch dir '$dir') — refusing to index " +
              "across a type drift the union scan would silently coerce")
        }
      }
    }
  }

  /** tmp-write + rename of a batch-dir sidecar (concurrent indexers
    * write identical bits, so the rename race is benign). */
  private def writeSidecar(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, name: String)(
      write: java.io.OutputStream => Unit): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".$name.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try write(out) finally out.close()
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, name)))
      deleteQuiet(fs, tmp, false)
  }

  /** Compaction for [[publishMergePartitioned]] tables: rewrite the
    * LIVE manifest's state into one fresh batch dir (one file per
    * partition via a partition-column repartition) and publish a
    * manifest referencing only it; the standard pointer-anchored
    * retention then reclaims the old batch dirs after two more
    * publishes. Content is bit-identical — compaction exists because
    * per-batch MERGE publishes accrete a batch dir per publish, and
    * at 100 TB the manifest's dir fan-out (footer reads, sidecar
    * opens, task scheduling) degrades scans long before data volume
    * does. Concurrency degrades exactly like a rival publisher: the
    * forward-only pointer swap makes one side a whole lost update,
    * never a torn table. Index sidecars are not carried over — the
    * idempotent indexers rebuild them for the new dir on their next
    * run. Returns the number of partition dirs written (0 = empty
    * table, nothing to do). */
  def compactMergePartitioned(spark: SparkSession, tableDir: String,
      partitionCol: String): Int = {
    import org.apache.spark.sql.functions.col
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val entries = manifestEntries(fs, root, partitionCol)
    val state = assembleManifest(spark, tableDir, entries).getOrElse(return 0)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val next = (manifestNumbers(fs, root) ++ batchNumbers(fs, root) :+ 0L).max + 1
    val bdir = f"b-$next%012d-$uid"
    state.repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(s"$tableDir/$bdir")
    val written = fs.listStatus(new org.apache.hadoop.fs.Path(root, bdir))
      .collect { case st if st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol=") => st.getPath.getName }
      .toSeq
    val mfile = f"manifest-$next%012d-$uid"
    writeRaw(uri, conf, new org.apache.hadoop.fs.Path(root, mfile),
      written.map(s => s"$bdir/$s").sorted.mkString("\n"))
    swapPointerForward(fs, uri, conf, root, mfile, s"$next-$uid-c")
    pruneMergePartitioned(fs, root)
    written.size
  }

  // ---- zone-map sidecars: dir-level min/max for range skipping ----

  /** Comparable driver-side key for zone-map bounds. Strings compare
    * by UTF-8 bytes (Spark's binary string order — Java
    * `String.compareTo` diverges on supplementary characters, which
    * would turn a skip into a wrong answer). Timestamps floor-divide
    * to micros so pre-epoch values stay correct; dates are epoch
    * days. */
  private def zoneKey(v: Any): (String, Either[Long, Either[Double, Array[Byte]]]) = v match {
    case l: Long    => ("long", Left(l))
    case i: Int     => ("long", Left(i.toLong))
    case s: Short   => ("long", Left(s.toLong))
    case b: Byte    => ("long", Left(b.toLong))
    case d: Double  => ("double", Right(Left(d)))
    case f: Float   => ("double", Right(Left(f.toDouble)))
    case s: String  => ("string", Right(Right(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    case t: java.sql.Timestamp =>
      ("timestamp", Left(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L))
    case d: java.sql.Date => ("date", Left(d.toLocalDate.toEpochDay))
    case other => throw new IllegalArgumentException(
      s"zone map does not support ${other.getClass.getName}")
  }

  private def zoneLeq(a: Either[Long, Either[Double, Array[Byte]]],
      b: Either[Long, Either[Double, Array[Byte]]]): Boolean = (a, b) match {
    case (Left(x), Left(y)) => x <= y
    case (Right(Left(x)), Right(Left(y))) => x <= y
    case (Right(Right(x)), Right(Right(y))) =>
      java.util.Arrays.compareUnsigned(x, y) <= 0
    case _ => throw new IllegalArgumentException("zone-map type mismatch")
  }

  private def zoneRepr(tag: String, k: Either[Long, Either[Double, Array[Byte]]]): String =
    k match {
      case Left(l) => l.toString
      case Right(Left(d)) => java.lang.Double.doubleToRawLongBits(d).toString
      case Right(Right(b)) => java.util.Base64.getEncoder.encodeToString(b)
    }

  private def zoneParse(tag: String, s: String): Either[Long, Either[Double, Array[Byte]]] =
    tag match {
      case "long" | "timestamp" | "date" => Left(s.toLong)
      case "double" => Right(Left(java.lang.Double.longBitsToDouble(s.toLong)))
      case "string" => Right(Right(java.util.Base64.getDecoder.decode(s)))
      case t => throw new IllegalArgumentException(s"unknown zone-map type $t")
    }

  /** Build per-batch-dir min/max zone maps: every immutable batch dir
    * lacking one gets a `_zonemap-<col>` sidecar (type tag + min +
    * max from a column-pruned scan; `empty` for an all-null dir).
    * Same operational contract as [[indexBatchKeys]] — idempotent,
    * off the publish critical path, dies with its dir — but for RANGE
    * predicates: the "Modified > last_sync" incremental pull over a
    * merge table skips every batch dir whose max is below the
    * watermark without opening a single parquet footer. Zone maps
    * have no false positives, so skipping is deterministic. */
  def indexBatchStats(spark: SparkSession, tableDir: String, statCol: String): Int = {
    import org.apache.spark.sql.functions.{max => fmax, min => fmin, col, input_file_name, regexp_extract}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(root)) return 0
    val todo = unindexedBatchDirs(fs, root, s"_zonemap-$statCol")
    if (todo.isEmpty) return 0
    // ONE map-side-combined job over all un-indexed dirs (vs the old
    // one-aggregation-job-per-dir driver loop): (dir, min, max) rows,
    // one per dir, collected driver-side — dir count, never data
    val conf = spark.sparkContext.hadoopConfiguration
    val counted = todo.map { d =>
      footerStats(fs, conf, new org.apache.hadoop.fs.Path(root, d))
    }
    // same loud schema-evolution guard as the bloom builder: an
    // all-null zonemap from a missing column would mark the dir
    // 'empty' and range scans would silently skip its rows
    requireColumnEverywhere(todo, counted, statCol, "indexBatchStats")
    val grouped = bulkScan(spark, tableDir, todo,
      counted.collectFirst { case (_, ms) if ms.nonEmpty => ms.head }, statCol)
      .groupBy("_bdir")
      .agg(fmin(col(statCol)).as("_lo"), fmax(col(statCol)).as("_hi"))
    val stats = withoutAqe(spark) { grouped.collect() }
      .map(r => r.getString(0) -> ((r.get(1), r.get(2)))).toMap
    todo.foreach { dir =>
      val body = stats.get(dir) match {
        case Some((lo, _)) if lo == null => "empty"
        case None => "empty" // zero-row dir contributes no group
        case Some((lo, hi)) =>
          val (tag, l) = zoneKey(lo)
          val (_, h) = zoneKey(hi)
          s"$tag\n${zoneRepr(tag, l)}\n${zoneRepr(tag, h)}"
      }
      writeSidecar(fs, new org.apache.hadoop.fs.Path(root, dir),
        s"_zonemap-$statCol")(out => out.write(body.getBytes("UTF-8")))
    }
    todo.size
  }

  /** Round-9 shape of [[indexBatchStats]] (serial per-dir jobs) —
    * kept for the byte-identity differential spec. */
  private[sources] def indexBatchStatsSerial(spark: SparkSession, tableDir: String,
      statCol: String): Int = {
    import org.apache.spark.sql.functions.{max => fmax, min => fmin, col}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(root)) return 0
    var built = 0
    fs.listStatus(root).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith("b-")) {
        val sidecar = new org.apache.hadoop.fs.Path(st.getPath, s"_zonemap-$statCol")
        if (!fs.exists(sidecar)) {
          val row = spark.read.parquet(st.getPath.toString)
            .agg(fmin(col(statCol)), fmax(col(statCol))).head()
          val body =
            if (row.isNullAt(0)) "empty"
            else {
              val (tag, lo) = zoneKey(row.get(0))
              val (_, hi) = zoneKey(row.get(1))
              s"$tag\n${zoneRepr(tag, lo)}\n${zoneRepr(tag, hi)}"
            }
          writeSidecar(fs, st.getPath, s"_zonemap-$statCol")(
            out => out.write(body.getBytes("UTF-8")))
          built += 1
        }
      }
    }
    built
  }

  /** Range scan over a [[publishMergePartitioned]] table that skips
    * every batch dir whose `_zonemap-<col>` sidecar (see
    * [[indexBatchStats]]) proves no row can satisfy
    * `lower <= col <= upper` (either bound optional, both
    * inclusive). Exactly equivalent to
    * `readMergePartitioned(...).filter(...)`: a missing sidecar is
    * read, an `empty` (all-null) dir is skipped — null never
    * satisfies a range predicate — and overlap is decided with the
    * same orderings Spark uses (binary UTF-8 for strings). */
  def readMergePartitionedRange(spark: SparkSession, tableDir: String,
      partitionCol: String, statCol: String,
      lower: Option[Any], upper: Option[Any]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val entries = manifestEntries(fs, root, partitionCol)
    val lo = lower.map(zoneKey)
    val hi = upper.map(zoneKey)
    val kept = entries.groupBy(topSegmentOf).toSeq.sortBy(_._1).flatMap {
      case (top, es) =>
        val sidecar = new org.apache.hadoop.fs.Path(root, s"$top/_zonemap-$statCol")
        val overlaps =
          if (!top.startsWith("b-") || !fs.exists(sidecar)) true // unindexed: read
          else {
            val in = fs.open(sidecar)
            val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                       finally in.close()
            if (body == "empty") false
            else {
              val Array(tag, minS, maxS) = body.split("\n", 3)
              val dirLo = zoneParse(tag, minS)
              val dirHi = zoneParse(tag, maxS)
              // no overlap iff dirHi < lower or upper < dirLo
              lo.forall { case (_, l) => zoneLeq(l, dirHi) } &&
                hi.forall { case (_, u) => zoneLeq(dirLo, u) }
            }
          }
        if (overlaps) es else Nil
    }
    val bounded = (df: DataFrame) => {
      val afterLo = lower.map(v => df.filter(col(statCol) >= lit(v))).getOrElse(df)
      upper.map(v => afterLo.filter(col(statCol) <= lit(v))).getOrElse(afterLo)
    }
    assembleManifest(spark, tableDir, kept) match {
      case Some(df) => bounded(df)
      case None => // every dir excluded: schema-only plan, zero files
        val schema = assembleManifest(spark, tableDir, entries)
          .getOrElse(spark.read.parquet(tableDir)).schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Keyed lookup over a [[publishMergePartitioned]] table that skips
    * every batch dir whose `_keybloom-<keyCol>` sidecar (see
    * [[indexBatchKeys]]) excludes ALL requested keys. Exactly
    * equivalent to `readMergePartitioned(...).filter(key isin keys)` —
    * Bloom false positives or a missing sidecar only widen the read
    * set, never the result. The skip test gates only the batch dirs
    * the LIVE manifest still references, so a key whose partition was
    * since rewritten by a newer batch costs at most a stale-positive
    * extra dir scan. At 100 TB this turns a point lookup from
    * read-every-live-dir into open-a-few-KB-sidecars +
    * read-the-one-dir-that-matches. */
  def readMergePartitionedKeyed(spark: SparkSession, tableDir: String,
      partitionCol: String, keyCol: String, keys: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val entries = manifestEntries(fs, root, partitionCol)
    val kept = entries.groupBy(topSegmentOf).toSeq.sortBy(_._1).flatMap {
      case (top, es) =>
        val sidecar = new org.apache.hadoop.fs.Path(root, s"$top/_keybloom-$keyCol")
        val mayContain =
          // any indexed top dir (b-* batch or adopted partition dir)
          // skip-tests; unindexed dirs always read
          if (!fs.exists(sidecar)) true
          else {
            val in = fs.open(sidecar)
            val bloom = try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
                        finally in.close()
            keys.exists {
              case l: Long   => bloom.mightContainLong(l)
              case i: Int    => bloom.mightContainLong(i.toLong)
              case s: Short  => bloom.mightContainLong(s.toLong)
              case b: Byte   => bloom.mightContainLong(b.toLong)
              case s: String => bloom.mightContainString(s)
              case o         => bloom.mightContain(o)
            }
          }
        if (mayContain) es else Nil
    }
    assembleManifest(spark, tableDir, kept) match {
      case Some(df) => df.filter(col(keyCol).isin(keys: _*))
      case None => // every dir excluded: schema-only plan, zero files
        val schema = assembleManifest(spark, tableDir, entries)
          .getOrElse(spark.read.parquet(tableDir)).schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Keyed read whose key set is a DATAFRAME — the shape that never
    * collects data-proportionally. Two regimes, picked at runtime by
    * a BOUNDED probe (`limit(maxPointLookup + 1)` — the collect can
    * never exceed maxPointLookup+1 rows regardless of key volume):
    *
    *  - point-lookup (≤ `maxPointLookup` distinct keys): delegate to
    *    [[readMergePartitionedKeyed]] — per-dir bloom sidecars prune
    *    whole batch dirs driver-side, the classic primary-key read;
    *  - bulk (more keys than that): dir pruning can't win (most dirs
    *    match some key), so run the scan with a broadcast
    *    bloom PREFILTER + exact semi-join against the keys frame
    *    ([[graft.operators.BloomJoin]]) — rows drop before the
    *    shuffle, the key set never visits the driver.
    *
    * Same result either way (both are exact key membership). */
  def readMergePartitionedKeyedFrame(spark: SparkSession, tableDir: String,
      partitionCol: String, keyCol: String, keys: DataFrame,
      maxPointLookup: Int = 8192, bulkFpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(maxPointLookup >= 1, s"maxPointLookup must be >= 1, got $maxPointLookup")
    val distinctKeys = keys.select(col(keyCol)).distinct()
    val probe = distinctKeys.limit(maxPointLookup + 1).collect()
    if (probe.length <= maxPointLookup)
      readMergePartitionedKeyed(spark, tableDir, partitionCol, keyCol,
        probe.map(_.get(0)).toSeq)
    else {
      // size the bloom from the true key count (a distributed agg on
      // the keys frame — one long to the driver, never the keys)
      val nKeys = distinctKeys.count()
      graft.operators.BloomJoin.semiJoin(
        readMergePartitioned(spark, tableDir, partitionCol), keyCol,
        distinctKeys, keyCol,
        expectedItems = math.max(nKeys, 1L), fpp = bulkFpp)
    }
  }

  /** Operational vacuum for [[publishMergePartitioned]] tables:
    * delete batch dirs referenced by NO manifest once older than
    * `olderThanMs` (default 24 h). Crashed publishers orphan their
    * in-flight batch dirs — the prune's in-flight rule must preserve
    * unreferenced dirs, so the leak is bounded by crash count but
    * never reclaimed; at 100 TB a periodic vacuum is part of
    * operating the table (a table format's VACUUM of uncommitted
    * files). The age threshold keeps live in-flight publishes safe: a
    * publisher stalled past it degrades to the documented lost
    * update. A referenced-dir set read from a vanishing manifest is
    * safe here: only a prune deletes manifests, and its pointer
    * arithmetic already adjudicated that manifest's dirs — and any
    * dir young enough to be mid-publish is spared by mtime anyway.
    * Returns the deleted dir names. */
  def vacuumOrphans(spark: SparkSession, tableDir: String,
      olderThanMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(root)) return Seq.empty
    val referenced = manifestNames(fs, root)
      .flatMap(readManifest(fs, root, _)).map(topSegmentOf).toSet
    val now = System.currentTimeMillis()
    val orphans = fs.listStatus(root).toSeq.filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("b-") &&
        !referenced(st.getPath.getName) &&
        now - st.getModificationTime > olderThanMs
    }
    orphans.foreach(st => deleteQuiet(fs, st.getPath, recursive = true))
    orphans.map(_.getPath.getName)
  }

  /** Live manifest entries (relative dir paths), resolving `_current`;
    * falls back to adopting a plain partitioned layout's root-level
    * `<col>=<val>` dirs when no manifest exists yet. A pointer naming
    * a manifest that no longer exists means the reader lagged past the
    * two-publish retention window: re-resolve (the pointer has moved
    * on) and fail LOUDLY if the table stays unreadable — never fall
    * back to a raw directory scan of a half-pruned layout. */
  private def manifestEntries(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, partitionCol: String): Seq[String] = {
    val ptr = new org.apache.hadoop.fs.Path(root, "_current")
    var attempt = 0
    while (true) {
      val live =
        if (fs.exists(ptr)) {
          val in = fs.open(ptr)
          val m = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                  finally in.close()
          if (m.startsWith("manifest-")) Some(m) else None
        } else None
      live match {
        case Some(m) =>
          if (fs.exists(new org.apache.hadoop.fs.Path(root, m)))
            return readManifest(fs, root, m)
          attempt += 1
          if (attempt >= 3)
            throw new IllegalStateException(
              s"manifest $m named by $root/_current no longer exists — " +
                "reader lagged beyond the two-publish retention window")
        case None if fs.exists(root) =>
          return fs.listStatus(root).toSeq.collect {
            case st if st.isDirectory && st.getPath.getName.contains("=") &&
              (partitionCol.isEmpty ||
                st.getPath.getName.startsWith(s"$partitionCol=")) =>
              st.getPath.getName
          }
        case None => return Seq.empty
      }
    }
    Seq.empty // unreachable
  }

  /** A manifest's reference list, or None if it vanished (a
    * concurrent pruner deleted it mid-pass). Callers must distinguish
    * the two: for a PROTECTED manifest a vanished read must abort the
    * prune, never silently shrink the protection set. */
  private def readManifestOpt(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, name: String): Option[Seq[String]] =
    try {
      val in = fs.open(new org.apache.hadoop.fs.Path(root, name))
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
      Some(s.split("\n").toSeq.map(_.trim).filter(_.nonEmpty))
    } catch { case _: java.io.FileNotFoundException => None }

  /** [[readManifestOpt]] where vanished-reads-as-empty is safe (the
    * rotated-out side of a prune, the reader's already-validated live
    * manifest). */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, name: String): Seq[String] =
    readManifestOpt(fs, root, name).getOrElse(Seq.empty)

  /** One DataFrame over a manifest's dirs: one basePath-scan per batch
    * dir (partition discovery restores the typed partition column),
    * unioned. None when the manifest is empty. */
  private def assembleManifest(spark: SparkSession, tableDir: String,
      entries: Seq[String]): Option[DataFrame] =
    if (entries.isEmpty) None
    else Some(entries.groupBy(e => e.splitAt(e.lastIndexOf('/') + 1)._1)
      .toSeq.sortBy(_._1)
      .map { case (parent, es) =>
        val base = if (parent.isEmpty) tableDir else s"$tableDir/${parent.stripSuffix("/")}"
        spark.read.option("basePath", base)
          .parquet(es.map(e => s"$tableDir/$e"): _*)
      }
      .reduce(_ unionByName _))

  private def segmentOf(entry: String): String =
    entry.substring(entry.lastIndexOf('/') + 1)
  private def topSegmentOf(entry: String): String = entry.split("/").head

  private def manifestNames(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isFile && st.getPath.getName.startsWith("manifest-") =>
        st.getPath.getName
    }
  // names may carry a "-<uid>" suffix (concurrent-publisher safety) or
  // not (legacy layout) — parse the numeric prefix only
  private def numberOf(name: String, prefix: String): Long = {
    val digits = name.stripPrefix(prefix).takeWhile(_.isDigit)
    if (digits.isEmpty) 0L else java.lang.Long.parseLong(digits)
  }
  private def manifestNumbers(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    manifestNames(fs, root).map(numberOf(_, "manifest-"))
  private def batchNumbers(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("b-") =>
        numberOf(st.getPath.getName, "b-")
    }

  /** Raw (sidecar-free) small-file write via FileContext — see the
    * checksum-sidecar note in [[publishSnapshot]]. */
  private def writeRaw(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration,
      path: org.apache.hadoop.fs.Path, content: String): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(uri, conf)
    val out = fc.create(path,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Atomic `_current` pointer swap (temp write + atomic
    * rename-over; stale checksum sidecars dropped first).
    *
    * The rename must be ATOMIC-OVERWRITE: concurrent publishers race
    * their swaps, and readers resolve the pointer unlocked. On HDFS,
    * `FileContext.rename(OVERWRITE)` is a single NameNode op. On the
    * local FS Hadoop EMULATES overwrite as delete-then-rename, which
    * both leaves a no-pointer window for readers and throws
    * FileAlreadyExistsException when two publishers interleave
    * (delete A, delete B, rename A, rename B → dest exists) — so
    * file:// swaps go through POSIX rename(2) via NIO ATOMIC_MOVE,
    * which replaces in one syscall. The N×M publisher/reader stress
    * spec is what flushed this out. */
  private def swapPointer(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration,
      root: org.apache.hadoop.fs.Path, content: String, stamp: String): Unit =
    atomicReplace(fs, uri, conf, root, "_current", content, stamp)

  /** Temp-write + atomic rename-over of a small control file (the
    * [[swapPointer]] mechanics, generalized to any name). */
  private[graft] def atomicReplace(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration,
      root: org.apache.hadoop.fs.Path, name: String, content: String,
      stamp: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(root, s"$name.tmp-$stamp")
    writeRaw(uri, conf, tmp, content)
    fs.delete(new org.apache.hadoop.fs.Path(root, s".$name.crc"), false)
    val dst = new org.apache.hadoop.fs.Path(root, name)
    if (Option(uri.getScheme).forall(_ == "file"))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    else
      org.apache.hadoop.fs.FileContext.getFileContext(uri, conf).rename(
        tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
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

  /** The committed version number of a snapshot table (or snapshot
    * GROUP) right now: the highest number any publisher has claimed or
    * swapped — claim markers (valid or crashed — a dead claim still
    * burned its number), the live pointer, and the version-dir listing
    * (legacy publishes never claimed). 0 = never published.
    *
    * NOT sufficient as a transactional read basis on its own: a rival
    * that has CLAIMED but not yet SWAPPED counts here while the
    * content a reader resolves (the pointer) is still the prior
    * version — a basis carrying only this number would pass the
    * commit check after the rival's swap and silently replace its
    * fold (ADVICE r17). Use [[snapshotReadBasis]], which also pins the
    * pointer version the content reads actually resolved. */
  def snapshotCommittedVersion(spark: SparkSession, tableRoot: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableRoot), spark.sparkContext.hadoopConfiguration)
    snapshotCommittedNum(fs, new org.apache.hadoop.fs.Path(tableRoot))
  }

  /** The transactional READ BASIS of a snapshot table (or GROUP): take
    * it BEFORE reading the content a publish derives from, pass it
    * back as `basis` to [[publishSnapshot]] / [[publishSnapshotGroup]].
    * Two numbers, because claims and visibility move separately:
    *
    *  - `committed` ([[snapshotCommittedVersion]]): the highest number
    *    any publisher has CLAIMED. A rival claiming after this moment
    *    makes the publish refuse (it may commit content this publish
    *    never saw).
    *  - `pointer`: the version the `_current` pointer RESOLVES right
    *    now — the version [[readSnapshot]] / [[readSnapshotGroupAll]]
    *    actually serve. A rival that claimed BEFORE this basis (so
    *    `committed` already counts it) but swaps its content live
    *    AFTER the content read leaves `committed` unchanged — only the
    *    pointer records that the content this publish derived from is
    *    no longer the live state (the claim-to-swap window, ADVICE
    *    r17: the whole data write sits between a rival's claim and its
    *    swap).
    *
    * A publish refuses unless BOTH still match at claim time. */
  def snapshotReadBasis(spark: SparkSession, tableRoot: String): SnapshotBasis = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableRoot), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    SnapshotBasis(snapshotCommittedNum(fs, root), snapshotPointerNum(fs, root))
  }

  /** See [[snapshotReadBasis]]. */
  final case class SnapshotBasis(committed: Long, pointer: Long)

  /** Liveness grace for snapshot-publish claims (shared by the
    * in-flight-rival refusal in [[claimSnapshotVersion]] and the
    * crashed-publisher litter reclaim in [[pruneSnapshotVersions]]): a
    * valid claim above the live pointer is IN-FLIGHT (its owner is
    * between claim and swap — the data write) until its freshest
    * evidence (marker or version-dir mtime) is this old, after which
    * it is declared dead: its number may be passed, its litter
    * reclaimed. MUST exceed the longest expected publish write (the
    * same contract a table format's VACUUM retention has with job
    * duration) — a publisher still writing past the grace is treated
    * as crashed, and its late swap refuses loudly rather than landing
    * ([[swapSnapshotOrRefuse]]). Default 30 min; operators of
    * long-write deployments raise `graft.snapshot.graceMs`. */
  private[sources] def snapshotGraceMs: Long =
    sys.props.get("graft.snapshot.graceMs").map(_.toLong)
      .getOrElse(30L * 60 * 1000)

  private def snapshotPointerNum(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Long =
    currentPointer(fs, root)
      .filter(_.startsWith("v-")).map(numberOf(_, "v-")).getOrElse(0L)

  private def snapshotCommittedNum(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Long = {
    val ptrNum = currentPointer(fs, root)
      .filter(_.startsWith("v-")).map(numberOf(_, "v-"))
    (commitNumbers(fs, root) ++ ptrNum.toSeq ++
      listVersions(fs, root).map(_._1) :+ 0L).max
  }

  /** Claim the next snapshot version for this publisher (r17, the
    * dense-claim OCC protocol [[commitMergeManifest]] built for merge
    * tables, applied to whole-snapshot publishes): derive
    * `next = committed + 1` and take `commit-<next>` with an atomic
    * put-if-absent. Exactly one publisher owns each number, so
    * publishes SERIALIZE — a raced rival REFUSES loudly
    * (`ConcurrentModificationException`) instead of degrading to the
    * pre-r17 whole lost update (last pointer swap silently replaced
    * the loser's table). Refuse-and-redrive, never rebase: snapshot
    * content derives from the prior snapshot (the registry fold, the
    * stats delta, a compaction), so committing a loser on top of a
    * rival's commit would publish state derived from a stale snapshot
    * — the caller must re-read and re-derive (the reference serializes
    * the same way through its per-load Postgres txn,
    * table-loader/services/loader.py:102).
    *
    * Claim-BEFORE-write: the number is owned before the (expensive)
    * data write starts, so a raced loser fails in milliseconds, and a
    * crash between claim and write merely burns a number (the marker
    * names a dir the pointer never swaps to; readers never resolve
    * it). A burned number is passed once its claim ages past
    * [[snapshotGraceMs]] — never a wedge.
    *
    * Three refusal rules (r18 — the first alone left the claim-to-swap
    * window open, ADVICE r17):
    *  1. `committed != basis.committed`: a rival CLAIMED since the
    *     basis read — it may commit content this publish never saw.
    *  2. `pointer != basis.pointer`: a rival that claimed BEFORE the
    *     basis read (so rule 1 cannot see it) SWAPPED its content live
    *     after this publish read the prior version — the content this
    *     publish derived from is no longer the live state.
    *  3. a VALID claim above the live pointer younger than
    *     [[snapshotGraceMs]] exists: its owner is mid-write. Claiming
    *     past it would let this publish (derived from the pre-rival
    *     pointer) swap OVER the rival's fold when the rival lands
    *     during this publish's own data write — the one interleaving
    *     rules 1-2 cannot order, because both checks pass before
    *     either swap exists. Applies with or without a basis. Once the
    *     claim ages past the grace its owner is declared dead: the
    *     number is passed, and the zombie's own late swap refuses
    *     ([[swapSnapshotOrRefuse]]). */
  private def claimSnapshotVersion(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, root: org.apache.hadoop.fs.Path, tableRoot: String,
      basis: Option[SnapshotBasis]): (Long, String, String) = {
    if (!fs.exists(root)) fs.mkdirs(root): Unit
    val committed = snapshotCommittedNum(fs, root)
    val ptrNum = snapshotPointerNum(fs, root)
    basis.foreach { b =>
      if (committed != b.committed)
        throw new java.util.ConcurrentModificationException(
          s"snapshot publish on $tableRoot: table moved from version " +
            s"${b.committed} (this publish's read basis) to $committed — a " +
            "concurrent publisher committed after this content was derived; " +
            "re-read and re-derive (stale-snapshot write refused, not lost)")
      if (ptrNum != b.pointer)
        throw new java.util.ConcurrentModificationException(
          s"snapshot publish on $tableRoot: the live pointer moved from " +
            s"version ${b.pointer} (the version this publish's content reads " +
            s"resolved) to $ptrNum — a rival that had already claimed before " +
            "the basis read swapped its content live afterwards (the " +
            "claim-to-swap window); this publish derives from a version " +
            "that is no longer live; re-read and re-derive")
    }
    val (inFlight, dead) = snapshotClaimsAbovePointer(fs, root, ptrNum)
    inFlight.headOption.foreach { case (n, age) =>
      throw new java.util.ConcurrentModificationException(
        s"snapshot publish on $tableRoot: version $n is claimed by an " +
          s"in-flight rival publisher (claim age ${age / 1000}s < grace " +
          s"${snapshotGraceMs / 1000}s) that has not swapped yet; claiming " +
          "past it would silently replace its fold when it lands — retry " +
          "after its swap (then re-read and re-derive) or after it ages out")
    }
    // dead claims above the pointer (aged past the grace, or
    // content-less): their numbers stay burned — the markers are tiny
    // and the below-live retention collects them once the pointer
    // passes (re-opening a number would hand it to a fresh claimer
    // while a slower-than-grace zombie still holds an equal-numbered
    // swap) — but their never-swapped version DIRS are reclaimed NOW,
    // while they are still provably never-live (above the pointer):
    // once the pointer numbers past them they would squat in the
    // time-travel retention window as partial garbage
    // (VERDICT r17 #3: crash-loop litter is bounded to one small
    // marker per crash, reclaimed as live advances).
    dead.foreach { vd =>
      deleteQuiet(fs, new org.apache.hadoop.fs.Path(root, vd), recursive = true)
    }
    val next = committed + 1
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val vdir = f"v-$next%012d-$uid"
    if (!createExclusive(fs, uri,
        new org.apache.hadoop.fs.Path(root, f"$CommitPrefix$next%012d"), vdir))
      throw new java.util.ConcurrentModificationException(
        s"snapshot publish on $tableRoot: version $next was claimed by a " +
          "concurrent publisher between this publish's read and its claim; " +
          "re-read and re-derive (stale-snapshot write refused, not lost)")
    (next, uid, vdir)
  }

  /** Classify claims above the live pointer: IN-FLIGHT (valid content,
    * liveness evidence younger than [[snapshotGraceMs]] — a publisher
    * presumed mid-write between claim and swap) vs DEAD (aged past the
    * grace, or content-less from a pre-content-atomic crash). Liveness
    * evidence is the freshest of the marker mtime and its named
    * version dir's mtime (a long data write keeps touching the dir).
    * Returns (in-flight (version, ageMs) ascending, dead claims'
    * named version-dir names). Normally both EMPTY — a swapped
    * publish's marker sits at or below the pointer — so the content
    * reads here cost nothing on the happy path. */
  private def snapshotClaimsAbovePointer(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      ptrNum: Long): (Seq[(Long, Long)], Seq[String]) = {
    val now = System.currentTimeMillis()
    val grace = snapshotGraceMs
    if (!fs.exists(root)) return (Seq.empty, Seq.empty)
    val inFlight = Seq.newBuilder[(Long, Long)]
    val dead = Seq.newBuilder[String]
    fs.listStatus(root).toSeq.foreach { st =>
      if (st.isFile && st.getPath.getName.startsWith(CommitPrefix) &&
          numberOf(st.getPath.getName, CommitPrefix) > ptrNum) {
        val content = readControlQuiet(fs, st.getPath)
        if (content.startsWith("v-")) {
          val vdirMt =
            try fs.getFileStatus(new org.apache.hadoop.fs.Path(root, content))
              .getModificationTime
            catch { case _: java.io.FileNotFoundException => 0L }
          val age = now - math.max(st.getModificationTime, vdirMt)
          if (age < grace)
            inFlight += ((numberOf(st.getPath.getName, CommitPrefix), age))
          else dead += content
        }
      }
    }
    (inFlight.result().sortBy(_._1), dead.result())
  }

  private def readControlQuiet(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String =
    try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    } catch { case _: java.io.IOException => "" }

  /** The snapshot publish's pointer swap, refused loudly when the
    * publish has been OVERTAKEN (r18 rule 4, the zombie-writer guard):
    * a publisher whose data write outlived [[snapshotGraceMs]] was
    * declared dead — rivals may have claimed past it
    * ([[claimSnapshotVersion]] rule 3's age-out) or the litter reclaim
    * may have re-opened its number. Landing its swap anyway would
    * silently replace the rival's fold (higher number still unswapped)
    * or point readers at a reclaimed dir (equal number, different
    * uid). Refusing instead keeps the invariant that NO snapshot
    * publish is ever silently lost: the zombie gets the same
    * `ConcurrentModificationException` redrive contract as a raced
    * claim, and its data dir is reclaimed inline. Within the grace the
    * check never fires — rule 3 kept rivals from claiming past a live
    * writer. */
  private[sources] def swapSnapshotOrRefuse(fs: org.apache.hadoop.fs.FileSystem,
      uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration,
      root: org.apache.hadoop.fs.Path, tableRoot: String, vdir: String,
      myNum: Long, uid: String): Unit = {
    val committed = snapshotCommittedNum(fs, root)
    val ptr = currentPointer(fs, root)
    val ptrNum = ptr.filter(_.startsWith("v-")).map(numberOf(_, "v-")).getOrElse(0L)
    if (committed > myNum || ptrNum > myNum ||
        (ptrNum == myNum && ptr.exists(_ != vdir))) {
      deleteQuiet(fs, new org.apache.hadoop.fs.Path(root, vdir), recursive = true)
      throw new java.util.ConcurrentModificationException(
        s"snapshot publish on $tableRoot: version $myNum was overtaken " +
          s"before its swap (committed=$committed, pointer=$ptrNum) — this " +
          s"publisher's write outlived the ${snapshotGraceMs / 1000}s " +
          "liveness grace and was declared dead (raise " +
          "graft.snapshot.graceMs above the longest publish write); the " +
          "swap is refused and the data dir reclaimed — re-read and " +
          "re-derive (never a silent replace)")
    }
    swapPointerForward(fs, uri, conf, root, vdir, s"$myNum-$uid", prefix = "v-")
  }

  /** Pointer-anchored retention for snapshot tables: versions (and
    * their claim markers) numbered below live−2 go — a reader that
    * resolved the pointer may still be scanning, two SWAPPED publish
    * cycles of slack is the retention window, the same
    * bounded-retention trade a table format's VACUUM makes. Counting
    * the listing instead would let concurrent publishers'
    * written-but-unswapped versions consume the slack and delete the
    * version the pointer still names. An unclaimed/unswapped rival
    * below the slack was refused loudly (r17) or is legacy litter no
    * reader ever resolved — deletable. deleteQuiet: a concurrent
    * pruner may have won the race. Aged claim temps (crashed
    * claimers) are reclaimed alongside.
    *
    * ABOVE live (r18, VERDICT r17 #3): a crashed publisher strands one
    * claim marker and possibly one never-swapped version dir past the
    * pointer, which retention below live never reaches. The DIR — the
    * expensive half — is reclaimed by [[claimSnapshotVersion]] the
    * moment the claim is classified dead (aged past
    * [[snapshotGraceMs]] or content-less), while it is still provably
    * never-live; the marker stays as a burned number (tiny; re-opening
    * it would hand the number to a fresh claimer while a
    * slower-than-grace zombie still holds an equal-numbered swap) and
    * is collected by the below-live rule once the pointer numbers
    * past it. Here, as belt-and-braces, aged version dirs above live
    * that NO claim references (a refused swap whose inline reclaim
    * crashed, manual litter) are swept too; anything younger than the
    * grace may be an in-flight write and is never touched. */
  private def pruneSnapshotVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, fallbackLive: Long): Unit = {
    val liveNum = currentPointer(fs, root)
      .filter(_.startsWith("v-")).map(numberOf(_, "v-")).getOrElse(fallbackLive)
    listVersions(fs, root).collect { case (v, p) if v < liveNum - 2 => p }
      .foreach(p => deleteQuiet(fs, p, recursive = true))
    val now = System.currentTimeMillis()
    val grace = snapshotGraceMs
    val sts = fs.listStatus(root).toSeq
    val claimed = scala.collection.mutable.Set.empty[String]
    sts.foreach { st =>
      val name = st.getPath.getName
      if (st.isFile && name.startsWith(CommitPrefix) &&
          numberOf(name, CommitPrefix) < liveNum - 2)
        deleteQuiet(fs, st.getPath, recursive = false)
      else if (st.isFile && name.startsWith(CommitPrefix) &&
          numberOf(name, CommitPrefix) > liveNum)
        claimed += readControlQuiet(fs, st.getPath)
      else if (st.isFile && name.startsWith(ClaimTmpPrefix) &&
          now - st.getModificationTime >= 10L * 60 * 1000)
        deleteQuiet(fs, st.getPath, recursive = false)
    }
    sts.foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("v-") &&
          numberOf(name, "v-") > liveNum && !claimed.contains(name) &&
          now - st.getModificationTime >= grace)
        deleteQuiet(fs, st.getPath, recursive = true)
    }
  }

  /** Snapshot-table publish, ATOMIC for readers and SERIALIZED across
    * publishers: versioned-directory layout with a pointer-file swap,
    * committed through the dense-claim OCC protocol — the
    * plain-parquet stand-in for the reference's Postgres transaction
    * boundary (`table-loader/services/loader.py:213-234`).
    *
    * Layout: `tableRoot/_current` (pointer, contains the live version
    * dir name) + `tableRoot/v-<n>-<uid>/…parquet` + one `commit-<n>`
    * claim marker per committed version. A publish claims its version
    * number ([[claimSnapshotVersion]] — a raced rival refuses loudly
    * with `ConcurrentModificationException`, never a silent lost
    * update), writes a NEW version dir, then swaps the pointer with
    * `FileContext.rename(OVERWRITE)` (atomic on HDFS and POSIX local
    * FS). Readers resolve the pointer first ([[readSnapshot]]), so
    * they observe either the old or the new version — never a missing
    * or partially-written table. Live data is never deleted in-line:
    * only versions below the two-publish retention window are pruned,
    * so a reader mid-scan of a prior version keeps its files.
    *
    * `basis`: the [[snapshotReadBasis]] taken BEFORE reading the
    * content this publish derives from — with it, a rival commit OR
    * swap between that read and this publish refuses instead of being
    * silently replaced (the transactional read-derive-publish
    * contract; [[graft.operators.IncrementalIdentity]] pins its
    * registry fold with exactly this). Without it the basis defaults
    * to publish-entry time, which still serializes raced publishers
    * but cannot see a rival that landed before entry. */
  def publishSnapshot(df: DataFrame, tableRoot: String,
      basis: Option[SnapshotBasis] = None): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableRoot)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val (next, uid, vdir) =
      claimSnapshotVersion(fs, uri, root, tableRoot, basis)
    df.write.mode(SaveMode.Overwrite).parquet(s"$tableRoot/$vdir")
    // atomic pointer swap: write a temp pointer, rename OVER the live
    // one. BOTH steps go through FileContext: the FileSystem API on a
    // local FS is ChecksumFileSystem, whose create() leaves a .crc
    // sidecar that rename() (raw FS) does NOT move — a concurrent
    // reader then validates the new pointer against the stale sidecar
    // and fails with a checksum error. FileContext writes raw (no
    // sidecar); any sidecar left by an older writer is dropped first.
    // Forward-only, and refused outright when this publish was
    // overtaken while writing (swapSnapshotOrRefuse).
    swapSnapshotOrRefuse(fs, uri, conf, root, tableRoot, vdir, next, uid)
    pruneSnapshotVersions(fs, root, next)
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
    listVersions(fs, new org.apache.hadoop.fs.Path(tableRoot)).map(_._1).distinct.sorted
  }

  /** Time travel: read a specific RETAINED version (see
    * [[snapshotVersions]]) — what lets a long job pin the table state
    * it started from across concurrent publishes, and an audit re-read
    * the pre-load state. Fails loudly if the version was pruned. When
    * rival same-numbered dirs exist (a lost concurrent publish), the
    * one the live pointer names wins; otherwise the choice is
    * name-deterministic. */
  def readSnapshotVersion(spark: SparkSession, tableRoot: String,
      version: Long): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableRoot), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val dirs = listVersions(fs, root).collect { case (v, p) if v == version => p }
    require(dirs.nonEmpty,
      s"version $version not retained (have: ${snapshotVersions(spark, tableRoot).mkString(",")})")
    val chosen = currentPointer(fs, root)
      .flatMap(cur => dirs.find(_.getName == cur))
      .getOrElse(dirs.minBy(_.getName))
    spark.read.parquet(chosen.toString)
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

  /** Multi-frame snapshot publish, ATOMIC across ALL members: the
    * [[publishSnapshot]] mechanics generalized to a GROUP of frames
    * that must evolve together — an identity registry's subjects +
    * local_ids, a model's weights + vocab. Every member is written
    * under ONE new version dir
    * (`tableRoot/v-<n>-<uid>/<member>/…parquet`) and the single
    * `_current` pointer swaps only after the LAST member is fully
    * written, so a reader can never observe member states from
    * different versions — the torn window a per-member snapshot pair
    * leaves open (crash between the two swaps ⇒ subjects from version
    * N beside local_ids from N−1, which re-mints duplicate subject
    * rows on the next incremental identity cycle). A crash mid-publish
    * strands an unswapped version dir that the normal pointer-anchored
    * prune collects later; the live version is untouched. Commit
    * (dense-claim OCC, raced rivals refuse loudly — the registry
    * evolution path [[graft.operators.IncrementalIdentity.resolveCycle]]
    * publishes through here, where a double-fired scheduler used to be
    * a whole lost registry update), retention, rival resolution and
    * prune rules are [[publishSnapshot]]'s verbatim, including
    * `basis`. */
  def publishSnapshotGroup(frames: Seq[(String, DataFrame)], tableRoot: String,
      basis: Option[SnapshotBasis] = None): Unit = {
    require(frames.nonEmpty, "publishSnapshotGroup needs at least one member frame")
    val conf = frames.head._2.sparkSession.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(tableRoot)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val (next, uid, vdir) =
      claimSnapshotVersion(fs, uri, root, tableRoot, basis)
    frames.foreach { case (member, _) =>
      require(member.nonEmpty && !member.contains("/"),
        s"member name must be a plain dir name, got '$member'")
    }
    // member writes are independent jobs into disjoint dirs: run them
    // CONCURRENTLY on the shared family pool (guide §2.6 — the next
    // write's tasks back-fill executors freed by the current write's
    // tail; at gate scale the fixed per-write job overheads overlap).
    // Fail-fast like the sequential loop it replaces: any member's
    // failure propagates before the swap, leaving an unswapped v-dir
    // for the prune — the identical crash story.
    graft.operators.IndexMaintenance.inParallel(frames) { case (member, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$tableRoot/$vdir/$member")
    }: Unit
    swapSnapshotOrRefuse(fs, uri, conf, root, tableRoot, vdir, next, uid)
    pruneSnapshotVersions(fs, root, next)
  }

  /** Read one member frame of the live [[publishSnapshotGroup]]
    * version. All members read against the same resolved pointer are
    * mutually consistent only if resolved ONCE — use
    * [[readSnapshotGroupAll]] when more than one member feeds the same
    * computation. */
  def readSnapshotGroup(spark: SparkSession, tableRoot: String,
      member: String): DataFrame =
    spark.read.parquet(s"${resolveSnapshot(spark, tableRoot)}/$member")

  /** Every member of the live group version, resolved from ONE pointer
    * read — the consistent-view read for multi-member consumers (a
    * publish landing between two separate [[readSnapshotGroup]] calls
    * would hand the caller members from different versions). */
  def readSnapshotGroupAll(spark: SparkSession, tableRoot: String,
      members: Seq[String]): Map[String, DataFrame] = {
    val live = resolveSnapshot(spark, tableRoot)
    members.map(m => m -> spark.read.parquet(s"$live/$m")).toMap
  }

  /** Time travel over a snapshot GROUP: all members of one RETAINED
    * prior version (see [[snapshotVersions]] — same retention as
    * single-frame snapshots). The audit read the incremental-identity
    * registry needs: "what did subjects AND local_ids look like
    * before cycle N", mutually consistent by construction. Fails
    * loudly when the version was pruned; rival same-numbered dirs
    * resolve with the [[readSnapshotVersion]] rule. */
  def readSnapshotGroupVersion(spark: SparkSession, tableRoot: String,
      version: Long, members: Seq[String]): Map[String, DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableRoot), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val dirs = listVersions(fs, root).collect { case (v, p) if v == version => p }
    require(dirs.nonEmpty,
      s"group version $version not retained (have: ${snapshotVersions(spark, tableRoot).mkString(",")})")
    val chosen = currentPointer(fs, root)
      .flatMap(cur => dirs.find(_.getName == cur))
      .getOrElse(dirs.minBy(_.getName))
    members.map(m => m -> spark.read.parquet(s"$chosen/$m")).toMap
  }

  // accepts both the uid-suffixed layout (`v-<n>-<uid>`) and the
  // legacy plain one (`v-<n>`) — numeric prefix only
  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("v-") =>
        (numberOf(st.getPath.getName, "v-"), st.getPath)
    }
}
