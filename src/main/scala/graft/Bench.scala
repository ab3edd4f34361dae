package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every declared query against
  * `SPARK_GRAFT_SF_DIR`, print one JSON line of per-query seconds.
  * A warm-up action first so JVM/codegen warm-up is not billed to the
  * first query. */
object Bench {

  /** The headline subset reported on the final (parse-bearing) JSON
    * line: the driver keeps only a bounded TAIL of captured output, so
    * the last line must stay well under ~1.5 KB (BENCH_r01/r02 both
    * lost their head and parsed as null). The full per-query map is
    * printed earlier and written to target/bench_full.json. Chosen to
    * cover every BASELINE.md comparison point plus the heaviest
    * distinctive operators. */
  private val headline = Seq(
    "q_identity_resolve", "q_identity_evolution", "q_pipeline_validate",
    "q_fn_gsid_deterministic", "q_fuzzy_center_resolve", "q_lookup_local_id",
    "q_upsert_merged", "q_op_field_mapping", "q_op_null_counts",
    "q_op_conflicts", "q_dedup_exact_groups", "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh", "q_dedup_minhash_fast", "q_dedup_simhash", "q_dedup_embedding",
    "q_text_metrics", "q_text_langid", "q_text_winnow",
    "q_vec_topk_cosine", "q_vec_ann_lsh", "q_vec_ann_ivf",
    "q_h3_shipping_priority", "q_h5_region_revenue", "q_h10_returned_items",
    "q_stream_windowed", "q_asof_purchase", "q_range_join",
    "q_text_pii_redact", "q_sample_split", "q_dedup_collapse", "q_text_tfidf",
    "q_curation_pipeline", "q_dedup_incremental", "q_dedup_semantic",
    "q_vec_pq_search", "q_text_bpe_learn", "q_graph_centrality",
    "q_retrieval_hybrid", "q_agg_hist_sketch", "q_rep_corr_matrix",
    // round-10 heavy additions: median-of-3 protection for the
    // queries most exposed to host noise (infra-heavy end-to-end
    // compositions); final-line budget re-measured at ~1.3 KB,
    // still under the driver's ~1.5 KB tail window
    "q_identity_incremental", "q_dedup_jaccard_prefix",
    "q_dedup_decontam_incremental")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // dev-side subset filter (comma-separated names) for big-SF runs
    // where the full suite is impractical (e.g. sf10 excludes the
    // labeled-quadratic all-pairs baseline); unset = driver contract,
    // every query
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM + codegen + parquet footer reads
    Tables.lineitem(spark, sfDir).count()

    var nRun = 0
    def timeQuery(q: graft.queries.QueryDef): Double = {
      val t0 = System.nanoTime()
      // a per-query failure must be LOUD: print it, and record the
      // query as -1 in the map (a silent catch turns a red query into
      // a fast-looking number)
      val err = try { q.fn(spark, sfDir).count(); None }
                catch { case e: Throwable => Some(e) }
      val dt = (System.nanoTime() - t0) / 1e9
      err.foreach { e =>
        System.err.println(s"[bench] FAILED ${q.name}: ${e.getClass.getName}: " +
          String.valueOf(e.getMessage).replaceAll("\\s+", " ").take(300))
      }
      // Isolate queries AND bound accumulated state: clearCache drops
      // SQL-cached plans, but localCheckpoint/persist blocks survive it
      // and pile up across ~80 queries until late queries pay eviction
      // + GC (driver's r2 bench ran 2-10x the local times for exactly
      // the checkpoint-heavy late-positioned queries). Unpersist every
      // RDD explicitly each round, and periodically force a GC so the
      // ContextCleaner actually releases shuffle files / broadcasts
      // (they are weak-reference-cleaned, i.e. only on GC — a 24g heap
      // may otherwise not GC for the whole run).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      nRun += 1
      if (nRun % 8 == 0) System.gc()
      if (err.isDefined) -1.0 else dt
    }
    val defs = SparkEntry.allDefs.filter(q => only.forall(_.contains(q.name)))
    val results = defs.map(q => q.name -> timeQuery(q))

    // The headline subset is re-timed twice more and reported as the
    // MEDIAN of the three runs: a single contended driver run (the
    // r08 bench regressed 10-44x on shuffle-heavy queries with
    // bit-identical code) can then no longer halve the apparent
    // throughput of any headline row. Bounded cost: repeats only for
    // the ~38 headline queries.
    val hset = headline.toSet
    val headlineDefs = defs.filter(q => hset(q.name))
    val reps: Map[String, Seq[Double]] = {
      val extra = (1 to 2).map(_ => headlineDefs.map(q => q.name -> timeQuery(q)).toMap)
      val first = results.toMap
      headlineDefs.map(q => q.name ->
        (Seq(first(q.name)) ++ extra.map(_(q.name)))).toMap
    }
    def median3(v: Seq[Double]): Double =
      if (v.exists(_ < 0)) -1.0 else v.sorted.apply(v.length / 2)

    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(qs: Seq[(String, Double)]): String =
      qs.map { case (k, v) => "\"" + k + "\":" + f2(v) }.mkString("{", ",", "}")
    def jsonLine(qs: Seq[(String, Double)], total: Double, tail: String = ""): String =
      s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":${jmap(qs)},"sf":"$sfDir"$tail}"""
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFailed = results.count(_._2 < 0)
    if (nFailed > 0)
      System.err.println(s"[bench] $nFailed queries FAILED (value -1 in the map)")
    val full = jsonLine(results, total)
    // full map: printed first (human log) and persisted for dev diffing
    println(full)
    // per-headline median/min/max: printed for the log, persisted for
    // dev diffing (kept OFF the final line to stay under the driver's
    // ~1.5 KB tail window)
    val spreadJson = reps.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k":{"median":${f2(median3(v))},"min":${f2(v.min)},"max":${f2(v.max)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"headline_spread","reps":3,"queries":$spreadJson}""")
    for ((name, text) <- Seq("bench_full.json" -> full,
        "bench_headline_spread.json" ->
          s"""{"metric":"headline_spread","reps":3,"queries":$spreadJson}""")) {
      try {
        val p = java.nio.file.Paths.get(s"target/$name")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, text.getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    }
    // final line = compact headline subset (median-of-3 values),
    // guaranteed inside the driver's tail window (see `headline`
    // scaladoc). spread_max_rel = worst (max-min)/median across
    // headline rows — a one-number contention indicator.
    val medians = results.collect { case (k, _) if hset(k) => k -> median3(reps(k)) }
    val spreadMaxRel = reps.values.collect {
      case v if v.forall(_ >= 0) && median3(v) > 0.05 => (v.max - v.min) / median3(v)
    }.foldLeft(0.0)(math.max)
    println(jsonLine(medians, total,
      s""","reps":3,"spread_max_rel":${f2(spreadMaxRel)}"""))
    spark.stop()
  }
}
