package graft

import graft.queries.QueryDef

/** Plan-shape audit: the properties that matter at 100 TB, asserted on
  * the optimized plans of the declared queries (not just their
  * results). Catches regressions like a lost broadcast, a lost filter
  * pushdown, or a cartesian product sneaking in. */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val q = SparkEntry.allDefs.find(_.name == name).get
    q.fn(spark, sf001).queryExecution.executedPlan.toString
  }

  test("dimension joins broadcast (no shuffle of nation/region)") {
    val p = planOf("q_join_dims")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("filter + projection push into the parquet scan") {
    val p = planOf("q_agg_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p.take(800))
    // only the needed columns are read
    assert(p.contains("l_returnflag") && !p.contains("l_comment"))
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("anti/semi joins stay joins (no subquery re-execution)") {
    assert(planOf("q_anti_customers_no_urgent").contains("LeftAnti"))
    assert(planOf("q_semi_customers_with_orders").contains("LeftSemi"))
  }

  test("fuzzy resolve broadcasts the dimension side") {
    val p = planOf("q_fuzzy_center_resolve")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("global-distinct window is a broadcast aggregate, not a single-partition window") {
    val p = planOf("q_w1_global_distinct")
    assert(!p.contains("Window"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("requiring-review rollup broadcasts the centers dim") {
    val p = planOf("q_rep_requiring_review")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("load-bookkeeping MERGE is one co-partitioned shuffle join, not a broadcast of the log") {
    val p = planOf("q_load_bookkeeping")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("incremental pull pushes the since-predicate into the scan") {
    val p = planOf("q_stream_incremental")
    // PushedFilters on the physical ts column: the raw INT64-nanos
    // long in the legacy layout, the native timestamp otherwise
    // (Tables.eventsSince plants the filter below the NTZ→TZ cast)
    assert(p.contains("GreaterThan(ts,"), p.take(800))
  }

  test("events loader normalization does not break pushdown or column pruning") {
    // the ts-normalizing projection must sit ABOVE the scan without
    // blocking either: event_type equality still reaches PushedFilters
    // and the wide `props` column is still pruned from ReadSchema
    val p = planOf("q_asof_purchase")
    assert(p.contains("EqualTo(event_type,click)"), p.take(1200))
    assert(p.contains("EqualTo(event_type,purchase)"), p.take(1200))
    assert(!p.contains("props"), "props survived column pruning")
    val w = planOf("q_stream_windowed")
    assert(!w.contains("props") && !w.contains("event_id"),
      "windowed stats read more columns than it needs")
  }

  test("keyed and range merge-table reads push their predicate into the kept dirs' scans") {
    // dir skipping (asserted in MergePruneSpec) composes with parquet
    // row-group pruning INSIDE the dirs that are read: the isin /
    // range predicate must reach PushedFilters of the remaining scan
    val kp = planOf("q_merge_keyed_lookup")
    assert(kp.contains("PushedFilters: [In(o_orderkey") ||
      kp.contains("PushedFilters: [IsNotNull(o_orderkey), In(o_orderkey"), kp.take(1200))
    val rp = planOf("q_merge_range_scan")
    assert(rp.contains("GreaterThanOrEqual(o_orderkey,1000)") &&
      rp.contains("LessThanOrEqual(o_orderkey,2000)"), rp.take(1200))
  }

  test("pairwise cosine joins broadcast the small side (no shuffled cartesian)") {
    val p = planOf("q_dedup_embedding")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("cosine is the native codegen'd expression, not interpreted HOF lambdas") {
    val p = planOf("q_vec_topk_cosine")
    assert(p.contains("cosine_sim"), p.take(800))
    assert(!p.contains("aggregate(zip_with"), p.take(800))
  }

  test("whole-stage codegen covers the scan-heavy queries") {
    val q = SparkEntry.allDefs.find(_.name == "q_agg_pricing").get
    val p = q.fn(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), p.take(400))
  }

  test("per-row curation ops (pii, repetition, split) stay zero-shuffle scans") {
    for (q <- Seq("q_text_pii_redact", "q_text_repetition", "q_sample_split")) {
      val p = planOf(q)
      // the only exchange allowed is the final presentation sort
      assert(!p.contains("Exchange hashpartitioning"), s"$q:\n${p.take(800)}")
      assert(!p.contains("Window") && !p.contains("Join"), s"$q:\n${p.take(800)}")
    }
  }

  test("contamination is an equi-join on shingles, never a cartesian") {
    val p = planOf("q_dedup_contamination")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
  }

  test("seeded ivf broadcasts the probed query side (table side never fans out)") {
    val p = planOf("q_vec_ann_ivf")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("curation pipeline is one scan + one narrow shuffle (the dedup window)") {
    val p = planOf("q_curation_pipeline")
    // exchanges: the fingerprint window + the final presentation sort —
    // no join, no extra aggregation shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n${p.take(1200)}")
    assert(!p.contains("Join"), p.take(1200))
  }

  test("domain-mix sampling is a zero-shuffle scan filter") {
    val p = planOf("q_sample_domain_mix")
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }

  test("chunking and z-order are zero-shuffle scan expressions") {
    for (q <- Seq("q_text_chunk", "q_layout_zorder")) {
      val p = planOf(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q:\n${p.take(800)}")
      assert(!p.contains("Join"), s"$q:\n${p.take(800)}")
    }
  }

  test("exact-k sample costs exactly the one per-stratum window shuffle") {
    val p = planOf("q_sample_exact_k")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n${p.take(1200)}")
    assert(!p.contains("Join"), p.take(1200))
  }

  test("repeated-span removal joins on gram/position keys, never a cartesian") {
    val p = planOf("q_dedup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("tfidf joins corpus size as a broadcast one-row aggregate, not a window") {
    val p = planOf("q_text_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1200))
    assert(!p.contains("SinglePartition, Window"), p.take(1200))
  }

  test("PQ encode is a zero-shuffle scan using the codegen'd argmin kernel") {
    val emb = Tables.embeddings(spark, sf001)
    val cbs = graft.operators.SimilaritySearch.pqCodebooks(emb, 0L until 4L, m = 4)
    val p = graft.operators.SimilaritySearch.pqEncode(emb, cbs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1200))
    assert(p.contains("nearest_centroid"), p.take(1200))
  }

  test("hashed model score is a zero-shuffle scan expression") {
    val p = Tables.documents(spark, sf001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.operators.TextAnalysis.hashedModelScore(
          org.apache.spark.sql.functions.col("text")).as("score"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1200))
  }

  test("semantic dedup: within-cluster equi-joins only, never a cartesian") {
    val p = planOf("q_dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    assert(p.contains("nearest_centroid"), p.take(1500))
  }

  test("vocab induction: global rank/cumsum window only after the top-N cut") {
    val p = planOf("q_text_vocab")
    // the top-N cut plans as TakeOrderedAndProject, so the
    // single-partition window upstream of the final sort sees <= N rows
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("fuzzy join: candidates come from an equi-join on grams, never a loop") {
    val p = planOf("q_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("bloom semi-join: native might_contain prefilter sits below the exchange") {
    val p = planOf("q_bloom_semi")
    // the probe is Spark's native might_contain over the filter-bits
    // literal (codegen-fused with the scan) — NOT a UDF boundary.
    // Plans print parents first, so "deeper than the shuffle" means
    // the prefilter appears AFTER the first SHUFFLE exchange in the
    // text ("Exchange hashpartitioning" — a bare indexOf(Exchange)
    // would anchor on a BroadcastExchange and prove nothing): the
    // shuffle then carries only rows that passed the bloom
    val firstExchange = p.indexOf("Exchange hashpartitioning")
    val filterAt = p.indexOf("might_contain")
    assert(filterAt >= 0, p.take(1500))
    assert(!p.contains("UDF("), p.take(1500))
    if (firstExchange >= 0) assert(filterAt > firstExchange, p.take(1500))
    assert(p.contains("LeftSemi"), p.take(1500))
  }

  test("per-key top-k: ObjectHashAggregate pair, no Window, no global sort of input") {
    val p = planOf("q_topk_per_key")
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_top_k_rows"),
      p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("heavy hitters recount: broadcast semi-join prunes before the aggregate") {
    val p = planOf("q_heavy_hitters")
    assert(p.contains("LeftSemi") && p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("kmv sketch: ObjectHashAggregate pair with map-side partials, one shuffle") {
    val p = planOf("q_agg_kmv_distinct")
    assert(p.contains("partial_kmv_distinct"), p.take(1500))
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
  }

  test("sequence packing: per-doc window partitioned by bucket, offsets broadcast") {
    val p = planOf("q_text_pack_spans")
    // the broadcast of the tiny bucket-offset table is the two-phase
    // prefix sum's signature — without it the plan would be a global
    // single-partition window over every data row
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("temperature mix: selection is a zero-shuffle scan filter") {
    val p = planOf("q_sample_temperature")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p.take(1500))
  }

  test("bm25: stats/df broadcast, top-k as TakeOrdered, no sort-merge join") {
    val p = planOf("q_text_bm25")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("histogram sketch: ObjectHashAggregate pair with map-side partials") {
    val p = planOf("q_agg_hist_sketch")
    assert(p.contains("partial_hist_fixed"), p.take(1500))
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
  }

  test("weighted sample: one per-stratum window shuffle, nothing else") {
    val p = planOf("q_sample_weighted")
    assert(p.contains("Window"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("matryoshka funnel: queries broadcast in both stages, corpus never fans out") {
    val p = planOf("q_vec_matryoshka")
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("rrf fusion: shortlist-level join, global order as TakeOrdered") {
    val p = planOf("q_retrieval_hybrid")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("kll sketch: ObjectHashAggregate pair with map-side partials, one shuffle") {
    val p = planOf("q_agg_kll_quantile")
    assert(p.contains("partial_kll_quantiles"), p.take(1500))
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
  }

  test("video near-dup: candidates from an equi-join on frame signatures, never a cartesian; payload never joins") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def bmp(seed: Long): Array[Byte] =
      graft.operators.Multimodal.synthBmp24(18, 16)((x, y) =>
        ((((seed % 9973L) * (x + 3) + (seed % 9949L) * (y + 7) + x * y * 31L) % 199L)).toInt)
    val frames = (1L to 4L).flatMap(v => (0 until 3).map(k => (v, k, bmp(v * 10 + k))))
      .toDF("video_id", "frame_idx", "payload")
    val p = graft.operators.Multimodal.videoNearDup(frames, 0.6)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    // the decoded signature frame is what joins — the binary payload
    // column must not appear above the decode
    assert(!p.contains("payload"), p.take(2000))
  }

  test("row-level change feed: delta scan lists only the changed dirs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_plan_cdc").toString + "/t"
    val cfg = graft.types.TableConfig("t", Seq("k"), Seq.empty)
    def b(lo: Long, hi: Long, pmod: Int) = (lo to hi).map(i => (i, s"v$i"))
      .toDF("k", "v").withColumn("p", (col("k") % pmod).cast("int"))
    graft.sources.Sources.publishMergePartitioned(spark, dir, b(1, 40, 4), cfg, "p")
    val since = graft.sources.Sources.mergeVersions(spark, dir).max
    // second publish touches ONLY partitions 1 and 3 (odd keys)
    graft.sources.Sources.publishMergePartitioned(spark, dir,
      b(41, 60, 4).filter(col("p").isin(1, 3)), cfg, "p")
    val delta = graft.sources.Sources.readMergePartitionedChanges(spark, dir, since, "p")
    val scanned = delta.queryExecution.executedPlan.toString
    // the changed-partition read must reference only the second
    // publish's batch dir — the first batch's untouched p=0/p=2 dirs
    // contribute zero I/O
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("b-")).sorted
    assert(batchDirs.length == 2)
    val (first, second) = (batchDirs(0), batchDirs(1))
    assert(scanned.contains(second), scanned.take(1500))
    assert(!scanned.contains(first), scanned.take(1500))
  }

  test("streaming kll: partial/merge aggregate pair under the window grouping") {
    val p = planOf("q_stream_kll")
    assert(p.contains("partial_kll_quantiles"), p.take(2000))
  }

  test("token-budget sample: windows only partition by bucket, never a global data window") {
    val p = planOf("q_sample_token_budget")
    // every data-row window must carry the bucket partitioning; a
    // single-partition window over data rows would read as a Window
    // whose required ordering has no partition spec on _b
    // the data-row running sum must carry the bucket partitioning
    // (the only unpartitioned window is the 256-row bucket-offset one)
    assert(p.contains("windowspecdefinition(_b#"), p.take(3000))
  }

  test("kmv set algebra: one aggregate pass builds the sketches, pair stage is sketch-sized") {
    val p = planOf("q_agg_kmv_setops")
    assert(p.contains("partial_kmv_minima"), p.take(2000))
    // the pair join runs over 5 sketch rows — no sort-merge machinery
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("ppjoin+ verify: equi-joins + array intersection, no cartesian, no posting re-expansion") {
    val p = planOf("q_dedup_jaccard_prefix")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the verify stage is a per-pair array intersection (a projection),
    // not a re-join of the full posting lists followed by a count agg
    assert(p.contains("array_intersect"), p.take(2000))
  }

  test("partitioned ANN: every branch keeps static probed-list pruning; merge is a top-k window") {
    val q = SparkEntry.allDefs.find(_.name == "q_vec_ivfpq_partitioned").get
    val df = q.fn(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // two partition branches unioned, each scanning only its own
    // index's probed _list dirs (partition filters on _list)
    assert(p.contains("Union"), p.take(2000))
    assert(p.contains("PartitionFilters: [_list"), p.take(3000))
    // the query side broadcasts into each branch — the corpus-side
    // codes never fan out
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }
}
