package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Gsid
import graft.operators.IdentityResolver

/** The centerpiece: batch identity resolution (SURVEY.md §2.9) driven
  * through the oracle gate.
  *
  * A synthetic registry is derived deterministically from `supplier`
  * (every supplier name registered once; every 10th registered twice
  * under a second, older GSID → multi-GSID conflicts), and a request
  * batch from `customer` (every 4th request matches a supplier name —
  * every 8th in UPPER case to exercise case-folding; the rest carry
  * never-seen identifiers → create_new; every 10th request has
  * center 0 = unknown). The DuckDB oracle re-derives the reference's
  * triage rules (`gsid-service/services/identity_resolution.py`)
  * independently in ANSI SQL.
  */
object IdentityQueries {

  private[graft] def registry(s: SparkSession, d: String): IdentityResolver.Registry = {
    val sup = Tables.supplier(s, d)
    val gS = Gsid.deterministic(concat(lit("S"), col("s_suppkey").cast("string")))
    val gX = Gsid.deterministic(concat(lit("X"), col("s_suppkey").cast("string")))
    val localIds = sup.select(
        col("s_name").as("local_subject_id"), lit("primary").as("identifier_type"),
        col("s_nationkey").cast("int").as("center_id"), gS.as("global_subject_id"))
      .unionByName(sup.filter(col("s_suppkey") % 10 === 0).select(
        col("s_name").as("local_subject_id"), lit("primary").as("identifier_type"),
        ((col("s_nationkey") + 1) % 25).cast("int").as("center_id"), gX.as("global_subject_id")))
    val subjects = sup.select(
        gS.as("global_subject_id"), col("s_nationkey").cast("int").as("center_id"),
        date_add(lit("2020-01-01").cast("date"), col("s_suppkey").cast("int")).as("created_at"))
      .unionByName(sup.filter(col("s_suppkey") % 10 === 0).select(
        gX.as("global_subject_id"), ((col("s_nationkey") + 1) % 25).cast("int").as("center_id"),
        date_add(lit("2019-01-01").cast("date"), col("s_suppkey").cast("int")).as("created_at")))
    IdentityResolver.Registry(subjects, localIds)
  }

  /** As [[registry]], with withdrawn/review flags derived from the
    * supplier key: every 7th 'S' subject (s_suppkey % 7 = 3) is
    * withdrawn; every 11th (s_suppkey % 11 = 5) is flagged for review
    * with a note. */
  private[graft] def flaggedRegistry(s: SparkSession, d: String): IdentityResolver.Registry = {
    val base = registry(s, d)
    val sup = Tables.supplier(s, d)
    val gS = Gsid.deterministic(concat(lit("S"), col("s_suppkey").cast("string")))
    val flags = sup.select(gS.as("global_subject_id"),
      (col("s_suppkey") % 7 === 3).as("withdrawn"),
      (col("s_suppkey") % 11 === 5).as("flagged_for_review"),
      when(col("s_suppkey") % 11 === 5, lit("flagged during load"))
        .cast("string").as("review_notes"))
    val subjects = base.subjects
      .join(flags, Seq("global_subject_id"), "left")
      .withColumn("withdrawn", coalesce(col("withdrawn"), lit(false)))
      .withColumn("flagged_for_review", coalesce(col("flagged_for_review"), lit(false)))
    IdentityResolver.Registry(subjects, base.localIds)
  }

  private[graft] def candidates(s: SparkSession, d: String): DataFrame = {
    val nsupp = Tables.supplier(s, d).count() // tiny dim; driver-side count is fine
    val requests = Tables.customer(s, d).select(
      col("c_custkey").as("request_id"),
      when(col("c_custkey") % 10 === 0, 0).otherwise(col("c_nationkey").cast("int"))
        .as("center_id"))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
    val matchedCands = requests.filter(col("request_id") % 4 === 1)
      .join(broadcast(sup), col("s_suppkey") === (col("request_id") % nsupp))
      .select(col("request_id"), col("center_id"),
        when(col("request_id") % 8 === 5, upper(col("s_name"))).otherwise(col("s_name"))
          .as("local_subject_id"),
        lit("primary").as("identifier_type"))
    val newCands = requests.filter(col("request_id") % 4 =!= 1)
      .select(col("request_id"), col("center_id"),
        concat(lit("A-"), col("request_id").cast("string")).as("local_subject_id"),
        lit("primary").as("identifier_type"))
    val secondCands = requests
      .select(col("request_id"), col("center_id"),
        concat(lit("C-"), col("request_id").cast("string")).as("local_subject_id"),
        lit("secondary").as("identifier_type"))
    matchedCands.unionByName(newCands).unionByName(secondCands)
  }

  private val oracleCtes =
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
      |         CASE WHEN r.request_id % 8 = 5 THEN upper(s.s_name) ELSE s.s_name END AS local_subject_id
      |  FROM requests r JOIN supplier s
      |    ON s.s_suppkey = r.request_id % (SELECT COUNT(*) FROM supplier)
      |  WHERE r.request_id % 4 = 1
      |  UNION ALL
      |  SELECT request_id, center_id, 'A-' || CAST(request_id AS VARCHAR)
      |  FROM requests WHERE request_id % 4 <> 1
      |  UNION ALL
      |  SELECT request_id, center_id, 'C-' || CAST(request_id AS VARCHAR) FROM requests),
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
      |mintkeys AS (
      |  SELECT request_id, min(lower(local_subject_id)) AS mint_key
      |  FROM cands GROUP BY request_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Fellegi-Sunter probabilistic linkage over the customer table:
    // intra-block (nation, segment) pairs scored by integer
    // field-agreement log-odds (account-balance band +4/−2, balance
    // sign +2/−1, name length +1/−1), kept at score ≥ 6 — the
    // evidence-weighing upgrade to the deterministic identifier
    // rules of q_identity_resolve. Integer sums, exact everywhere.
    QueryDef.sql(
      "q_identity_fs_linkage",
      """WITH p AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |    CAST((CASE WHEN floor(a.c_acctbal/1000.0) = floor(b.c_acctbal/1000.0) THEN 1 ELSE 0 END)
        |       + (CASE WHEN (a.c_acctbal >= 0.0) = (b.c_acctbal >= 0.0) THEN 1 ELSE 0 END)
        |       + (CASE WHEN length(a.c_name) = length(b.c_name) THEN 1 ELSE 0 END)
        |      AS INT) AS n_agree,
        |    CAST((CASE WHEN floor(a.c_acctbal/1000.0) = floor(b.c_acctbal/1000.0) THEN 4 ELSE -2 END)
        |       + (CASE WHEN (a.c_acctbal >= 0.0) = (b.c_acctbal >= 0.0) THEN 2 ELSE -1 END)
        |       + (CASE WHEN length(a.c_name) = length(b.c_name) THEN 1 ELSE -1 END)
        |      AS INT) AS score
        |  FROM customer a JOIN customer b
        |    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
        |    AND a.c_custkey < b.c_custkey)
        |SELECT id_a, id_b, n_agree, score FROM p
        |WHERE score >= 6
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      import graft.operators.Linkage
      import graft.operators.Linkage.CompareField
      Linkage.selfScore(Tables.customer(s, d), "c_custkey",
          Seq("c_nationkey", "c_mktsegment"),
          Seq(
            CompareField(r => floor(r.getField("c_acctbal") / lit(1000.0)), 4, -2),
            CompareField(r => r.getField("c_acctbal") >= lit(0.0), 2, -1),
            CompareField(r => length(r.getField("c_name")), 1, -1)),
          minScore = 6)
        .orderBy("id_a", "id_b")
    },

    // Blocking-quality report for the linkage blocking scheme: the
    // candidate-pair count comes from block SIZES alone (Σ C(n,2)
    // over a groupBy — no pair materialized), and pair completeness
    // joins a ground-truth pair set (equal-balance customer pairs)
    // against the block keys. The two ratios every linkage
    // deployment tunes, at one-aggregation cost.
    QueryDef.sql(
      "q_identity_blocking_quality",
      """WITH truth AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM customer a JOIN customer b
        |    ON a.c_acctbal = b.c_acctbal AND a.c_custkey < b.c_custkey),
        |blocks AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |           FROM customer GROUP BY 1, 2),
        |bstats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |             CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs,
        |             CAST(SUM(n) AS BIGINT) AS n_records
        |           FROM blocks),
        |caught AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_caught
        |           FROM truth t
        |           JOIN customer a ON a.c_custkey = t.id_a
        |           JOIN customer b ON b.c_custkey = t.id_b
        |           WHERE a.c_nationkey = b.c_nationkey
        |             AND a.c_mktsegment = b.c_mktsegment),
        |tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
        |SELECT n_records, n_blocks, candidate_pairs,
        |  n_records * (n_records - 1) // 2 AS total_pairs,
        |  1.0 - CAST(candidate_pairs AS DOUBLE)
        |        / CAST(n_records * (n_records - 1) // 2 AS DOUBLE) AS reduction_ratio,
        |  n_truth, n_caught,
        |  CASE WHEN n_truth > 0
        |       THEN CAST(n_caught AS DOUBLE) / CAST(n_truth AS DOUBLE)
        |       ELSE 0.0 END AS pair_completeness
        |FROM bstats CROSS JOIN caught CROSS JOIN tn""".stripMargin) { (s, d) =>
      import graft.operators.Linkage
      val cust = Tables.customer(s, d)
      val truth = cust.select(col("c_custkey").as("id_a"), col("c_acctbal").as("_ba"))
        .join(cust.select(col("c_custkey").as("id_b"), col("c_acctbal").as("_bb")),
          col("_ba") === col("_bb") && col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      Linkage.blockingQuality(cust, "c_custkey",
        Seq("c_nationkey", "c_mktsegment"), truth)
    },

    // Fellegi-Sunter EM parameter estimation (Winkler 1988) over the
    // same blocked pairs as q_identity_fs_linkage: 5 E/M iterations
    // learning λ and per-field m/u FROM the data. Bit-exactness
    // across engines comes from the quantized-weight discipline: the
    // pairs collapse to ≤2^3 agreement-pattern counts (one
    // distributed aggregation, pairs never rescanned), each E-step
    // posterior quantizes to wq = floor(w·1e9 + 0.5), every M-step
    // sum is an exact integer sum, and each new parameter is one
    // mirrored IEEE division — the oracle replays the ENTIRE
    // 5-iteration trajectory as unrolled CTEs and must land on
    // identical doubles. The candidate join is BOUNDED: blocks larger
    // than maxBlock=256 rows are deterministically subsampled by
    // md5-fate rank (mirrored in the oracle's `capped` CTE), so total
    // pairs are nBlocks·maxBlock² — linear-bounded, not quadratic —
    // at any scale factor; at sf≤0.1 every block is under the cap and
    // the result is bit-identical to the uncapped estimate.
    QueryDef.sql(
      "q_identity_fs_em", {
        val fieldsSql = Seq(
          "floor(a.c_acctbal/1000.0) = floor(b.c_acctbal/1000.0)",
          "(a.c_acctbal >= 0.0) = (b.c_acctbal >= 0.0)",
          "length(a.c_name) = length(b.c_name)")
        val nF = fieldsSql.size
        val iters = 5
        val gCols = (0 until nF).map(f => s"g$f")
        def pm(i: String) = (0 until nF).map(f =>
          s"(CASE WHEN c.g$f = 1 THEN $i.m$f ELSE 1.0 - $i.m$f END)")
          .foldLeft(s"$i.lambda")((acc, t) => s"$acc * $t")
        def pu(i: String) = (0 until nF).map(f =>
          s"(CASE WHEN c.g$f = 1 THEN $i.u$f ELSE 1.0 - $i.u$f END)")
          .foldLeft(s"(1.0 - $i.lambda)")((acc, t) => s"$acc * $t")
        val iterCtes = (1 to iters).map { k =>
          val p = pm("i"); val q = pu("i")
          s"""e$k AS (SELECT ${gCols.map("c." + _).mkString(", ")}, c.cnt,
             |  CAST(FLOOR(($p) / (($p) + ($q)) * 1000000000.0 + 0.5) AS BIGINT) AS wq
             |  FROM cnts c CROSS JOIN it${k - 1} i),
             |it$k AS (SELECT
             |  LEAST(GREATEST(CAST(SUM(cnt * wq) AS DOUBLE)
             |    / (1000000000.0 * CAST(t.n AS DOUBLE)), 0.000001), 0.999999) AS lambda,
             |${(0 until nF).map(f =>
                s"""  LEAST(GREATEST(CAST(SUM(cnt * wq * g$f) AS DOUBLE)
                   |    / CAST(SUM(cnt * wq) AS DOUBLE), 0.000001), 0.999999) AS m$f,
                   |  LEAST(GREATEST(CAST(SUM(cnt * (1000000000 - wq) * g$f) AS DOUBLE)
                   |    / CAST(SUM(cnt * (1000000000 - wq)) AS DOUBLE), 0.000001), 0.999999) AS u$f""".stripMargin)
                .mkString(",\n")}
             |  FROM e$k CROSS JOIN tot t GROUP BY t.n)""".stripMargin
        }.mkString(",\n")
        s"""WITH capped AS (
           |  SELECT * FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY c_nationkey, c_mktsegment
           |      ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS _rn
           |    FROM customer) WHERE _rn <= 256),
           |pairs AS (
           |  SELECT ${fieldsSql.zipWithIndex.map { case (fx, f) =>
                s"(CASE WHEN $fx THEN 1 ELSE 0 END) AS g$f" }.mkString(",\n         ")}
           |  FROM capped a JOIN capped b
           |    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
           |    AND a.c_custkey < b.c_custkey),
           |cnts AS (SELECT ${gCols.mkString(", ")}, CAST(COUNT(*) AS BIGINT) AS cnt
           |         FROM pairs GROUP BY ${gCols.mkString(", ")}),
           |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cnts),
           |it0 AS (SELECT CAST(0.5 AS DOUBLE) AS lambda,
           |${(0 until nF).map(f =>
              s"  CAST(0.9 AS DOUBLE) AS m$f, CAST(0.1 AS DOUBLE) AS u$f").mkString(",\n")}),
           |$iterCtes
           |SELECT f.field_idx,
           |  CASE f.field_idx ${(0 until nF).map(f => s"WHEN $f THEN i.m$f").mkString(" ")} END AS m,
           |  CASE f.field_idx ${(0 until nF).map(f => s"WHEN $f THEN i.u$f").mkString(" ")} END AS u,
           |  i.lambda, t.n AS n_pairs
           |FROM it$iters i CROSS JOIN tot t
           |CROSS JOIN (VALUES ${(0 until nF).map(f => s"($f)").mkString(", ")}) f(field_idx)
           |ORDER BY field_idx""".stripMargin
      }) { (s, d) =>
      import graft.operators.Linkage
      val params = Linkage.estimateParamsEM(Tables.customer(s, d), "c_custkey",
        Seq("c_nationkey", "c_mktsegment"),
        Seq(
          r => floor(r.getField("c_acctbal") / lit(1000.0)),
          r => r.getField("c_acctbal") >= lit(0.0),
          r => length(r.getField("c_name"))),
        iters = 5)
      import s.implicits._
      params.m.indices.map(f =>
          (f, params.m(f), params.u(f), params.lambda, params.nPairs))
        .toDF("field_idx", "m", "u", "lambda", "n_pairs")
        .orderBy("field_idx")
    },

    QueryDef.sql(
      "q_identity_resolve",
      s"""$oracleCtes
         |SELECT r.request_id, r.center_id,
         |  CASE WHEN coalesce(a.n_matches, 0) = 0 THEN 'create_new'
         |       WHEN a.n_matches = 1 THEN 'link_existing'
         |       ELSE 'conflict_resolved' END AS action,
         |  CASE WHEN coalesce(a.n_matches, 0) = 0
         |       THEN 'GSID-' || upper(substr(md5('NEW:' || m.mint_key), 1, 16))
         |       ELSE a.matched[1] END AS gsid,
         |  CASE WHEN coalesce(a.n_matches, 0) > 1 THEN 'multiple_gsid_conflict'
         |       WHEN a.n_matches = 1 THEN 'center_agnostic_match'
         |       ELSE 'no_match' END AS match_strategy,
         |  CAST(CASE WHEN coalesce(a.n_matches, 0) <= 1 AND coalesce(a.n_cc, 0) = 0 THEN 1.0
         |            WHEN coalesce(a.n_cc, 0) > 0 THEN 0.7 ELSE 0.5 END AS DOUBLE) AS confidence,
         |  CASE WHEN coalesce(a.n_matches, 0) > 1 THEN array_to_string(a.matched, ',')
         |       END AS matched_gsids,
         |  CASE WHEN coalesce(a.n_matches, 0) > 1 THEN 'used_oldest'
         |       WHEN a.n_matches = 1 AND coalesce(a.n_cc, 0) > 0 THEN 'center_mismatch'
         |       END AS conflict_resolution,
         |  (coalesce(a.n_matches, 0) > 1 OR coalesce(a.n_cc, 0) > 0) AS requires_review
         |FROM requests r
         |LEFT JOIN agg a USING (request_id)
         |JOIN mintkeys m USING (request_id)
         |ORDER BY r.request_id""".stripMargin) { (s, d) =>
      // every request carries one shared-able identifier (primary) plus a
      // unique secondary, so identifier chains are impossible and ONE
      // grouping hop is provably exact for this batch shape (the oracle
      // independently confirms); saves a checkpoint job
      IdentityResolver.resolve(candidates(s, d), registry(s, d), deterministicMint = true,
          groupingIterations = 1)
        // driver comparator can't sort ARRAY cells — ship a joined string
        .withColumn("matched_gsids",
          when(col("matched_gsids").isNotNull, concat_ws(",", col("matched_gsids"))))
        .orderBy("request_id")
    },

    // Withdrawn-aware resolution: same batch, registry where every 7th
    // 'S' subject is withdrawn — single matches against them resolve
    // under 'exact_withdrawn' and require review (identity_resolution
    // .py:52-81, 01-schema.sql:105).
    QueryDef.sql(
      "q_identity_withdrawn",
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
        |         DATE '2020-01-01' + CAST(s_suppkey AS INT) AS created_at,
        |         s_suppkey % 7 = 3 AS withdrawn
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16)),
        |         DATE '2019-01-01' + CAST(s_suppkey AS INT), FALSE
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |requests AS (
        |  SELECT c_custkey AS request_id,
        |         CASE WHEN c_custkey % 10 = 0 THEN 0 ELSE CAST(c_nationkey AS INT) END AS center_id
        |  FROM customer),
        |cands AS (
        |  SELECT r.request_id, r.center_id,
        |         CASE WHEN r.request_id % 8 = 5 THEN upper(s.s_name) ELSE s.s_name END AS local_subject_id
        |  FROM requests r JOIN supplier s
        |    ON s.s_suppkey = r.request_id % (SELECT COUNT(*) FROM supplier)
        |  WHERE r.request_id % 4 = 1
        |  UNION ALL
        |  SELECT request_id, center_id, 'A-' || CAST(request_id AS VARCHAR)
        |  FROM requests WHERE request_id % 4 <> 1
        |  UNION ALL
        |  SELECT request_id, center_id, 'C-' || CAST(request_id AS VARCHAR) FROM requests),
        |matches AS (
        |  SELECT c.request_id, c.center_id AS req_center, l.gsid,
        |         l.center_id AS id_center, s.created_at, s.withdrawn
        |  FROM cands c
        |  JOIN localids l ON lower(l.local_subject_id) = lower(c.local_subject_id)
        |  JOIN subjects s ON s.gsid = l.gsid),
        |agg AS (
        |  SELECT request_id,
        |         CAST(COUNT(DISTINCT gsid) AS INT) AS n_matches,
        |         list_transform(list_sort(list(DISTINCT [CAST(created_at AS VARCHAR), gsid])),
        |                        x -> x[2]) AS matched,
        |         SUM(CASE WHEN id_center <> req_center AND id_center <> 0 AND req_center <> 0
        |                  THEN 1 ELSE 0 END) AS n_cc,
        |         MAX(CASE WHEN withdrawn THEN 1 ELSE 0 END) AS any_w
        |  FROM matches GROUP BY request_id),
        |mintkeys AS (
        |  SELECT request_id, min(lower(local_subject_id)) AS mint_key
        |  FROM cands GROUP BY request_id)
        |SELECT r.request_id, r.center_id,
        |  CASE WHEN coalesce(a.n_matches, 0) = 0 THEN 'create_new'
        |       WHEN a.n_matches = 1 THEN 'link_existing'
        |       ELSE 'conflict_resolved' END AS action,
        |  CASE WHEN coalesce(a.n_matches, 0) = 0
        |       THEN 'GSID-' || upper(substr(md5('NEW:' || m.mint_key), 1, 16))
        |       ELSE a.matched[1] END AS gsid,
        |  CASE WHEN coalesce(a.n_matches, 0) > 1 THEN 'multiple_gsid_conflict'
        |       WHEN a.n_matches = 1 AND coalesce(a.any_w, 0) > 0 THEN 'exact_withdrawn'
        |       WHEN a.n_matches = 1 THEN 'center_agnostic_match'
        |       ELSE 'no_match' END AS match_strategy,
        |  (coalesce(a.n_matches, 0) > 1 OR coalesce(a.n_cc, 0) > 0
        |    OR coalesce(a.any_w, 0) > 0) AS requires_review
        |FROM requests r
        |LEFT JOIN agg a USING (request_id)
        |JOIN mintkeys m USING (request_id)
        |ORDER BY r.request_id""".stripMargin) { (s, d) =>
      IdentityResolver.resolve(candidates(s, d), flaggedRegistry(s, d),
          deterministicMint = true, groupingIterations = 1) // chainless batch
        .select("request_id", "center_id", "action", "gsid", "match_strategy",
          "requires_review")
        .orderBy("request_id")
    },

    // v_subjects_requiring_review (01-schema.sql:628-646): flagged or
    // withdrawn subjects with center name + identifier rollups.
    QueryDef.sql(
      "q_rep_requiring_review",
      """WITH localids AS (
        |  SELECT s_name AS local_subject_id, 'primary' AS identifier_type,
        |         'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid
        |  FROM supplier
        |  UNION ALL
        |  SELECT s_name, 'primary',
        |         'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16))
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |subjects AS (
        |  SELECT 'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid,
        |         CAST(s_nationkey AS INT) AS center_id,
        |         DATE '2020-01-01' + CAST(s_suppkey AS INT) AS created_at,
        |         s_suppkey % 7 = 3 AS withdrawn,
        |         s_suppkey % 11 = 5 AS flagged_for_review,
        |         CASE WHEN s_suppkey % 11 = 5 THEN 'flagged during load' END AS review_notes
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16)),
        |         CAST((s_nationkey + 1) % 25 AS INT),
        |         DATE '2019-01-01' + CAST(s_suppkey AS INT), FALSE, FALSE, NULL
        |  FROM supplier WHERE s_suppkey % 10 = 0)
        |SELECT s.gsid AS global_subject_id, s.center_id, n.n_name AS center_name,
        |  s.flagged_for_review, s.review_notes, s.withdrawn,
        |  strftime(s.created_at, '%Y-%m-%d') AS created_at,
        |  COUNT(DISTINCT l.identifier_type) AS num_identifier_types,
        |  COUNT(DISTINCT l.local_subject_id) AS num_local_ids
        |FROM subjects s
        |LEFT JOIN nation n ON n.n_nationkey = s.center_id
        |LEFT JOIN localids l ON l.gsid = s.gsid
        |WHERE s.flagged_for_review OR s.withdrawn
        |GROUP BY 1, 2, 3, 4, 5, 6, 7
        |ORDER BY global_subject_id""".stripMargin) { (s, d) =>
      val reg = flaggedRegistry(s, d)
      val centers = Tables.nation(s, d)
        .select(col("n_nationkey").cast("int").as("center_id"), col("n_name").as("name"))
      IdentityResolver.requiringReview(reg.subjects, reg.localIds, centers)
        .withColumn("created_at", date_format(col("created_at"), "yyyy-MM-dd"))
        .select("global_subject_id", "center_id", "center_name", "flagged_for_review",
          "review_notes", "withdrawn", "created_at", "num_identifier_types",
          "num_local_ids")
        .orderBy("global_subject_id")
    },

    // FIXPOINT intra-batch grouping under the hash gate: requests form
    // 5-request identifier chains (request r carries CH-r plus CH-(r+4)
    // linking to the next request), none match the registry, and
    // grouping must converge over arbitrarily long chains — the oracle
    // recomputes the connected components with a recursive min-label
    // CTE and mints from each component's lexicographic-min identifier.
    QueryDef.sql(
      "q_identity_fixpoint",
      """WITH RECURSIVE reqs AS (
        |  SELECT c_custkey AS r FROM customer WHERE c_custkey % 4 = 2),
        |cand AS (
        |  SELECT r, 'ch-' || CAST(r AS VARCHAR) AS nid FROM reqs
        |  UNION ALL
        |  SELECT r, 'ch-' || CAST(r + 4 AS VARCHAR) FROM reqs
        |  WHERE ((r - 2) // 4) % 5 <> 4),
        |edges AS (SELECT a.r AS ra, b.r AS rb FROM cand a JOIN cand b USING (nid)),
        |cc(r, l) AS (
        |  SELECT r, r FROM reqs
        |  UNION
        |  SELECT e.ra, cc.l FROM edges e JOIN cc ON cc.r = e.rb),
        |comp AS (SELECT r, min(l) AS leader FROM cc GROUP BY r),
        |mint AS (SELECT c.leader, min(cd.nid) AS mk
        |         FROM comp c JOIN cand cd ON cd.r = c.r GROUP BY c.leader)
        |SELECT c.r AS request_id, 'create_new' AS action,
        |  'GSID-' || upper(substr(md5('NEW:' || m.mk), 1, 16)) AS gsid
        |FROM comp c JOIN mint m ON m.leader = c.leader
        |ORDER BY request_id""".stripMargin) { (s, d) =>
      val reqs = Tables.customer(s, d).filter(col("c_custkey") % 4 === 2)
        .select(col("c_custkey").as("request_id"),
          col("c_nationkey").cast("int").as("center_id"))
      val own = reqs.select(col("request_id"), col("center_id"),
        concat(lit("CH-"), col("request_id").cast("string")).as("local_subject_id"),
        lit("primary").as("identifier_type"))
      val link = reqs
        .filter(expr("((request_id - 2) div 4) % 5") =!= 4)
        .select(col("request_id"), col("center_id"),
          concat(lit("CH-"), (col("request_id") + 4).cast("string")).as("local_subject_id"),
          lit("secondary").as("identifier_type"))
      IdentityResolver.resolve(own.unionByName(link), registry(s, d),
          deterministicMint = true, groupingIterations = 0) // FIXPOINT
        .select("request_id", "action", "gsid")
        .orderBy("request_id")
    },

    // A1-shape resolution summary over the same batch.
    QueryDef.sql(
      "q_identity_summary",
      s"""$oracleCtes,
         |res AS (
         |  SELECT r.request_id,
         |    CASE WHEN coalesce(a.n_matches, 0) = 0 THEN 'create_new'
         |         WHEN a.n_matches = 1 THEN 'link_existing'
         |         ELSE 'conflict_resolved' END AS action,
         |    CASE WHEN coalesce(a.n_matches, 0) = 0
         |         THEN 'GSID-' || upper(substr(md5('NEW:' || m.mint_key), 1, 16))
         |         ELSE a.matched[1] END AS gsid,
         |    (coalesce(a.n_matches, 0) > 1 OR coalesce(a.n_cc, 0) > 0) AS requires_review
         |  FROM requests r LEFT JOIN agg a USING (request_id) JOIN mintkeys m USING (request_id))
         |SELECT action, COUNT(*) AS n, CAST(COUNT(DISTINCT gsid) AS BIGINT) AS n_distinct_gsids,
         |       CAST(SUM(CASE WHEN requires_review THEN 1 ELSE 0 END) AS BIGINT) AS n_review
         |FROM res GROUP BY action ORDER BY action""".stripMargin) { (s, d) =>
      IdentityResolver.resolve(candidates(s, d), registry(s, d), deterministicMint = true,
          groupingIterations = 1) // chainless batch
        .groupBy("action")
        .agg(count(lit(1)).as("n"),
          countDistinct("gsid").as("n_distinct_gsids"),
          sum(when(col("requires_review"), 1L).otherwise(0L)).as("n_review"))
        .orderBy("action")
    },

    // F17 CHAINED note append under the gate: withdraw() appends a
    // dated reason BELOW whatever review_notes a subject already
    // carries (routes.py:159-182's COALESCE(review_notes || E'\n', '')
    // || msg). Every 5th 'S' subject withdraws (every 10th with a
    // reason); suppkeys with s_suppkey % 55 = 5 already carry
    // 'flagged during load', so the oracle must reproduce the
    // two-line newline concat byte-for-byte — and suppkeys ≡ 3 (mod 7)
    // that withdraw twice must stay withdrawn.
    QueryDef.sql(
      "q_identity_notes_append",
      """WITH subjects AS (
        |  SELECT 'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid,
        |         s_suppkey % 7 = 3 AS withdrawn,
        |         s_suppkey % 11 = 5 AS flagged_for_review,
        |         CASE WHEN s_suppkey % 11 = 5 THEN 'flagged during load' END AS review_notes
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16)),
        |         FALSE, FALSE, NULL
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |w AS (
        |  SELECT 'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS gsid,
        |         'Withdrawn on 2024-08-01' ||
        |           CASE WHEN s_suppkey % 10 = 0
        |                THEN '. Reason: consent revoked #' || CAST(s_suppkey AS VARCHAR)
        |                ELSE '' END AS note
        |  FROM supplier WHERE s_suppkey % 5 = 0)
        |SELECT s.gsid AS global_subject_id,
        |  s.withdrawn OR w.note IS NOT NULL AS withdrawn,
        |  s.flagged_for_review,
        |  CASE WHEN w.note IS NULL THEN s.review_notes
        |       WHEN s.review_notes IS NULL THEN w.note
        |       ELSE s.review_notes || chr(10) || w.note END AS review_notes
        |FROM subjects s LEFT JOIN w ON w.gsid = s.gsid
        |ORDER BY global_subject_id""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val gS = Gsid.deterministic(concat(lit("S"), col("s_suppkey").cast("string")))
      val withdrawals = sup.filter(col("s_suppkey") % 5 === 0)
        .select(gS.as("global_subject_id"),
          when(col("s_suppkey") % 10 === 0,
            concat(lit("consent revoked #"), col("s_suppkey").cast("string")))
            .cast("string").as("reason"))
      IdentityResolver.withdraw(flaggedRegistry(s, d).subjects, withdrawals,
          java.sql.Date.valueOf("2024-08-01"))
        .select("global_subject_id", "withdrawn", "flagged_for_review", "review_notes")
        .orderBy("global_subject_id")
    })
}
