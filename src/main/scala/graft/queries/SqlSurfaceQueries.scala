package graft.queries

import graft.GraftSql

/** The pure-SQL proof surface (SURVEY.md §2.12 / round-10 widening):
  * every gate here drives the engine ENTIRELY through `spark.sql`
  * TEXT — tables registered as temp views by [[GraftSql.registerTables]],
  * the custom Catalyst expressions registered by
  * [[GraftSql.registerFunctions]] — the path a SQL-first user of the
  * engine takes. Each query is a representative §2 operator family
  * re-stated in SQL (identity resolution, dup finder, change
  * detection, BM25, exact dedup, window dedup, conflicts, the custom
  * sketch aggregates, semi/anti), hash-gated against an independent
  * DuckDB oracle exactly like the DataFrame-driven gates: the SQL
  * dialect surface is proven, not just one grouped aggregate
  * (`q_sql_surface`).
  *
  * Determinism rules are the standard ones (QueryDef scaladoc); the
  * Spark text and the oracle mirror arithmetic but are written in
  * each engine's own dialect (sort_array/collect_set vs
  * list_sort/list, element_at vs 1-based [], date_format vs
  * strftime).
  */
object SqlSurfaceQueries {

  private def sqlQuery(s: org.apache.spark.sql.SparkSession, d: String,
      text: String): org.apache.spark.sql.DataFrame = {
    GraftSql.registerTables(s, d)
    GraftSql.registerFunctions(s)
    s.sql(text)
  }

  /** The synthetic supplier registry (IdentityQueries.registry) in
    * Spark SQL dialect — the same rows the DataFrame path builds. */
  private val sparkRegistryCtes =
    """WITH localids AS (
      |  SELECT s_name AS local_subject_id, 'primary' AS identifier_type,
      |         CAST(s_nationkey AS INT) AS center_id,
      |         'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS STRING)), 1, 16)) AS gsid
      |  FROM supplier
      |  UNION ALL
      |  SELECT s_name, 'primary', CAST((s_nationkey + 1) % 25 AS INT),
      |         'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS STRING)), 1, 16))
      |  FROM supplier WHERE s_suppkey % 10 = 0),
      |subjects AS (
      |  SELECT 'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS STRING)), 1, 16)) AS gsid,
      |         date_add(DATE '2020-01-01', CAST(s_suppkey AS INT)) AS created_at
      |  FROM supplier
      |  UNION ALL
      |  SELECT 'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS STRING)), 1, 16)),
      |         date_add(DATE '2019-01-01', CAST(s_suppkey AS INT))
      |  FROM supplier WHERE s_suppkey % 10 = 0)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // §2.9 identity resolution as ONE spark.sql statement: the
    // registry, the candidate batch (matched subset presenting
    // supplier names case-folded), the center-agnostic match
    // aggregation, oldest-wins pick, deterministic mint for the
    // unmatched — the whole action/strategy/confidence ladder in SQL
    // text. Same semantics q_identity_resolve pins for the DataFrame
    // path.
    QueryDef.sql(
      "q_sql_identity_resolve",
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
        |cands AS (
        |  SELECT c.c_custkey AS request_id,
        |         CASE WHEN c.c_custkey % 10 = 0 THEN 0 ELSE CAST(c.c_nationkey AS INT) END AS center_id,
        |         CASE WHEN c.c_custkey % 8 = 5 THEN upper(s.s_name) ELSE s.s_name END AS local_subject_id
        |  FROM customer c JOIN supplier s
        |    ON s.s_suppkey = c.c_custkey % (SELECT COUNT(*) FROM supplier)
        |  WHERE c.c_custkey % 4 = 1),
        |m AS (
        |  SELECT c.request_id, c.center_id AS req_center, l.gsid,
        |         l.center_id AS id_center, s.created_at
        |  FROM cands c
        |  JOIN localids l ON lower(l.local_subject_id) = lower(c.local_subject_id)
        |  JOIN subjects s ON s.gsid = l.gsid),
        |a AS (
        |  SELECT request_id,
        |    CAST(COUNT(DISTINCT gsid) AS INT) AS n_matches,
        |    list_transform(list_sort(list(DISTINCT [CAST(created_at AS VARCHAR), gsid])),
        |                   x -> x[2]) AS matched,
        |    SUM(CASE WHEN id_center <> req_center AND id_center <> 0 AND req_center <> 0
        |             THEN 1 ELSE 0 END) AS n_cc
        |  FROM m GROUP BY request_id),
        |mk AS (SELECT request_id, min(lower(local_subject_id)) AS mint_key
        |       FROM cands GROUP BY request_id)
        |SELECT c.request_id, c.center_id,
        |  CASE WHEN coalesce(a.n_matches, 0) = 0 THEN 'create_new'
        |       WHEN a.n_matches = 1 THEN 'link_existing'
        |       ELSE 'conflict_resolved' END AS action,
        |  CASE WHEN coalesce(a.n_matches, 0) = 0
        |       THEN 'GSID-' || upper(substr(md5('NEW:' || mk.mint_key), 1, 16))
        |       ELSE a.matched[1] END AS gsid,
        |  CASE WHEN coalesce(a.n_matches, 0) > 1 THEN 'multiple_gsid_conflict'
        |       WHEN a.n_matches = 1 THEN 'center_agnostic_match'
        |       ELSE 'no_match' END AS match_strategy,
        |  CAST(CASE WHEN coalesce(a.n_matches, 0) <= 1 AND coalesce(a.n_cc, 0) = 0 THEN 1.0
        |            WHEN coalesce(a.n_cc, 0) > 0 THEN 0.7 ELSE 0.5 END AS DOUBLE) AS confidence,
        |  (coalesce(a.n_matches, 0) > 1 OR coalesce(a.n_cc, 0) > 0) AS requires_review
        |FROM (SELECT DISTINCT request_id, center_id FROM cands) c
        |LEFT JOIN a USING (request_id)
        |JOIN mk USING (request_id)
        |ORDER BY c.request_id""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        sparkRegistryCtes +
        """,
          |cands AS (
          |  SELECT c.c_custkey AS request_id,
          |         CASE WHEN c.c_custkey % 10 = 0 THEN 0 ELSE CAST(c.c_nationkey AS INT) END AS center_id,
          |         CASE WHEN c.c_custkey % 8 = 5 THEN upper(s.s_name) ELSE s.s_name END AS local_subject_id
          |  FROM customer c JOIN supplier s
          |    ON s.s_suppkey = c.c_custkey % (SELECT COUNT(*) FROM supplier)
          |  WHERE c.c_custkey % 4 = 1),
          |m AS (
          |  SELECT c.request_id, c.center_id AS req_center, l.gsid,
          |         l.center_id AS id_center, s.created_at
          |  FROM cands c
          |  JOIN localids l ON lower(l.local_subject_id) = lower(c.local_subject_id)
          |  JOIN subjects s ON s.gsid = l.gsid),
          |a AS (
          |  SELECT request_id,
          |    CAST(COUNT(DISTINCT gsid) AS INT) AS n_matches,
          |    transform(sort_array(collect_set(array(CAST(created_at AS STRING), gsid))),
          |              x -> element_at(x, 2)) AS matched,
          |    SUM(CASE WHEN id_center <> req_center AND id_center <> 0 AND req_center <> 0
          |             THEN 1 ELSE 0 END) AS n_cc
          |  FROM m GROUP BY request_id),
          |mk AS (SELECT request_id, min(lower(local_subject_id)) AS mint_key
          |       FROM cands GROUP BY request_id)
          |SELECT c.request_id, c.center_id,
          |  CASE WHEN coalesce(a.n_matches, 0) = 0 THEN 'create_new'
          |       WHEN a.n_matches = 1 THEN 'link_existing'
          |       ELSE 'conflict_resolved' END AS action,
          |  CASE WHEN coalesce(a.n_matches, 0) = 0
          |       THEN 'GSID-' || upper(substr(md5('NEW:' || mk.mint_key), 1, 16))
          |       ELSE element_at(a.matched, 1) END AS gsid,
          |  CASE WHEN coalesce(a.n_matches, 0) > 1 THEN 'multiple_gsid_conflict'
          |       WHEN a.n_matches = 1 THEN 'center_agnostic_match'
          |       ELSE 'no_match' END AS match_strategy,
          |  CAST(CASE WHEN coalesce(a.n_matches, 0) <= 1 AND coalesce(a.n_cc, 0) = 0 THEN 1.0
          |            WHEN coalesce(a.n_cc, 0) > 0 THEN 0.7 ELSE 0.5 END AS DOUBLE) AS confidence,
          |  (coalesce(a.n_matches, 0) > 1 OR coalesce(a.n_cc, 0) > 0) AS requires_review
          |FROM (SELECT DISTINCT request_id, center_id FROM cands) c
          |LEFT JOIN a USING (request_id)
          |JOIN mk USING (request_id)
          |ORDER BY c.request_id""".stripMargin)
    },

    // A6 dup finder in SQL text (v_duplicate_subjects,
    // 01-schema.sql:537-561): identifiers linked to >1 GSID with the
    // sorted gsid/center rollups.
    QueryDef.sql(
      "q_sql_dup_finder",
      """WITH localids AS (
        |  SELECT s_name AS local_subject_id, 'primary' AS identifier_type,
        |         CAST(s_nationkey AS INT) AS center_id,
        |         'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS global_subject_id
        |  FROM supplier
        |  UNION ALL
        |  SELECT s_name, 'primary', CAST((s_nationkey + 1) % 25 AS INT),
        |         'GSID-' || upper(substr(md5('X' || CAST(s_suppkey AS VARCHAR)), 1, 16))
        |  FROM supplier WHERE s_suppkey % 10 = 0)
        |SELECT local_subject_id, identifier_type,
        |  CAST(COUNT(DISTINCT global_subject_id) AS INT) AS n_gsids,
        |  array_to_string(list_sort(list(DISTINCT global_subject_id)), ',') AS gsids,
        |  array_to_string(list_sort(list(DISTINCT center_id)), ',') AS centers
        |FROM localids
        |GROUP BY local_subject_id, identifier_type
        |HAVING COUNT(DISTINCT global_subject_id) > 1
        |ORDER BY local_subject_id""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        sparkRegistryCtes +
        """
          |SELECT local_subject_id, identifier_type,
          |  CAST(COUNT(DISTINCT gsid) AS INT) AS n_gsids,
          |  array_join(sort_array(collect_set(gsid)), ',') AS gsids,
          |  array_join(transform(sort_array(collect_set(center_id)),
          |                       x -> CAST(x AS STRING)), ',') AS centers
          |FROM localids
          |GROUP BY local_subject_id, identifier_type
          |HAVING COUNT(DISTINCT gsid) > 1
          |ORDER BY local_subject_id""".stripMargin)
    },

    // J4 change detection in SQL text: full-outer diff of a current
    // vs incoming order snapshot — new/orphaned/updated/unchanged plus
    // the name-sorted changed-fields list, null-safe comparisons.
    QueryDef.sql(
      "q_sql_change_detection",
      """WITH cur AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |inc AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |j AS (
        |  SELECT coalesce(i.o_orderkey, c.o_orderkey) AS o_orderkey,
        |    i.o_orderkey IS NOT NULL AS in_p, c.o_orderkey IS NOT NULL AS ex_p,
        |    i.o_totalprice IS DISTINCT FROM c.o_totalprice AS d_tp,
        |    i.o_orderstatus IS DISTINCT FROM c.o_orderstatus AS d_os,
        |    i.o_orderpriority IS DISTINCT FROM c.o_orderpriority AS d_op
        |  FROM inc i FULL JOIN cur c ON i.o_orderkey = c.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN NOT ex_p THEN 'new' WHEN NOT in_p THEN 'orphaned'
        |       WHEN d_tp OR d_os OR d_op THEN 'updated' ELSE 'unchanged' END AS change_status,
        |  CASE WHEN ex_p AND in_p AND (d_tp OR d_os OR d_op)
        |       THEN trim(concat(
        |         CASE WHEN d_op THEN 'o_orderpriority,' ELSE '' END,
        |         CASE WHEN d_os THEN 'o_orderstatus,' ELSE '' END,
        |         CASE WHEN d_tp THEN 'o_totalprice,' ELSE '' END), ',')
        |       ELSE '' END AS changed_fields
        |FROM j
        |WHERE NOT ex_p OR NOT in_p OR d_tp OR d_os OR d_op
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """WITH cur AS (
          |  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
          |  FROM orders WHERE o_orderkey % 7 <> 0),
          |inc AS (
          |  SELECT o_orderkey,
          |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
          |    o_orderstatus,
          |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority
          |  FROM orders WHERE o_orderkey % 3 <> 0),
          |j AS (
          |  SELECT coalesce(i.o_orderkey, c.o_orderkey) AS o_orderkey,
          |    i.o_orderkey IS NOT NULL AS in_p, c.o_orderkey IS NOT NULL AS ex_p,
          |    i.o_totalprice IS DISTINCT FROM c.o_totalprice AS d_tp,
          |    i.o_orderstatus IS DISTINCT FROM c.o_orderstatus AS d_os,
          |    i.o_orderpriority IS DISTINCT FROM c.o_orderpriority AS d_op
          |  FROM inc i FULL JOIN cur c ON i.o_orderkey = c.o_orderkey)
          |SELECT o_orderkey,
          |  CASE WHEN NOT ex_p THEN 'new' WHEN NOT in_p THEN 'orphaned'
          |       WHEN d_tp OR d_os OR d_op THEN 'updated' ELSE 'unchanged' END AS change_status,
          |  CASE WHEN ex_p AND in_p AND (d_tp OR d_os OR d_op)
          |       THEN trim(BOTH ',' FROM concat(
          |         CASE WHEN d_op THEN 'o_orderpriority,' ELSE '' END,
          |         CASE WHEN d_os THEN 'o_orderstatus,' ELSE '' END,
          |         CASE WHEN d_tp THEN 'o_totalprice,' ELSE '' END))
          |       ELSE '' END AS changed_fields
          |FROM j
          |WHERE NOT ex_p OR NOT in_p OR d_tp OR d_os OR d_op
          |ORDER BY o_orderkey""".stripMargin)
    },

    // Okapi-BM25 in SQL text over the documents table — the same
    // linear-idf fixed-fold scoring q_text_bm25 pins for the
    // DataFrame operator, top-25 for the 3-term query.
    QueryDef.sql(
      "q_sql_bm25",
      """WITH dl AS (SELECT doc_id,
        |        CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS dl
        |      FROM documents),
        |toks AS (SELECT doc_id,
        |        unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS term
        |      FROM documents),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |            CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS BIGINT) AS tot
        |          FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |       WHERE term IN ('merge', 'spark', 'vector') GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    ((CAST(s.n_docs - dfreq.df AS DOUBLE) + 0.5) / (CAST(dfreq.df AS DOUBLE) + 0.5)) *
        |    ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)) /
        |     (CAST(tf.tf AS DOUBLE) +
        |      1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) /
        |                            (CAST(s.tot AS DOUBLE) / s.n_docs))))) AS s_t
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s),
        |agg AS (
        |  SELECT doc_id,
        |    ((0.0 + coalesce(max(CASE WHEN term = 'merge' THEN s_t END), 0.0))
        |         + coalesce(max(CASE WHEN term = 'spark' THEN s_t END), 0.0))
        |         + coalesce(max(CASE WHEN term = 'vector' THEN s_t END), 0.0) AS score,
        |    CAST(COUNT(*) AS INT) AS n_terms
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, score, n_terms FROM agg
        |ORDER BY score DESC, doc_id LIMIT 25""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """WITH dl AS (SELECT doc_id,
          |        CAST(size(filter(split(trim(text), '\\s+'), x -> x != '')) AS BIGINT) AS dl
          |      FROM documents),
          |toks AS (SELECT doc_id, term
          |      FROM documents
          |      LATERAL VIEW explode(filter(split(trim(text), '\\s+'), x -> x != '')) t AS term),
          |stats AS (SELECT COUNT(*) AS n_docs,
          |            CAST(SUM(size(filter(split(trim(text), '\\s+'), x -> x != ''))) AS BIGINT) AS tot
          |          FROM documents),
          |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
          |       WHERE term IN ('merge', 'spark', 'vector') GROUP BY 1, 2),
          |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
          |scored AS (
          |  SELECT tf.doc_id, tf.term,
          |    ((CAST(s.n_docs - dfreq.df AS DOUBLE) + 0.5) / (CAST(dfreq.df AS DOUBLE) + 0.5)) *
          |    ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)) /
          |     (CAST(tf.tf AS DOUBLE) +
          |      1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) /
          |                            (CAST(s.tot AS DOUBLE) / s.n_docs))))) AS s_t
          |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s),
          |agg AS (
          |  SELECT doc_id,
          |    ((0.0 + coalesce(max(CASE WHEN term = 'merge' THEN s_t END), 0.0))
          |         + coalesce(max(CASE WHEN term = 'spark' THEN s_t END), 0.0))
          |         + coalesce(max(CASE WHEN term = 'vector' THEN s_t END), 0.0) AS score,
          |    CAST(COUNT(*) AS INT) AS n_terms
          |  FROM scored GROUP BY doc_id)
          |SELECT doc_id, score, n_terms FROM agg
          |ORDER BY score DESC, doc_id LIMIT 25""".stripMargin)
    },

    // Exact content dedup in SQL text: normalized-text fingerprint
    // groups, first-wins keeper, duplicate count. The corpus is
    // salted with whitespace-perturbed re-emits of every 5th doc
    // (id+10⁹), which NORMALIZATION must collapse onto their
    // originals — so the gate is non-empty at every SF and actually
    // exercises the trim/lower/whitespace-fold pipeline, not just
    // grouping.
    QueryDef.sql(
      "q_sql_dedup_exact",
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, '  ' || text || '  '
        |  FROM documents WHERE doc_id % 5 = 0),
        |f AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM docs)
        |SELECT fingerprint, CAST(min(doc_id) AS BIGINT) AS keeper,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM f GROUP BY fingerprint
        |HAVING COUNT(*) > 1
        |ORDER BY fingerprint""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """WITH docs AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 1000000000, '  ' || text || '  '
          |  FROM documents WHERE doc_id % 5 = 0),
          |f AS (
          |  SELECT doc_id,
          |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ')) AS fingerprint
          |  FROM docs)
          |SELECT fingerprint, CAST(min(doc_id) AS BIGINT) AS keeper,
          |  CAST(COUNT(*) AS BIGINT) AS n_docs
          |FROM f GROUP BY fingerprint
          |HAVING COUNT(*) > 1
          |ORDER BY fingerprint""".stripMargin)
    },

    // W2 window dedup in SQL text: oldest order per customer by
    // (date, key) row_number.
    QueryDef.sql(
      "q_sql_window_dedup",
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS first_day
        |FROM r WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """WITH r AS (
          |  SELECT o_custkey, o_orderkey, o_orderdate,
          |    row_number() OVER (PARTITION BY o_custkey
          |                       ORDER BY o_orderdate, o_orderkey) AS rn
          |  FROM orders)
          |SELECT o_custkey, o_orderkey,
          |  date_format(o_orderdate, 'yyyy-MM-dd') AS first_day
          |FROM r WHERE rn = 1
          |ORDER BY o_custkey""".stripMargin)
    },

    // J5 conflict detection in SQL text: two sources disagreeing on a
    // field for the same natural key → one conflict row per key with
    // both values.
    QueryDef.sql(
      "q_sql_conflicts",
      """WITH s1 AS (SELECT o_orderkey, o_orderstatus FROM orders),
        |s2 AS (SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 13 = 0 THEN 'Z' ELSE o_orderstatus END AS o_orderstatus
        |       FROM orders)
        |SELECT s1.o_orderkey, 'o_orderstatus' AS field,
        |  s1.o_orderstatus AS v1, s2.o_orderstatus AS v2
        |FROM s1 JOIN s2 USING (o_orderkey)
        |WHERE s1.o_orderstatus IS DISTINCT FROM s2.o_orderstatus
        |ORDER BY s1.o_orderkey""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """WITH s1 AS (SELECT o_orderkey, o_orderstatus FROM orders),
          |s2 AS (SELECT o_orderkey,
          |         CASE WHEN o_orderkey % 13 = 0 THEN 'Z' ELSE o_orderstatus END AS o_orderstatus
          |       FROM orders)
          |SELECT s1.o_orderkey, 'o_orderstatus' AS field,
          |  s1.o_orderstatus AS v1, s2.o_orderstatus AS v2
          |FROM s1 JOIN s2 USING (o_orderkey)
          |WHERE s1.o_orderstatus IS DISTINCT FROM s2.o_orderstatus
          |ORDER BY s1.o_orderkey""".stripMargin)
    },

    // The custom histogram sketch aggregate through its SQL
    // registration: hist_fixed(...) + LATERAL VIEW posexplode — same
    // oracle bucket map as q_agg_hist_sketch.
    QueryDef.sql(
      "q_sql_hist_sketch",
      """WITH b AS (SELECT event_type,
        |    CASE WHEN value < 0.0 THEN 0
        |         WHEN value >= 400.0 THEN 41
        |         ELSE LEAST(CAST(FLOOR((value - 0.0) / 10.0) AS INT) + 1, 40) END AS slot
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, slot, COUNT(*) AS cnt
        |FROM b GROUP BY event_type, slot
        |ORDER BY event_type, slot""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """SELECT event_type, slot, cnt
          |FROM (SELECT event_type, hist_fixed(value, 0.0, 10.0, 40) AS h
          |      FROM events WHERE value IS NOT NULL GROUP BY event_type) g
          |LATERAL VIEW posexplode(h) t AS slot, cnt
          |WHERE cnt > 0
          |ORDER BY event_type, slot""".stripMargin)
    },

    // The KLL quantile sketch through its SQL registration (variadic
    // kll_quantiles_exact) with the exact-regime precondition
    // ENFORCED — a group exceeding k fails the job loudly instead of
    // silently flaking the rank-pick oracle at a larger scale factor.
    // Same oracle as q_agg_kll_quantile.
    QueryDef.sql(
      "q_sql_kll",
      """WITH f AS (SELECT o_orderpriority, o_totalprice
        |           FROM orders WHERE o_orderkey % 7 = 0),
        |n AS (SELECT o_orderpriority, COUNT(*) AS n FROM f GROUP BY 1),
        |r AS (SELECT o_orderpriority, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY o_totalprice) AS rn
        |      FROM f),
        |p AS (SELECT * FROM (VALUES (0, 0.25), (1, 0.5), (2, 0.75)) AS t(qi, p))
        |SELECT n.o_orderpriority AS o_orderpriority, p.qi, r.o_totalprice AS qv
        |FROM n CROSS JOIN p
        |JOIN r ON r.o_orderpriority = n.o_orderpriority
        |  AND r.rn = GREATEST(1, CAST(CEIL(CAST(p.p AS DOUBLE) * n.n) AS BIGINT))
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """SELECT o_orderpriority, qi, qv
          |FROM (SELECT o_orderpriority,
          |        kll_quantiles_exact(o_totalprice, 65536, 0.25, 0.5, 0.75) AS q
          |      FROM orders WHERE o_orderkey % 7 = 0
          |      GROUP BY o_orderpriority) g
          |LATERAL VIEW posexplode(q) t AS qi, qv
          |ORDER BY o_orderpriority, qi""".stripMargin)
    },

    // As-of join in SQL text: latest purchase at-or-before each click
    // per user — the row_number re-derivation IS how a SQL-first user
    // expresses as-of on Spark (no native ASOF keyword); the oracle
    // runs the IDENTICAL text, so the formulation itself is what's
    // pinned. Same scenario as the operator gate q_asof_purchase.
    QueryDef.sql(
      "q_sql_asof",
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts,
        |    p.purchase_id, p.ts AS purchase_ts,
        |    row_number() OVER (PARTITION BY c.event_id
        |                       ORDER BY p.ts DESC) AS rn
        |  FROM clicks c LEFT JOIN p
        |    ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT event_id, user_id, ts, purchase_id, purchase_ts
        |FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """WITH clicks AS (
          |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
          |p AS (
          |  SELECT user_id, ts, max(event_id) AS purchase_id
          |  FROM events WHERE event_type = 'purchase'
          |  GROUP BY user_id, ts),
          |j AS (
          |  SELECT c.event_id, c.user_id, c.ts,
          |    p.purchase_id, p.ts AS purchase_ts,
          |    row_number() OVER (PARTITION BY c.event_id
          |                       ORDER BY p.ts DESC) AS rn
          |  FROM clicks c LEFT JOIN p
          |    ON p.user_id = c.user_id AND p.ts <= c.ts)
          |SELECT event_id, user_id, ts, purchase_id, purchase_ts
          |FROM j WHERE rn = 1
          |ORDER BY event_id""".stripMargin)
    },

    // A10-family rollup in SQL text: subtotal lattice over
    // (priority, status) with exact DECIMAL-routed sums.
    QueryDef.sql(
      "q_sql_rollup",
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
          |  coalesce(o_orderstatus, 'ALL') AS status,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders
          |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
          |ORDER BY priority, status""".stripMargin)
    },

    // S8/J6 semi + anti in one SQL statement: per-segment counts of
    // customers with and without orders.
    QueryDef.sql(
      "q_sql_semi_anti",
      """WITH k AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT c.c_mktsegment,
        |  CAST(SUM(CASE WHEN k.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
        |  CAST(SUM(CASE WHEN k.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without
        |FROM customer c LEFT JOIN k ON k.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin) { (s, d) =>
      sqlQuery(s, d,
        """WITH k AS (SELECT DISTINCT o_custkey FROM orders)
          |SELECT c.c_mktsegment,
          |  CAST(SUM(CASE WHEN k.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
          |  CAST(SUM(CASE WHEN k.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without
          |FROM customer c LEFT JOIN k ON k.o_custkey = c.c_custkey
          |GROUP BY c.c_mktsegment
          |ORDER BY c.c_mktsegment""".stripMargin)
    })
}
