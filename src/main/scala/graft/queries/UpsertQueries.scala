package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{LoadBookkeeping, UpsertWriter}
import graft.types.TableConfig

/** Upsert/MERGE queries (SURVEY.md §2.8 U1/U2/U6/U7): current state is
  * one subset of `orders`, the incoming batch another subset with
  * perturbed values; the oracle re-derives the post-merge snapshot,
  * audit rows and dry-run counts with a FULL JOIN. `o_orderdate` is
  * immutable (U2): updates must keep the current value, inserts take
  * the incoming one (shifted a day to make violations visible). */
object UpsertQueries {

  private val cfg = TableConfig("orders", Seq("o_orderkey"), Seq("o_orderdate"))

  private def mergeInputs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority", "o_orderdate")
    val incoming = base.filter(col("o_orderkey") % 3 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 11 === 0, concat(lit("X-"), col("o_orderpriority")))
          .otherwise(col("o_orderpriority")))
      .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY"))
    val current = base.filter(col("o_orderkey") % 7 =!= 0)
    (current, incoming)
  }

  private val oracleCtes =
    """WITH incoming AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority,
      |    o_orderdate + INTERVAL 1 DAY AS o_orderdate
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |cur AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority, o_orderdate
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |j AS (
      |  SELECT coalesce(i.o_orderkey, c.o_orderkey) AS o_orderkey,
      |    i.o_orderkey IS NOT NULL AS in_p, c.o_orderkey IS NOT NULL AS ex_p,
      |    i.o_totalprice AS i_tp, c.o_totalprice AS c_tp,
      |    i.o_orderstatus AS i_os, c.o_orderstatus AS c_os,
      |    i.o_orderpriority AS i_op, c.o_orderpriority AS c_op,
      |    i.o_orderdate AS i_od, c.o_orderdate AS c_od
      |  FROM incoming i FULL JOIN cur c ON i.o_orderkey = c.o_orderkey),
      |cls AS (
      |  SELECT *,
      |    CASE WHEN NOT ex_p THEN 'insert' WHEN NOT in_p THEN 'orphaned'
      |         WHEN (i_tp IS DISTINCT FROM c_tp) OR (i_os IS DISTINCT FROM c_os)
      |              OR (i_op IS DISTINCT FROM c_op) THEN 'update'
      |         ELSE 'unchanged' END AS status
      |  FROM j)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q_upsert_merged",
      s"""$oracleCtes
         |SELECT o_orderkey,
         |  CASE WHEN status IN ('insert','update') THEN i_tp ELSE c_tp END AS o_totalprice,
         |  CASE WHEN status IN ('insert','update') THEN i_os ELSE c_os END AS o_orderstatus,
         |  CASE WHEN status IN ('insert','update') THEN i_op ELSE c_op END AS o_orderpriority,
         |  CASE WHEN status = 'insert' THEN i_od ELSE c_od END AS o_orderdate
         |FROM cls
         |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val (current, incoming) = mergeInputs(s, d)
      UpsertWriter.merge(current, incoming, cfg).merged.orderBy("o_orderkey")
    },

    QueryDef.sql(
      "q_upsert_audit",
      s"""$oracleCtes
         |SELECT * FROM (
         |  SELECT 'orders' AS table_name,
         |    '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR) || '}' AS record_key,
         |    'o_totalprice' AS field,
         |    CAST(c_tp AS VARCHAR) AS old_value, CAST(i_tp AS VARCHAR) AS new_value
         |  FROM cls WHERE status = 'update' AND i_tp IS DISTINCT FROM c_tp
         |  UNION ALL
         |  SELECT 'orders', '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR) || '}',
         |    'o_orderpriority', c_op, i_op
         |  FROM cls WHERE status = 'update' AND i_op IS DISTINCT FROM c_op
         |  UNION ALL
         |  SELECT 'orders', '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR) || '}',
         |    'o_orderstatus', c_os, i_os
         |  FROM cls WHERE status = 'update' AND i_os IS DISTINCT FROM c_os)
         |ORDER BY record_key, field""".stripMargin) { (s, d) =>
      val (current, incoming) = mergeInputs(s, d)
      UpsertWriter.merge(current, incoming, cfg).audit
        .select("table_name", "record_key", "field", "old_value", "new_value")
        .orderBy("record_key", "field")
    },

    QueryDef.sql(
      "q_upsert_preview",
      s"""$oracleCtes
         |SELECT CAST(SUM(CASE WHEN status = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS inserted,
         |       CAST(SUM(CASE WHEN status = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS updated,
         |       CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS unchanged,
         |       CAST(SUM(CASE WHEN status = 'orphaned' THEN 1 ELSE 0 END) AS BIGINT) AS orphaned
         |FROM cls
         |ORDER BY inserted""".stripMargin) { (s, d) =>
      val (current, incoming) = mergeInputs(s, d)
      UpsertWriter.merge(current, incoming, cfg).preview.orderBy("inserted")
    },

    // U3: local_subject_ids delete-and-replace MERGE — match on
    // (local_subject_id, identifier_type) ONLY; center changes replace
    // the row, GSID changes update in place, new identifiers insert,
    // unmatched existing rows survive (load_strategies.py:196-352).
    QueryDef.sql(
      "q_upsert_local_ids",
      """WITH cur AS (
        |  SELECT s_name AS local_subject_id, 'primary' AS identifier_type,
        |         CAST(s_nationkey AS INT) AS center_id,
        |         'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16)) AS global_subject_id,
        |         s_suppkey AS k
        |  FROM supplier),
        |inc AS (
        |  SELECT s_name AS local_subject_id, 'primary' AS identifier_type,
        |    CAST(CASE WHEN s_suppkey % 3 = 0 THEN (s_nationkey + 2) % 25
        |              ELSE s_nationkey END AS INT) AS center_id,
        |    CASE WHEN s_suppkey % 3 = 1
        |         THEN 'GSID-' || upper(substr(md5('R' || CAST(s_suppkey AS VARCHAR)), 1, 16))
        |         ELSE 'GSID-' || upper(substr(md5('S' || CAST(s_suppkey AS VARCHAR)), 1, 16))
        |    END AS global_subject_id
        |  FROM supplier WHERE s_suppkey % 4 <> 0
        |  UNION ALL
        |  SELECT 'NEW-' || CAST(s_suppkey AS VARCHAR), 'secondary',
        |    CAST(s_nationkey AS INT),
        |    'GSID-' || upper(substr(md5('N' || CAST(s_suppkey AS VARCHAR)), 1, 16))
        |  FROM supplier WHERE s_suppkey % 5 = 0)
        |SELECT coalesce(i.center_id, c.center_id) AS center_id,
        |  coalesce(i.local_subject_id, c.local_subject_id) AS local_subject_id,
        |  coalesce(i.identifier_type, c.identifier_type) AS identifier_type,
        |  coalesce(i.global_subject_id, c.global_subject_id) AS global_subject_id
        |FROM cur c
        |FULL JOIN inc i USING (local_subject_id, identifier_type)
        |ORDER BY local_subject_id, identifier_type""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val gS = graft.functions.Gsid.deterministic(
        concat(lit("S"), col("s_suppkey").cast("string")))
      val cur = sup.select(
        col("s_name").as("local_subject_id"), lit("primary").as("identifier_type"),
        col("s_nationkey").cast("int").as("center_id"), gS.as("global_subject_id"))
      val inc = sup.filter(col("s_suppkey") % 4 =!= 0).select(
        col("s_name").as("local_subject_id"), lit("primary").as("identifier_type"),
        when(col("s_suppkey") % 3 === 0, (col("s_nationkey") + 2) % 25)
          .otherwise(col("s_nationkey")).cast("int").as("center_id"),
        when(col("s_suppkey") % 3 === 1,
          graft.functions.Gsid.deterministic(
            concat(lit("R"), col("s_suppkey").cast("string"))))
          .otherwise(gS).as("global_subject_id"))
        .unionByName(sup.filter(col("s_suppkey") % 5 === 0).select(
          concat(lit("NEW-"), col("s_suppkey").cast("string")).as("local_subject_id"),
          lit("secondary").as("identifier_type"),
          col("s_nationkey").cast("int").as("center_id"),
          graft.functions.Gsid.deterministic(
            concat(lit("N"), col("s_suppkey").cast("string"))).as("global_subject_id")))
      UpsertWriter.mergeLocalSubjectIds(cur, inc).merged
        .orderBy("local_subject_id", "identifier_type")
    },

    // U8: fragment_resolutions load bookkeeping — per-(batch, table)
    // load stats derived from orders; an overlapping second wave of
    // loads updates existing keys (ON CONFLICT DO UPDATE) and inserts
    // new ones.
    QueryDef.sql(
      "q_load_bookkeeping",
      """WITH ex AS (
        |  SELECT 'B' || CAST(o_orderkey % 3 AS VARCHAR) AS batch_id,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'specimen' ELSE 'samples' END AS table_name,
        |    CAST(SUM(CASE WHEN o_orderkey % 11 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_loaded,
        |    CAST(SUM(CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_failed
        |  FROM orders WHERE o_orderkey % 7 <> 0 GROUP BY 1, 2),
        |inc AS (
        |  SELECT 'B' || CAST(1 + o_orderkey % 4 AS VARCHAR) AS batch_id,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'specimen' ELSE 'samples' END AS table_name,
        |    CAST(SUM(CASE WHEN o_orderkey % 11 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_loaded,
        |    CAST(SUM(CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_failed
        |  FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY 1, 2),
        |n_ex AS (
        |  SELECT batch_id, table_name,
        |    'staging/validated/' || batch_id || '/' || table_name || '.csv' AS fragment_key,
        |    CASE WHEN rows_failed > 0 THEN 'partial' ELSE 'success' END AS load_status,
        |    CASE WHEN table_name = 'specimen' THEN 'upsert' ELSE 'standard_insert' END AS load_strategy,
        |    rows_loaded + rows_failed AS rows_attempted, rows_loaded, rows_failed,
        |    CAST(NULL AS VARCHAR) AS error_message, 'table_loader' AS created_by
        |  FROM ex),
        |n_inc AS (
        |  SELECT batch_id, table_name,
        |    'staging/validated/' || batch_id || '/' || table_name || '.csv' AS fragment_key,
        |    CASE WHEN rows_failed > 0 THEN 'partial' ELSE 'success' END AS load_status,
        |    CASE WHEN table_name = 'specimen' THEN 'upsert' ELSE 'standard_insert' END AS load_strategy,
        |    rows_loaded + rows_failed AS rows_attempted, rows_loaded, rows_failed,
        |    CAST(NULL AS VARCHAR) AS error_message, 'table_loader' AS created_by
        |  FROM inc)
        |SELECT coalesce(i.batch_id, e.batch_id) AS batch_id,
        |  coalesce(i.table_name, e.table_name) AS table_name,
        |  coalesce(i.fragment_key, e.fragment_key) AS fragment_key,
        |  CASE WHEN i.batch_id IS NOT NULL THEN i.load_status ELSE e.load_status END AS load_status,
        |  CASE WHEN i.batch_id IS NOT NULL THEN i.load_strategy ELSE e.load_strategy END AS load_strategy,
        |  CASE WHEN i.batch_id IS NOT NULL THEN i.rows_attempted ELSE e.rows_attempted END AS rows_attempted,
        |  CASE WHEN i.batch_id IS NOT NULL THEN i.rows_loaded ELSE e.rows_loaded END AS rows_loaded,
        |  CASE WHEN i.batch_id IS NOT NULL THEN i.rows_failed ELSE e.rows_failed END AS rows_failed,
        |  CAST(NULL AS VARCHAR) AS error_message,
        |  'table_loader' AS created_by
        |FROM n_ex e
        |FULL JOIN n_inc i USING (batch_id, table_name, fragment_key)
        |ORDER BY batch_id, table_name""".stripMargin) { (s, d) =>
      def loads(filterMod: Int, batchId: org.apache.spark.sql.Column): DataFrame =
        Tables.orders(s, d).filter(col("o_orderkey") % filterMod =!= 0)
          .groupBy(batchId.as("batch_id"),
            when(col("o_orderkey") % 2 === 0, "specimen").otherwise("samples")
              .as("table_name"))
          .agg(
            sum(when(col("o_orderkey") % 11 =!= 0, 1L).otherwise(0L)).as("rows_loaded"),
            sum(when(col("o_orderkey") % 11 === 0, 1L).otherwise(0L)).as("rows_failed"))
          .withColumn("load_status",
            when(col("rows_failed") > 0, "partial").otherwise("success"))
      val existing = LoadBookkeeping.normalize(
        loads(7, concat(lit("B"), (col("o_orderkey") % 3).cast("string"))))
      LoadBookkeeping.record(existing,
          loads(5, concat(lit("B"), (col("o_orderkey") % 4 + 1).cast("string"))))
        .orderBy("batch_id", "table_name")
    })
}
