package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{ChangeDetector, ConflictDetector, FieldMapper, SchemaValidator}
import graft.types.MappingConfig

/** Queries driving the mapping / validation / change-detection /
  * conflict-detection operators (SURVEY.md §2.2, §2.4 J4-J5, §2.10)
  * through the driver's DuckDB gate. */
object OperatorQueries {

  private val mappingCfg = MappingConfig.fromJson(
    """{
      |  "field_mapping": {"subject_name": "c_name", "acct_balance": "c_acctbal",
      |                    "never_there": "no_such_col"},
      |  "static_fields": {"source": "tpch"},
      |  "subject_id_candidates": ["c_custkey"],
      |  "center_id_field": "c_nationkey",
      |  "default_center_id": 0
      |}""".stripMargin)

  val defs: Seq[QueryDef] = Seq(

    // P1-P3: mapping projection with static fields + auto-includes;
    // the missing source column is skipped with a warning.
    QueryDef.sql(
      "q_op_field_mapping",
      """SELECT c_name AS subject_name, c_acctbal AS acct_balance, 'tpch' AS source,
        |       c_custkey, c_nationkey
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      FieldMapper.applyMapping(Tables.customer(s, d), mappingCfg).df
        .orderBy("c_custkey")
    },

    // V3: natural-key duplicate detection.
    QueryDef.sql(
      "q_op_duplicate_keys",
      """SELECT l_partkey, l_suppkey, COUNT(*) AS dup_count
        |FROM lineitem
        |GROUP BY l_partkey, l_suppkey
        |HAVING COUNT(*) > 1
        |ORDER BY l_partkey, l_suppkey""".stripMargin) { (s, d) =>
      SchemaValidator.duplicateKeys(Tables.lineitem(s, d), Seq("l_partkey", "l_suppkey"))
        .orderBy("l_partkey", "l_suppkey")
    },

    // J4: full-outer change detection — incoming is a perturbed subset
    // of orders, existing another subset; classification + changed
    // fields must match the oracle's FULL JOIN re-derivation.
    QueryDef.sql(
      "q_op_change_detection",
      """WITH incoming AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |existing AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |j AS (
        |  SELECT coalesce(i.o_orderkey, e.o_orderkey) AS o_orderkey,
        |    i.o_orderkey IS NOT NULL AS in_p, e.o_orderkey IS NOT NULL AS ex_p,
        |    (i.o_totalprice IS DISTINCT FROM e.o_totalprice) AS d_price,
        |    (i.o_orderstatus IS DISTINCT FROM e.o_orderstatus) AS d_status
        |  FROM incoming i FULL JOIN existing e ON i.o_orderkey = e.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN NOT ex_p THEN 'new' WHEN NOT in_p THEN 'orphaned'
        |       WHEN d_price OR d_status THEN 'updated' ELSE 'unchanged' END AS change_status,
        |  CASE WHEN ex_p AND in_p AND (d_price OR d_status)
        |       THEN coalesce(array_to_string(list_sort(list_filter(
        |              [CASE WHEN d_price THEN 'o_totalprice' END,
        |               CASE WHEN d_status THEN 'o_orderstatus' END], x -> x IS NOT NULL)), ','), '')
        |       ELSE '' END AS changed_fields
        |FROM j
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d).select("o_orderkey", "o_totalprice", "o_orderstatus")
      val incoming = orders.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val existing = orders.filter(col("o_orderkey") % 7 =!= 0)
      ChangeDetector.compare(incoming, existing, Seq("o_orderkey"))
        // driver comparator can't sort ARRAY cells — ship a joined string
        .select(col("o_orderkey"), col("change_status"),
          concat_ws(",", col("changed_fields")).as("changed_fields"))
        .orderBy("o_orderkey")
    },

    // SCD Type-2 history: three snapshot generations collapse to the
    // change rows, each stamped with its validity interval (valid_to
    // null = current). The oracle replays the same window pipeline.
    QueryDef.sql(
      "q_scd2_history",
      """WITH s1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS snap_ts
        |            FROM orders),
        |s2 AS (SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
        |           AS o_orderstatus,
        |         o_totalprice, 2 AS snap_ts
        |       FROM orders),
        |s3 AS (SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |              ELSE o_totalprice END AS o_totalprice,
        |         3 AS snap_ts
        |       FROM s2),
        |snap AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3),
        |m AS (SELECT *, row_number() OVER w AS rn,
        |        lag(o_orderstatus) OVER w AS ps, lag(o_totalprice) OVER w AS pp
        |      FROM snap WINDOW w AS (PARTITION BY o_orderkey ORDER BY snap_ts)),
        |chg AS (SELECT o_orderkey, o_orderstatus, o_totalprice, snap_ts FROM m
        |        WHERE rn = 1 OR (o_orderstatus IS DISTINCT FROM ps)
        |           OR (o_totalprice IS DISTINCT FROM pp))
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  snap_ts AS valid_from,
        |  lead(snap_ts) OVER (PARTITION BY o_orderkey ORDER BY snap_ts) AS valid_to
        |FROM chg
        |ORDER BY o_orderkey, valid_from""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val s1 = o.withColumn("snap_ts", lit(1))
      val s2 = o.withColumn("o_orderstatus",
          when(col("o_orderkey") % 5 === 0, lit("X")).otherwise(col("o_orderstatus")))
        .withColumn("snap_ts", lit(2))
      val s3 = s2.withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("snap_ts", lit(3))
      ChangeDetector.scd2History(
          s1.unionByName(s2).unionByName(s3),
          Seq("o_orderkey"), "snap_ts", Seq("o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey", "valid_from")
    },

    // V1/V2: required-column presence + one-pass NOT-NULL counts over a
    // frame with induced nulls and a missing required column.
    QueryDef.sql(
      "q_op_null_counts",
      """SELECT * FROM (
        |  SELECT 'o_clerk_opt' AS "column", TRUE AS present,
        |    (SELECT CAST(SUM(CASE WHEN o_orderkey % 9 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |     FROM orders) AS null_count,
        |    'null_in_required_column' AS error_type
        |  UNION ALL
        |  SELECT 'o_orderstatus', TRUE, CAST(0 AS BIGINT), CAST(NULL AS VARCHAR)
        |  UNION ALL
        |  SELECT 'o_missing_col', FALSE, CAST(0 AS BIGINT), 'missing_required_column')
        |ORDER BY "column"""".stripMargin) { (s, d) =>
      val frame = Tables.orders(s, d)
        .withColumn("o_clerk_opt",
          when(col("o_orderkey") % 9 === 0, lit(null)).otherwise(col("o_orderpriority")))
      SchemaValidator.nullCountReport(frame, Seq(
        SchemaValidator.ColumnSpec("o_clerk_opt", required = true),
        SchemaValidator.ColumnSpec("o_orderstatus", required = true),
        SchemaValidator.ColumnSpec("o_missing_col", required = true),
        SchemaValidator.ColumnSpec("created_at", required = true), // always skipped
        SchemaValidator.ColumnSpec("o_orderkey", required = true, primaryKey = true)))
        .orderBy("column")
    },

    // A3: change-analysis summary (update_detector.py:194-217) over the
    // same perturbed inputs as q_op_change_detection.
    QueryDef.sql(
      "q_op_change_summary",
      """WITH incoming AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |existing AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |j AS (
        |  SELECT i.o_orderkey IS NOT NULL AS in_p, e.o_orderkey IS NOT NULL AS ex_p,
        |    (i.o_totalprice IS DISTINCT FROM e.o_totalprice)
        |      OR (i.o_orderstatus IS DISTINCT FROM e.o_orderstatus) AS changed
        |  FROM incoming i FULL JOIN existing e ON i.o_orderkey = e.o_orderkey)
        |SELECT CASE WHEN NOT ex_p THEN 'new' WHEN NOT in_p THEN 'orphaned'
        |            WHEN changed THEN 'updated' ELSE 'unchanged' END AS change_status,
        |       COUNT(*) AS n
        |FROM j
        |GROUP BY 1
        |ORDER BY change_status""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d).select("o_orderkey", "o_totalprice", "o_orderstatus")
      val incoming = orders.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val existing = orders.filter(col("o_orderkey") % 7 =!= 0)
      ChangeDetector.summary(
          ChangeDetector.compare(incoming, existing, Seq("o_orderkey")))
        .orderBy("change_status")
    },

    // J5: conflict detection over synthetic registry pairs derived from
    // lineitem (center first — elif — so a row yields one conflict).
    QueryDef.sql(
      "q_op_conflicts",
      """WITH incoming AS (
        |  SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS local_subject_id,
        |    'part' AS identifier_type,
        |    CAST(l_suppkey % 5 AS INT) AS incoming_center_id,
        |    'GSID-' || upper(substr(md5(CAST(l_partkey AS VARCHAR)), 1, 16)) AS incoming_gsid
        |  FROM lineitem WHERE l_linenumber = 1),
        |existing AS (
        |  SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS local_subject_id,
        |    'part' AS identifier_type,
        |    CAST(l_partkey % 5 AS INT) AS existing_center_id,
        |    'GSID-' || upper(substr(md5(CAST(l_partkey + (l_partkey % 3) AS VARCHAR)), 1, 16)) AS existing_gsid
        |  FROM lineitem WHERE l_linenumber = 2)
        |SELECT 'batch_test' AS batch_id,
        |  CASE WHEN existing_center_id <> incoming_center_id THEN 'center_mismatch'
        |       WHEN existing_gsid <> incoming_gsid THEN 'multi_gsid' END AS conflict_type,
        |  local_subject_id, identifier_type,
        |  existing_center_id, incoming_center_id, existing_gsid, incoming_gsid,
        |  CAST(NULL AS VARCHAR) AS resolution_action
        |FROM incoming JOIN existing USING (local_subject_id, identifier_type)
        |WHERE existing_center_id <> incoming_center_id OR existing_gsid <> incoming_gsid
        |ORDER BY local_subject_id, existing_center_id, incoming_center_id, existing_gsid""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val incoming = li.filter(col("l_linenumber") === 1).select(
        col("l_partkey").cast("string").as("local_subject_id"),
        lit("part").as("identifier_type"),
        (col("l_suppkey") % 5).cast("int").as("center_id"),
        graft.functions.Gsid.deterministic(col("l_partkey").cast("string")).as("global_subject_id"))
      val existing = li.filter(col("l_linenumber") === 2).select(
        col("l_partkey").cast("string").as("local_subject_id"),
        lit("part").as("identifier_type"),
        (col("l_partkey") % 5).cast("int").as("center_id"),
        graft.functions.Gsid.deterministic(
          (col("l_partkey") + (col("l_partkey") % 3)).cast("string")).as("global_subject_id"))
        .dropDuplicates()
      ConflictDetector.detect(incoming, existing, "batch_test")
        .orderBy("local_subject_id", "existing_center_id", "incoming_center_id", "existing_gsid")
    },

    // A2: conflict summary by type.
    QueryDef.sql(
      "q_op_conflict_summary",
      """WITH incoming AS (
        |  SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS local_subject_id,
        |    CAST(l_suppkey % 5 AS INT) AS incoming_center_id,
        |    'GSID-' || upper(substr(md5(CAST(l_partkey AS VARCHAR)), 1, 16)) AS incoming_gsid
        |  FROM lineitem WHERE l_linenumber = 1),
        |existing AS (
        |  SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS local_subject_id,
        |    CAST(l_partkey % 5 AS INT) AS existing_center_id,
        |    'GSID-' || upper(substr(md5(CAST(l_partkey + (l_partkey % 3) AS VARCHAR)), 1, 16)) AS existing_gsid
        |  FROM lineitem WHERE l_linenumber = 2)
        |SELECT conflict_type, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN existing_center_id <> incoming_center_id THEN 'center_mismatch'
        |              WHEN existing_gsid <> incoming_gsid THEN 'multi_gsid' END AS conflict_type
        |  FROM incoming JOIN existing USING (local_subject_id)
        |  WHERE existing_center_id <> incoming_center_id OR existing_gsid <> incoming_gsid)
        |GROUP BY conflict_type
        |ORDER BY conflict_type""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val incoming = li.filter(col("l_linenumber") === 1).select(
        col("l_partkey").cast("string").as("local_subject_id"),
        lit("part").as("identifier_type"),
        (col("l_suppkey") % 5).cast("int").as("center_id"),
        graft.functions.Gsid.deterministic(col("l_partkey").cast("string")).as("global_subject_id"))
      val existing = li.filter(col("l_linenumber") === 2).select(
        col("l_partkey").cast("string").as("local_subject_id"),
        lit("part").as("identifier_type"),
        (col("l_partkey") % 5).cast("int").as("center_id"),
        graft.functions.Gsid.deterministic(
          (col("l_partkey") + (col("l_partkey") % 3)).cast("string")).as("global_subject_id"))
        .dropDuplicates()
      ConflictDetector.summary(ConflictDetector.detect(incoming, existing, "batch_test"))
        .orderBy("conflict_type")
    })
}
