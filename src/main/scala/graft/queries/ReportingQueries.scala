package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Similarity
import graft.operators.CenterResolver

/** Reporting / window / set-op queries (SURVEY.md §2.5 A4-A12, §2.6
  * W1-W3, §2.7) plus the fuzzy center-resolution ladder J7. */
object ReportingQueries {

  private def dsum(c: String, scale: Int = 2) =
    sum(col(c).cast(s"decimal(18,$scale)")).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // J7/W3: alias→exact→fuzzy ladder over corrupted nation names,
    // levenshtein-ratio scorer (ANSI-reproducible; RO-UDF covered in
    // unit tests).
    QueryDef.sql(
      "q_fuzzy_center_resolve",
      """WITH inputs AS (
        |  SELECT c_custkey AS input_id,
        |    CASE c_custkey % 4
        |      WHEN 0 THEN n.n_name
        |      WHEN 1 THEN lower(n.n_name)
        |      WHEN 2 THEN substr(n.n_name, 1, length(n.n_name) - 1)
        |      ELSE 'ZZ-' || CAST(c_custkey AS VARCHAR)
        |    END AS center_name
        |  FROM customer JOIN nation n ON n.n_nationkey = c_nationkey),
        |norm AS (
        |  SELECT input_id, center_name,
        |         lower(trim(replace(center_name, '_', ' '))) AS n_in
        |  FROM inputs),
        |exact AS (
        |  SELECT input_id, min(n_nationkey) AS exact_id
        |  FROM norm JOIN nation ON n_in = lower(n_name) OR lower(center_name) = lower(n_name)
        |  GROUP BY input_id),
        |scored AS (
        |  SELECT input_id, n_nationkey,
        |    CASE WHEN greatest(length(n_in), length(lower(n_name))) = 0 THEN 1.0
        |         ELSE 1.0 - CAST(levenshtein(n_in, lower(n_name)) AS DOUBLE)
        |                    / greatest(length(n_in), length(lower(n_name))) END AS score
        |  FROM (SELECT * FROM norm WHERE input_id NOT IN (SELECT input_id FROM exact))
        |  CROSS JOIN nation),
        |best AS (
        |  SELECT input_id, n_nationkey, score,
        |         row_number() OVER (PARTITION BY input_id ORDER BY score DESC, n_nationkey) AS rn
        |  FROM scored)
        |SELECT i.input_id, i.center_name,
        |  CASE WHEN e.exact_id IS NOT NULL THEN e.exact_id
        |       WHEN b.score >= 0.7 THEN b.n_nationkey END AS center_id,
        |  CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
        |       WHEN b.score >= 0.7 THEN 'fuzzy'
        |       ELSE 'unresolved' END AS method
        |FROM inputs i
        |LEFT JOIN exact e USING (input_id)
        |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (input_id)
        |ORDER BY input_id""".stripMargin) { (s, d) =>
      val inputs = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("c_nationkey"))
        .select(col("c_custkey").as("input_id"),
          expr("""CASE CAST(c_custkey % 4 AS INT)
                 |  WHEN 0 THEN n_name
                 |  WHEN 1 THEN lower(n_name)
                 |  WHEN 2 THEN substring(n_name, 1, length(n_name) - 1)
                 |  ELSE concat('ZZ-', CAST(c_custkey AS STRING))
                 |END""".stripMargin).as("center_name"))
      val centers = Tables.nation(s, d)
        .select(col("n_nationkey").as("center_id"), col("n_name").as("name"))
      CenterResolver.resolve(inputs, "input_id", "center_name", centers,
          threshold = 0.7, scorer = Similarity.levenshteinRatio)
        .orderBy("input_id")
    },

    // A4: stats by group with avg over exact decimals.
    QueryDef.sql(
      "q_rep_stats_by_action",
      """SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_value
        |FROM events
        |GROUP BY event_type, date_trunc('day', ts)
        |ORDER BY n DESC, event_type, day
        |LIMIT 200""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("avg_value"))
        .orderBy(col("n").desc, col("event_type"), col("day"))
        .limit(200)
    },

    // A5: multi-status customers (ARRAY_AGG DISTINCT + HAVING > 1).
    QueryDef.sql(
      "q_rep_multi_status",
      """SELECT o_custkey, array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS INT) AS n_statuses
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(DISTINCT o_orderstatus) > 1
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      // size(collect_set) instead of a parallel countDistinct — avoids
      // the Expand two-pass distinct plan (see IdentityResolver.resolve).
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sort_array(collect_set(col("o_orderstatus"))).as("_set"))
        .withColumn("statuses", concat_ws(",", col("_set")))
        .withColumn("n_statuses", size(col("_set")))
        .filter(col("n_statuses") > 1)
        .select("o_custkey", "statuses", "n_statuses")
        .orderBy("o_custkey")
    },

    // A7: audit-stats shape (count, countDistinct, min/max) by group.
    QueryDef.sql(
      "q_rep_event_stats",
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
        |  min(ts) AS first_ts, max(ts) AS last_ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"),
          min("ts").as("first_ts"), max("ts").as("last_ts"),
          dsum("value").as("total_value"))
        .orderBy("event_type")
    },

    // A9: subjects-by-source shape over documents.
    QueryDef.sql(
      "q_rep_docs_by_source",
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), countDistinct("lang").as("n_langs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("source")
    },

    // A10: UNION ALL of per-table counts.
    QueryDef.sql(
      "q_rep_union_counts",
      """SELECT 'orders' AS data_type, COUNT(*) AS n FROM orders
        |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |ORDER BY data_type""".stripMargin) { (s, d) =>
      Tables.orders(s, d).agg(count(lit(1)).as("n")).select(lit("orders").as("data_type"), col("n"))
        .unionByName(Tables.lineitem(s, d).agg(count(lit(1)).as("n"))
          .select(lit("lineitem").as("data_type"), col("n")))
        .unionByName(Tables.customer(s, d).agg(count(lit(1)).as("n"))
          .select(lit("customer").as("data_type"), col("n")))
        .orderBy("data_type")
    },

    // A8: conditional aggregation (SUM CASE WHEN) by group.
    QueryDef.sql(
      "q_rep_conditional_agg",
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_totalprice") > 100000, 1L).otherwise(0L)).as("n_big"))
        .orderBy("o_orderpriority")
    },

    // A12: collect-to-document (grouped sorted lists).
    QueryDef.sql(
      "q_rep_collect_lists",
      """SELECT event_type, array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_ids
        |FROM events WHERE event_id < 500
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d).filter(col("event_id") < 500)
        .groupBy("event_type")
        .agg(concat_ws(",",
          transform(sort_array(collect_set(col("user_id"))), _.cast("string"))).as("user_ids"))
        .orderBy("event_type")
    },

    // W1: global distinct-count window — expressed as a broadcast of a
    // one-row aggregate (scales where COUNT(DISTINCT) OVER () cannot).
    QueryDef.sql(
      "q_w1_global_distinct",
      """SELECT doc_id, lang,
        |  (SELECT COUNT(DISTINCT lang) FROM documents) AS n_langs,
        |  (SELECT COUNT(DISTINCT lang) FROM documents) > 1 AS conflict_detected
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val agg = docs.agg(countDistinct("lang").as("n_langs"))
      docs.select("doc_id", "lang")
        .crossJoin(broadcast(agg))
        .withColumn("conflict_detected", col("n_langs") > 1)
        .orderBy("doc_id")
    },

    // W2: oldest-record selection per group ((created_at, key) order).
    QueryDef.sql(
      "q_w2_oldest_order_per_customer",
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    },

    // §2.7 set difference: customers with F orders but no O orders.
    QueryDef.sql(
      "q_set_except",
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct())
        .orderBy("o_custkey")
    },

    // F15/F16-shape: JSON field extraction from the events props payload.
    QueryDef.sql(
      "q_fn_json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).filter(col("event_id") < 2000)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },

    // J9-shape: explode + aggregate (word frequencies).
    QueryDef.sql(
      "q_explode_word_freq",
      """SELECT word, COUNT(*) AS n
        |FROM (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                    x -> x <> '')) AS word
        |      FROM documents)
        |GROUP BY word
        |ORDER BY n DESC, word
        |LIMIT 100""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(100)
    },

    // Wide reporting: pivot on a low-cardinality column (explicit value
    // list — at scale an unbounded pivot would need a distinct pre-pass;
    // pinning the values keeps it one aggregate).
    QueryDef.sql(
      "q_rep_pivot",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .select(col("l_returnflag"),
          col("F_n").as("n_f"), col("O_n").as("n_o"),
          col("F_qty").as("qty_f"), col("O_qty").as("qty_o"))
        .orderBy("l_returnflag")
    },

    // Hierarchical totals via ROLLUP; grouping-null keys coalesced to
    // 'ALL' in both dialects so the comparator's sort keys stay
    // non-null.
    QueryDef.sql(
      "q_rep_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy("returnflag", "linestatus")
    },

    // NTILE quartile segmentation of customer spend. The global window
    // is bounded by the AGGREGATED customer table (one row per
    // customer), not the order stream; at extreme scale the same cut
    // comes from the exact-percentile scalars (q_text_length_band's
    // broadcast pattern) instead of a total order.
    QueryDef.sql(
      "q_rep_ntile",
      """WITH spend AS (SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey),
        |q AS (SELECT o_custkey, total,
        |        ntile(4) OVER (ORDER BY total DESC, o_custkey) AS quartile
        |      FROM spend)
        |SELECT quartile, CAST(COUNT(*) AS BIGINT) AS n,
        |  min(total) AS min_total, max(total) AS max_total
        |FROM q GROUP BY quartile
        |ORDER BY quartile""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val spend = Tables.orders(s, d).groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      spend.withColumn("quartile",
          ntile(4).over(W.orderBy(col("total").desc, col("o_custkey"))))
        .groupBy("quartile")
        .agg(count(lit(1)).as("n"), min("total").as("min_total"),
          max("total").as("max_total"))
        .orderBy("quartile")
    },

    // Pearson correlation (quantity vs discount) from exact BIGINT
    // sums folded through ONE fixed float expression — corr()
    // built-ins stream-update in nondeterministic order and never hash
    // equal, and huge DECIMAL→DOUBLE casts round differently per
    // engine; r is scale-invariant, so the inputs go to exact integer
    // units (×100 / ×10000) whose int64 sums convert deterministically.
    QueryDef.sql(
      "q_rep_correlation",
      """WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(round(l_discount * 10000) AS BIGINT)) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
        |             * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(round(l_discount * 10000) AS BIGINT)
        |             * CAST(round(l_discount * 10000) AS BIGINT)) AS DOUBLE) AS sy2,
        |    CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
        |             * CAST(round(l_discount * 10000) AS BIGINT)) AS DOUBLE) AS sxy
        |  FROM lineitem)
        |SELECT n,
        |  (n * sxy - sx * sy)
        |    / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)) AS pearson_r
        |FROM s""".stripMargin) { (s, d) =>
      val qx = round(col("l_quantity") * 100).cast("long")
      val dy = round(col("l_discount") * 10000).cast("long")
      val agg = Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        sum(qx).cast("double").as("sx"),
        sum(dy).cast("double").as("sy"),
        sum(qx * qx).cast("double").as("sx2"),
        sum(dy * dy).cast("double").as("sy2"),
        sum(qx * dy).cast("double").as("sxy"))
      agg.select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          / (sqrt(col("n") * col("sx2") - col("sx") * col("sx"))
            * sqrt(col("n") * col("sy2") - col("sy") * col("sy"))))
          .as("pearson_r"))
    },

    // Referential-integrity audit across tables: documents without an
    // embedding row and embeddings without a document — two anti-join
    // counts (the cross-dataset completeness check a multimodal /
    // embedding pipeline runs before training).
    QueryDef.sql(
      "q_audit_referential",
      """SELECT * FROM (
        |  SELECT 'docs_without_embedding' AS check_name,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents d WHERE NOT EXISTS (
        |    SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
        |  UNION ALL
        |  SELECT 'embeddings_without_doc',
        |    CAST(COUNT(*) AS BIGINT)
        |  FROM embeddings e WHERE NOT EXISTS (
        |    SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val a = docs.join(emb, docs("doc_id") === emb("vec_id"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("docs_without_embedding").as("check_name"), col("n"))
      val b = emb.join(docs, emb("vec_id") === docs("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("embeddings_without_doc").as("check_name"), col("n"))
      a.unionByName(b).orderBy("check_name")
    },

    // Deequ-style declarative constraint suite compiled into ONE
    // aggregation pass over orders: conditional sums + exact
    // count-distincts, exploded to a (check_name, target, violations,
    // passed) report. Mixed pass/fail by construction: o_orderkey is
    // unique, o_custkey is not; status 'P' violates the enum; prices
    // overflow 300k but not 500k.
    QueryDef.sql(
      "q_audit_constraints",
      """SELECT * FROM (
        |  SELECT 'in_range' AS check_name, 'o_totalprice[0.0,300000.0]' AS target,
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |                  OR o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS violations,
        |    SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |             OR o_totalprice > 300000 THEN 1 ELSE 0 END) = 0 AS passed
        |  FROM orders
        |  UNION ALL
        |  SELECT 'in_range', 'o_totalprice[0.0,500000.0]',
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |                  OR o_totalprice > 500000 THEN 1 ELSE 0 END) AS BIGINT),
        |    SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |             OR o_totalprice > 500000 THEN 1 ELSE 0 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'in_set', 'o_orderstatus{O|F}',
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL
        |                  OR o_orderstatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS BIGINT),
        |    SUM(CASE WHEN o_orderstatus IS NULL
        |             OR o_orderstatus NOT IN ('O','F') THEN 1 ELSE 0 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'not_null', 'o_custkey',
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'row_count', '[1000,1000000000]',
        |    CASE WHEN COUNT(*) BETWEEN 1000 AND 1000000000
        |         THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END,
        |    COUNT(*) BETWEEN 1000 AND 1000000000
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique', 'o_custkey',
        |    CAST(COUNT(*) - COUNT(DISTINCT ROW(o_custkey)) AS BIGINT),
        |    COUNT(*) - COUNT(DISTINCT ROW(o_custkey)) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique', 'o_orderkey',
        |    CAST(COUNT(*) - COUNT(DISTINCT ROW(o_orderkey)) AS BIGINT),
        |    COUNT(*) - COUNT(DISTINCT ROW(o_orderkey)) = 0
        |  FROM orders)
        |ORDER BY check_name, target""".stripMargin) { (s, d) =>
      import graft.operators.Constraints
      import graft.operators.Constraints._
      Constraints.check(Tables.orders(s, d), Seq(
        NotNull("o_custkey"),
        Unique(Seq("o_orderkey")),
        Unique(Seq("o_custkey")),
        InSet("o_orderstatus", Seq("O", "F")),
        InRange("o_totalprice", 0.0, 300000.0),
        InRange("o_totalprice", 0.0, 500000.0),
        RowCountBetween(1000L, 1000000000L)))
    },

    // Materialized-view delta merge (IncrementalAgg): per-customer
    // aggregate state initialized from pre-1995 orders is folded
    // forward with the post-1995 delta WITHOUT rescanning the base;
    // the oracle is the full-recompute GROUP BY — component
    // associativity (count/exact-DECIMAL-sum/min/max) makes
    // incremental ≡ full, which is the whole point of the operator.
    QueryDef.sql(
      "q_agg_incremental",
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
        |FROM orders GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      import graft.operators.IncrementalAgg
      val orders = Tables.orders(s, d)
      val split = lit("1995-01-01").cast("timestamp")
      val base = orders.filter(col("o_orderdate") < split)
      val delta = orders.filter(col("o_orderdate") >= split)
      val state = IncrementalAgg.partial(base, Seq("o_custkey"), "o_totalprice")
      IncrementalAgg.merge(state, delta, Seq("o_custkey"), "o_totalprice")
        .select(col("o_custkey"), col("agg_n").cast("long").as("n"),
          col("agg_sum").cast("double").as("total"),
          col("agg_min").as("mn"), col("agg_max").as("mx"))
        .orderBy("o_custkey")
    },

    // Per-key top-k through the bounded TopKRows typed aggregate
    // (size-k heap, map-side partial agg, ≤k rows per key per
    // partition on the wire) — the oracle is the row_number() window
    // formulation it replaces at scale; (score DESC, tie ASC) is a
    // total order so the two agree row-for-row.
    QueryDef.sql(
      "q_topk_per_key",
      """SELECT o_custkey, "rank", o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS "rank"
        |  FROM orders)
        |WHERE "rank" <= 3
        |ORDER BY o_custkey, "rank"""".stripMargin) { (s, d) =>
      graft.operators.TopK.perKey(Tables.orders(s, d), Seq("o_custkey"),
          "o_totalprice", "o_orderkey", Nil, k = 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rank")
    },

    // EXACT heavy hitters via Misra-Gries sketch-then-verify
    // (HeavyHitters.exact): the sketch's order-dependent extras are
    // eliminated by the exact recount, so the output is precisely
    // {v : freq(v)*20 > n} and the oracle is a plain GROUP BY +
    // HAVING. The value is a deterministic Zipf-like residue
    // (o_orderkey % ((o_orderkey % 32)+1): residue 0 carries ~12.7%
    // of the mass, descending) — 32 distinct values against a
    // 20-counter sketch, so eviction and the coverage guarantee are
    // genuinely exercised.
    QueryDef.sql(
      "q_heavy_hitters",
      """WITH w AS (SELECT CAST(o_orderkey % ((o_orderkey % 32) + 1) AS VARCHAR)
        |             AS value FROM orders),
        |t AS (SELECT COUNT(*) AS n FROM w),
        |c AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY value)
        |SELECT value, n FROM c
        |WHERE n * 20 > (SELECT n FROM t)
        |ORDER BY value""".stripMargin) { (s, d) =>
      val skewed = Tables.orders(s, d).select(
        (col("o_orderkey") % ((col("o_orderkey") % 32) + 1)).as("v"))
      graft.operators.HeavyHitters.exact(skewed, "v", sketchK = 20, thresholdK = 20)
        .orderBy("value")
    },

    // BIG × BIG fuzzy string join (FuzzyJoin.trigramJoin): supplier
    // names vs a dirty copy (one char deleted at a key-dependent
    // position) matched by trigram Jaccard over DISCRIMINATIVE grams —
    // stop-gram cap 40 removes the 'supplier#0'-style boilerplate
    // every name shares, so candidates come from the rare digit-region
    // grams (posting-list equi-join, never a nested loop). The oracle
    // replays gram extraction, the cap, and the Jaccard arithmetic.
    QueryDef.sql(
      "q_fuzzy_join",
      """WITH l AS (SELECT s_suppkey AS lid, lower(s_name) AS s FROM supplier),
        |r AS (SELECT s_suppkey AS rid,
        |        lower(concat(substr(s_name, 1, (s_suppkey % 10) + 1),
        |                     substr(s_name, (s_suppkey % 10) + 3))) AS s
        |      FROM supplier WHERE s_suppkey % 3 = 0),
        |lg AS (SELECT DISTINCT lid AS id, substr(s, i, 3) AS g
        |       FROM l, UNNEST(range(1, greatest(len(s)-1, 1))) AS t(i)
        |       WHERE len(s) >= 3),
        |rg AS (SELECT DISTINCT rid AS id, substr(s, i, 3) AS g
        |       FROM r, UNNEST(range(1, greatest(len(s)-1, 1))) AS t(i)
        |       WHERE len(s) >= 3),
        |pl AS (SELECT g, COUNT(*) AS c
        |       FROM (SELECT g FROM lg UNION ALL SELECT g FROM rg) GROUP BY g),
        |keep AS (SELECT g FROM pl WHERE c <= 40),
        |lk AS (SELECT lg.* FROM lg JOIN keep USING (g)),
        |rk AS (SELECT rg.* FROM rg JOIN keep USING (g)),
        |ls AS (SELECT id AS left_id, CAST(COUNT(*) AS BIGINT) AS n_a FROM lk GROUP BY id),
        |rs AS (SELECT id AS right_id, CAST(COUNT(*) AS BIGINT) AS n_b FROM rk GROUP BY id),
        |co AS (SELECT lk.id AS left_id, rk.id AS right_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |       FROM lk JOIN rk USING (g) GROUP BY 1, 2)
        |SELECT left_id, right_id, n_common, n_a, n_b,
        |  CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
        |FROM co JOIN ls USING (left_id) JOIN rs USING (right_id)
        |WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5
        |ORDER BY left_id, right_id""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val dirty = sup.filter(col("s_suppkey") % 3 === 0).select(
        col("s_suppkey").as("rid"),
        concat(
          expr("substr(s_name, 1, (s_suppkey % 10) + 1)"),
          expr("substr(s_name, (s_suppkey % 10) + 3)")).as("s"))
      graft.operators.FuzzyJoin.trigramJoin(
          sup, "s_suppkey", "s_name", dirty, "rid", "s",
          threshold = 0.5, n = 3, stopGramCap = 40)
        .orderBy("left_id", "right_id")
    },

    // Time-weighted average per user (telemetry semantics: a value
    // holds until the next event, so it is weighted by its holding
    // interval). Weights are FLOOR-MINUTES: with micros weights the
    // exact weighted sum reaches ~1e18, past double's 2^53 exact-int
    // range, and the two engines' DECIMAL→DOUBLE casts round a ULP
    // apart — minute granularity keeps numerator and denominator
    // exactly representable, so the ONE IEEE division hashes equal.
    // The denominator is the SUM of the same floored weights (not the
    // floored span): weights must sum to the denominator or a constant
    // signal would not average to itself. Per-user window = one keyed
    // shuffle.
    QueryDef.sql(
      "q_rep_time_weighted",
      """WITH w AS (
        |  SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v,
        |    lead(ts) OVER (PARTITION BY user_id
        |                   ORDER BY ts, CAST(value AS DECIMAL(18,2))) AS nts
        |  FROM events),
        |a AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN nts IS NULL THEN 0
        |        ELSE v * ((epoch_us(nts) - epoch_us(ts)) // 60000000) END) AS wsum,
        |    SUM(CASE WHEN nts IS NULL THEN 0
        |        ELSE (epoch_us(nts) - epoch_us(ts)) // 60000000 END) AS span
        |  FROM w GROUP BY user_id)
        |SELECT user_id,
        |  CASE WHEN span = 0 THEN NULL
        |       ELSE CAST(wsum AS DOUBLE) / CAST(span AS DOUBLE) END AS twa
        |FROM a
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("ts"),
          col("value").cast("decimal(18,2)").as("v"))
        .withColumn("nts", lead(col("ts"), 1).over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("v"))))
        .groupBy("user_id")
        .agg(
          sum(when(col("nts").isNull, lit(0).cast("decimal(38,2)"))
            .otherwise(col("v") *
              expr("(unix_micros(nts) - unix_micros(ts)) div 60000000")))
            .as("wsum"),
          sum(when(col("nts").isNull, lit(0L))
            .otherwise(expr("(unix_micros(nts) - unix_micros(ts)) div 60000000")))
            .as("span"))
        .select(col("user_id"),
          when(col("span") === 0, lit(null).cast("double"))
            .otherwise(col("wsum").cast("double") / col("span").cast("double"))
            .as("twa"))
        .orderBy("user_id")
    },

    // Volume anomaly detection: per-type daily counts scored by
    // z-score against the type's own distribution. Mean/variance come
    // from exact integer sums (n, n²) with one fixed expression shape
    // — population variance, correctly-rounded sqrt — so the float
    // scores hash equal.
    QueryDef.sql(
      "q_rep_anomaly",
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type,
        |         CAST(COUNT(*) AS BIGINT) AS days,
        |         CAST(SUM(n) AS BIGINT) AS sn,
        |         CAST(SUM(n * n) AS BIGINT) AS sn2
        |       FROM d GROUP BY 1),
        |z AS (SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.n,
        |        CAST(sn AS DOUBLE) / CAST(days AS DOUBLE) AS mean,
        |        sqrt(CAST(sn2 AS DOUBLE) / CAST(days AS DOUBLE)
        |             - (CAST(sn AS DOUBLE) / CAST(days AS DOUBLE))
        |               * (CAST(sn AS DOUBLE) / CAST(days AS DOUBLE))) AS sd
        |      FROM d JOIN st USING (event_type))
        |SELECT event_type, day, n,
        |  CASE WHEN sd > 0.0 THEN (CAST(n AS DOUBLE) - mean) / sd ELSE 0.0 END AS z,
        |  CASE WHEN sd > 0.0 THEN abs((CAST(n AS DOUBLE) - mean) / sd) > 2.0
        |       ELSE FALSE END AS anomaly
        |FROM z
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val dayCounts = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val st = dayCounts.groupBy("event_type").agg(
        count(lit(1)).as("days"), sum("n").as("sn"),
        sum(col("n") * col("n")).as("sn2"))
      val mean = col("sn").cast("double") / col("days").cast("double")
      val sd = sqrt(col("sn2").cast("double") / col("days").cast("double")
        - mean * mean)
      val z = (col("n").cast("double") - mean) / sd
      dayCounts.join(broadcast(st), "event_type")
        .select(col("event_type"), col("day"), col("n"),
          when(sd > 0.0, z).otherwise(lit(0.0)).as("z"),
          when(sd > 0.0, abs(z) > 2.0).otherwise(lit(false)).as("anomaly"))
        .orderBy("event_type", "day")
    },

    // User-journey transition matrix: per-user events ordered by
    // (ts, event_id), each consecutive pair counted — the Markov-chain
    // view of behavior (and the event-level analogue of the bigram
    // LM). One keyed window shuffle + one pair aggregation.
    QueryDef.sql(
      "q_rep_transitions",
      """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |           FROM events),
        |nx AS (SELECT user_id, event_type AS src,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY us, event_id) AS dst
        |       FROM o)
        |SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM nx WHERE dst IS NOT NULL
        |GROUP BY src, dst
        |ORDER BY src, dst""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val w = W.partitionBy("user_id").orderBy(unix_micros(col("ts")), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst")
        .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
        .orderBy("src", "dst")
    },

    // Ordered funnel with a 12h conversion window per stage: users
    // whose first view leads to a click within 12h leads to a purchase
    // within 12h of that — each stage is a keyed min-aggregate
    // constrained by the previous stage's timestamp (exact integer
    // microseconds), never a row-by-row sequence scan.
    QueryDef.sql(
      "q_rep_funnel",
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(us) AS t2 FROM ev e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us >= t1
        |        AND us <= t1 + 43200000000 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(us) AS t3 FROM ev e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us >= t2
        |        AND us <= t2 + 43200000000 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS name, CAST(COUNT(*) AS BIGINT) AS users FROM v
        |  UNION ALL
        |  SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM p)
        |ORDER BY step""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1"))
      val c = ev.join(v, "user_id")
        .filter(col("event_type") === "click" && col("us") >= col("t1") &&
          col("us") <= col("t1") + 43200000000L)
        .groupBy("user_id").agg(min("us").as("t2"))
      val p = ev.join(c, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("t2") &&
          col("us") <= col("t2") + 43200000000L)
        .groupBy("user_id").agg(min("us").as("t3"))
      val s1 = v.agg(count(lit(1)).as("users"))
        .select(lit(1).as("step"), lit("view").as("name"), col("users"))
      val s2 = c.agg(count(lit(1)).as("users"))
        .select(lit(2).as("step"), lit("view>click").as("name"), col("users"))
      val s3 = p.agg(count(lit(1)).as("users"))
        .select(lit(3).as("step"), lit("view>click>purchase").as("name"), col("users"))
      s1.unionByName(s2).unionByName(s3).orderBy("step")
    },

    // Cohort retention: users bucketed by first-event week, activity
    // counted per week offset — all time arithmetic in exact integer
    // epoch-microsecond division, no date-function dialect drift.
    QueryDef.sql(
      "q_rep_cohort_retention",
      """WITH f AS (SELECT user_id, MIN(epoch_us(ts)) AS fus FROM events
        |           GROUP BY user_id),
        |j AS (SELECT e.user_id,
        |        f.fus // 604800000000 AS cohort_week,
        |        (epoch_us(e.ts) - f.fus) // 604800000000 AS week_offset
        |      FROM events e JOIN f ON f.user_id = e.user_id)
        |SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
        |  CAST(week_offset AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users,
        |  CAST(COUNT(*) AS BIGINT) AS events
        |FROM j GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val w = 604800000000L
      val f = ev.groupBy("user_id").agg(min(unix_micros(col("ts"))).as("fus"))
      ev.join(f, "user_id")
        .select(col("user_id"),
          expr(s"fus div $w").as("cohort_week"),
          expr(s"(unix_micros(ts) - fus) div $w").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("active_users"),
          count(lit(1)).as("events"))
        .orderBy("cohort_week", "week_offset")
    },

    // CUBE: all 2^k grouping combinations in one pass (ROLLUP's
    // hierarchical subset is gated above) — Spark's Expand feeds one
    // aggregate, matching GROUP BY CUBE.
    QueryDef.sql(
      "q_rep_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy("returnflag", "linestatus")
    },

    // Exact interpolated percentiles (both engines use the
    // lower + g*(higher-lower) continuous-quantile formula over
    // identical doubles).
    QueryDef.sql(
      "q_rep_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS p50,
        |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.95) AS p95
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)").as("p50"),
          expr("percentile(CAST(l_quantity AS DOUBLE), 0.95)").as("p95"))
        .orderBy("l_returnflag")
    },

    // Exact-arithmetic Pearson correlation matrix: fixed-point (×100)
    // integer moments — order-free exact sums, one aggregation pass
    // for all 4+10 moments — then one DOUBLE cast + sqrt/divide per
    // cell. The built-in corr() could never hash-gate (its running
    // double sums round in shuffle order); this one does.
    QueryDef.sql(
      "q_rep_corr_matrix", {
        val c = Seq("l_quantity" -> 0, "l_extendedprice" -> 1,
          "l_discount" -> 2, "l_tax" -> 3)
        def cell(i: Int, j: Int): String = {
          val (a, b) = (math.min(i, j), math.max(i, j))
          s"CAST(n*p$a$b - s$i*s$j AS DOUBLE)"
        }
        def corr(i: Int, j: Int): String =
          s"${cell(i, j)} / (sqrt(${cell(i, i)}) * sqrt(${cell(j, j)}))"
        val rows = (for (i <- c.indices; j <- c.indices if i < j) yield
          s"""SELECT '${c(i)._1}' AS x_col, '${c(j)._1}' AS y_col,
             |    CAST(n AS BIGINT) AS n, ${corr(i, j)} AS corr FROM s""".stripMargin)
          .mkString("\n  UNION ALL\n  ")
        s"""WITH t AS (SELECT ${c.map { case (nm, i) =>
              s"CAST(round($nm*100.0) AS HUGEINT) AS x$i" }.mkString(", ")}
           |           FROM lineitem),
           |s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           |        ${c.map { case (_, i) => s"SUM(x$i) AS s$i" }.mkString(", ")},
           |        ${(for (i <- c.indices; j <- c.indices if i <= j)
                      yield s"SUM(x$i*x$j) AS p$i$j").mkString(", ")}
           |      FROM t)
           |SELECT * FROM (
           |  $rows
           |) ORDER BY x_col, y_col""".stripMargin
      }) { (s, d) =>
      graft.operators.Stats.pearsonMatrix(Tables.lineitem(s, d),
          Seq("l_quantity" -> 2, "l_extendedprice" -> 2,
            "l_discount" -> 2, "l_tax" -> 2))
        .orderBy("x_col", "y_col")
    },

    // OLS fit (extendedprice ~ quantity) from the same exact integer
    // moments: slope/intercept/r² with floating point appearing only
    // in the final mirrored op sequence. Distributed exact linear
    // regression — the 1-feature normal equation, no iteration.
    QueryDef.sql(
      "q_rep_ols",
      """WITH t AS (SELECT CAST(round(l_quantity*100.0) AS HUGEINT) AS x0,
        |                  CAST(round(l_extendedprice*100.0) AS HUGEINT) AS x1
        |           FROM lineitem),
        |s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x0) AS s0, SUM(x1) AS s1,
        |        SUM(x0*x0) AS p00, SUM(x0*x1) AS p01, SUM(x1*x1) AS p11
        |      FROM t)
        |SELECT CAST(n AS BIGINT) AS n,
        |  (CAST(n*p01 - s0*s1 AS DOUBLE) / CAST(n*p00 - s0*s0 AS DOUBLE)) * 1.0
        |    AS slope,
        |  ((CAST(s1 AS DOUBLE)
        |      - (CAST(n*p01 - s0*s1 AS DOUBLE) / CAST(n*p00 - s0*s0 AS DOUBLE))
        |        * CAST(s0 AS DOUBLE)) / CAST(n AS DOUBLE)) / 100.0 AS intercept,
        |  (CAST(n*p01 - s0*s1 AS DOUBLE)
        |     / (sqrt(CAST(n*p00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*p11 - s1*s1 AS DOUBLE))))
        |  * (CAST(n*p01 - s0*s1 AS DOUBLE)
        |     / (sqrt(CAST(n*p00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*p11 - s1*s1 AS DOUBLE))))
        |    AS r2
        |FROM s""".stripMargin) { (s, d) =>
      graft.operators.Stats.olsFit(Tables.lineitem(s, d),
        "l_quantity", 2, "l_extendedprice", 2)
    },

    // Per-group OLS — one (extendedprice ~ quantity) trend per return
    // flag, every segment's fit from the single keyed moment pass.
    QueryDef.sql(
      "q_rep_ols_by",
      """WITH t AS (SELECT l_returnflag,
        |             CAST(round(l_quantity*100.0) AS HUGEINT) AS x0,
        |             CAST(round(l_extendedprice*100.0) AS HUGEINT) AS x1
        |           FROM lineitem),
        |s AS (SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
        |        SUM(x0) AS s0, SUM(x1) AS s1,
        |        SUM(x0*x0) AS p00, SUM(x0*x1) AS p01, SUM(x1*x1) AS p11
        |      FROM t GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  (CAST(n*p01 - s0*s1 AS DOUBLE) / CAST(n*p00 - s0*s0 AS DOUBLE)) * 1.0
        |    AS slope,
        |  ((CAST(s1 AS DOUBLE)
        |      - (CAST(n*p01 - s0*s1 AS DOUBLE) / CAST(n*p00 - s0*s0 AS DOUBLE))
        |        * CAST(s0 AS DOUBLE)) / CAST(n AS DOUBLE)) / 100.0 AS intercept,
        |  (CAST(n*p01 - s0*s1 AS DOUBLE)
        |     / (sqrt(CAST(n*p00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*p11 - s1*s1 AS DOUBLE))))
        |  * (CAST(n*p01 - s0*s1 AS DOUBLE)
        |     / (sqrt(CAST(n*p00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*p11 - s1*s1 AS DOUBLE))))
        |    AS r2
        |FROM s
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      graft.operators.Stats.olsFitBy(Tables.lineitem(s, d), Seq("l_returnflag"),
          "l_quantity", 2, "l_extendedprice", 2)
        .orderBy("l_returnflag")
    },

    // Two-feature OLS (extendedprice ~ quantity + discount) by the
    // closed-form normal equation over exact integer moments: the
    // centered cross-moments are HUGEINT/DECIMAL-exact, cast to
    // DOUBLE once, and combined in the identical mirrored sequence
    // (determinant, Cramer solves, intercept, R²).
    QueryDef.sql(
      "q_rep_ols2",
      """WITH t AS (SELECT CAST(round(l_quantity*100.0) AS HUGEINT) AS x0,
        |                  CAST(round(l_discount*100.0) AS HUGEINT) AS x1,
        |                  CAST(round(l_extendedprice*100.0) AS HUGEINT) AS x2
        |           FROM lineitem),
        |s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |        SUM(x0) AS s0, SUM(x1) AS s1, SUM(x2) AS s2,
        |        SUM(x0*x0) AS p00, SUM(x0*x1) AS p01, SUM(x0*x2) AS p02,
        |        SUM(x1*x1) AS p11, SUM(x1*x2) AS p12, SUM(x2*x2) AS p22
        |      FROM t),
        |m AS (SELECT CAST(n AS BIGINT) AS nb,
        |        CAST(n*p00 - s0*s0 AS DOUBLE) AS c00,
        |        CAST(n*p01 - s0*s1 AS DOUBLE) AS c01,
        |        CAST(n*p02 - s0*s2 AS DOUBLE) AS c02,
        |        CAST(n*p11 - s1*s1 AS DOUBLE) AS c11,
        |        CAST(n*p12 - s1*s2 AS DOUBLE) AS c12,
        |        CAST(n*p22 - s2*s2 AS DOUBLE) AS c22,
        |        CAST(s0 AS DOUBLE) AS d0, CAST(s1 AS DOUBLE) AS d1,
        |        CAST(s2 AS DOUBLE) AS d2, CAST(n AS DOUBLE) AS dn
        |      FROM s)
        |SELECT nb AS n,
        |  ((c11*c02 - c01*c12) / (c00*c11 - c01*c01)) * 1.0 AS slope_1,
        |  ((c00*c12 - c01*c02) / (c00*c11 - c01*c01)) * 1.0 AS slope_2,
        |  ((d2 - ((c11*c02 - c01*c12) / (c00*c11 - c01*c01)) * d0
        |       - ((c00*c12 - c01*c02) / (c00*c11 - c01*c01)) * d1) / dn) / 100.0
        |    AS intercept,
        |  (((c11*c02 - c01*c12) / (c00*c11 - c01*c01)) * c02
        |     + ((c00*c12 - c01*c02) / (c00*c11 - c01*c01)) * c12) / c22 AS r2
        |FROM m""".stripMargin) { (s, d) =>
      graft.operators.Stats.olsFit2(Tables.lineitem(s, d),
        "l_quantity", 2, "l_discount", 2, "l_extendedprice", 2)
    },

    // Winsorization (percentile clipping): per-group exact p05/p95
    // bounds, tail clip counts, and the clipped sum (DECIMAL-routed).
    // Two passes, zero data shuffles — the bounds broadcast back onto
    // a scan. Spark percentile ≡ DuckDB quantile_cont bit-exactly.
    QueryDef.sql(
      "q_rep_winsorize",
      """WITH b AS (SELECT l_returnflag,
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.05) AS q_lo,
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.95) AS q_hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, max(b.q_lo) AS q_lo, max(b.q_hi) AS q_hi,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN CAST(l_quantity AS DOUBLE) < b.q_lo THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_clipped_lo,
        |  CAST(SUM(CASE WHEN CAST(l_quantity AS DOUBLE) > b.q_hi THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_clipped_hi,
        |  CAST(SUM(CAST(least(greatest(CAST(l_quantity AS DOUBLE), b.q_lo), b.q_hi)
        |           AS DECIMAL(18,6))) AS DOUBLE) AS sum_clipped
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.operators.Robust.winsorizeStats(
          Tables.lineitem(s, d), "l_quantity", Seq("l_returnflag"), 0.05, 0.95)
        .orderBy("l_returnflag")
    },

    // Median/MAD robust outlier profile per event type: the
    // heavy-tail-safe outlier rule (|x − med| > 3·1.4826·MAD). Three
    // broadcast-back passes, zero data shuffles, every comparison
    // over exact interpolated percentiles.
    QueryDef.sql(
      "q_rep_mad_outliers",
      """WITH m AS (SELECT event_type,
        |    quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
        |  FROM events GROUP BY 1),
        |d2 AS (SELECT e.event_type, CAST(e.value AS DOUBLE) AS v, m.med
        |       FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, max(med) AS med,
        |         quantile_cont(abs(v - med), 0.5) AS mad
        |       FROM d2 GROUP BY 1)
        |SELECT e.event_type, max(md.med) AS med, max(md.mad) AS mad,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN md.mad > 0 AND
        |                     abs(CAST(e.value AS DOUBLE) - md.med) > (3.0 * 1.4826) * md.mad
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN md USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.operators.Robust.madOutlierStats(
          Tables.events(s, d), "value", Seq("event_type"), 3.0)
        .orderBy("event_type")
    },

    // Fixed-width histogram (distribution reporting without a sort):
    // bucket = floor(x / width), top bucket clamped — one map-side-
    // combined aggregate, deterministic (IEEE divide + floor are
    // exact), vs percentile's per-group value sort.
    // KMV distinct-count sketch vs exact COUNT(DISTINCT) per group:
    // the md5-derived 48-bit hash family makes the k-minimum-values
    // estimate BIT-REPRODUCIBLE in the oracle (unlike any native
    // approx_count_distinct) — the oracle ranks distinct hashes per
    // group and replays floor((k-1)·2^48 / h_k) exactly.
    QueryDef.sql(
      "q_agg_kmv_distinct",
      """WITH h AS (SELECT DISTINCT o_orderpriority,
        |             ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |           FROM orders),
        |rk AS (SELECT o_orderpriority, h,
        |         row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn,
        |         COUNT(*) OVER (PARTITION BY o_orderpriority) AS nd
        |       FROM h),
        |est AS (SELECT o_orderpriority,
        |          CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS BIGINT)
        |               ELSE CAST(floor((CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |                    / CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE)) AS BIGINT)
        |          END AS kmv_estimate
        |        FROM rk GROUP BY o_orderpriority),
        |ex AS (SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact
        |       FROM orders GROUP BY o_orderpriority)
        |SELECT est.o_orderpriority, est.kmv_estimate, ex.n_exact
        |FROM est JOIN ex USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority").agg(
          graft.functions.KmvDistinct.kmvDistinct(col("o_custkey"), 64)
            .as("kmv_estimate"),
          countDistinct(col("o_custkey")).as("n_exact"))
        .orderBy("o_orderpriority")
    },

    // KMV sketch ALGEBRA: cross-set overlap from STORED minima arrays
    // — union sketch (k smallest of the merged distinct hashes ==
    // exactly the union's own sketch), distinct-union estimate,
    // k-minima Jaccard (Beyer et al. SIGMOD'07: fraction of the
    // union sketch's minima present in both), and the intersection
    // estimate jaccard·union. The customer sets behind each order
    // priority genuinely overlap, so the estimates are non-trivial;
    // every step is builtin array arithmetic over the same Portable
    // hashes, replayed list-for-list by the oracle. At 100 TB this is
    // the contamination-rate / audience-overlap profile computed from
    // sketch rows with NO rescan of either table.
    QueryDef.sql(
      "q_agg_kmv_setops",
      """WITH h AS (SELECT DISTINCT o_orderpriority AS p,
        |             ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |           FROM orders),
        |rk AS (SELECT p, h, row_number() OVER (PARTITION BY p ORDER BY h) AS rn FROM h),
        |mins AS (SELECT p, list(h ORDER BY h) AS st FROM rk WHERE rn <= 256 GROUP BY p),
        |pairs AS (SELECT a.p AS pa, b.p AS pb, a.st AS sa, b.st AS sb
        |          FROM mins a JOIN mins b ON a.p < b.p),
        |u AS (SELECT pa, pb, sa, sb,
        |        list_sort(list_distinct(sa || sb))[1:256] AS un
        |      FROM pairs),
        |calc AS (SELECT pa, pb,
        |    CASE WHEN len(un) < 256 THEN CAST(len(un) AS BIGINT)
        |         ELSE CAST(floor((CAST(255 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |              / CAST(un[256] AS DOUBLE)) AS BIGINT)
        |    END AS union_est,
        |    CAST(len(list_filter(un,
        |           x -> list_contains(sa, x) AND list_contains(sb, x))) AS DOUBLE)
        |      / CAST(len(un) AS DOUBLE) AS jaccard_est
        |  FROM u)
        |SELECT pa, pb, union_est, jaccard_est,
        |  CAST(floor(jaccard_est * CAST(union_est AS DOUBLE)) AS BIGINT) AS inter_est
        |FROM calc
        |ORDER BY pa, pb""".stripMargin) { (s, d) =>
      import graft.functions.KmvDistinct._
      val k = 256
      val st = Tables.orders(s, d).groupBy(col("o_orderpriority").as("p"))
        .agg(kmvMinima(col("o_custkey"), k).as("st"))
      val pairs = st.select(col("p").as("pa"), col("st").as("sa"))
        .join(st.select(col("p").as("pb"), col("st").as("sb")), col("pa") < col("pb"))
      pairs.select(col("pa"), col("pb"),
          kmvEstimate(kmvUnion(col("sa"), col("sb"), k), k).as("union_est"),
          kmvJaccard(col("sa"), col("sb"), k).as("jaccard_est"),
          kmvIntersect(col("sa"), col("sb"), k).as("inter_est"))
        .orderBy("pa", "pb")
    },

    // Fixed-boundary histogram SKETCH (TypedImperativeAggregate,
    // graft.functions.FixedHistogram): per-group state is 42 longs
    // regardless of group size — one row per group per map partition
    // on the wire, vs one row per (group, bucket) for the groupBy
    // formulation below. The gate explodes the counts array and the
    // oracle re-derives every (slot, cnt) pair from the same exact
    // bucket map (IEEE divide + floor), pinning the sketch bit-exactly.
    QueryDef.sql(
      "q_agg_hist_sketch",
      """WITH b AS (SELECT event_type,
        |    CASE WHEN value < 0.0 THEN 0
        |         WHEN value >= 400.0 THEN 41
        |         ELSE LEAST(CAST(FLOOR((value - 0.0) / 10.0) AS INT) + 1, 40) END AS slot
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, slot, COUNT(*) AS cnt
        |FROM b GROUP BY event_type, slot
        |ORDER BY event_type, slot""".stripMargin) { (s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(graft.functions.Histograms.histFixed(col("value"), 0.0, 10.0, 40).as("h"))
        .select(col("event_type"), posexplode(col("h")).as(Seq("slot", "cnt")))
        .filter(col("cnt") > 0)
        .orderBy("event_type", "slot")
    },

    // Auto-ranged per-group histogram: bounds DERIVED from each
    // group's own min/max (exact, order-free aggregates), width one
    // shared IEEE division, bucket map identical to hist_fixed's —
    // the histogram(col, n) convenience without a priori bounds.
    // Bounds join broadcasts (group-count rows); the count shuffle is
    // per populated (group, slot). Data-derived doubles stay
    // oracle-replayable because both engines run the same op
    // sequence on the same min/max.
    QueryDef.sql(
      "q_agg_hist_auto",
      """WITH f AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
        |      FROM f GROUP BY 1),
        |w AS (SELECT event_type, lo, (hi - lo) / CAST(8 AS DOUBLE) AS width FROM b),
        |s AS (SELECT f.event_type,
        |        CASE WHEN w.width = 0 THEN 1
        |             WHEN f.value < w.lo THEN 0
        |             WHEN f.value >= w.lo + CAST(8 AS DOUBLE) * w.width THEN 9
        |             ELSE LEAST(CAST(FLOOR((f.value - w.lo) / w.width) AS INT) + 1, 8)
        |        END AS slot,
        |        w.lo, w.width
        |      FROM f JOIN w USING (event_type))
        |SELECT event_type, slot, COUNT(*) AS cnt, lo, width
        |FROM s GROUP BY event_type, slot, lo, width
        |ORDER BY event_type, slot""".stripMargin) { (s, d) =>
      graft.functions.Histograms.autoHistogram(
          Tables.events(s, d), Seq("event_type"), "value", 8)
        .orderBy("event_type", "slot")
    },

    // Quantile estimates read off the histogram sketch — the constant-
    // memory alternative to exact percentile's per-group value sort:
    // at 100 TB the sketch agg ships 42 longs per group while
    // percentile() shuffles every value. Both engines interpolate
    // from their own independently-derived counts with the identical
    // single-rounding formula, so even the DOUBLE estimates hash-match.
    QueryDef.sql(
      "q_agg_hist_quantile",
      """WITH b AS (SELECT event_type,
        |    CASE WHEN value < 0.0 THEN 0
        |         WHEN value >= 400.0 THEN 41
        |         ELSE LEAST(CAST(FLOOR((value - 0.0) / 10.0) AS INT) + 1, 40) END AS slot
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, slot, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |w AS (SELECT event_type, slot, cnt,
        |        SUM(cnt) OVER (PARTITION BY event_type) AS total,
        |        SUM(cnt) OVER (PARTITION BY event_type ORDER BY slot
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM c),
        |q50 AS (SELECT event_type,
        |          0.0 + 10.0 * (CAST(slot - 1 AS DOUBLE)
        |            + (0.5 * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
        |              / CAST(cnt AS DOUBLE)) AS p50
        |        FROM w
        |        WHERE CAST(cum AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
        |        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY slot) = 1),
        |q90 AS (SELECT event_type,
        |          0.0 + 10.0 * (CAST(slot - 1 AS DOUBLE)
        |            + (0.9 * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
        |              / CAST(cnt AS DOUBLE)) AS p90
        |        FROM w
        |        WHERE CAST(cum AS DOUBLE) >= 0.9 * CAST(total AS DOUBLE)
        |        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY slot) = 1)
        |SELECT q50.event_type AS event_type, q50.p50, q90.p90
        |FROM q50 JOIN q90 ON q50.event_type = q90.event_type
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val h = Tables.events(s, d).groupBy("event_type")
        .agg(graft.functions.Histograms.histFixed(col("value"), 0.0, 10.0, 40).as("h"))
      graft.functions.Histograms.quantilesFromHistogram(
          h, Seq("event_type"), "h", 0.0, 10.0, Seq("p50" -> 0.5, "p90" -> 0.9))
        .orderBy("event_type")
    },

    // UNKNOWN-RANGE quantile sketch (KLL/MRL TypedImperativeAggregate,
    // graft.functions.KllQuantiles): the distribution profile
    // hist_fixed cannot give without a priori [lo, width] and exact
    // percentile cannot give without shuffling every value. The gate
    // pins the sketch's EXACT regime (groups below the k capacity —
    // no compaction, any partitioning/merge order): read-off is
    // selection at rank ceil(p·n) over the value multiset, which the
    // oracle replays verbatim with a row_number pick. Probabilities
    // are DYADIC (exact doubles) so ceil(p·n) can never straddle an
    // ulp between engines. The compacted regime's H·n/k rank-error
    // bound and weight conservation are KllSpec's.
    QueryDef.sql(
      "q_agg_kll_quantile",
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
      Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0)
        .groupBy("o_orderpriority")
        .agg(graft.functions.Kll.kllQuantilesExact(
          col("o_totalprice"), 65536, Seq(0.25, 0.5, 0.75)).as("q"))
        .select(col("o_orderpriority"), posexplode(col("q")).as(Seq("qi", "qv")))
        .orderBy("o_orderpriority", "qi")
    },

    // KLL incremental maintenance: per-(priority, batch-half) sketch
    // STATES are built and stored as binary rows (KllSketchAgg), then
    // the profile refresh aggregates ONLY those sketch rows
    // (KllMergeQuantiles) — data is never rescanned. In the exact
    // regime the merged ladder is the union multiset, so the merged
    // read-off must equal the full-data rank pick the SAME oracle as
    // q_agg_kll_quantile performs — which is exactly what's gated:
    // build-store-merge-refresh ≡ direct single-pass.
    QueryDef.sql(
      "q_agg_kll_incremental",
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
      val perBatch = Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0)
        .withColumn("half", (col("o_orderkey") % 2).cast("int"))
        .groupBy("o_orderpriority", "half")
        .agg(graft.functions.Kll.kllSketch(col("o_totalprice"), 65536).as("state"))
        // the stored-sketch table a nightly job would persist
        .localCheckpoint(false)
      perBatch
        .groupBy("o_orderpriority")
        .agg(graft.functions.Kll.kllMergeExact(
          col("state"), 65536, Seq(0.25, 0.5, 0.75)).as("q"))
        .select(col("o_orderpriority"), posexplode(col("q")).as(Seq("qi", "qv")))
        .orderBy("o_orderpriority", "qi")
    },

    // Distribution drift off the histogram sketches: each event
    // type's value distribution vs the 'view' baseline, as exact
    // integer L1 (Σ|cA·N_B − cB·N_A| — cross-multiplied counts, no
    // float reduction anywhere) and the total-variation distance
    // L1/(2·N_A·N_B). The drift check between a training snapshot
    // and a serving window costs two 42-long arrays per pair — the
    // raw data is never rescanned.
    QueryDef.sql(
      "q_agg_hist_drift",
      """WITH b AS (SELECT event_type,
        |    CASE WHEN value < 0.0 THEN 0
        |         WHEN value >= 400.0 THEN 41
        |         ELSE LEAST(CAST(FLOOR((value - 0.0) / 10.0) AS INT) + 1, 40) END AS slot
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, slot, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
        |spine AS (SELECT et.event_type, CAST(r.range AS INT) AS slot
        |          FROM (SELECT DISTINCT event_type FROM c WHERE event_type <> 'view') et
        |          CROSS JOIN range(0, 42) r),
        |fa AS (SELECT s.event_type, s.slot, coalesce(c.cnt, 0) AS ca
        |       FROM spine s LEFT JOIN c
        |         ON c.event_type = s.event_type AND c.slot = s.slot),
        |fb AS (SELECT s.slot, coalesce(c.cnt, 0) AS cb
        |       FROM (SELECT DISTINCT slot FROM spine) s
        |       LEFT JOIN c ON c.event_type = 'view' AND c.slot = s.slot),
        |l AS (SELECT fa.event_type,
        |        CAST(SUM(abs(fa.ca * nb.n - fb.cb * na.n)) AS BIGINT) AS l1,
        |        max(na.n) AS na, max(nb.n) AS nb
        |      FROM fa JOIN fb USING (slot)
        |      JOIN n na ON na.event_type = fa.event_type
        |      JOIN (SELECT n FROM n WHERE event_type = 'view') nb ON true
        |      GROUP BY fa.event_type)
        |SELECT event_type, l1,
        |  CAST(l1 AS DOUBLE) / (2.0 * (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS tvd
        |FROM l ORDER BY event_type""".stripMargin) { (s, d) =>
      val h = Tables.events(s, d).groupBy("event_type")
        .agg(graft.functions.Histograms.histFixed(col("value"), 0.0, 10.0, 40).as("h"))
      val base = h.filter(col("event_type") === "view").select(col("h").as("hb"))
      h.filter(col("event_type") =!= "view")
        .crossJoin(broadcast(base))
        .select(col("event_type"),
          graft.functions.Histograms.l1Drift(col("h"), col("hb")).as("l1"),
          graft.functions.Histograms.tvDistance(col("h"), col("hb")).as("tvd"))
        .orderBy("event_type")
    },

    QueryDef.sql(
      "q_rep_histogram",
      """SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS INT) AS bucket,
        |  COUNT(*) AS n,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(least(floor(col("o_totalprice") / 50000.0), lit(9)).cast("int")
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
        .orderBy("bucket")
    })
}
