package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Core scan/filter/aggregate/join/top-k queries (SURVEY.md §2.1, §2.5,
  * §2.6 W4, §2.7). Shapes mirror the reference's reporting SQL
  * (`database/init-scripts/01-schema.sql` helpers) re-expressed over the
  * driver's TPC-H-ish testdata. */
object CoreQueries {

  /** Exact-decimal sum of a double column, returned as DOUBLE. */
  private def dsum(c: String, scale: Int = 2) =
    sum(col(c).cast(s"decimal(18,$scale)")).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // A1/A4-shape pricing summary (scan + filter + hash agg, map-side
    // partial agg is free; filter pushed to parquet).
    QueryDef.sql(
      "q_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,3)) - CAST(l_discount AS DECIMAL(8,3)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(8,3)") - col("l_discount").cast("decimal(8,3)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // J2-shape dimension join: fact ⋈ two tiny dims — both broadcast
    // (centers table in the reference is 83 rows; nation/region likewise).
    QueryDef.sql(
      "q_join_dims",
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"), dsum("c_acctbal").as("total_acctbal"))
        .orderBy("r_name", "n_name")
    },

    // W4: recency/top-k — Spark plans a TakeOrderedAndProject (no full
    // sort, no shuffle of the whole table).
    QueryDef.sql(
      "q_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // J6 anti-join (reference: exclusion filters / orphan detection,
    // `table-loader/services/loader.py:125-171`).
    QueryDef.sql(
      "q_anti_customers_no_urgent",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // J6 semi-join (reference: batched keyed lookup S8 re-expressed
    // set-based, `load_strategies.py:501-586`).
    QueryDef.sql(
      "q_semi_customers_with_orders",
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // Salted equi-join under the hash gate: a synthetically skewed key
    // (70% of lineitem lands on key 0) joined through
    // SkewJoin.saltedEquiJoin — the oracle is the PLAIN join, proving
    // salting is result-transparent while the hot key spreads over 8
    // shuffle buckets.
    QueryDef.sql(
      "q_skew_salted",
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
        |              ELSE CAST(l_orderkey % 25 AS INT) END AS k
        |  FROM lineitem)
        |SELECT n.n_name, COUNT(*) AS n
        |FROM li JOIN nation n ON n.n_nationkey = li.k
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select(
        when(col("l_orderkey") % 10 < 7, 0)
          .otherwise((col("l_orderkey") % 25).cast("int")).as("k"),
        col("l_orderkey"))
      val build = Tables.nation(s, d)
        .select(col("n_nationkey").cast("int").as("k"), col("n_name"))
      graft.operators.SkewJoin.saltedEquiJoin(li, build, "k", salt = 8,
          probeSaltSource = col("l_orderkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
        .orderBy("n_name")
    },

    // Bloom-prefiltered semi-join (BloomJoin.semiJoin): probe rows are
    // dropped against the build side's broadcast bloom BEFORE the
    // shuffle; false positives die in the exact semi-join, so the
    // oracle is the plain IN-subquery — bloom bit patterns can't leak
    // into the result (no false negatives), only into shuffle volume.
    QueryDef.sql(
      "q_bloom_semi",
      """WITH sel AS (SELECT o_orderkey FROM orders
        |             WHERE o_orderstatus = 'P' AND o_totalprice > 400000)
        |SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM sel)
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      val sel = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "P" && col("o_totalprice") > 400000)
      graft.operators.BloomJoin.semiJoin(
          Tables.lineitem(s, d), "l_orderkey", sel, "o_orderkey",
          expectedItems = 100000L, fpp = 0.01)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey")
    },

    // Schema-evolution union (SchemaEvolution.unionEvolved): three
    // "export generations" of orders — ints that widened to longs,
    // prices that moved to DECIMAL, a column added mid-history —
    // reconciled onto the widened schema with typed nulls for the
    // missing column. The oracle is DuckDB's UNION ALL BY NAME with
    // the same casts.
    QueryDef.sql(
      "q_schema_evolution",
      """SELECT * FROM (
        |  SELECT o_orderkey, CAST(o_custkey AS INT) AS cust,
        |         CAST(o_totalprice AS DOUBLE) AS price,
        |         CAST(NULL AS VARCHAR) AS status
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS cust,
        |         CAST(o_totalprice AS DOUBLE) AS price,
        |         CAST(NULL AS VARCHAR) AS status
        |  FROM orders WHERE o_orderkey % 3 = 1
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS cust,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |         o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 3 = 2)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import graft.operators.SchemaEvolution
      val o = Tables.orders(s, d)
      val gen1 = o.filter(col("o_orderkey") % 3 === 0).select(
        col("o_orderkey"), col("o_custkey").cast("int").as("cust"),
        col("o_totalprice").as("price"))
      val gen2 = o.filter(col("o_orderkey") % 3 === 1).select(
        col("o_orderkey"), col("o_custkey").as("cust"),
        col("o_totalprice").as("price"))
      val gen3 = o.filter(col("o_orderkey") % 3 === 2).select(
        col("o_orderkey"), col("o_custkey").as("cust"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderstatus").as("status"))
      SchemaEvolution.unionEvolved(Seq(gen1, gen2, gen3))
        .withColumn("price", col("price").cast("double"))
        .orderBy("o_orderkey")
    })
}
