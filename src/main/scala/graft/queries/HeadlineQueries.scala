package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Classic multi-join analytical shapes (TPC-H Q3/Q5/Q10 analogs on
  * the synthetic schema) — the headline BENCH queries exercising
  * join-order, broadcast selection, partial aggregation and top-k
  * together. All decimal-exact per the QueryDef contract. */
object HeadlineQueries {

  private def revenue = sum(
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(8,3)") - col("l_discount").cast("decimal(8,3)")))
    .cast("double")

  val defs: Seq[QueryDef] = Seq(

    // Q3 shape: shipping priority.
    QueryDef.sql(
      "q_h3_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,3)) - CAST(l_discount AS DECIMAL(8,3)))) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 20""".stripMargin) { (s, d) =>
      val cutoff = java.sql.Timestamp.valueOf("1995-03-15 00:00:00")
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d).filter(col("o_orderdate") < cutoff),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(20)
    },

    // Q5 shape: revenue by nation for one region (5-way join, two
    // broadcast dims, co-keyed fact joins).
    QueryDef.sql(
      "q_h5_region_revenue",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,3)) - CAST(l_discount AS DECIMAL(8,3)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      // Join ORDER is chosen by what the optimizer cannot see (r18,
      // guide §3 — no CBO stats, Catalyst keeps the written order):
      // the region filter keeps 1/5 of nations, so suppliers shrink
      // 5x BEFORE touching the fact tables; lineitem joins the
      // filtered suppliers first (5x fewer surviving lineitem rows
      // into every later exchange), then orders, then customer — the
      // same inner-join tree re-rooted, conjuncts preserved, result
      // set identical (and the revenue SUM is exact DECIMAL, so
      // reassociation cannot move a bit).
      val asiaSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q10 shape: returned-item reporting (join + agg + top-k).
    QueryDef.sql(
      "q_h10_returned_items",
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,3)) - CAST(l_discount AS DECIMAL(8,3)))) AS DOUBLE) AS revenue,
        |  n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 50""".stripMargin) { (s, d) =>
      // Aggregate BEFORE attaching customer attributes (r18, guide
      // §2.3 "aggregate before you shuffle" + §3.3): the pre-r18 plan
      // dragged c_name strings through the orders x lineitem bulk and
      // aggregated last; now revenue folds to <=1 row per customer on
      // the fact side first, and the (unique-keyed) customer join
      // attaches names to the aggregated rows — identical groups and
      // sums (c_name/n_name are functionally dependent on c_custkey,
      // and the revenue SUM is exact DECIMAL, so the fold order cannot
      // move a bit).
      val perCust = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
            .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(revenue.as("revenue"))
      Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
        .join(perCust, col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(50)
    })
}
