package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.Sources

/** Driver-checked round trips through the file sinks (SURVEY.md §2.1
  * S1/S3/S9/S11/S12): each query writes a table through the sink under
  * test, reads it back through the matching scan, and aggregates; the
  * DuckDB oracle computes the same aggregate from the ORIGINAL parquet.
  * Any loss in the sink/scan round trip (types, precision, timestamp
  * formats, partition-column restoration) breaks the value hash. */
object SourceQueries {

  /** Scratch dir inside the repo (the driver may not allow writes
    * elsewhere); per-SF so sf0.01 and sf0.1 runs don't collide. */
  private def scratch(sfDir: String, tag: String): String =
    s"/root/repo/target/roundtrip/${new java.io.File(sfDir).getName}_$tag"

  val defs: Seq[QueryDef] = Seq(

    // S1 CSV scan + S9/S11 CSV sink: orders -> CSV -> read (explicit
    // schema) -> aggregate. Exercises double, timestamp and string
    // round-trips through text serialization.
    QueryDef.sql(
      "q_source_csv_roundtrip",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS max_day
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val dir = scratch(d, "csv")
      Sources.writeCsv(o, dir)
      Sources.readCsv(s, dir, Some(o.schema))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
          max(to_date(col("o_orderdate"))).cast("string").as("max_day"))
        .orderBy("o_orderstatus")
    },

    // ORC sink + scan round trip (the columnar alternative container
    // format Spark ships natively): full-width orders through ORC,
    // aggregate vs the parquet-derived oracle. Types, timestamps and
    // column order must survive the container switch exactly.
    QueryDef.sql(
      "q_source_orc_roundtrip",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_day
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val dir = scratch(d, "orc")
      o.write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
          min(to_date(col("o_orderdate"))).cast("string").as("min_day"))
        .orderBy("o_orderpriority")
    },

    // ANALYZE-shape per-column statistics (row/null/distinct counts,
    // native-typed min/max rendered as strings).
    QueryDef.sql(
      "q_table_stats", {
        def one(c: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(MIN($c) AS VARCHAR) AS min_s,
             |  CAST(MAX($c) AS VARCHAR) AS max_s
             |FROM orders""".stripMargin
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
          .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }) { (s, d) =>
      graft.operators.TableStats.columnStats(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("col_name")
    },

    // S12 per-entity JSON sink + S3 JSON scan: orders partitioned by
    // priority -> JSONL -> read back -> per-partition aggregate. The
    // partition column is restored from the directory layout.
    QueryDef.sql(
      "q_source_json_roundtrip",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
      val dir = scratch(d, "json")
      Sources.writePartitionedJson(o, dir, "o_orderpriority")
      Sources.readJsonLines(s, dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("o_orderpriority")
    })
}
