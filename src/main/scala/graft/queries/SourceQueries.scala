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

  /** `q_merge_keyed_lookup`'s BUILD phase — seed write + MERGE publish
    * + key-bloom sidecar build — split out (r18, VERDICT r17 #7) so
    * the scale ledger can time it separately from the lookup: the gate
    * row rebuilds the table every rep, so its sf10 wall and shuffle
    * are publish cost, not lookup cost. Returns the table dir. */
  private[graft] def keyedLookupBuild(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val cfg = graft.types.TableConfig("orders", Seq("o_orderkey"), Seq("o_orderdate"))
    val base = Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority", "o_orderdate")
      .withColumn("p", (col("o_orderkey") % 4).cast("int"))
    val current = base.filter(col("o_orderkey") % 7 =!= 0)
    val incoming = base
      .filter(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 4 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 11 === 0, concat(lit("X-"), col("o_orderpriority")))
          .otherwise(col("o_orderpriority")))
      .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY"))
    val dir = scratch(d, "pmergek")
    current.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("p").parquet(dir)
    Sources.publishMergePartitioned(s, dir, incoming, cfg, "p")
    Sources.indexBatchKeys(s, dir, "o_orderkey")
    dir
  }

  /** `q_merge_keyed_lookup`'s LOOKUP phase over a [[keyedLookupBuild]]
    * table: the bloom-sidecar-pruned keyed read alone. */
  private[graft] def keyedLookupRead(s: org.apache.spark.sql.SparkSession,
      d: String, dir: String): org.apache.spark.sql.DataFrame = {
    val base = Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority", "o_orderdate")
      .withColumn("p", (col("o_orderkey") % 4).cast("int"))
    // keys as a FRAME: the read picks point-lookup (sidecar-pruned)
    // vs bulk (bloom semi-join) itself via a BOUNDED probe — no
    // data-proportional collect anywhere in the harness
    val keys = base.filter(col("o_orderkey") % 97 === 0).select("o_orderkey")
    Sources.readMergePartitionedKeyedFrame(s, dir, "p", "o_orderkey", keys)
      .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority",
        "o_orderdate", "p")
      .orderBy("o_orderkey")
  }

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

    // Small-file compaction under the gate: publish a fragmented
    // snapshot (32 files), compact to one through the versioned
    // pointer swap, read the live version back row-for-row. Any loss
    // or duplication in the rewrite breaks the value hash.
    QueryDef.sql(
      "q_source_compaction",
      """SELECT doc_id, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val dir = scratch(d, "compact")
      val docs = Tables.documents(s, d).select("doc_id", "n_chars")
      Sources.publishSnapshot(docs.repartition(32), dir)
      Sources.compact(s, dir, targetBytes = Long.MaxValue)
      Sources.readSnapshot(s, dir).orderBy("doc_id")
    },

    // S6/S7 JDBC under the oracle: supplier rows loaded into an
    // EMBEDDED Derby database (in-JVM, Spark ships the driver), read
    // back through the pushdown JDBC scan — the whole
    // parquet → JDBC insert → WHERE-pushed scan round trip is
    // hash-gated against DuckDB re-deriving the same rows from the
    // parquet table directly. Derby upper-cases identifiers, so the
    // result columns are re-aliased to the oracle's names.
    QueryDef.sql(
      "q_jdbc_roundtrip",
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier WHERE s_nationkey < 13
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val url = s"jdbc:derby:memory:graft_${new java.io.File(d).getName};create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.execute("DROP TABLE supplier")
        catch { case _: java.sql.SQLException => } // first run: no table
        st.execute("CREATE TABLE supplier (s_suppkey BIGINT, " +
          "s_name VARCHAR(64), s_nationkey INT, s_acctbal DOUBLE)")
        val ps = conn.prepareStatement("INSERT INTO supplier VALUES (?,?,?,?)")
        Tables.supplier(s, d)
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
          .collect().foreach { r => // dimension-sized: 1k rows at sf0.1
            ps.setLong(1, r.getAs[Long]("s_suppkey"))
            ps.setString(2, r.getAs[String]("s_name"))
            ps.setInt(3, r.getAs[Int]("s_nationkey"))
            ps.setDouble(4, r.getAs[Double]("s_acctbal"))
            ps.addBatch()
          }
        ps.executeBatch()
      } finally conn.close()
      Sources.readJdbc(s, url, "supplier")
        .filter(col("s_nationkey") < 13) // pushed into Derby's WHERE
        .select(col("s_suppkey").as("s_suppkey"), col("s_name").as("s_name"),
          col("s_nationkey").as("s_nationkey"), col("s_acctbal").as("s_acctbal"))
        .orderBy("s_suppkey")
    },

    // Partitioned MERGE under the gate: seed a p=o_orderkey%4
    // partitioned table with `current`, merge an incoming batch that
    // touches ONLY partitions 1-3 (dynamic partition overwrite), read
    // the whole table back. Partition 0 must survive untouched,
    // partitions 1-3 must hold the full-join merge result (update /
    // insert / orphaned / unchanged, immutable o_orderdate kept).
    QueryDef.sql(
      "q_merge_partitioned",
      """WITH incoming AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority,
        |    o_orderdate + INTERVAL 1 DAY AS o_orderdate
        |  FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 4 <> 0),
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
        |  FROM incoming i FULL JOIN (SELECT * FROM cur WHERE o_orderkey % 4 <> 0) c
        |    ON i.o_orderkey = c.o_orderkey),
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
        |  CASE WHEN status IN ('insert','update') THEN i_op ELSE c_op END AS o_orderpriority,
        |  CASE WHEN status = 'insert' THEN i_od ELSE c_od END AS o_orderdate,
        |  CAST(o_orderkey % 4 AS INT) AS p
        |FROM cls
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority, o_orderdate,
        |  CAST(0 AS INT) AS p
        |FROM cur WHERE o_orderkey % 4 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val cfg = graft.types.TableConfig("orders", Seq("o_orderkey"), Seq("o_orderdate"))
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority", "o_orderdate")
        .withColumn("p", (col("o_orderkey") % 4).cast("int"))
      val current = base.filter(col("o_orderkey") % 7 =!= 0)
      val incoming = base
        .filter(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 4 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 11 === 0, concat(lit("X-"), col("o_orderpriority")))
            .otherwise(col("o_orderpriority")))
        .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY"))
      val dir = scratch(d, "pmerge")
      // static overwrite resets the table dir between runs
      current.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("p").parquet(dir)
      Sources.publishMergePartitioned(s, dir, incoming, cfg, "p")
      Sources.readMergePartitioned(s, dir, "p")
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority",
          "o_orderdate", "p")
        .orderBy("o_orderkey")
    },

    // Bloom-skipped keyed lookup on the merge table under the gate:
    // same seed + merge as q_merge_partitioned, then indexBatchKeys
    // builds the per-batch-dir `_keybloom` sidecars and the keyed
    // reader answers a point-lookup set (o_orderkey % 97 = 0) while
    // skipping every batch dir whose filter excludes all keys. The
    // oracle replays the merge and applies the same key predicate —
    // the Bloom path must be result-identical to scan-then-filter.
    QueryDef.sql(
      "q_merge_keyed_lookup",
      """WITH incoming AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority,
        |    o_orderdate + INTERVAL 1 DAY AS o_orderdate
        |  FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 4 <> 0),
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
        |  FROM incoming i FULL JOIN (SELECT * FROM cur WHERE o_orderkey % 4 <> 0) c
        |    ON i.o_orderkey = c.o_orderkey),
        |cls AS (
        |  SELECT *,
        |    CASE WHEN NOT ex_p THEN 'insert' WHEN NOT in_p THEN 'orphaned'
        |         WHEN (i_tp IS DISTINCT FROM c_tp) OR (i_os IS DISTINCT FROM c_os)
        |              OR (i_op IS DISTINCT FROM c_op) THEN 'update'
        |         ELSE 'unchanged' END AS status
        |  FROM j)
        |SELECT * FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN status IN ('insert','update') THEN i_tp ELSE c_tp END AS o_totalprice,
        |    CASE WHEN status IN ('insert','update') THEN i_os ELSE c_os END AS o_orderstatus,
        |    CASE WHEN status IN ('insert','update') THEN i_op ELSE c_op END AS o_orderpriority,
        |    CASE WHEN status = 'insert' THEN i_od ELSE c_od END AS o_orderdate,
        |    CAST(o_orderkey % 4 AS INT) AS p
        |  FROM cls
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority, o_orderdate,
        |    CAST(0 AS INT) AS p
        |  FROM cur WHERE o_orderkey % 4 = 0) AS u
        |WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      keyedLookupRead(s, d, keyedLookupBuild(s, d))
    },

    // Merge-table compaction under the gate: replay the
    // q_merge_partitioned merge, COMPACT the table (live state
    // rewritten into one batch dir, forward-only publish), read back.
    // The oracle is the uncompacted merge result — compaction must be
    // content-identical, hash-for-hash.
    QueryDef.sql(
      "q_merge_compacted",
      """WITH incoming AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority,
        |    o_orderdate + INTERVAL 1 DAY AS o_orderdate
        |  FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 4 <> 0),
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
        |  FROM incoming i FULL JOIN (SELECT * FROM cur WHERE o_orderkey % 4 <> 0) c
        |    ON i.o_orderkey = c.o_orderkey),
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
        |  CASE WHEN status IN ('insert','update') THEN i_op ELSE c_op END AS o_orderpriority,
        |  CASE WHEN status = 'insert' THEN i_od ELSE c_od END AS o_orderdate,
        |  CAST(o_orderkey % 4 AS INT) AS p
        |FROM cls
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority, o_orderdate,
        |  CAST(0 AS INT) AS p
        |FROM cur WHERE o_orderkey % 4 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val cfg = graft.types.TableConfig("orders", Seq("o_orderkey"), Seq("o_orderdate"))
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority", "o_orderdate")
        .withColumn("p", (col("o_orderkey") % 4).cast("int"))
      val current = base.filter(col("o_orderkey") % 7 =!= 0)
      val incoming = base
        .filter(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 4 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 11 === 0, concat(lit("X-"), col("o_orderpriority")))
            .otherwise(col("o_orderpriority")))
        .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY"))
      val dir = scratch(d, "pmergec")
      current.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("p").parquet(dir)
      Sources.publishMergePartitioned(s, dir, incoming, cfg, "p")
      Sources.compactMergePartitioned(s, dir, "p")
      Sources.readMergePartitioned(s, dir, "p")
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority",
          "o_orderdate", "p")
        .orderBy("o_orderkey")
    },

    // Zone-map range scan on the merge table under the gate: same
    // seed + merge as q_merge_partitioned, then indexBatchStats
    // builds per-batch-dir min/max `_zonemap` sidecars and the range
    // reader answers an o_orderkey BETWEEN scan. Zone maps have no
    // false positives, so this is the deterministic sibling of the
    // Bloom keyed path; the oracle replays the merge with the same
    // BETWEEN predicate.
    QueryDef.sql(
      "q_merge_range_scan",
      """WITH incoming AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority,
        |    o_orderdate + INTERVAL 1 DAY AS o_orderdate
        |  FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 4 <> 0),
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
        |  FROM incoming i FULL JOIN (SELECT * FROM cur WHERE o_orderkey % 4 <> 0) c
        |    ON i.o_orderkey = c.o_orderkey),
        |cls AS (
        |  SELECT *,
        |    CASE WHEN NOT ex_p THEN 'insert' WHEN NOT in_p THEN 'orphaned'
        |         WHEN (i_tp IS DISTINCT FROM c_tp) OR (i_os IS DISTINCT FROM c_os)
        |              OR (i_op IS DISTINCT FROM c_op) THEN 'update'
        |         ELSE 'unchanged' END AS status
        |  FROM j)
        |SELECT * FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN status IN ('insert','update') THEN i_tp ELSE c_tp END AS o_totalprice,
        |    CASE WHEN status IN ('insert','update') THEN i_os ELSE c_os END AS o_orderstatus,
        |    CASE WHEN status IN ('insert','update') THEN i_op ELSE c_op END AS o_orderpriority,
        |    CASE WHEN status = 'insert' THEN i_od ELSE c_od END AS o_orderdate,
        |    CAST(o_orderkey % 4 AS INT) AS p
        |  FROM cls
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority, o_orderdate,
        |    CAST(0 AS INT) AS p
        |  FROM cur WHERE o_orderkey % 4 = 0) AS u
        |WHERE o_orderkey BETWEEN 1000 AND 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val cfg = graft.types.TableConfig("orders", Seq("o_orderkey"), Seq("o_orderdate"))
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority", "o_orderdate")
        .withColumn("p", (col("o_orderkey") % 4).cast("int"))
      val current = base.filter(col("o_orderkey") % 7 =!= 0)
      val incoming = base
        .filter(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 4 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 11 === 0, concat(lit("X-"), col("o_orderpriority")))
            .otherwise(col("o_orderpriority")))
        .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY"))
      val dir = scratch(d, "pmerger")
      current.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("p").parquet(dir)
      Sources.publishMergePartitioned(s, dir, incoming, cfg, "p")
      Sources.indexBatchStats(s, dir, "o_orderkey")
      Sources.readMergePartitionedRange(s, dir, "p", "o_orderkey",
          lower = Some(1000L), upper = Some(2000L))
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority",
          "o_orderdate", "p")
        .orderBy("o_orderkey")
    },

    // Row-level change feed between retained versions: replay the
    // q_merge_partitioned publish, pin `since` = the live version,
    // publish a SECOND batch (touching only the odd partitions), and
    // read mergeRowChangesSince(since) — the full-outer state diff of
    // only the rewritten partitions, classified new/updated with the
    // name-sorted changed-fields list. The oracle replays both merges
    // in SQL and diffs state2 against state1 for p IN (1,3). Keys the
    // second batch leaves bit-identical must NOT appear (the
    // `unchanged` drop), and untouched partitions contribute nothing.
    QueryDef.sql(
      "q_merge_changefeed",
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority, o_orderdate,
        |         CAST(o_orderkey % 4 AS INT) AS p
        |  FROM orders),
        |cur AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
        |i1 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority,
        |    o_orderdate + INTERVAL 1 DAY AS o_orderdate,
        |    p
        |  FROM base WHERE o_orderkey % 3 <> 0 AND o_orderkey % 4 <> 0),
        |s1 AS (
        |  SELECT coalesce(i.o_orderkey, c.o_orderkey) AS o_orderkey,
        |    CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE c.o_totalprice END AS o_totalprice,
        |    CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderstatus ELSE c.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderpriority ELSE c.o_orderpriority END AS o_orderpriority,
        |    CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderdate ELSE i.o_orderdate END AS o_orderdate,
        |    coalesce(i.p, c.p) AS p
        |  FROM i1 i FULL JOIN (SELECT * FROM cur WHERE o_orderkey % 4 <> 0) c
        |    ON i.o_orderkey = c.o_orderkey),
        |i2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 2.0 ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus, o_orderpriority, o_orderdate, p
        |  FROM base WHERE o_orderkey % 2 = 1 AND (o_orderkey % 6 = 1 OR o_orderkey % 21 = 0)),
        |old13 AS (SELECT * FROM s1 WHERE p IN (1, 3)),
        |d AS (
        |  SELECT coalesce(i.o_orderkey, o.o_orderkey) AS o_orderkey,
        |    i.o_orderkey IS NOT NULL AS in_p, o.o_orderkey IS NOT NULL AS ex_p,
        |    CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE o.o_totalprice END AS n_tp, o.o_totalprice AS o_tp,
        |    CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderstatus ELSE o.o_orderstatus END AS n_os, o.o_orderstatus AS o_os,
        |    CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderpriority ELSE o.o_orderpriority END AS n_op, o.o_orderpriority AS o_op,
        |    CASE WHEN o.o_orderkey IS NOT NULL THEN o.o_orderdate ELSE i.o_orderdate END AS n_od, o.o_orderdate AS o_od
        |  FROM i2 i FULL JOIN old13 o ON i.o_orderkey = o.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN NOT ex_p THEN 'new' ELSE 'updated' END AS change_status,
        |  CASE WHEN NOT ex_p THEN ''
        |       ELSE trim(concat(
        |    CASE WHEN n_od IS DISTINCT FROM o_od THEN 'o_orderdate,' ELSE '' END,
        |    CASE WHEN n_op IS DISTINCT FROM o_op THEN 'o_orderpriority,' ELSE '' END,
        |    CASE WHEN n_os IS DISTINCT FROM o_os THEN 'o_orderstatus,' ELSE '' END,
        |    CASE WHEN n_tp IS DISTINCT FROM o_tp THEN 'o_totalprice,' ELSE '' END), ',')
        |  END AS changed_fields
        |FROM d
        |WHERE NOT ex_p OR (n_tp IS DISTINCT FROM o_tp) OR (n_os IS DISTINCT FROM o_os)
        |   OR (n_op IS DISTINCT FROM o_op) OR (n_od IS DISTINCT FROM o_od)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val cfg = graft.types.TableConfig("orders", Seq("o_orderkey"), Seq("o_orderdate"))
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority", "o_orderdate")
        .withColumn("p", (col("o_orderkey") % 4).cast("int"))
      val current = base.filter(col("o_orderkey") % 7 =!= 0)
      val incoming1 = base
        .filter(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 4 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 11 === 0, concat(lit("X-"), col("o_orderpriority")))
            .otherwise(col("o_orderpriority")))
        .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY"))
      val incoming2 = base
        .filter(col("o_orderkey") % 2 === 1 &&
          (col("o_orderkey") % 6 === 1 || col("o_orderkey") % 21 === 0))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 1, col("o_totalprice") + 2.0)
            .otherwise(col("o_totalprice")))
      val dir = scratch(d, "pmergecf")
      current.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("p").parquet(dir)
      Sources.publishMergePartitioned(s, dir, incoming1, cfg, "p")
      val since = Sources.mergeVersions(s, dir).max
      Sources.publishMergePartitioned(s, dir, incoming2, cfg, "p")
      Sources.mergeRowChangesSince(s, dir, since, Seq("o_orderkey"), "p")
        .select(col("o_orderkey"), col("change_status"),
          array_join(col("changed_fields"), ",").as("changed_fields"))
        .orderBy("o_orderkey")
    },

    // Row-level DELETE publish (publishMergeDeletes — GDPR erasure /
    // eval-set eviction): publish the seed, pin `since`, delete every
    // %13 key, then read BOTH surfaces the retraction must reach —
    // the live table state (rows gone, untouched partitions never
    // rewritten) and the row-level change feed (each deleted key
    // classified `orphaned`, which is what lets keyed downstream
    // state like the decontamination snapshot retract). The oracle
    // reconstructs both sides set-theoretically.
    QueryDef.sql(
      "q_merge_delete",
      """WITH seed AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT o_orderkey, 'live' AS src FROM seed WHERE o_orderkey % 13 <> 0
        |UNION ALL
        |SELECT o_orderkey, 'orphaned' AS src FROM seed WHERE o_orderkey % 13 = 0
        |ORDER BY src, o_orderkey""".stripMargin) { (s, d) =>
      val cfg = graft.types.TableConfig("orders", Seq("o_orderkey"), Seq.empty)
      val base = Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"),
          (col("o_orderkey") % 4).cast("int").as("p"))
      val dir = scratch(d, "pmergedel")
      Sources.publishMergePartitioned(s, dir, base, cfg, "p")
      val since = Sources.mergeVersions(s, dir).max
      val dels = base.filter(col("o_orderkey") % 13 === 0).select("o_orderkey", "p")
      Sources.publishMergeDeletes(s, dir, dels, cfg, "p")
      val live = Sources.readMergePartitioned(s, dir, "p")
        .select(col("o_orderkey"), lit("live").as("src"))
      val orph = Sources.mergeRowChangesSince(s, dir, since, Seq("o_orderkey"), "p")
        .filter(col("change_status") === "orphaned")
        .select(col("o_orderkey"), lit("orphaned").as("src"))
      live.unionByName(orph).orderBy("src", "o_orderkey")
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
