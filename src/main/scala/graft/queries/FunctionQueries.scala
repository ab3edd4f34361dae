package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Coercions, Gsid, IdValidation}

/** Scalar-function queries (SURVEY.md §2.3): drive the coercion /
  * validation / GSID functions through the driver's oracle gate on a
  * synthetic mixed-quality column derived deterministically from the
  * testdata (the parquet tables are clean, so we manufacture the dirty
  * values the reference's transformer sees — null tokens, garbage,
  * scientific notation — from row attributes). */
object FunctionQueries {

  // Spark side: raw mixed-quality string from lineitem attrs
  private val rawCase =
    """CASE CAST(l_orderkey * 7 + l_linenumber AS INT) % 8
      |  WHEN 0 THEN 'NA'
      |  WHEN 1 THEN CAST(l_quantity AS STRING)
      |  WHEN 2 THEN 'abc'
      |  WHEN 3 THEN ''
      |  WHEN 4 THEN '1e2'
      |  WHEN 5 THEN CAST(l_extendedprice AS STRING)
      |  WHEN 6 THEN ' 42 '
      |  ELSE 'N/A'
      |END""".stripMargin

  // DuckDB side: same expression (CAST double AS VARCHAR prints
  // identically for these magnitudes in both engines)
  private val rawCaseDuck = rawCase.replace("AS STRING", "AS VARCHAR")

  // DuckDB re-expressions of the Coercions column functions
  private val nullNormDuck =
    "CASE WHEN raw IS NULL OR upper(trim(raw)) IN ('','NULL','NA','N/A') THEN NULL ELSE trim(raw) END"
  private val numRe = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q_fn_coercions",
      s"""WITH raws AS (
         |  SELECT l_orderkey, l_linenumber, $rawCaseDuck AS raw
         |  FROM lineitem
         |), norm AS (
         |  SELECT l_orderkey, l_linenumber, raw, $nullNormDuck AS s
         |  FROM raws
         |)
         |SELECT l_orderkey, l_linenumber, raw,
         |  s AS cleaned,
         |  CASE WHEN s IS NOT NULL AND regexp_matches(s, '$numRe')
         |         AND TRY_CAST(s AS DOUBLE) BETWEEN -2147483648 AND 2147483647
         |       THEN CAST(TRUNC(TRY_CAST(s AS DOUBLE)) AS INTEGER) END AS as_int,
         |  CASE WHEN s IS NOT NULL AND regexp_matches(s, '$numRe')
         |       THEN TRY_CAST(s AS DOUBLE) END AS as_double,
         |  CASE WHEN s IS NULL THEN NULL
         |       ELSE lower(s) IN ('true','t','yes','y','1') END AS as_bool
         |FROM norm
         |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("raw", expr(rawCase))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("raw"),
          Coercions.normalizeNullTokens(col("raw")).as("cleaned"),
          Coercions.toIntLenient(col("raw")).as("as_int"),
          Coercions.toDoubleLenient(col("raw")).as("as_double"),
          Coercions.toBooleanLenient(col("raw")).as("as_bool"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    QueryDef.sql(
      "q_fn_id_validation",
      """WITH ids AS (
        |  SELECT c_custkey,
        |    CASE c_custkey % 7
        |      WHEN 0 THEN 'test' || CAST(c_custkey AS VARCHAR)
        |      WHEN 1 THEN '000'
        |      WHEN 2 THEN 'ab'
        |      WHEN 3 THEN c_name
        |      WHEN 4 THEN '12'
        |      WHEN 5 THEN 'id ' || CAST(c_custkey AS VARCHAR)
        |      ELSE 'GAP-' || CAST(c_custkey AS VARCHAR)
        |    END AS local_id
        |  FROM customer
        |)
        |SELECT c_custkey, local_id,
        |  CASE WHEN trim(local_id) = '' THEN FALSE
        |       WHEN regexp_matches(trim(local_id), '(?i)^test') OR regexp_matches(trim(local_id), '(?i)^demo')
        |         OR regexp_matches(trim(local_id), '(?i)^example') OR regexp_matches(trim(local_id), '^0+$')
        |         OR regexp_matches(trim(local_id), '^9+$') OR regexp_matches(trim(local_id), '(?i)^x+$')
        |       THEN FALSE ELSE TRUE END AS valid,
        |  CASE WHEN trim(local_id) = '' THEN 'error'
        |       WHEN regexp_matches(trim(local_id), '(?i)^test') OR regexp_matches(trim(local_id), '(?i)^demo')
        |         OR regexp_matches(trim(local_id), '(?i)^example') OR regexp_matches(trim(local_id), '^0+$')
        |         OR regexp_matches(trim(local_id), '^9+$') OR regexp_matches(trim(local_id), '(?i)^x+$')
        |       THEN 'error'
        |       WHEN regexp_matches(trim(local_id), '^[0-9]{1,3}$') OR regexp_matches(trim(local_id), '^[a-z]{1,2}$')
        |         OR regexp_matches(trim(local_id), '\s') OR regexp_matches(trim(local_id), '[^a-zA-Z0-9_-]')
        |         OR regexp_matches(trim(local_id), '^[0-9]+$')
        |         OR length(trim(local_id)) < 3
        |       THEN 'warning'
        |       ELSE 'info' END AS severity
        |FROM ids
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .withColumn("local_id", expr(
          """CASE c_custkey % 7
            |  WHEN 0 THEN concat('test', CAST(c_custkey AS STRING))
            |  WHEN 1 THEN '000'
            |  WHEN 2 THEN 'ab'
            |  WHEN 3 THEN c_name
            |  WHEN 4 THEN '12'
            |  WHEN 5 THEN concat('id ', CAST(c_custkey AS STRING))
            |  ELSE concat('GAP-', CAST(c_custkey AS STRING))
            |END""".stripMargin))
        .withColumn("v", IdValidation.validate(col("local_id"), lit("primary")))
        .select(col("c_custkey"), col("local_id"),
          col("v.valid").as("valid"), col("v.severity").as("severity"))
        .orderBy("c_custkey")
    },

    // F5/F6: strict date parse + lenient ISO timestamp parse over a
    // mixed-shape raw column (plain date, T-separated, trailing Z,
    // space-separated, garbage, null token). Outputs formatted as
    // strings; the session runs UTC so 'Z' instants print identically.
    QueryDef.sql(
      "q_fn_datetime_parse",
      """WITH raws AS (
        |  SELECT o_orderkey,
        |    CASE o_orderkey % 6
        |      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |      WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d') || 'T12:34:56'
        |      WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d') || 'T12:34:56Z'
        |      WHEN 3 THEN strftime(o_orderdate, '%Y-%m-%d') || ' 01:02:03'
        |      WHEN 4 THEN 'not-a-ts'
        |      ELSE 'NA'
        |    END AS raw
        |  FROM orders),
        |norm AS (
        |  SELECT o_orderkey, raw,
        |    CASE WHEN upper(trim(raw)) IN ('','NULL','NA','N/A') THEN NULL
        |         ELSE trim(raw) END AS s
        |  FROM raws)
        |SELECT o_orderkey, raw,
        |  strftime(try_strptime(s, '%Y-%m-%d'), '%Y-%m-%d') AS parsed_date,
        |  strftime(coalesce(
        |    try_strptime(replace(s, 'Z', ''), '%Y-%m-%dT%H:%M:%S'),
        |    try_strptime(s, '%Y-%m-%d %H:%M:%S'),
        |    try_strptime(s, '%Y-%m-%d')), '%Y-%m-%d %H:%M:%S') AS parsed_ts
        |FROM norm
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .withColumn("raw", expr(
          """CASE CAST(o_orderkey % 6 AS INT)
            |  WHEN 0 THEN date_format(o_orderdate, 'yyyy-MM-dd')
            |  WHEN 1 THEN concat(date_format(o_orderdate, 'yyyy-MM-dd'), 'T12:34:56')
            |  WHEN 2 THEN concat(date_format(o_orderdate, 'yyyy-MM-dd'), 'T12:34:56Z')
            |  WHEN 3 THEN concat(date_format(o_orderdate, 'yyyy-MM-dd'), ' 01:02:03')
            |  WHEN 4 THEN 'not-a-ts'
            |  ELSE 'NA'
            |END""".stripMargin))
        .select(col("o_orderkey"), col("raw"),
          date_format(Coercions.toDateLenient(col("raw")), "yyyy-MM-dd").as("parsed_date"),
          date_format(Coercions.toTimestampLenient(col("raw")), "yyyy-MM-dd HH:mm:ss")
            .as("parsed_ts"))
        .orderBy("o_orderkey")
    },

    // F11 deterministic mint + F13 format validation. The md5-derived
    // variant is the oracle-reproducible GSID (hex ⊂ GSID alphabet).
    QueryDef.sql(
      "q_fn_gsid_deterministic",
      """SELECT c_custkey,
        |  'GSID-' || upper(substr(md5(c_name), 1, 16)) AS gsid,
        |  regexp_matches('GSID-' || upper(substr(md5(c_name), 1, 16)),
        |                 '^GSID-[0-9A-HJKMNP-TV-Z]{16}$') AS format_valid
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          Gsid.deterministic(col("c_name")).as("gsid"),
          Gsid.isValid(Gsid.deterministic(col("c_name"))).as("format_valid"))
        .orderBy("c_custkey")
    },

    // F12 fixed-length Crockford base32 of a non-negative long — the
    // codegen'd Base32Encode expression vs a pure shift/mask re-derivation
    // (32 = 2^5, so digit i is (n >> 5*(L-i)) & 31 in both dialects).
    QueryDef.sql(
      "q_fn_base32", {
        def b32(expr: String, len: Int): String =
          (1 to len).map(i =>
            s"substr('${Gsid.Alphabet}', CAST((($expr) >> ${5 * (len - i)}) & 31 AS INT) + 1, 1)")
            .mkString(" || ")
        s"""SELECT c_custkey,
           |  ${b32("c_custkey", 11)} AS b32_id,
           |  ${b32("c_custkey * 2654435761", 5)} AS b32_short
           |FROM customer
           |ORDER BY c_custkey""".stripMargin
      }) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey"),
          Gsid.base32(col("c_custkey"), 11).as("b32_id"),
          Gsid.base32(col("c_custkey") * lit(2654435761L), 5).as("b32_short"))
        .orderBy("c_custkey")
    },

    // The SQL surface end-to-end: tables registered as temp views +
    // the engine's custom functions registered in the session's
    // FunctionRegistry, driven entirely through spark.sql text — the
    // path a SQL-first user of the engine takes. The custom codegen'd
    // base32 expression rides inside a grouped aggregate; the oracle
    // re-derives it with the shift/mask expansion.
    QueryDef.sql(
      "q_sql_surface", {
        def b32(expr: String, len: Int): String =
          (1 to len).map(i =>
            s"substr('${Gsid.Alphabet}', CAST((($expr) >> ${5 * (len - i)}) & 31 AS INT) + 1, 1)")
            .mkString(" || ")
        s"""SELECT ${b32("o_custkey", 4)} AS code, CAST(COUNT(*) AS BIGINT) AS n
           |FROM orders
           |GROUP BY 1
           |ORDER BY code""".stripMargin
      }) { (s, d) =>
      graft.GraftSql.registerTables(s, d)
      graft.GraftSql.registerFunctions(s)
      s.sql("""SELECT base32_encode(o_custkey, 4) AS code,
              |       CAST(COUNT(*) AS BIGINT) AS n
              |FROM orders
              |GROUP BY base32_encode(o_custkey, 4)
              |ORDER BY code""".stripMargin)
    })
}
