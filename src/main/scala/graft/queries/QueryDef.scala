package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism contract (so the driver's value-hash compare passes):
  *   - never aggregate raw DOUBLEs — reduction order differs between
  *     engines; route sums/avgs through exact DECIMAL and cast the
  *     final value back to DOUBLE (IEEE ops on identical inputs are
  *     bit-deterministic; only reductions are not),
  *   - end every query with a total-order ORDER BY,
  *   - alias every computed column identically in both dialects.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
