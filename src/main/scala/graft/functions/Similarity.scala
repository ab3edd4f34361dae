package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy string similarity (SURVEY.md §2.3 F14).
  *
  * The reference uses Python's `difflib.SequenceMatcher.ratio()`
  * (Ratcliff-Obershelp) against a threshold
  * (`fragment-validator/services/center_resolver.py:61-85`). Two
  * implementations:
  *   - [[ratio]]: faithful Ratcliff-Obershelp as a Scala UDF (short
  *     dimension strings — center names — so no autojunk heuristic
  *     applies and per-row cost is trivial);
  *   - [[levenshteinRatio]]: codegen'd built-in approximation
  *     `1 - lev(a,b)/max(len)`, used where the oracle must reproduce
  *     the score in ANSI SQL (DuckDB has `levenshtein` too).
  */
object Similarity {

  /** Ratcliff-Obershelp similarity = 2*M / (|a|+|b|), M = total matched
    * chars via recursive longest-common-substring splitting. Matches
    * difflib.SequenceMatcher.ratio() for short strings (no autojunk). */
  def ratio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val total = a.length + b.length
    if (total == 0) return 1.0
    2.0 * matchingBlocks(a, b) / total
  }

  private def matchingBlocks(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    // longest matching block (difflib.find_longest_match, earliest on ties)
    var bestI, bestJ, bestLen = 0
    // j2len: for current i, lengths of matches ending at j
    var j2len = new Array[Int](b.length + 1)
    var i = 0
    while (i < a.length) {
      val newJ2len = new Array[Int](b.length + 1)
      var j = 0
      while (j < b.length) {
        if (a.charAt(i) == b.charAt(j)) {
          val k = j2len(j) + 1
          newJ2len(j + 1) = k
          if (k > bestLen) {
            bestI = i - k + 1; bestJ = j - k + 1; bestLen = k
          }
        }
        j += 1
      }
      j2len = newJ2len
      i += 1
    }
    if (bestLen == 0) 0
    else matchingBlocks(a.substring(0, bestI), b.substring(0, bestJ)) +
      bestLen +
      matchingBlocks(a.substring(bestI + bestLen), b.substring(bestJ + bestLen))
  }

  /** UDF form for use in DataFrame plans (broadcast nested-loop fuzzy
    * join J7 — the dimension side is ~100 rows so a non-codegen UDF is
    * not on any hot path). */
  def ratioUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: String, b: String) => ratio(a, b))

  def register(spark: SparkSession): Unit =
    spark.udf.register("similarity_ratio", (a: String, b: String) => ratio(a, b))

  /** Levenshtein-based ratio — codegen'd, ANSI-SQL-expressible:
    * `1 - levenshtein(a,b) / greatest(length(a), length(b))`
    * (1.0 when both empty). */
  def levenshteinRatio(a: Column, b: Column): Column = {
    val maxLen = greatest(length(a), length(b))
    when(maxLen === 0, lit(1.0))
      .otherwise(lit(1.0) - levenshtein(a, b).cast("double") / maxLen.cast("double"))
  }
}
