package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable BIG × BIG fuzzy string join via character-n-gram posting
  * lists — the set-similarity-join shape (pg_trgm / Vernica et al.,
  * SIGMOD'10) that replaces a quadratic nested-loop once BOTH sides
  * are large. (The reference's fuzzy matching — CenterResolver — is a
  * broadcast NLJ against a ~100-row dimension, which is right THERE;
  * this operator covers the case the reference never faces: fuzzy
  * reconciliation of two large identifier corpora.)
  *
  * Candidates come from an equi-join on grams (shuffle ∝ Σ posting²),
  * so selectivity hinges on gram rarity: `stopGramCap` drops grams
  * whose combined posting list exceeds the cap from the similarity
  * universe ENTIRELY — sizes and intersections both count only kept
  * grams, i.e. Jaccard over discriminative grams (the n-gram analogue
  * of stopword removal; boilerplate affixes shared by every string
  * stop contributing precisely because they identify nothing).
  * Strings whose grams are all stopped cannot match (no candidates) —
  * callers matching boilerplate-only strings need a lower cap or
  * exact-match pre-pass. The cap is part of the declared semantics
  * and the oracle replays it, so the gate pins the whole derivation.
  *
  * Output: (left_id, right_id, n_common, n_a, n_b, jaccard) for pairs
  * with jaccard >= threshold; jaccard is the single IEEE division of
  * exact integer counts (hash-stable). */
object FuzzyJoin {

  /** Distinct (id, gram) pairs of lower-cased character n-grams. */
  private[graft] def charGrams(df: DataFrame, idCol: String, strCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("_id"), lower(col(strCol)).as("_s"))
      .filter(length(col("_s")) >= n)
      .select(col("_id"), explode(array_distinct(expr(
        s"transform(sequence(1, length(_s) - ${n - 1}), i -> substring(_s, i, $n))")))
        .as("_g"))

  def trigramJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      threshold: Double, n: Int = 3, stopGramCap: Int = 0): DataFrame = {
    val lg0 = charGrams(left, leftId, leftStr, n)
    val rg0 = charGrams(right, rightId, rightStr, n)
    val (lg, rg) =
      if (stopGramCap <= 0) (lg0, rg0)
      else {
        // combined posting length: a gram hot on either side identifies
        // nothing about a cross pair, so the cap counts both sides
        val keep = lg0.select("_g").unionAll(rg0.select("_g"))
          .groupBy("_g").agg(count(lit(1)).as("_c"))
          .filter(col("_c") <= stopGramCap).select("_g")
        (lg0.join(keep, Seq("_g")), rg0.join(keep, Seq("_g")))
      }
    val ls = lg.groupBy("_id").agg(count(lit(1)).as("n_a"))
      .select(col("_id").as("left_id"), col("n_a"))
    val rs = rg.groupBy("_id").agg(count(lit(1)).as("n_b"))
      .select(col("_id").as("right_id"), col("n_b"))
    val common = lg.select(col("_id").as("left_id"), col("_g"))
      .join(rg.select(col("_id").as("right_id"), col("_g")), Seq("_g"))
      .groupBy("left_id", "right_id").agg(count(lit(1)).as("n_common"))
    common
      .join(ls, Seq("left_id"))
      .join(rs, Seq("right_id"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("left_id", "right_id", "n_common", "n_a", "n_b", "jaccard")
  }
}
