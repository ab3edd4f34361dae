package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition: fuse the rankings of independent
  * retrieval systems (lexical BM25, embedding ANN, …) into one list.
  *
  * The modern retrieval stack runs sparse and dense retrievers side by
  * side and merges them AT THE RANK LEVEL, because their scores live
  * on incomparable scales; the reference has no retrieval surface at
  * all, so this is a beyond-reference operator of the training-data /
  * RAG family (companion to [[TextAnalysis.bm25]] and
  * [[SimilaritySearch]]).
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * `fused(d) = Σ_lists 1/(c + rank_list(d))`, a document absent from
    * a list contributing 0. RRF needs no score calibration — only
    * ranks cross system boundaries — which is exactly why it is the
    * default fusion everywhere heterogeneous retrievers meet.
    *
    * Each input is `(tag, list)` where the list carries `idCol` and an
    * integer `rank` (1-based, already truncated to that system's
    * shortlist). Output: `idCol`, one `rank_<tag>` column per system
    * (0 = not retrieved by that system), `rrf_score`, best k rows.
    *
    * Determinism: ranks are ints, each contribution is one IEEE
    * division of exact values, and the contributions are summed in
    * DECLARATION order (a left fold, not a data-ordered reduction) —
    * so the fused score is bit-reproducible and oracle-checkable.
    *
    * Scale: shortlists are k-bounded per query, so the fusion joins
    * O(systems · k) rows — negligible next to the retrievals
    * themselves; the final global sort is a k-row TakeOrdered. */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String, k: Int,
      c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val joined = lists.map { case (tag, df) =>
      df.select(col(idCol), col("rank").cast("int").as(s"rank_$tag"))
    }.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = lists.map { case (tag, _) =>
      coalesce(
        lit(1.0) / (lit(c.toDouble) + col(s"rank_$tag").cast("double")),
        lit(0.0))
    }.reduce(_ + _)
    val ranksOut = lists.map { case (tag, _) =>
      coalesce(col(s"rank_$tag"), lit(0)).as(s"rank_$tag")
    }
    joined.withColumn("rrf_score", score)
      .select(col(idCol) +: ranksOut :+ col("rrf_score"): _*)
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
