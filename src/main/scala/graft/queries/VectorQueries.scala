package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, SimilaritySearch}

/** Similarity-search queries over the `embeddings` table. The
  * brute-force cosine top-k is oracle-checked: both engines fold the
  * dot product left-to-right in double precision over identical
  * float32 inputs, so scores are bit-deterministic. The LSH ANN path
  * is rows-only (seeded-hyperplane buckets aren't ANSI-expressible);
  * its recall against brute force is asserted in VectorSpec. */
object VectorQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q_vec_topk_cosine",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |t AS (SELECT vec_id AS neighbor_id, embedding AS tv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(range(1, len(tv) + 1),
        |        i -> CAST(tv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(tv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |      AS score
        |  FROM t CROSS JOIN q
        |  WHERE neighbor_id <> query_id),
        |rk AS (SELECT query_id, neighbor_id, score,
        |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS "rank"
        |       FROM scored)
        |SELECT query_id, "rank", neighbor_id, score
        |FROM rk WHERE "rank" <= 10
        |ORDER BY query_id, "rank"""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 10)
        .orderBy("query_id", "rank")
    },

    // Embedding-cosine near-dup pairs — exact baseline under the hash
    // gate (both engines fold dot products left-to-right in double).
    // The LSH-bucketed scale variant is recall-pinned in DedupSpec.
    QueryDef.sql(
      "q_dedup_embedding",
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |s AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |      AS cosine
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine
        |FROM s WHERE cosine >= 0.45
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.embeddingNearDups(Tables.embeddings(s, d), "vec_id", "embedding", 0.45)
        .orderBy("id_a", "id_b")
    },

    QueryDef.rowsOnly("q_vec_ann_lsh") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.annTopK(emb, emb.filter(col("vec_id") < 20), k = 5, nBits = 6,
          nProbe = 3)
        .orderBy("query_id", "rank")
    },

    QueryDef.rowsOnly("q_vec_ann_ivf") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.ivfTopK(emb, emb.filter(col("vec_id") < 20), k = 5,
          nLists = 8, nProbe = 2)
        .orderBy("query_id", "rank")
    })
}
