package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity-graph centrality over a document corpus — the
  * crawl-prioritization / representative-document signal (PageRank is
  * the classic frontier-ranking function; over a near-dup similarity
  * graph the same iteration scores how "central" a document is in its
  * duplication neighborhood, which downstream feeds survivor election
  * and diversity re-weighting).
  *
  * Differential-exactness design: the damped power iteration runs in
  * INTEGER arithmetic — ranks are BIGINTs at a fixed scale, each
  * neighbor contribution is one integer division `r div deg`, and the
  * damping is `(85·Σ) div 100` — so three iterations are
  * bit-reproducible in any engine (floating-point PageRank sums in
  * nondeterministic order and never hashes equal). Rank mass is
  * bounded by N·scale, so 85·Σ stays far inside int64.
  *
  * Scale: the graph lives as an edge table (src, dst) — 2·|pairs|
  * rows, orders of magnitude below the corpus for any sane edge
  * threshold (same posture as [[Dedup.collapseNearDuplicates]]). Each
  * iteration is one keyed join of contributions onto edges + one
  * map-side-combining groupBy on dst — shuffle volume proportional to
  * |edges|, never |corpus|·|corpus|. The expensive part (the shingle
  * posting-list self-join that DISCOVERS the edges) is materialized
  * once and reused by all iterations.
  *
  * The reference has no graph operators; this extends SURVEY.md §2.13.
  */
object GraphRank {

  /** Edges = document pairs sharing ≥ `minShared` word `n`-gram
    * shingles (the [[Dedup.contamination]] posting-list join turned
    * corpus-vs-itself), symmetrized. */
  def similarityEdges(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minShared: Long = 2L): DataFrame = {
    val sh = Dedup.shingles(docs, idCol, textCol, n)
    val pairs = sh.select(col("_id").as("ia"), col("shingle"))
      .join(sh.select(col("_id").as("ib"), col("shingle")), "shingle")
      .filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minShared)
    pairs.select(col("ia").as("src"), col("ib").as("dst"))
      .unionByName(pairs.select(col("ib").as("src"), col("ia").as("dst")))
  }

  /** `iters` rounds of integer-arithmetic damped power iteration over
    * the similarity graph; returns (doc_id, degree, rank). Documents
    * with no edges settle at the base mass `(15·scale) div 100`. */
  /** Triangle enumeration over an undirected edge list (`id_a < id_b`
    * rows, as every pair-finding operator here emits): all ordered
    * triples a < b < c with the three edges present. The standard
    * two-equi-join formulation — candidate wedges (a−b, b−c) close
    * against the a−c edge — whose cost is Σ deg² for the wedge join,
    * NOT |V|³; on near-dup graphs (small, dense clusters) that is
    * cluster-bounded. Triangles are the community signal pair counts
    * miss: a triangle means three documents that are MUTUALLY near
    * duplicates, the safest collapse decision there is.
    *
    * Exact, deterministic (set semantics over integer ids), and
    * replayable by a 3-way self-join in any SQL engine. */
  def triangles(pairs: DataFrame): DataFrame = {
    val e1 = pairs.select(col("id_a"), col("id_b"))
    val e2 = pairs.select(col("id_a").as("id_b"), col("id_b").as("id_c"))
    val e3 = pairs.select(col("id_a"), col("id_b").as("id_c"))
    e1.join(e2, "id_b").join(e3, Seq("id_a", "id_c"))
      .select("id_a", "id_b", "id_c")
  }

  def similarityCentrality(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minShared: Long = 2L, iters: Int = 3,
      scale: Long = 1000000000L): DataFrame = {
    val nodes = docs.select(col(idCol).as("doc_id"))
    // Overflow guard: total mass is conserved at ~N·scale, so a hub's
    // inbound mass m can approach N·scale and the damped step computes
    // 85·m — exact int64 therefore requires 85·N·scale < 2^63. At the
    // default scale=1e9 that caps N at ~1.08e8 docs; beyond that the
    // caller must lower `scale` (1e6 reaches ~1.08e11 docs with six
    // digits of rank resolution intact). Fail loudly, never wrap.
    val nNodes = nodes.count()
    require(nNodes <= Long.MaxValue / 85L / math.max(scale, 1L),
      s"similarityCentrality: $nNodes nodes at scale=$scale risks int64 " +
        s"overflow (85*N*scale >= 2^63); lower scale (e.g. 1e6) so that " +
        s"N <= ${Long.MaxValue / 85L} / scale")
    // the edge table feeds deg + every iteration: materialize it once
    val edges = similarityEdges(docs, idCol, textCol, n, minShared)
      .localCheckpoint(false)
    val deg = edges.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).as("degree"))

    var r = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = r.join(deg, "doc_id")
        .select(col("doc_id").as("src"), expr("r div degree").as("c"))
      val mass = edges.join(contrib, "src")
        .groupBy(col("dst").as("doc_id")).agg(sum("c").as("m"))
      r = nodes.join(mass, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(15L * scale / 100L) +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("r"))
    }
    r.join(deg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("degree"), lit(0L)).as("degree"),
        col("r").as("rank"))
  }
}
