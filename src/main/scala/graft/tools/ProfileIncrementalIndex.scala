package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LexicalIndex, SimilaritySearch}

/** Incremental-index maintenance vs rebuild, measured — the scale
  * claim behind round 14's `applyIvfPqIndexChanges` and
  * `applyBm25IndexChanges` is that a delta batch costs the DELTA's
  * work (its docs' postings / its vectors' lists), never the corpus.
  * This tool builds each index at a real tier, applies a ~1% change
  * feed, and prints build wall, apply wall, rebuild wall and the
  * touched-partition counts, so the "maintain, don't rebuild" economy
  * is a measured ratio instead of an argument.
  *
  * Usage: `runMain graft.tools.ProfileIncrementalIndex <sfDir> [scope]`
  * — scope `all` (default), `bm25lsm` (base build + rebuild +
  * append-apply only, for the big-tier flatness measurement), or
  * `readamp` (K successive append feeds: search wall per live
  * segment generation, then compaction restoring it — the LSM
  * read-amplification curve that sets the compaction trigger). */
object ProfileIncrementalIndex {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val scope = if (args.length > 1) args(1) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---------------- BM25 ----------------
    val docs = graft.Tables.documents(spark, sfDir).localCheckpoint(false)
    val nDocs = docs.count()
    // constant ~500-doc feed at ANY tier (selector scales with the
    // corpus), so tier-to-tier apply growth isolates the CORPUS term —
    // a proportional feed would confound it with delta growth
    val modBase = math.max(300L, nDocs / 167L)
    val m = col("doc_id") % modBase
    val base = docs.filter(m =!= 7)
    val feed = docs.filter(m === 7).withColumn("_change", lit("new"))
      .unionByName(docs.filter(m === 13).withColumn("_change", lit("orphaned")))
      .unionByName(docs.filter(m === 29)
        .withColumn("text", concat(col("text"), lit(" spark")))
        .withColumn("_change", lit("updated")))
    val nFeed = feed.count()

    if (scope == "readamp") {
      // K disjoint ~500-doc feeds applied in sequence: each apply adds
      // one segment generation per table and one tombstone wave; the
      // search must union more branches and kill more rows each step
      val dir = tmp("graft_prof_bm25_amp")
      val amBase = docs.filter(m >= 10)
      val (_, b0) = time(LexicalIndex.writeBm25Index(amBase, dir, nBuckets = 64))
      println(f"[inc-readamp] step=0 applies=0 build_s=$b0%.1f")
      (1 to 8).foreach { k =>
        val fk = docs.filter(m === (k - 1))
          .withColumn("_change", lit(if (k % 2 == 0) "updated" else "new"))
        val (_, aW) = time(LexicalIndex.applyBm25IndexChanges(
          spark, dir, fk, mode = "append"))
        val (r, sW) = time(LexicalIndex.searchBm25Index(
          spark, dir, Seq("merge", "spark", "vector"), k = 25).collect())
        println(f"[inc-readamp] step=$k%d applies=$k%d apply_s=$aW%.1f " +
          f"search_s=$sW%.2f top=${r.length}%d")
        // the automated trigger under the same workload: default
        // policy (8 generations/segments) — a no-op mid-curve, fires
        // once the log crosses the threshold (r15)
        val ((h, ran), mW) = time(LexicalIndex.maintainBm25IfNeeded(spark, dir))
        println(f"[inc-readamp] maintain step=$k%d gens=${h.maxGenerations}%d " +
          f"ts_segs=${h.tombstoneSegments}%d ts_rows=${h.tombstoneRows}%d " +
          f"fired=$ran%b wall_s=$mW%.1f")
      }
      val (_, cW) = time(LexicalIndex.compactBm25Index(spark, dir))
      val (r2, s2) = time(LexicalIndex.searchBm25Index(
        spark, dir, Seq("merge", "spark", "vector"), k = 25).collect())
      println(f"[inc-readamp] compacted compact_s=$cW%.1f search_s=$s2%.2f " +
        f"top=${r2.length}%d")
      spark.stop(); return
    }

    val rebDir = tmp("graft_prof_bm25_reb")
    val finalDocs = docs.filter(m =!= 13)
      .withColumn("text", when(m === 29, concat(col("text"), lit(" spark")))
        .otherwise(col("text")))
    val (_, rebuildW) = time(LexicalIndex.writeBm25Index(finalDocs, rebDir, nBuckets = 64))

    if (scope == "all") {
      val bmDir = tmp("graft_prof_bm25")
      val (_, buildW) = time(LexicalIndex.writeBm25Index(base, bmDir, nBuckets = 64))
      val (delta, applyW) = time(
        LexicalIndex.applyBm25IndexChanges(spark, bmDir, feed))
      val (res, searchW) = time(LexicalIndex.searchBm25Index(
        spark, bmDir, Seq("merge", "spark", "vector"), k = 25).collect())
      println(f"[inc-index] op=bm25 mode=rewrite docs=$nDocs%d feed=$nFeed%d " +
        f"build_s=$buildW%.1f apply_s=$applyW%.1f rebuild_s=$rebuildW%.1f " +
        f"apply_over_rebuild=${applyW / rebuildW}%.2f " +
        f"removed=${delta.removedPostings}%d added=${delta.addedPostings}%d " +
        f"search_s=$searchW%.2f top=${res.length}%d")
    }

    // the log-structured path on a fresh copy of the same base/feed:
    // apply should cost the DELTA; compaction pays the amortized bill
    val lsmDir = tmp("graft_prof_bm25_lsm")
    val (_, lsmBuildW) = time(LexicalIndex.writeBm25Index(base, lsmDir, nBuckets = 64))
    val (_, lsmApplyW) = time(LexicalIndex.applyBm25IndexChanges(
      spark, lsmDir, feed, mode = "append"))
    val (lsmRes, lsmSearchW) = time(LexicalIndex.searchBm25Index(
      spark, lsmDir, Seq("merge", "spark", "vector"), k = 25).collect())
    val (compactW, postSearchW) =
      if (scope == "all") {
        val (_, c) = time(LexicalIndex.compactBm25Index(spark, lsmDir))
        val (_, p) = time(LexicalIndex.searchBm25Index(
          spark, lsmDir, Seq("merge", "spark", "vector"), k = 25).collect())
        (c, p)
      } else (-1.0, -1.0)
    println(f"[inc-index] op=bm25 mode=append docs=$nDocs%d feed=$nFeed%d " +
      f"build_s=$lsmBuildW%.1f apply_s=$lsmApplyW%.1f rebuild_s=$rebuildW%.1f " +
      f"apply_over_rebuild=${lsmApplyW / rebuildW}%.2f " +
      f"search_tombstoned_s=$lsmSearchW%.2f compact_s=$compactW%.1f " +
      f"search_compacted_s=$postSearchW%.2f top=${lsmRes.length}%d")
    if (scope != "all") { spark.stop(); return }

    // ---------------- IVF-PQ ----------------
    val emb = graft.Tables.embeddings(spark, sfDir).localCheckpoint(false)
    val nVec = emb.count()
    val vm = col("vec_id") % 300
    val high = col("vec_id") >= 8
    val vBase = emb.filter(!high || vm =!= 7)
    val vFeed = emb.filter(high && vm === 7).withColumn("_change", lit("new"))
      .unionByName(emb.filter(high && vm === 13).withColumn("_change", lit("orphaned")))
      .unionByName(emb.filter(high && vm === 29)
        .withColumn("embedding", reverse(col("embedding")))
        .withColumn("_change", lit("updated")))
    val nVFeed = vFeed.count()
    val ivDir = tmp("graft_prof_ivfpq")
    val (_, vBuildW) = time(SimilaritySearch.writeIvfPqIndex(
      vBase, ivDir, coarseIds = 0L until 64L, pqIds = 0L until 8L, m = 4))
    val (vDelta, vApplyW) = time(
      SimilaritySearch.applyIvfPqIndexChanges(spark, ivDir, vFeed))
    val vRebDir = tmp("graft_prof_ivfpq_reb")
    val vFinal = emb.filter(!high || vm =!= 13)
      .withColumn("embedding",
        when(high && vm === 29, reverse(col("embedding"))).otherwise(col("embedding")))
    val (_, vRebuildW) = time(SimilaritySearch.writeIvfPqIndex(
      vFinal, vRebDir, coarseIds = 0L until 64L, pqIds = 0L until 8L, m = 4))
    val (vRes, vSearchW) = time(SimilaritySearch.searchIvfPqIndex(
      spark, ivDir, emb.filter(col("vec_id") < 5), k = 5, nProbe = 4).collect())
    println(f"[inc-index] op=ivfpq mode=rewrite vecs=$nVec%d feed=$nVFeed%d " +
      f"build_s=$vBuildW%.1f apply_s=$vApplyW%.1f rebuild_s=$vRebuildW%.1f " +
      f"apply_over_rebuild=${vApplyW / vRebuildW}%.2f " +
      f"removed=${vDelta.removed}%d added=${vDelta.added}%d " +
      f"search_s=$vSearchW%.2f top=${vRes.length}%d")

    val vLsmDir = tmp("graft_prof_ivfpq_lsm")
    val (_, vLsmBuildW) = time(SimilaritySearch.writeIvfPqIndex(
      vBase, vLsmDir, coarseIds = 0L until 64L, pqIds = 0L until 8L, m = 4))
    val (_, vLsmApplyW) = time(SimilaritySearch.applyIvfPqIndexChanges(
      spark, vLsmDir, vFeed, mode = "append"))
    val (vLsmRes, vLsmSearchW) = time(SimilaritySearch.searchIvfPqIndex(
      spark, vLsmDir, emb.filter(col("vec_id") < 5), k = 5, nProbe = 4).collect())
    val (_, vCompactW) = time(SimilaritySearch.compactIvfPqIndex(spark, vLsmDir))
    val (_, vPostSearchW) = time(SimilaritySearch.searchIvfPqIndex(
      spark, vLsmDir, emb.filter(col("vec_id") < 5), k = 5, nProbe = 4).collect())
    println(f"[inc-index] op=ivfpq mode=append vecs=$nVec%d feed=$nVFeed%d " +
      f"build_s=$vLsmBuildW%.1f apply_s=$vLsmApplyW%.1f " +
      f"apply_over_rebuild=${vLsmApplyW / vRebuildW}%.2f " +
      f"search_tombstoned_s=$vLsmSearchW%.2f compact_s=$vCompactW%.1f " +
      f"search_compacted_s=$vPostSearchW%.2f top=${vLsmRes.length}%d")
    spark.stop()
  }
}
