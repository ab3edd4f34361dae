package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The automated compaction trigger (VERDICT r14 #2): health reports
  * the LSM read-amp signals (generations per partition, tombstone
  * segments/rows/bytes), `maintainIfNeeded` compacts past thresholds
  * and is a pure read below them, and the compacted index answers the
  * same search as the corpus scan. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_idx_maint").toString

  private def doc(i: Long) = (i, s"term$i spark merge vector doc$i")

  test("BM25: health tracks generations and tombstones; trigger fires past threshold") {
    val dir = freshDir()
    LexicalIndex.writeBm25Index((1L to 40L).map(doc).toDF("doc_id", "text"),
      dir, nBuckets = 4)
    val h0 = LexicalIndex.bm25IndexHealth(spark, dir)
    assert(h0.maxGenerations == 1 && h0.tombstoneSegments == 0 &&
      h0.tombstoneRows == 0L)

    // three append applies: each adds a write generation + a segment
    for (r <- 1 to 3) {
      val feed = Seq((40L + r, s"fresh doc number $r about spark", "new"),
        (r.toLong, "", "orphaned")).toDF("doc_id", "text", "_change")
      LexicalIndex.applyBm25IndexChanges(spark, dir, feed, mode = "append"): Unit
    }
    val h1 = LexicalIndex.bm25IndexHealth(spark, dir)
    assert(h1.maxGenerations == 4) // base + 3 applies
    assert(h1.tombstoneSegments == 3)
    assert(h1.tombstoneRows == 6L) // 2 ids per apply
    assert(h1.tombstoneBytes > 0L)

    // below threshold (default policy allows 8): PURE no-op
    val preVersions = graft.sources.Sources
      .mergeVersions(spark, s"$dir/postings")
    val (hc, ranDefault) = LexicalIndex.maintainBm25IfNeeded(spark, dir)
    assert(!ranDefault)
    assert(hc.maxGenerations == 4)
    assert(graft.sources.Sources.mergeVersions(spark, s"$dir/postings")
      == preVersions)
    assert(LsmTombstones.exists(spark, dir))

    // tight policy: the trigger fires and the index folds to one
    // generation with the kill set cleared
    val tight = IndexMaintenance.MaintenancePolicy(maxGenerations = 2)
    val (h2, ran) = LexicalIndex.maintainBm25IfNeeded(spark, dir, tight)
    assert(ran)
    assert(h2.breaches(tight).nonEmpty) // reported pre-maintenance state
    val h3 = LexicalIndex.bm25IndexHealth(spark, dir)
    assert(h3.maxGenerations == 1 && h3.tombstoneSegments == 0 &&
      h3.tombstoneRows == 0L)

    // compacted index answers the corpus-scan search exactly
    val finalDocs = ((4L to 40L) ++ (41L to 43L)).map { i =>
      if (i <= 40L) doc(i) else (i, s"fresh doc number ${i - 40L} about spark")
    }.toDF("doc_id", "text")
    val q = Seq("spark", "term7")
    assert(LexicalIndex.searchBm25Index(spark, dir, q, k = 5)
      .collect().map(_.toSeq).toSeq ==
      TextAnalysis.bm25(finalDocs, "doc_id", "text", q, k = 5)
        .collect().map(_.toSeq).toSeq)

    // and re-running the trigger on the healthy index is a no-op
    val (_, again) = LexicalIndex.maintainBm25IfNeeded(spark, dir, tight)
    assert(!again)
  }

  test("IVF-PQ: trigger compacts past tombstone-segment threshold") {
    def vec(id: Long): Seq[Float] = {
      val lobe = if (id % 2 == 0) 0f else 100f
      Seq.tabulate(8)(i => lobe + ((id * 7 + i * 3) % 13).toFloat)
    }
    val dir = freshDir()
    SimilaritySearch.writeIvfPqIndex(
      (0L until 16L).map(id => (id, vec(id))).toDF("vec_id", "embedding"),
      dir, 0L until 4L, 0L until 4L, m = 4)
    for (r <- 16 to 18) {
      val feed = Seq((r.toLong, vec(r.toLong)))
        .toDF("vec_id", "embedding").withColumn("_change", lit("new"))
      SimilaritySearch.applyIvfPqIndexChanges(spark, dir, feed,
        mode = "append"): Unit
    }
    val h = SimilaritySearch.ivfPqIndexHealth(spark, dir)
    assert(h.tombstoneSegments == 3)
    val tight = IndexMaintenance.MaintenancePolicy(maxTombstoneSegments = 2)
    val (_, ran) = SimilaritySearch.maintainIvfPqIfNeeded(spark, dir, tight)
    assert(ran)
    val h2 = SimilaritySearch.ivfPqIndexHealth(spark, dir)
    assert(h2.maxGenerations == 1 && h2.tombstoneSegments == 0)
    // content equals a rebuild over the post-change corpus
    val reb = freshDir()
    SimilaritySearch.writeIvfPqIndex(
      (0L until 19L).map(id => (id, vec(id))).toDF("vec_id", "embedding"),
      reb, 0L until 4L, 0L until 4L, m = 4)
    def codes(d: String) = graft.sources.Sources
      .readMergePartitioned(spark, s"$d/codes", "_list")
      .select(col("_id").cast("long"), col("codes"), col("_list").cast("int"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getInt(2)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(codes(dir) == codes(reb))
  }

  test("family health rollup: per-partition generations/tombstones in one call; routed applies land in parallel (VERDICT r16 #5/#7)") {
    val root = freshDir() + "/fam"
    val docs = (1L to 30L).map { i =>
      (i, s"term$i spark family doc$i", if (i % 3 == 0) "de" else if (i % 3 == 1) "en" else "fr")
    }.toDF("doc_id", "text", "lang")
    val segs = LexicalIndex.writePartitionedBm25Index(docs, root, "lang", nBuckets = 4)
    assert(segs.toSet == Set("lang=en", "lang=de", "lang=fr"))
    assert(IndexMaintenance.familySegments(spark, root, "lang") ==
      Seq("lang=de", "lang=en", "lang=fr"))

    // a routed delta touching every partition (the full-fan-out shape
    // the family pool exists for): one apply per partition, in parallel
    val delta = Seq(
      (31L, "fresh spark doc en", "en", "new"),
      (32L, "fresh spark doc de", "de", "new"),
      (2L, "", "fr", "orphaned")).toDF("doc_id", "text", "lang", "_change")
    val applied = LexicalIndex.applyPartitionedBm25IndexChanges(
      spark, root, "lang", delta, mode = "append")
    assert(applied.keySet == Set("lang=en", "lang=de", "lang=fr"))

    // rollup: listing-only by default (tombstoneRows = -1, no count
    // job), every other field exact per partition
    val h = IndexMaintenance.familyHealth(spark, root, "lang",
      Seq("postings" -> "_b", "forward" -> "_db", "doclen" -> "_db")).toMap
    assert(h.keySet == Set("lang=en", "lang=de", "lang=fr"))
    assert(h.values.forall(_.tombstoneRows == -1L))
    assert(h("lang=en").maxGenerations == 2) // base + 1 apply
    assert(h("lang=de").maxGenerations == 2)
    // fr's change was a pure retraction: tombstone only, no new postings
    assert(h("lang=fr").maxGenerations == 1)
    assert(h("lang=fr").tombstoneSegments == 1)
    assert(h("lang=fr").tombstoneBytes > 0L)

    // counted rollup: exact kill-set sizes per partition — and ONE
    // Spark job at full fan-out (r18, VERDICT r17 #4: the per-partition
    // count job design was 4096 jobs at the family cap). AQE off for
    // the assertion so stage materialization doesn't split the one
    // action into per-stage jobs.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    val hc =
      try {
        val r = IndexMaintenance.familyHealth(spark, root, "lang",
          Seq("postings" -> "_b"), countTombstoneRows = true).toMap
        graft.Bench.drainListeners(spark)
        r
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      }
    // one count action; parquet footer/schema inference may add one
    // constant job — the pre-r18 design ran one count job PER
    // partition (plus its per-read inference), O(partitions)
    assert(jobs.get() <= 2,
      s"counted familyHealth ran ${jobs.get()} Spark jobs (want <= 2, " +
        "independent of partition count)")
    assert(hc("lang=fr").tombstoneRows == 1L)
    assert(hc("lang=en").tombstoneRows == 1L) // 'new' tombstones its own id
    // parallel applies produced the same search results as the routed
    // semantics promise: partitioned search over en equals a fresh
    // index over the en slice
    val enDocs = docs.filter(col("lang") === "en").drop("lang")
      .union(Seq((31L, "fresh spark doc en")).toDF("doc_id", "text"))
    assert(LexicalIndex.searchPartitionedBm25Index(spark, root, "lang",
        Seq("en"), Seq("spark"), k = 5).collect().map(_.toSeq).toSeq ==
      TextAnalysis.bm25(enDocs, "doc_id", "text", Seq("spark"), k = 5)
        .collect().map(_.toSeq).toSeq)
  }

  test("auto-vacuum from the maintenance loop: aged superseded generations reclaimed, young and live spared") {
    val dir = freshDir()
    val docs = (1L to 20L).map(doc).toDF("doc_id", "text")
    LexicalIndex.writeBm25Index(docs, dir, nBuckets = 4)
    val gen1 = LexicalIndex.rebuildBm25Index(spark, dir, docs, nBuckets = 4)
    val gen2 = LexicalIndex.rebuildBm25Index(spark, dir, docs, nBuckets = 4)
    val expected = TextAnalysis.bm25(docs, "doc_id", "text",
      Seq("spark", "term7"), k = 5).collect().map(_.toSeq).toSeq
    def searchNow() = LexicalIndex.searchBm25Index(spark, dir,
      Seq("spark", "term7"), k = 5).collect().map(_.toSeq).toSeq

    // swap just happened: the default grace (1 h) spares EVERYTHING —
    // an in-flight reader of gen1 or the plain layout keeps its files
    LexicalIndex.maintainBm25IfNeeded(spark, dir): Unit
    assert(new java.io.File(gen1).exists(), "young superseded gen reclaimed")
    assert(new java.io.File(dir, "postings").exists(),
      "young superseded plain layout reclaimed")
    assert(searchNow() == expected)

    // age the last swap (the _gen pointer's mtime IS the swap time) AND
    // the superseded candidates themselves (r17: vacuum requires both —
    // a fresh-mtime dir is someone's in-flight write), and drop in a
    // crashed-swap tmp pointer: the same maintenance loop now reclaims
    // gen1, the plain-layout tables and the stale tmp — and leaves the
    // live generation serving identical results
    val aged = System.currentTimeMillis() - 2L * 3600 * 1000
    assert(new java.io.File(dir, "_gen").setLastModified(aged))
    assert(new java.io.File(gen1).setLastModified(aged))
    Seq("postings", "forward", "doclen", "stats", "meta", "tombstones")
      .map(new java.io.File(dir, _)).filter(_.exists())
      .foreach(f => assert(f.setLastModified(aged)))
    val staleTmp = new java.io.File(dir, "_gen.tmp-deadbeef")
    assert(staleTmp.createNewFile())
    assert(staleTmp.setLastModified(aged))
    val youngTmp = new java.io.File(dir, "_gen.tmp-feedface")
    assert(youngTmp.createNewFile())
    LexicalIndex.maintainBm25IfNeeded(spark, dir): Unit
    assert(!new java.io.File(gen1).exists(), "aged superseded gen kept")
    assert(!new java.io.File(dir, "postings").exists(),
      "aged superseded plain layout kept")
    assert(!staleTmp.exists(), "stale crashed-swap tmp pointer kept")
    assert(youngTmp.exists(), "in-flight tmp pointer deleted")
    assert(new java.io.File(gen2).exists(), "live generation deleted")
    assert(searchNow() == expected)

    // maintenance (incl. compaction trigger) still works post-vacuum
    LexicalIndex.applyBm25IndexChanges(spark, dir,
      Seq((21L, "fresh spark doc", "new")).toDF("doc_id", "text", "_change"),
      mode = "append"): Unit
    assert(LexicalIndex.bm25IndexHealth(spark, dir).maxGenerations == 2)
  }
}
