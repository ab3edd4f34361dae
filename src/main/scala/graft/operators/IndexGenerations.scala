package graft.operators

import org.apache.spark.sql.SparkSession

/** Atomic GENERATION swap for persisted index directories — the
  * retrain/rebuild half of the index-maintenance story.
  *
  * Incremental maintenance ([[SimilaritySearch.applyIvfPqIndexChanges]],
  * [[LexicalIndex.applyBm25IndexChanges]]) keeps an index trailing its
  * corpus at delta cost, but some changes can only be a full rebuild:
  * retraining drifted IVF-PQ quantizers, re-bucketing BM25 postings, a
  * retention purge that must drop rows from every partition. Rebuilding
  * IN PLACE (overwrite the live dirs) tears the index under concurrent
  * readers — a searcher that has read the new codes against the old
  * codebooks computes garbage distances, silently.
  *
  * So a rebuild is a new GENERATION: the full index layout (codes +
  * quantizers + stats + its own fresh tombstone log) is built complete
  * and cold in `<dir>/gen-<n>-<uid>/`, then ONE control file (`_gen`,
  * the same tmp-write + atomic-rename-over discipline as the merge
  * tables' `_current` pointer — [[graft.sources.Sources.atomicReplace]])
  * is swapped to name it. Every reader and every maintenance entry
  * point resolves the pointer first, so the swap is atomic for all of
  * them: a reader mid-search keeps the OLD generation (untouched until
  * [[vacuum]]), the next resolve gets the new one, and incremental
  * maintenance simply continues against whichever generation it
  * resolved. A directory with no pointer IS its own generation (the
  * legacy/plain layout), which keeps every pre-generation index
  * readable unchanged.
  *
  * Writer discipline: generation builds write only their own cold
  * subdir, so a rebuild may overlap live SEARCHES freely. It must not
  * overlap incremental APPLIES of the outgoing generation — their
  * updates survive in the old dir but are not in the rebuild input
  * (the documented lost-update of rebuilding from a moving corpus);
  * quiesce the applier across the cutover, as a checkpointed
  * change-feed consumer naturally does between micro-batches.
  * [[vacuum]] additionally requires no in-flight readers of superseded
  * generations (grace-period deletion, the merge tables' vacuum
  * contract). */
private[graft] object IndexGenerations {

  private val PointerName = "_gen"
  private val GenPrefix = "gen-"

  private def fsOf(spark: SparkSession, d: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)

  /** The live generation dir: `<dir>/<pointee>` when the `_gen`
    * pointer exists, else `dir` itself (plain / pre-generation
    * layout). */
  def resolve(spark: SparkSession, dir: String): String = {
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, PointerName)
    if (!fs.exists(p)) dir
    else {
      val in = fs.open(p)
      val name =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(name.nonEmpty && !name.contains("/") && !name.contains(".."),
        s"index generation pointer $p names an invalid generation '$name'")
      val gen = new org.apache.hadoop.fs.Path(dir, name)
      require(fs.exists(gen),
        s"index generation pointer $p names $name, which does not exist — " +
          "vacuumed too eagerly?")
      gen.toString
    }
  }

  /** Path for the next generation build (monotonic over live gen dirs;
    * uid suffix keeps racing builders from colliding on a dir). The
    * caller builds the full layout there, then [[swap]]s. */
  def next(spark: SparkSession, dir: String): String = {
    val fs = fsOf(spark, dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val n =
      if (!fs.exists(root)) 1L
      else fs.listStatus(root).toSeq.collect {
        case st if st.isDirectory && st.getPath.getName.startsWith(GenPrefix) =>
          val num = st.getPath.getName.drop(GenPrefix.length).takeWhile(_.isDigit)
          if (num.isEmpty) 0L else num.toLong
      }.foldLeft(0L)(math.max) + 1L
    val uid = java.util.UUID.randomUUID().toString.take(8)
    new org.apache.hadoop.fs.Path(root, s"$GenPrefix$n-$uid").toString
  }

  /** Atomically point the index at a fully-built generation dir
    * (must be a direct child of `dir`, as [[next]] returns). */
  def swap(spark: SparkSession, dir: String, genDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val gen = new org.apache.hadoop.fs.Path(genDir)
    require(gen.getParent != null &&
        gen.getParent.toUri.getPath == root.toUri.getPath &&
        gen.getName.startsWith(GenPrefix),
      s"generation $genDir is not a direct gen-* child of $dir")
    require(fsOf(spark, genDir).exists(gen),
      s"generation $genDir does not exist — build it before swapping")
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    graft.sources.Sources.atomicReplace(fsOf(spark, dir),
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration,
      root, PointerName, gen.getName, stamp)
  }

  /** Delete superseded generation dirs (anything `gen-*` the pointer
    * does not name). No-op on a plain layout. Returns dirs deleted.
    * Requires no in-flight readers of the superseded generations —
    * run after a grace period, like the merge tables' vacuum. */
  def vacuum(spark: SparkSession, dir: String): Int = {
    val fs = fsOf(spark, dir)
    val ptr = new org.apache.hadoop.fs.Path(dir, PointerName)
    if (!fs.exists(ptr)) return 0
    val live = new org.apache.hadoop.fs.Path(resolve(spark, dir)).getName
    val root = new org.apache.hadoop.fs.Path(dir)
    val dead = fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith(GenPrefix) &&
          st.getPath.getName != live => st.getPath
    }
    dead.foreach(p => fs.delete(p, true): Unit)
    dead.size
  }
}
