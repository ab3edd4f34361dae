package graft.sources

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.SparkSpec

/** The round-10 bulk index builders: ONE Spark job indexes N batch
  * dirs (footer-metadata sizing, no per-dir count pass), and the
  * sidecar bytes are IDENTICAL to the round-9 serial per-dir build —
  * bloom (same BloomFilterAggregate expression, same per-dir
  * n/numBits, commutative insertion) and zonemap (same min/max, same
  * repr writer). */
class IndexBulkSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft_idx_$tag").toString + "/t"
    val cfg = graft.types.TableConfig("t", Seq("k"), Seq.empty)
    // DISJOINT partitions per publish so the live manifest references
    // all three b- dirs: the builders index only manifest-referenced
    // dirs (r15 — a sidecar for a dir no reader can resolve is a
    // wasted full scan)
    def batch(lo: Long, hi: Long, pBase: Int) =
      (lo to hi).map(i => (i, s"name-$i", java.sql.Timestamp.valueOf(
        f"2024-01-${(i % 27) + 1}%02d 00:00:00"))).toDF("k", "name", "ts")
        .withColumn("p",
          (org.apache.spark.sql.functions.col("k") % 2 + pBase).cast("int"))
    Sources.publishMergePartitioned(spark, dir, batch(1, 40, 0), cfg, "p")
    Sources.publishMergePartitioned(spark, dir, batch(41, 80, 2), cfg, "p")
    Sources.publishMergePartitioned(spark, dir, batch(81, 120, 4), cfg, "p")
    dir
  }

  private def sidecars(dir: String, name: String): Map[String, Array[Byte]] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    fs.listStatus(root).collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("b-") =>
        val p = new org.apache.hadoop.fs.Path(st.getPath, name)
        val in = fs.open(p)
        val bytes = try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
          buf.toByteArray
        } finally in.close()
        st.getPath.getName -> bytes
    }.toMap
  }

  test("bulk bloom build is byte-identical to the serial build (long and string keys)") {
    Seq("k", "name").foreach { keyCol =>
      val a = mkTable(s"ser_$keyCol")
      val b = mkTable(s"blk_$keyCol")
      assert(Sources.indexBatchKeysSerial(spark, a, keyCol) == 3)
      assert(Sources.indexBatchKeys(spark, b, keyCol) == 3)
      val sa = sidecars(a, s"_keybloom-$keyCol")
      val sb = sidecars(b, s"_keybloom-$keyCol")
      assert(sa.keySet.size == 3 && sb.keySet.size == 3)
      // dir names differ across tables (uid suffix) — compare the
      // SORTED byte blobs (publish order fixes the content per slot)
      val ba = sa.toSeq.sortBy(_._1).map(_._2)
      val bb = sb.toSeq.sortBy(_._1).map(_._2)
      ba.zip(bb).foreach { case (x, y) =>
        assert(java.util.Arrays.equals(x, y), s"bloom bytes differ for keyCol=$keyCol")
      }
    }
  }

  test("bulk zonemap build is byte-identical to the serial build (long, string, timestamp)") {
    Seq("k", "name", "ts").foreach { statCol =>
      val a = mkTable(s"zser_$statCol")
      val b = mkTable(s"zblk_$statCol")
      assert(Sources.indexBatchStatsSerial(spark, a, statCol) == 3)
      assert(Sources.indexBatchStats(spark, b, statCol) == 3)
      val sa = sidecars(a, s"_zonemap-$statCol").toSeq.sortBy(_._1).map(_._2)
      val sb = sidecars(b, s"_zonemap-$statCol").toSeq.sortBy(_._1).map(_._2)
      sa.zip(sb).foreach { case (x, y) =>
        assert(new String(x, "UTF-8") == new String(y, "UTF-8"),
          s"zonemap differs for statCol=$statCol: " +
            s"'${new String(x, "UTF-8")}' vs '${new String(y, "UTF-8")}'")
      }
    }
  }

  // the listener bus is async; a short settle keeps the count exact
  private def waitForListeners(): Unit = Thread.sleep(500)

  test("bulk key index runs ONE Spark job for N dirs; idempotent re-run runs none") {
    val dir = mkTable("onejob")
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(Sources.indexBatchKeys(spark, dir, "k") == 3)
      waitForListeners()
      assert(jobs == 1, s"expected exactly one job for 3 dirs, saw $jobs")
      jobs = 0
      assert(Sources.indexBatchKeys(spark, dir, "k") == 0) // all indexed
      waitForListeners()
      assert(jobs == 0, s"idempotent re-run must schedule no job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("schema-evolution guard: a dir lacking the column fails loudly, never an empty sidecar") {
    val dir = Files.createTempDirectory("graft_idx_evo").toString + "/t"
    val cfg = graft.types.TableConfig("t", Seq("k"), Seq.empty)
    import org.apache.spark.sql.functions.col
    // first batch has no 'extra' column; second does
    Sources.publishMergePartitioned(spark, dir,
      (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
        .withColumn("p", (col("k") % 2).cast("int")), cfg, "p")
    Sources.publishMergePartitioned(spark, dir,
      (11L to 20L).map(i => (i, s"v$i", i * 2)).toDF("k", "v", "extra")
        .withColumn("p", (col("k") % 2).cast("int")), cfg, "p")
    val e1 = intercept[IllegalArgumentException] {
      Sources.indexBatchKeys(spark, dir, "extra")
    }
    assert(e1.getMessage.contains("no column 'extra'"))
    val e2 = intercept[IllegalArgumentException] {
      Sources.indexBatchStats(spark, dir, "extra")
    }
    assert(e2.getMessage.contains("no column 'extra'"))
    // no half-written sidecars left behind
    assert(sidecars0(dir, "_keybloom-extra").isEmpty)
    assert(sidecars0(dir, "_zonemap-extra").isEmpty)
  }

  private def sidecars0(dir: String, name: String): Map[String, Array[Byte]] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("b-") &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, name)) =>
        st.getPath.getName -> Array.empty[Byte]
    }.toMap
  }

  test("keyed lookup and range scan behave identically over bulk-built sidecars") {
    val dir = mkTable("use")
    Sources.indexBatchKeys(spark, dir, "k")
    Sources.indexBatchStats(spark, dir, "k")
    val hit = Sources.readMergePartitionedKeyed(spark, dir, "p", "k", Seq(42L))
      .collect()
    assert(hit.map(_.getAs[Long]("k")).toSeq == Seq(42L))
    val ranged = Sources.readMergePartitionedRange(spark, dir, "p", "k",
        lower = Some(100L), upper = Some(110L))
      .select("k").collect().map(_.getLong(0)).sorted
    assert(ranged.toSeq == (100L to 110L))
  }
}
