package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.types.TableConfig

/** Optimistic-concurrency commit for merge-table DATA publishes
  * (VERDICT r15 #1): before r16, two concurrent publishers both read
  * manifest N, both wrote a rival N+1, and the last pointer swap
  * silently dropped the loser's batch (the documented whole lost
  * update). The claim-marker protocol must instead (a) land BOTH
  * batches when they touch disjoint partitions (rebase), (b) land both
  * batches of racing same-partition APPENDS (append content never
  * depends on current content), and (c) refuse loudly — never lose —
  * when racing merges touch the same partition. */
class OccMergeSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableConfig("occ_t", Seq("k"), Seq.empty)

  private def freshDir(): String =
    Files.createTempDirectory("graft_occ").toString

  private def rowsOf(dir: String): Set[(String, Int, String)] =
    Sources.readMergePartitioned(spark, dir, "p")
      .select(col("k"), col("p").cast("int"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  test("racing merge publishes to DISJOINT partitions both land") {
    for (round <- 1 to 3) {
      val dir = freshDir()
      Sources.publishMergePartitioned(spark, dir,
        Seq(("seed1", 1, "s"), ("seed2", 2, "s")).toDF("k", "p", "v"),
        cfg, "p"): Unit
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = Seq(1, 2).map { p =>
        new Thread(() => {
          try {
            gate.await()
            Sources.publishMergePartitioned(spark, dir,
              Seq((s"w$p-$round", p, "x")).toDF("k", "p", "v"), cfg, "p"): Unit
          } catch { case t: Throwable => errs.add(t): Unit }
        })
      }
      threads.foreach(_.start()); gate.countDown()
      threads.foreach(_.join(180000))
      assert(errs.isEmpty, s"disjoint publish threw: ${errs.peek()}")
      // pre-r16 this lost one writer's whole batch to the swap race
      assert(rowsOf(dir) == Set(("seed1", 1, "s"), ("seed2", 2, "s"),
        (s"w1-$round", 1, "x"), (s"w2-$round", 2, "x")))
    }
  }

  test("racing APPENDS to the same partition both land (rebase, never refuse)") {
    for (round <- 1 to 3) {
      val dir = freshDir()
      Sources.publishMergeAppend(spark, dir,
        Seq(("seed", 1, "s")).toDF("k", "p", "v"), "p")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = Seq("a", "b").map { who =>
        new Thread(() => {
          try {
            gate.await()
            Sources.publishMergeAppend(spark, dir,
              Seq((s"$who-$round", 1, "x")).toDF("k", "p", "v"), "p")
          } catch { case t: Throwable => errs.add(t): Unit }
        })
      }
      threads.foreach(_.start()); gate.countDown()
      threads.foreach(_.join(180000))
      assert(errs.isEmpty, s"append threw: ${errs.peek()}")
      assert(rowsOf(dir) == Set(("seed", 1, "s"),
        (s"a-$round", 1, "x"), (s"b-$round", 1, "x")))
    }
  }

  test("racing merges on the SAME partition: refuse-or-serialize, never a silent loss") {
    var sawConflict = false
    for (round <- 1 to 5) {
      val dir = freshDir()
      Sources.publishMergePartitioned(spark, dir,
        Seq(("seed", 1, "s")).toDF("k", "p", "v"), cfg, "p"): Unit
      val refused = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = Seq("a", "b").map { who =>
        new Thread(() => {
          try {
            gate.await()
            Sources.publishMergePartitioned(spark, dir,
              Seq((s"$who-$round", 1, "x")).toDF("k", "p", "v"), cfg, "p"): Unit
          } catch {
            case _: java.util.ConcurrentModificationException =>
              refused.add(who): Unit // the loud path — caller re-derives
            case t: Throwable => errs.add(t): Unit
          }
        })
      }
      threads.foreach(_.start()); gate.countDown()
      threads.foreach(_.join(180000))
      assert(errs.isEmpty, s"unexpected error class: ${errs.peek()}")
      val present = rowsOf(dir)
      val refusedSet = { val it = refused.iterator(); val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next(); b.result() }
      sawConflict ||= refusedSet.nonEmpty
      // THE invariant: a writer's batch is in the table iff its publish
      // returned success — absent-and-silent is the pre-r16 bug
      for (who <- Seq("a", "b")) {
        val landed = present.contains((s"$who-$round", 1, "x"))
        if (refusedSet.contains(who))
          assert(!landed, s"$who was refused but its rows landed")
        else
          assert(landed, s"$who succeeded but its batch was silently lost")
      }
      assert(present.contains(("seed", 1, "s")))
    }
    info(if (sawConflict) "observed >=1 real overlap refusal across rounds"
         else "races serialized every round (both publishes landed)")
  }

  test("publisher base = latest COMMITTED state, even when the pointer lags") {
    val dir = freshDir()
    Sources.publishMergeAppend(spark, dir, Seq(("one", 1, "a")).toDF("k", "p", "v"), "p")
    Sources.publishMergeAppend(spark, dir, Seq(("two", 1, "b")).toDF("k", "p", "v"), "p")
    // simulate a publisher that claimed + wrote but whose pointer swap
    // never landed (crash between claim and swap): regress _current to
    // the oldest retained manifest by hand
    val root = new java.io.File(dir)
    val manifests = root.listFiles().map(_.getName)
      .filter(_.startsWith("manifest-")).sorted
    assert(manifests.length >= 2)
    Files.write(java.nio.file.Paths.get(dir, "_current"),
      manifests.head.getBytes("UTF-8")): Unit
    // a reader resolving the stale pointer sees the old state...
    assert(!rowsOf(dir).contains(("two", 1, "b")))
    // ...but the next PUBLISH must fold in the durably-claimed commit,
    // not rebase history from the stale pointer
    Sources.publishMergeAppend(spark, dir, Seq(("three", 1, "c")).toDF("k", "p", "v"), "p")
    assert(rowsOf(dir) == Set(("one", 1, "a"), ("two", 1, "b"), ("three", 1, "c")))
  }

  test("a content-less claim marker (crashed legacy claimer) never wedges publishing (ADVICE r16)") {
    val dir = freshDir()
    Sources.publishMergePartitioned(spark, dir,
      Seq(("seed", 1, "s")).toDF("k", "p", "v"), cfg, "p"): Unit
    // simulate the pre-r17 crash window: a marker created at
    // lastCommitted+1 whose content never got written. Before the fix
    // every later publish re-derived exactly this number, lost the
    // claim to the corpse 20 times, and threw — a PERMANENT wedge.
    val committed = Sources.mergeCommittedVersion(spark, dir)
    val poison = java.nio.file.Paths.get(dir, f"commit-${committed + 1}%012d")
    Files.write(poison, Array.emptyByteArray): Unit
    // publishes must number PAST the claimed-dead slot and land
    Sources.publishMergePartitioned(spark, dir,
      Seq(("after", 1, "x")).toDF("k", "p", "v"), cfg, "p"): Unit
    Sources.publishMergeAppend(spark, dir,
      Seq(("more", 2, "y")).toDF("k", "p", "v"), "p")
    assert(rowsOf(dir) == Set(("seed", 1, "s"), ("after", 1, "x"),
      ("more", 2, "y")))
    assert(Sources.mergeCommittedVersion(spark, dir) > committed + 1,
      "commits did not advance past the dead claim")
    // a garbage-content marker (crash mid-write) is the same class
    val committed2 = Sources.mergeCommittedVersion(spark, dir)
    Files.write(java.nio.file.Paths.get(dir, f"commit-${committed2 + 1}%012d"),
      "garbage".getBytes("UTF-8")): Unit
    Sources.publishMergePartitioned(spark, dir,
      Seq(("again", 1, "z")).toDF("k", "p", "v"), cfg, "p"): Unit
    assert(rowsOf(dir).contains(("again", 1, "z")))
  }

  test("a refused publish leaves no orphan batch dir or loser manifest behind (ADVICE r16)") {
    val dir = freshDir()
    Sources.publishMergePartitioned(spark, dir,
      Seq(("seed", 1, "s")).toDF("k", "p", "v"), cfg, "p"): Unit
    def listing() = new java.io.File(dir).listFiles().map(_.getName).toSet
    val before = listing()
    // force a deterministic stale-snapshot refuse: derive a publish from
    // the current state, let a rival commit to the same partition first,
    // then commit the stale publish — publishMergePartitioned re-reads
    // at entry, so instead drive the refuse through publishMergeReplace
    // with a pinned stale basis (same commit path, same reclaim contract)
    val basis = Sources.mergeCommittedVersion(spark, dir)
    val stale = Sources.readMergePartitioned(spark, dir, "p")
      .filter(col("p") === 1).localCheckpoint(false)
    Sources.publishMergePartitioned(spark, dir,
      Seq(("rival", 1, "r")).toDF("k", "p", "v"), cfg, "p"): Unit
    val afterRival = listing()
    intercept[java.util.ConcurrentModificationException] {
      Sources.publishMergeReplace(spark, dir, stale, "p", Seq(1),
        basisVersion = Some(basis))
    }
    val afterRefuse = listing()
    // the refused publish must not add anything durable: no b-* dir, no
    // manifest, no commit marker beyond what the rival left
    assert(afterRefuse == afterRival,
      s"refuse left litter: ${(afterRefuse -- afterRival).mkString(", ")}")
    assert((afterRival -- before).exists(_.startsWith("b-")),
      "sanity: the rival's publish did add a batch dir")
    // table state is exactly the rival's merge result
    assert(rowsOf(dir) == Set(("seed", 1, "s"), ("rival", 1, "r")))
  }

  test("compaction (replace) racing an append: the appended batch survives") {
    // replace refuses only when a rival committed AFTER its read; an
    // append that lands first is IN its read; one that lands during the
    // replace either rebases the append or refuses the replace — the
    // appended rows must never vanish silently.
    for (round <- 1 to 3) {
      val dir = freshDir()
      Sources.publishMergeAppend(spark, dir,
        Seq(("seed", 1, "s"), ("seed2", 1, "t")).toDF("k", "p", "v"), "p")
      val gate = new java.util.concurrent.CountDownLatch(1)
      val replaceRefused = new java.util.concurrent.atomic.AtomicBoolean(false)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val tAppend = new Thread(() => {
        try { gate.await()
          Sources.publishMergeAppend(spark, dir,
            Seq((s"app-$round", 1, "x")).toDF("k", "p", "v"), "p")
        } catch { case t: Throwable => errs.add(t): Unit }
      })
      val tReplace = new Thread(() => {
        try { gate.await()
          // the transactional compaction pattern: snapshot the basis
          // BEFORE reading the content to fold
          val basis = Sources.mergeCommittedVersion(spark, dir)
          val cur = Sources.readMergePartitioned(spark, dir, "p")
            .filter(col("p") === 1).localCheckpoint(false)
          Sources.publishMergeReplace(spark, dir, cur, "p", Seq(1),
            basisVersion = Some(basis))
        } catch {
          case _: java.util.ConcurrentModificationException =>
            replaceRefused.set(true)
          case t: Throwable => errs.add(t): Unit
        }
      })
      Seq(tAppend, tReplace).foreach(_.start()); gate.countDown()
      Seq(tAppend, tReplace).foreach(_.join(180000))
      assert(errs.isEmpty, s"unexpected error: ${errs.peek()}")
      val present = rowsOf(dir)
      assert(present.contains((s"app-$round", 1, "x")),
        s"appended batch vanished (replaceRefused=${replaceRefused.get()})")
      assert(present.contains(("seed", 1, "s")) && present.contains(("seed2", 1, "t")))
    }
  }

  test("corpse reclaim is exclusive: a paused rival's resumed reclaim cannot destroy the winner's valid marker (ADVICE r17 #2)") {
    val dir = freshDir()
    Sources.publishMergePartitioned(spark, dir,
      Seq(("seed", 1, "s")).toDF("k", "p", "v"), cfg, "p"): Unit
    val committed = Sources.mergeCommittedVersion(spark, dir)
    val n = committed + 1
    // a legacy corpse at lastCommitted+1: publisher A reads it as a
    // corpse, then pauses indefinitely (GC) before its delete
    Files.write(java.nio.file.Paths.get(dir, f"commit-$n%012d"),
      Array.emptyByteArray): Unit
    // rival B publishes meanwhile: reclaims the corpse (rename to the
    // permanent tombstone), wins number n with a VALID marker, swaps
    Sources.publishMergeAppend(spark, dir,
      Seq(("bwin", 1, "b")).toDF("k", "p", "v"), "p")
    assert(Sources.mergeCommittedVersion(spark, dir) == n,
      "B did not win the reclaimed number")
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
    val root = new org.apache.hadoop.fs.Path(dir)
    val marker = new org.apache.hadoop.fs.Path(root, f"commit-$n%012d")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, f"_corpse-$n%012d")),
      "reclaim left no tombstone")
    def markerContent(): String = {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    val valid = markerContent()
    assert(valid.startsWith("manifest-"))
    // A resumes: pre-r18 its blind deleteQuiet destroyed B's valid
    // marker here, A re-claimed n and silently dropped B's batch. The
    // tombstoned reclaim loses on dest-exists and touches nothing.
    Sources.reclaimCorpseMarker(fs, uri, root, marker, n)
    assert(markerContent() == valid, "resumed reclaim touched the valid marker")
    assert(rowsOf(dir) == Set(("seed", 1, "s"), ("bwin", 1, "b")))
    // and the table stays fully publishable afterwards
    Sources.publishMergeAppend(spark, dir,
      Seq(("after", 2, "c")).toDF("k", "p", "v"), "p")
    assert(rowsOf(dir).contains(("after", 2, "c")))
  }
}
