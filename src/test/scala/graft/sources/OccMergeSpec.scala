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
}
