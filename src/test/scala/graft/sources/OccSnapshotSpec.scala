package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{IdentityResolver, IncrementalIdentity}

/** Optimistic-concurrency commit for SNAPSHOT and snapshot-GROUP
  * publishes (VERDICT r16 #1): before r17 two racing snapshot
  * publishers degraded to a documented whole lost update — the last
  * pointer swap silently replaced the loser's table. The registry
  * evolution path ([[IncrementalIdentity.resolveCycle]]) publishes the
  * subjects+local_ids group through exactly this path, so a
  * double-fired scheduler was a lost registry fold. Now every publish
  * claims its version with a dense `commit-<n>` marker; a raced loser
  * REFUSES loudly (`ConcurrentModificationException`) — snapshot
  * content derives from the prior snapshot, so rebase is unsound and
  * refuse-and-redrive is the semantic (the reference's serializable
  * load txn, table-loader/services/loader.py:102). */
class OccSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_occ_snap").toString + "/t"

  test("racing snapshot publishes: one wins, the loser refuses loudly, a redrive lands") {
    for (round <- 1 to 3) {
      val dir = freshDir()
      Sources.publishSnapshot(Seq(0).toDF("x"), dir)
      val refused = new java.util.concurrent.ConcurrentLinkedQueue[Int]
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val gate = new java.util.concurrent.CountDownLatch(1)
      // both threads snapshot the SAME basis before the gate — the
      // transactional read-derive-publish shape a registry fold has
      val basis = Sources.snapshotReadBasis(spark, dir)
      val threads = Seq(1, 2).map { k =>
        new Thread(() => {
          try {
            gate.await()
            Sources.publishSnapshot(Seq(k).toDF("x"), dir,
              basis = Some(basis))
          } catch {
            case _: java.util.ConcurrentModificationException =>
              refused.add(k): Unit
            case t: Throwable => errs.add(t): Unit
          }
        })
      }
      threads.foreach(_.start()); gate.countDown()
      threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"unexpected error class: ${errs.peek()}")
      // exactly one basis-pinned publish can land per basis
      assert(refused.size == 1,
        s"round $round: expected exactly 1 refusal, got ${refused.size}")
      val winner = Seq(1, 2).filterNot(k => refused.contains(k)).head
      val live = Sources.readSnapshot(spark, dir).collect().map(_.getInt(0)).toSeq
      assert(live == Seq(winner),
        s"live table is not the winner's complete frame: $live")
      // the refuse is redrivable: re-read the basis, re-derive, publish
      val loser = refused.peek()
      Sources.publishSnapshot(Seq(loser * 100).toDF("x"), dir,
        basis = Some(Sources.snapshotReadBasis(spark, dir)))
      assert(Sources.readSnapshot(spark, dir).collect()
        .map(_.getInt(0)).toSeq == Seq(loser * 100))
    }
  }

  test("a stale basis refuses even with no claim contention (rival landed before entry)") {
    val dir = freshDir()
    Sources.publishSnapshot(Seq(1, 2).toDF("x"), dir)
    val basis = Sources.snapshotReadBasis(spark, dir)
    // a rival commits AFTER this publish derived its content
    Sources.publishSnapshot(Seq(3).toDF("x"), dir)
    intercept[java.util.ConcurrentModificationException] {
      Sources.publishSnapshot(Seq(99).toDF("x"), dir, basis = Some(basis))
    }
    // the rival's table is intact — refused, not lost
    assert(Sources.readSnapshot(spark, dir).collect()
      .map(_.getInt(0)).toSeq == Seq(3))
    // group publishes carry the identical contract
    val gdir = freshDir()
    Sources.publishSnapshotGroup(Seq("a" -> Seq(1).toDF("x")), gdir)
    val gBasis = Sources.snapshotReadBasis(spark, gdir)
    Sources.publishSnapshotGroup(Seq("a" -> Seq(2).toDF("x")), gdir)
    intercept[java.util.ConcurrentModificationException] {
      Sources.publishSnapshotGroup(Seq("a" -> Seq(9).toDF("x")), gdir,
        basis = Some(gBasis))
    }
    assert(Sources.readSnapshotGroup(spark, gdir, "a").collect()
      .map(_.getInt(0)).toSeq == Seq(2))
  }

  test("a content-less claim marker (crashed claimer) never wedges snapshot publishing") {
    val dir = freshDir()
    Sources.publishSnapshot(Seq(1).toDF("x"), dir)
    val committed = Sources.snapshotCommittedVersion(spark, dir)
    // crash window: claim created, data never written, swap never
    // landed — the marker burns its number but must not wedge anyone
    Files.write(java.nio.file.Paths.get(dir, f"commit-${committed + 1}%012d"),
      Array.emptyByteArray): Unit
    Sources.publishSnapshot(Seq(2).toDF("x"), dir)
    assert(Sources.readSnapshot(spark, dir).collect()
      .map(_.getInt(0)).toSeq == Seq(2))
    assert(Sources.snapshotCommittedVersion(spark, dir) == committed + 2,
      "the publish did not number past the dead claim")
  }

  test("double-fired resolve cycle: the losing cycle refuses loudly; a redriven cycle converges (VERDICT r16 #1)") {
    val root = Files.createTempDirectory("graft_occ_cycle").toString
    val (fragDir, ckDir, regRoot) = (s"$root/f", s"$root/ck", s"$root/r")
    val day = java.sql.Date.valueOf("2024-06-01")
    val cfg = graft.types.TableConfig("fragments", Seq("request_id"), Seq.empty)
    val reg0 = IdentityResolver.Registry(
      Seq(("G1", 1, "2020-01-01")).toDF("global_subject_id", "center_id", "created_at")
        .withColumn("created_at", col("created_at").cast("date")),
      Seq((1, "a", "primary", "G1"))
        .toDF("center_id", "local_subject_id", "identifier_type", "global_subject_id"))
    IncrementalIdentity.publishRegistry(reg0, regRoot)
    def frag(rows: Seq[(Long, Int, String)]) =
      rows.toDF("request_id", "center_id", "local_subject_id")
        .withColumn("identifier_type", lit("primary"))
        .withColumn("p", (col("request_id") % 2).cast("int"))
    val batch = Seq((101L, 1, "b"), (102L, 2, "c"))
    Sources.publishMergePartitioned(spark, fragDir, frag(batch), cfg, "p"): Unit

    // sequential ground truth: ONE cycle folds the batch exactly once
    val seqRoot = s"$root/rseq"
    IncrementalIdentity.publishRegistry(reg0, seqRoot)
    val seqCk = s"$root/ckseq"
    IncrementalIdentity.resolveCycle(spark, fragDir, seqCk, seqRoot,
      Seq("request_id"), day, "p", groupingIterations = 1)(identity): Unit
    def rows(r: String) = {
      val m = IncrementalIdentity.readRegistry(spark, r)
      (m.subjects.collect().map(_.toString).toSeq.sorted,
        m.localIds.collect().map(_.toString).toSeq.sorted)
    }
    val expected = rows(seqRoot)

    // two schedulers double-fire the SAME cycle (same checkpoint, same
    // registry): pre-r17 the second publish silently replaced the
    // first's fold — now exactly one Cycle lands and the loser either
    // refuses loudly (raced past the winner's publish) or no-ops
    // (arrived after the winner's checkpoint advance)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = Seq("s1", "s2").map { who =>
      new Thread(() => {
        try {
          gate.await()
          val c = IncrementalIdentity.resolveCycle(spark, fragDir, ckDir,
            regRoot, Seq("request_id"), day, "p", groupingIterations = 1)(identity)
          outcomes.add(if (c.isDefined) s"$who:cycle" else s"$who:noop"): Unit
        } catch {
          case _: java.util.ConcurrentModificationException =>
            outcomes.add(s"$who:refused"): Unit
          case t: Throwable => errs.add(t): Unit
        }
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"unexpected error class: ${errs.peek()}")
    val byKind = { val it = outcomes.iterator(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result() }.map(_.split(":")(1))
    // at least one fold lands; a second "cycle" outcome is the benign
    // interleaving where the loser read the WINNER'S registry before
    // resolving (fresh basis, idempotent re-apply — the crash-window
    // semantic); what can never happen is a silent lost or double fold,
    // which the registry equality below pins
    assert(byKind.count(_ == "cycle") >= 1,
      s"no scheduler landed the fold: $byKind")
    info(s"double-fire outcomes: $byKind")
    // the registry equals ONE sequential fold — never a double-mint,
    // never a lost fold
    assert(rows(regRoot) == expected, "registry diverged from the single fold")
    // a redriven cycle (the loser retrying after its refusal) is a
    // clean no-op: the winner advanced the checkpoint
    val redrive = IncrementalIdentity.resolveCycle(spark, fragDir, ckDir,
      regRoot, Seq("request_id"), day, "p", groupingIterations = 1)(identity)
    assert(redrive.isEmpty, "redriven cycle re-folded an already-folded batch")
    assert(rows(regRoot) == expected)

    // DETERMINISTIC interleaving of the same race: cycle B reads its
    // basis, then a rival scheduler runs the whole cycle to completion
    // before B publishes — B MUST refuse loudly (its fold derives from
    // the pre-rival registry), B's checkpoint must not advance, and a
    // redriven B converges against the winner's registry.
    val root2 = Files.createTempDirectory("graft_occ_cycle2").toString
    val (fragDir2, regRoot2) = (s"$root2/f", s"$root2/r")
    val (ckA, ckB) = (s"$root2/cka", s"$root2/ckb")
    IncrementalIdentity.publishRegistry(reg0, regRoot2)
    Sources.publishMergePartitioned(spark, fragDir2, frag(batch), cfg, "p"): Unit
    intercept[java.util.ConcurrentModificationException] {
      IncrementalIdentity.resolveCycle(spark, fragDir2, ckB, regRoot2,
        Seq("request_id"), day, "p", groupingIterations = 1) { delta =>
        // fires after B's basis read (the cycle body reads the basis
        // and registry before building candidates): the rival lands
        // the same fold first
        IncrementalIdentity.resolveCycle(spark, fragDir2, ckA, regRoot2,
          Seq("request_id"), day, "p", groupingIterations = 1)(identity): Unit
        delta
      }
    }
    val expected2 = rows(regRoot2)
    // B redrives: its checkpoint never advanced, so the delta is
    // redelivered; resolution against the winner's registry is the
    // match-first idempotent re-apply — registry unchanged
    val redriveB = IncrementalIdentity.resolveCycle(spark, fragDir2, ckB,
      regRoot2, Seq("request_id"), day, "p", groupingIterations = 1)(identity)
    assert(redriveB.isDefined, "loser's checkpoint advanced despite the refusal")
    assert(rows(regRoot2) == expected2,
      "redriven cycle was not an idempotent re-apply")
  }

  // ────────────────────── r18: the claim-to-swap window ──────────────────────

  private def hadoopBits(dir: String) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(dir)
    (org.apache.hadoop.fs.FileSystem.get(uri, conf), uri, conf,
      new org.apache.hadoop.fs.Path(dir))
  }

  /** Simulate a rival publisher's claim exactly as claimSnapshotVersion
    * leaves it: a content-atomic `commit-<n>` marker naming a fully
    * written (but UNSWAPPED) version dir. */
  private def rivalClaim(dir: String, n: Long, uid: String, value: Int): String = {
    import spark.implicits._
    val vdir = f"v-$n%012d-$uid"
    Seq(value).toDF("x").write.parquet(s"$dir/$vdir")
    Files.write(java.nio.file.Paths.get(dir, f"commit-$n%012d"),
      vdir.getBytes("UTF-8")): Unit
    vdir
  }

  test("ADVICE r17: a rival's swap landing inside the basis's claim-to-swap window refuses (pointer pin)") {
    val dir = freshDir()
    Sources.publishSnapshot(Seq(1).toDF("x"), dir)
    // rival A claims version 2 (claim-before-write) and finishes its
    // data write, but has NOT swapped yet
    val vdirA = rivalClaim(dir, 2L, "rivala", 222)
    // B takes its read basis now: committed already counts A's claim
    // (2), but the pointer — the version B's content reads resolve —
    // is still 1
    val basis = Sources.snapshotReadBasis(spark, dir)
    assert(basis.committed == 2L && basis.pointer == 1L,
      s"test setup drifted: $basis")
    assert(Sources.readSnapshot(spark, dir).collect().map(_.getInt(0)).toSeq
      == Seq(1), "B's content read must still resolve version 1")
    // A swaps its fold live — inside B's claim-to-swap window
    val (fs, uri, conf, root) = hadoopBits(dir)
    Sources.swapSnapshotOrRefuse(fs, uri, conf, root, dir, vdirA, 2L, "rivala")
    // pre-r18 this passed (committed == basis == 2), claimed 3 and
    // silently replaced A's fold with content derived from version 1
    intercept[java.util.ConcurrentModificationException] {
      Sources.publishSnapshot(Seq(99).toDF("x"), dir, basis = Some(basis))
    }
    assert(Sources.readSnapshot(spark, dir).collect().map(_.getInt(0)).toSeq
      == Seq(222), "rival A's fold was lost")
    // the refusal is redrivable with a fresh basis over A's fold
    Sources.publishSnapshot(Seq(300).toDF("x"), dir,
      basis = Some(Sources.snapshotReadBasis(spark, dir)))
    assert(Sources.readSnapshot(spark, dir).collect().map(_.getInt(0)).toSeq
      == Seq(300))
  }

  test("an in-flight rival claim blocks ALL publishes until swap or age-out; the aged-out zombie's swap refuses") {
    val dir = freshDir()
    Sources.publishSnapshot(Seq(1).toDF("x"), dir)
    // rival A is mid-publish: claimed version 2, still writing
    val vdirA = rivalClaim(dir, 2L, "inflight", 222)
    // no publisher — pinned or not — may claim past a live in-flight
    // rival: claiming 3 would let this publish (derived from version
    // 1) swap over A's fold when A lands mid-write
    val e = intercept[java.util.ConcurrentModificationException] {
      Sources.publishSnapshot(Seq(99).toDF("x"), dir)
    }
    assert(e.getMessage.contains("in-flight"), e.getMessage)
    // A ages past the liveness grace → declared dead: publishes
    // proceed (numbering past), and the prune reclaims A's litter
    sys.props("graft.snapshot.graceMs") = "0"
    try {
      Sources.publishSnapshot(Seq(3).toDF("x"), dir)
      assert(Sources.readSnapshot(spark, dir).collect().map(_.getInt(0)).toSeq
        == Seq(3))
      val (fs, uri, conf, root) = hadoopBits(dir)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(root, vdirA)),
        "dead claimer's version dir was not reclaimed")
      // the zombie writer (actually alive, just slower than the grace)
      // now tries to land its swap: it must refuse loudly — its number
      // was declared dead and its dir reclaimed; swapping would point
      // readers at a deleted dir or replace the rival's fold
      intercept[java.util.ConcurrentModificationException] {
        Sources.swapSnapshotOrRefuse(fs, uri, conf, root, dir, vdirA, 2L,
          "inflight")
      }
      assert(Sources.readSnapshot(spark, dir).collect().map(_.getInt(0)).toSeq
        == Seq(3), "zombie swap landed")
    } finally sys.props.remove("graft.snapshot.graceMs"): Unit
  }

  test("crash-loop litter above live is bounded: aged claims + dirs are reclaimed by later publishes (VERDICT r17 #3)") {
    val dir = freshDir()
    Sources.publishSnapshot(Seq(1).toDF("x"), dir)
    // three crashed publish attempts: each claimed, wrote (some of)
    // its version dir, and died before the swap
    val crashDirs = (2L to 4L).map(n => rivalClaim(dir, n, s"crash$n", n.toInt))
    val (fs, _, _, root) = hadoopBits(dir)
    def names(): Set[String] =
      fs.listStatus(root).toSeq.map(_.getPath.getName).toSet
    // fresh litter is NEVER touched (it may be an in-flight write):
    // within the grace a publish refuses rather than reclaims
    intercept[java.util.ConcurrentModificationException] {
      Sources.publishSnapshot(Seq(9).toDF("x"), dir)
    }
    assert(crashDirs.forall(names()), "fresh litter was touched")
    sys.props("graft.snapshot.graceMs") = "0"
    try {
      // aged out → the next successful publish reclaims every crashed
      // version DIR at claim time (the expensive half, reclaimed while
      // provably never-live)
      Sources.publishSnapshot(Seq(10).toDF("x"), dir)
      assert(crashDirs.forall(d => !names().contains(d)),
        s"crashed version dirs survived: ${names()}")
      // the burned markers are tiny and die as the pointer passes them
      // (below-live retention) — two more publishes collect all three
      Sources.publishSnapshot(Seq(11).toDF("x"), dir)
      Sources.publishSnapshot(Seq(12).toDF("x"), dir)
      assert((2L to 4L).forall(n => !names().contains(f"commit-$n%012d")),
        s"burned crash markers survived: ${names()}")
      assert(Sources.readSnapshot(spark, dir).collect().map(_.getInt(0)).toSeq
        == Seq(12))
    } finally sys.props.remove("graft.snapshot.graceMs"): Unit
  }
}
