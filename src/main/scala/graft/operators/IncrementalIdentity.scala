package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Continuous identity resolution — §2.9's resolver driven by the
  * merge-table change feed instead of a corpus rescan.
  *
  * The reference approximates continuous MDM with cron re-extracts
  * (`docs/developers/architecture/data-flow.md:496-523`): every cycle
  * re-pulls the fragment tables and re-runs resolution over
  * EVERYTHING. At 100 TB that rescan is the cost ceiling. This
  * operator composes two primitives the engine already has —
  * [[Sources.processMergeRowChanges]] (checkpointed ROW-level CDC
  * over a [[Sources.publishMergePartitioned]] fragments table) and
  * [[IdentityResolver]] (set-based resolve → links → applyBatch) —
  * so each cycle reads ONLY the rows that changed since the last
  * checkpoint, resolves them against the current registry snapshot,
  * and publishes the evolved registry. Work per cycle is bounded by
  * changed data, never table size.
  *
  * Row-level (not partition-level) delivery is load-bearing here:
  * partition-level CDC re-delivers whole rewritten partitions, and an
  * already-resolved identifier arriving BESIDE a new center's claim
  * of the same identifier changes the batch's link statement (the
  * link merge is delete-and-replace per identifier — two centers in
  * one batch is a different input than one center re-presenting).
  * With the row diff, each cycle's batch is exactly the rows a
  * sequential operator would have seen, so incremental ≡ sequential
  * EXACTLY (the `q_identity_incremental` gate proves it against the
  * same oracle the two-batch evolution gate uses).
  *
  * Correctness under redelivery (the crash story):
  *  - the change feed is AT-LEAST-ONCE: its checkpoint advances only
  *    after the cycle body returns, so a crash anywhere inside the
  *    body re-delivers the same delta next run;
  *  - redelivery is absorbed by resolution's match-first idempotency
  *    (the `q_identity_rerun` property): a re-presented identifier
  *    links to its already-minted GSID, mints nothing, re-merges
  *    identical link rows, and the dated-note guard keeps same-day
  *    reruns from duplicating review notes.
  *  - the registry snapshot itself is published with
  *    [[Sources.publishSnapshotGroup]]: subjects and local_ids move
  *    under ONE atomic pointer swap, so a crash can never leave
  *    subjects from cycle N beside local_ids from N−1 (a torn
  *    registry would re-mint duplicate subject rows on redelivery).
  *
  * Scale shape: the delta→registry join is [[IdentityResolver]]'s J1
  * (shuffle on normalized identifier, auto-armed salted skew
  * fallback); the registry read is a pointer-resolved parquet scan;
  * the publish rewrites the registry snapshot — at very large
  * registries pair this with [[graft.catalog.RegistryCatalog]]'s
  * bucketed layout, which resolve() auto-routes on.
  */
object IncrementalIdentity {

  /** Registry group-member names under the registry snapshot root. */
  private val SubjectsMember = "subjects"
  private val LocalIdsMember = "local_ids"

  /** One completed incremental cycle: the batch's resolution rows,
    * the fragments-table version the checkpoint advanced to, and the
    * registry state AFTER the fold (same frames just published). */
  final case class Cycle(
      resolutions: DataFrame,
      consumedVersion: Long,
      registry: IdentityResolver.Registry)

  /** Seed (or forcibly reset) the registry snapshot group.
    * `basis`: the [[Sources.snapshotReadBasis]] of the registry the
    * published state was DERIVED from — with it, a rival cycle
    * committing OR swapping in between refuses loudly instead of
    * having this publish silently replace its fold (see
    * [[resolveCycle]]). */
  def publishRegistry(reg: IdentityResolver.Registry, registryRoot: String,
      basis: Option[Sources.SnapshotBasis] = None): Unit =
    Sources.publishSnapshotGroup(
      Seq(SubjectsMember -> reg.subjects, LocalIdsMember -> reg.localIds),
      registryRoot, basis)

  /** The live registry snapshot, both members resolved from ONE
    * pointer read (mutually consistent by construction). */
  def readRegistry(spark: SparkSession, registryRoot: String): IdentityResolver.Registry = {
    val m = Sources.readSnapshotGroupAll(spark, registryRoot,
      Seq(SubjectsMember, LocalIdsMember))
    IdentityResolver.Registry(m(SubjectsMember), m(LocalIdsMember))
  }

  /** Run ONE checkpointed incremental-resolution cycle.
    *
    * `fragmentsDir` is a [[Sources.publishMergePartitioned]] table of
    * fragment rows keyed by `naturalKey`; `toCandidates` maps the
    * delta frame to the resolver's candidate schema (request_id,
    * center_id, local_subject_id, identifier_type). Returns None when
    * nothing was published since the checkpoint (no work, no writes).
    *
    * Ordering inside the cycle (each step's failure mode is benign):
    *  1. read delta (row-level changes since the checkpoint),
    *  2. resolve against the live registry snapshot, materialize the
    *     resolution rows (they feed links + applyBatch + the caller),
    *  3. publish the evolved registry (atomic group swap — crash
    *     before this leaves the old registry; crash after re-applies
    *     an idempotent batch on redelivery),
    *  4. advance the change-feed checkpoint (inside
    *     processMergeRowChanges, after this body returns).
    */
  def resolveCycle(
      spark: SparkSession,
      fragmentsDir: String,
      checkpointDir: String,
      registryRoot: String,
      naturalKey: Seq[String],
      asOf: java.sql.Date,
      partitionCol: String = "",
      deterministicMint: Boolean = true,
      groupingIterations: Int = 2)(
      toCandidates: DataFrame => DataFrame): Option[Cycle] =
    Sources.processMergeRowChanges(spark, fragmentsDir, checkpointDir,
        naturalKey, partitionCol) {
      (delta, version) =>
        // pin the read basis BEFORE reading the registry: two schedulers
        // double-firing a cycle both fold the same delta into the same
        // registry state — without the pin the second publish silently
        // replaces the first's fold (the lost-update class the merge
        // tables' OCC closed in r16); with it, the loser refuses with
        // ConcurrentModificationException, its checkpoint does not
        // advance, and a re-driven cycle re-reads the winner's registry
        // and converges (usually to a no-op: resolution is match-first
        // idempotent over an already-folded batch). The basis pins both
        // the claim count AND the pointer version readRegistry resolves
        // — a rival mid-publish (claimed, unswapped) that lands during
        // this cycle refuses it either way (Sources.snapshotReadBasis).
        val basis = Sources.snapshotReadBasis(spark, registryRoot)
        val reg = readRegistry(spark, registryRoot)
        val candidates = toCandidates(delta)
        // materialized: resolutions feed links, applyBatch AND the
        // caller — without truncation each consumer re-runs the whole
        // delta-resolve lineage (batch-sized state, never registry-sized)
        val res = IdentityResolver.resolve(candidates, reg,
          deterministicMint, groupingIterations).localCheckpoint(false)
        val links = IdentityResolver.links(candidates, res, reg.localIds)
        val evolved = IdentityResolver.applyBatch(reg, res, links, asOf)
        publishRegistry(evolved, registryRoot, basis = Some(basis))
        // hand back the PUBLISHED state (re-read, not the lazy plan):
        // the caller's reads must not re-trigger the apply lineage
        Cycle(res, version, readRegistry(spark, registryRoot))
    }
}
