package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Gsid

/** Set-based identity resolution (SURVEY.md §2.9) — the reference's
  * centerpiece "query".
  *
  * Re-expresses `gsid-service/services/identity_resolution.py:12-354`
  * (a per-request REST/SQL loop, ~2k IDs/s) as ONE Spark job over the
  * whole batch: case-insensitive registry join → per-request aggregation
  * → action triage (create/link/conflict+oldest-wins) → deterministic
  * intra-batch grouping for new subjects. On a cluster the registry
  * join shuffles both sides on the normalized identifier — no
  * driver-side loops, no point lookups.
  *
  * Semantics preserved:
  *  - matching is center-agnostic and case-insensitive (`:55-71`);
  *  - 0 matches → `create_new` + mint; 1 → `link_existing`;
  *    ≥2 → `conflict_resolved`, matched GSIDs sorted by
  *    `(created_at, gsid)`, oldest wins (`:107-211`);
  *  - center-conflict ladder: both centers real and different →
  *    conflict; unknown (0) never conflicts (`:84-105`);
  *  - strategy no_match / center_agnostic_match / multiple_gsid_conflict
  *    and confidence 1.0 / 0.7 / 0.5 exactly as the reference's
  *    conditional (center conflicts take the 0.7 branch even for
  *    multi-GSID, `:299-308`).
  *
  * Batch-vs-sequential caveat (SURVEY.md §7.5.1): the reference sees
  * its own inserts because requests run sequentially. Here, unmatched
  * requests sharing an identifier are grouped (identifier → min
  * request leader, one iteration) and mint ONE GSID per group. Chained
  * sharing (A~B via id1, B~C via id2) converges per-iteration, which
  * covers everything the reference's own tests exercise.
  */
object IdentityResolver {

  final case class Registry(subjects: DataFrame, localIds: DataFrame)

  /** Optional subject columns (withdrawn / flagged_for_review /
    * review_notes — `01-schema.sql:26-29`) defaulted when the snapshot
    * doesn't carry them, so small registries stay minimal. */
  private def withSubjectFlags(subjects: DataFrame): DataFrame = {
    val c = subjects.columns.toSet
    val s1 = if (c("withdrawn")) subjects
             else subjects.withColumn("withdrawn", lit(false))
    val s2 = if (c("flagged_for_review")) s1
             else s1.withColumn("flagged_for_review", lit(false))
    if (c("review_notes")) s2
    else s2.withColumn("review_notes", lit(null).cast("string"))
  }

  /** Resolve a batch.
    *
    * `candidates` columns: request_id, center_id, local_subject_id,
    * identifier_type. `registry.localIds`: center_id, local_subject_id,
    * identifier_type, global_subject_id. `registry.subjects`:
    * global_subject_id, center_id, created_at.
    *
    * `deterministicMint = true` derives new GSIDs from the group's
    * minimum normalized identifier (`GSID-` + md5 — reproducible for
    * differential tests); `false` mints random format-valid GSIDs
    * (production semantics, one per group).
    */
  def resolve(
      candidates: DataFrame,
      registry: Registry,
      deterministicMint: Boolean = true): DataFrame =
    resolve(candidates, registry, deterministicMint, groupingIterations = 2)

  /** As [[resolve]], with explicit intra-batch grouping depth: each
    * iteration propagates group leaders one identifier-hop further
    * (iteration 1 merges direct sharers; 2 covers A~B~C chains — one
    * hop more than the reference's own tests need; raise it for deeper
    * chains, or pass ≤ 0 to iterate to a FIXPOINT, covering unbounded
    * chains at one comparison action per hop). */
  def resolve(
      candidates: DataFrame,
      registry: Registry,
      deterministicMint: Boolean,
      groupingIterations: Int): DataFrame =
    resolve(candidates, registry, deterministicMint, groupingIterations,
      skewSaltThreshold = 2000000L, skewSalt = 32)

  /** Diagnostic (spec-visible): whether the LAST resolve() call routed
    * the registry join through the salted fallback. */
  @volatile private[graft] var lastResolveUsedSaltedJoin: Boolean = false

  /** As the 4-arg [[resolve]], with the skew fallback explicit.
    *
    * SCALING.md names hot identifiers as the risk for the J1 registry
    * join: one identifier carried by millions of batch rows lands a
    * whole shuffle partition on one task. `skewSaltThreshold` arms a
    * HOT-KEY PROBE — one map-side-combining count over the batch's
    * normalized identifiers (batch-sized, never registry-sized) — and
    * when the hottest identifier reaches the threshold the join runs
    * through [[SkewJoin.saltedEquiJoin]] instead: the probe side
    * salts on `request_id` (deterministic xxhash64, no rand()), the
    * registry build side explodes `skewSalt`-fold, output identical,
    * hot key spread over `skewSalt` partitions. Pass
    * `skewSaltThreshold <= 0` to disable the probe (plain join,
    * zero extra jobs). AQE's skew-join split stays on either way;
    * this fallback covers the aggregation-side skew AQE cannot
    * re-split (the groupBy("_nid") inside the probe handles its own
    * skew via partial aggregation). */
  def resolve(
      candidates: DataFrame,
      registry: Registry,
      deterministicMint: Boolean,
      groupingIterations: Int,
      skewSaltThreshold: Long,
      skewSalt: Int): DataFrame = {

    // lazy checkpoint: the hot-key probe below is an extra aggregation
    // job over cand, and the J1 join + per-request aggregation consume
    // it again — without materialized blocks each consumer would
    // re-evaluate the caller's full candidate-building lineage
    // (mapping projection, id derivation, unions). Batch-sized state.
    val cand = candidates.select(
      col("request_id"), col("center_id"),
      col("local_subject_id"), col("identifier_type"),
      lower(col("local_subject_id")).as("_nid"))
      .localCheckpoint(false)

    // AUTO-ROUTE on a cataloged registry: RegistryCatalog persists
    // local_subject_ids with a precomputed `norm_id` =
    // lower(local_subject_id), bucketed + sorted on it. When that
    // column is present, join on the ATTRIBUTE itself — re-deriving
    // lower(...) would hide the bucketing from the planner and put an
    // Exchange back under the registry side of J1. With the attribute,
    // the bucketed scan's output partitioning satisfies the join and
    // only the (batch-sized) probe reshuffles. norm_id's content is
    // the catalog's write-time contract (CatalogSpec pins equality of
    // both routes).
    val li = (if (registry.localIds.columns.contains("norm_id"))
      registry.localIds.select(
        col("norm_id").as("_nid"),
        col("center_id"), col("global_subject_id"))
    else
      registry.localIds.select(
        lower(col("local_subject_id")).as("_nid"),
        col("center_id"), col("global_subject_id")))
      .select(col("_nid"), col("center_id").as("_id_center"),
        col("global_subject_id").as("_gsid"))

    val subj = withSubjectFlags(registry.subjects).select(
      col("global_subject_id").as("_gsid"),
      col("created_at").as("_created_at"),
      coalesce(col("withdrawn"), lit(false)).as("_withdrawn"))

    // J1: center-agnostic, case-insensitive registry match — with the
    // hot-key probe + salted fallback described on the overload
    val probeSide = cand.select(
      col("request_id"), col("center_id").as("_req_center"), col("_nid"))
    // Probe only when the batch COULD hold a hot key (r18, guide §1):
    // the hottest identifier's count is bounded by the batch row
    // count, and the row count is bounded by the optimizer's
    // sizeInBytes estimate (every row occupies ≥ 1 byte in any size
    // accounting Catalyst produces). A batch whose estimated bytes sit
    // below the threshold therefore cannot reach it, and the probe —
    // a full aggregation pass over the batch — is a wasted job. The
    // bound is read from the CALLER's frame (pre-checkpoint: a lazy
    // localCheckpoint plans as LogicalRDD, whose unknown stats default
    // to Long.Max and would force the probe back on). Estimation
    // failure degrades to probing, never to skipping; a pathological
    // under-estimate (ultra-RLE parquet) merely skips the salt — the
    // join output is identical either way and AQE skew-split stays on.
    val mayHoldHotKey =
      (try candidates.queryExecution.optimizedPlan.stats.sizeInBytes
       catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }) >=
        BigInt(skewSaltThreshold)
    val useSalted = skewSaltThreshold > 0 && mayHoldHotKey && {
      val hottest = cand.groupBy("_nid").agg(count(lit(1)).as("c"))
        .agg(max("c")).first()
      !hottest.isNullAt(0) && hottest.getLong(0) >= skewSaltThreshold
    }
    lastResolveUsedSaltedJoin = useSalted
    val matches =
      (if (useSalted)
        SkewJoin.saltedEquiJoin(probeSide, li, "_nid", skewSalt,
          probeSaltSource = col("request_id"))
      else probeSide.join(li, "_nid"))
        .join(subj, "_gsid")

    // _n_matches = size(_matched): the collect_set is already the
    // distinct (created_at, gsid) set and created_at is functionally
    // dependent on gsid, so counting it is free — a countDistinct
    // alongside the other aggregates would force Expand (every match
    // row duplicated per aggregate group) and a second shuffle pass.
    val agg = matches.groupBy("request_id").agg(
      transform(
        sort_array(collect_set(struct(col("_created_at").as("c"), col("_gsid").as("g")))),
        x => x("g")).as("_matched"),
      sum(when(col("_id_center") =!= col("_req_center") &&
               col("_id_center") =!= 0 && col("_req_center") =!= 0, 1L).otherwise(0L))
        .as("_n_center_conflicts"),
      max(when(col("_withdrawn"), 1L).otherwise(0L)).as("_any_withdrawn"))
      .withColumn("_n_matches", size(col("_matched")))

    val requests = cand.groupBy("request_id").agg(max(col("center_id")).as("center_id"))

    // `reqs` (which contains the whole registry-match + aggregation
    // subtree) feeds the grouping loop below AND the final join; the
    // loop's iterated self-references would otherwise inline ~2^iters
    // copies of that subtree into one DAG (measured 5-7x slowdown at
    // sf0.1). LAZY localCheckpoint the two shared frames — both are
    // O(batch) rows, never registry-sized — so every downstream
    // consumer (and each loop hop) starts from truncated lineage.
    // Lazy, not eager: the plan truncates immediately either way, but
    // eager spends a whole Spark job per checkpoint — under a loaded
    // scheduler those fixed job barriers dominate (driver bench ran
    // this 10-20x local time); lazy folds materialization into the
    // first consuming job and later branches reuse the cached blocks.
    val reqs = requests.join(agg, Seq("request_id"), "left")
      .withColumn("_n", coalesce(col("_n_matches"), lit(0)))
      .localCheckpoint(false)

    // intra-batch grouping of unmatched requests (see scaladoc):
    // iterated label propagation — leader(identifier) = min leader of
    // its requests; leader(request) = min leader of its identifiers.
    val unmatchedCand = cand
      .join(reqs.filter(col("_n") === 0).select("request_id"), Seq("request_id"), "left_semi")
      .localCheckpoint(false)
    var reqLeader = unmatchedCand.select(col("request_id"), col("request_id").as("_leader"))
      .distinct()
    def hop(prev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val idLeader = unmatchedCand.join(prev, "request_id")
        .groupBy("_nid").agg(min("_leader").as("_id_leader"))
      unmatchedCand.join(idLeader, "_nid")
        .groupBy("request_id").agg(min("_id_leader").as("_leader"))
    }
    if (groupingIterations > 0) {
      for (i <- 1 to groupingIterations) {
        reqLeader = hop(reqLeader)
        // truncate lineage between iterations (except the last — the
        // final plan joins it once): without this the plan doubles per
        // hop and Catalyst/codegen time dwarfs the actual label work
        if (i < groupingIterations) reqLeader = reqLeader.localCheckpoint(false)
      }
    } else {
      // groupingIterations ≤ 0: iterate to a FIXPOINT — labels are
      // monotonically non-increasing, so the label SUM strictly
      // decreases while anything changes and "sum unchanged" is global
      // convergence; covers arbitrarily long identifier chains at ONE
      // cheap aggregate job per hop (vs a join + count). DECIMAL sum so
      // the invariant can't be confused by overflow at any batch size.
      // NON-NUMERIC request ids (Pipelines mints md5 hex strings) have
      // no numeric sum: for those the check sums xxhash64 of the label
      // — any label change alters the sum up to a ~2^-64 per-hop
      // collision (vastly safer than casting hex to decimal, which
      // yields NULL and NPE'd here before this guard).
      val numericLabels = reqLeader.schema("_leader").dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal = {
        val measure =
          if (numericLabels) sum(col("_leader").cast("decimal(38,0)"))
          // cast BEFORE summing: xxhash64 longs span the full 64-bit
          // range and their Long sum overflows (throws under ANSI)
          else sum(xxhash64(col("_leader")).cast("decimal(38,0)"))
        df.agg(coalesce(measure, lit(0).cast("decimal(38,0)")))
          .first().getDecimal(0)
      }
      var prevSum = labelSum(reqLeader)
      var hops = 0
      var converged = false
      while (!converged && hops < 50) {
        // lazy: labelSum is the materializing action — one job per hop
        // instead of a checkpoint job plus the sum job
        val next = hop(reqLeader).localCheckpoint(false)
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        reqLeader = next
        hops += 1
      }
      // fail LOUD if the cap truncated an unconverged chain — silent
      // truncation would mint multiple GSIDs for one linked group
      if (!converged)
        throw new IllegalStateException(
          s"intra-batch grouping did not converge within $hops hops — " +
            "identifier chains deeper than the cap; raise the cap or " +
            "split the batch")
    }
    val groupMint = unmatchedCand.join(reqLeader, "request_id")
      .groupBy("_leader").agg(min("_nid").as("_mint_key"))
    val mintBase = reqLeader.join(groupMint, "_leader")
    val minted =
      if (deterministicMint)
        mintBase.select(col("request_id"),
          Gsid.deterministic(concat(lit("NEW:"), col("_mint_key"))).as("_new_gsid"))
      else {
        val perGroup = mintBase.select("_leader").distinct()
          .withColumn("_new_gsid", Gsid.generate())
        mintBase.join(perGroup, "_leader").select("request_id", "_new_gsid")
      }

    val n = col("_n")
    reqs.join(minted, Seq("request_id"), "left")
      .select(
        col("request_id"), col("center_id"),
        when(n === 0, lit("create_new"))
          .when(n === 1, lit("link_existing"))
          .otherwise(lit("conflict_resolved")).as("action"),
        when(n === 0, col("_new_gsid")).otherwise(element_at(col("_matched"), 1)).as("gsid"),
        when(n > 1, lit("multiple_gsid_conflict"))
          // single match against a withdrawn subject: still links (the
          // reference carries `withdrawn` through and records it —
          // identity_resolution.py:52-81) but under the schema's
          // 'exact_withdrawn' strategy (01-schema.sql:105)
          .when(n === 1 && coalesce(col("_any_withdrawn"), lit(0L)) > 0,
            lit("exact_withdrawn"))
          .when(n === 1, lit("center_agnostic_match"))
          .otherwise(lit("no_match")).as("match_strategy"),
        when(n <= 1 && coalesce(col("_n_center_conflicts"), lit(0L)) === 0, lit(1.0))
          .when(coalesce(col("_n_center_conflicts"), lit(0L)) > 0, lit(0.7))
          .otherwise(lit(0.5)).as("confidence"),
        when(n > 1, col("_matched")).otherwise(lit(null).cast("array<string>"))
          .as("matched_gsids"),
        when(n > 1, lit("used_oldest"))
          .when(n === 1 && coalesce(col("_n_center_conflicts"), lit(0L)) > 0,
            lit("center_mismatch")).as("conflict_resolution"),
        (n > 1 || coalesce(col("_n_center_conflicts"), lit(0L)) > 0 ||
          coalesce(col("_any_withdrawn"), lit(0L)) > 0).as("requires_review"))
  }

  /** Step 4-5 of the reference (`identity_resolution.py:272-330`): one
    * `identity_resolutions` log row per request, with the JSONB
    * candidate payload. The reference keys the row by the request's
    * FIRST identifier; batch inputs have no positional order, so the
    * deterministic stand-in is min(identifier_type, local_subject_id)
    * (documented deviation). */
  def resolutionLog(resolutions: DataFrame, candidates: DataFrame,
      createdBy: String = "graft"): DataFrame = {
    val firstCand = candidates
      .groupBy("request_id")
      .agg(min(struct(col("identifier_type"), col("local_subject_id"))).as("_first"),
        to_json(sort_array(collect_set(struct(
          col("local_subject_id"), col("identifier_type"))))).as("candidate_ids"))
    resolutions.join(firstCand, "request_id")
      .select(
        col("_first.local_subject_id").as("local_subject_id"),
        col("_first.identifier_type").as("identifier_type"),
        col("center_id").as("input_center_id"),
        col("gsid"), col("gsid").as("matched_gsid"),
        col("action"), col("match_strategy"), col("confidence"),
        col("candidate_ids"),
        when(col("matched_gsids").isNotNull, to_json(col("matched_gsids")))
          .as("matched_gsids"),
        col("requires_review"),
        lit(createdBy).as("created_by"))
  }

  /** Registry evolution (§3.2 batch form): fold one resolved batch into
    * the registry snapshot — create_new subjects appended, identifier
    * links MERGEd with the local_subject_ids delete-and-replace
    * semantics. The returned snapshot is what the NEXT batch resolves
    * against, giving the reference's sequential-visibility behavior at
    * batch granularity.
    *
    * Subject-row updates applied per the reference's in-transaction
    * UPDATEs (`identity_resolution.py:139-211`):
    *  - center 0→real upgrade: a `link_existing` resolution carrying a
    *    real center onto an unknown-center (0) subject updates the
    *    subject row (`:139-154`; deterministic pick = min real center
    *    when several requests link the same subject in one batch);
    *  - review flags: center-mismatch links flag the chosen subject,
    *    multi-GSID conflicts flag ALL matched subjects (`:156-211`),
    *    appending a dated note to `review_notes`.
    *
    * Note appends are guarded by an already-present check, which makes
    * re-presenting the SAME batch on the same date a byte-identical
    * no-op (match-first resolution mints nothing on a rerun, and the
    * guard keeps the rerun from duplicating its own conflict notes) —
    * the idempotent-rerun property `q_identity_rerun` gates. A later
    * batch's note carries a different date, so real note chains still
    * append. */
  def applyBatch(
      registry: Registry,
      resolutions: DataFrame,
      links: DataFrame,
      createdAt: java.sql.Date): Registry = {
    val base = withSubjectFlags(registry.subjects)

    val newSubjects = resolutions.filter(col("action") === "create_new")
      .select(col("gsid").as("global_subject_id"), col("center_id"),
        lit(createdAt).as("created_at"),
        lit(false).as("withdrawn"), lit(false).as("flagged_for_review"),
        lit(null).cast("string").as("review_notes"))
      .dropDuplicates("global_subject_id")

    val upgrades = resolutions
      .filter(col("action") === "link_existing" && col("center_id") =!= 0)
      .groupBy(col("gsid").as("global_subject_id"))
      .agg(min("center_id").as("_new_center"))

    val flags = resolutions
      .filter(col("requires_review") && col("action") =!= "create_new")
      .select(col("gsid").as("global_subject_id"),
        when(col("action") === "conflict_resolved",
          lit(s"MULTI-GSID CONFLICT detected on $createdAt"))
          .otherwise(lit(s"CENTER CONFLICT detected on $createdAt")).as("_note"))
      .unionByName(resolutions.filter(col("action") === "conflict_resolved")
        .select(explode(col("matched_gsids")).as("global_subject_id"),
          lit(s"MULTI-GSID CONFLICT detected on $createdAt").as("_note")))
      .groupBy("global_subject_id")
      .agg(concat_ws("\n", sort_array(collect_set(col("_note")))).as("_notes"))

    val updated = base
      .join(upgrades, Seq("global_subject_id"), "left")
      .join(flags, Seq("global_subject_id"), "left")
      .withColumn("center_id",
        when(col("center_id") === 0 && col("_new_center").isNotNull, col("_new_center"))
          .otherwise(col("center_id")))
      .withColumn("review_notes",
        // already-present guard: a same-day rerun of the same batch
        // regenerates the identical note block and must not duplicate
        // it (idempotent rerun); a new date is a new string and chains
        when(col("_notes").isNotNull &&
            !coalesce(col("review_notes"), lit("")).contains(col("_notes")),
          concat_ws("\n", col("review_notes"), col("_notes")))
          .otherwise(col("review_notes")))
      .withColumn("flagged_for_review", col("flagged_for_review") || col("_notes").isNotNull)
      .drop("_new_center", "_notes")

    val subjects = updated.unionByName(newSubjects, allowMissingColumns = true)
    val localIds = UpsertWriter.mergeLocalSubjectIds(
      registry.localIds,
      links.select("center_id", "local_subject_id", "identifier_type", "global_subject_id"))
      .merged
    Registry(subjects, localIds)
  }

  /** Withdraw subjects (`gsid-service/api/routes.py:159-182`): set
    * `withdrawn` and append a dated reason to `review_notes`.
    * `withdrawals` columns: global_subject_id, optional reason. */
  def withdraw(subjects: DataFrame, withdrawals: DataFrame,
      asOf: java.sql.Date): DataFrame = {
    val w = (if (withdrawals.columns.contains("reason")) withdrawals
             else withdrawals.withColumn("reason", lit(null).cast("string")))
      .select(col("global_subject_id"), col("reason"))
      .dropDuplicates("global_subject_id")
      .withColumn("_w_note",
        concat(lit(s"Withdrawn on $asOf"),
          when(col("reason").isNotNull, concat(lit(". Reason: "), col("reason")))
            .otherwise(lit(""))))
    withSubjectFlags(subjects)
      .join(w.select("global_subject_id", "_w_note"), Seq("global_subject_id"), "left")
      .withColumn("withdrawn", col("withdrawn") || col("_w_note").isNotNull)
      .withColumn("review_notes",
        // same-day re-withdrawal is a no-op (see applyBatch's guard)
        when(col("_w_note").isNotNull &&
            !coalesce(col("review_notes"), lit("")).contains(col("_w_note")),
          concat_ws("\n", col("review_notes"), col("_w_note")))
          .otherwise(col("review_notes")))
      .drop("_w_note")
  }

  /** `v_subjects_requiring_review` (`01-schema.sql:628-646`): subjects
    * flagged for review or withdrawn, with center name and identifier
    * rollup counts. `centers` columns: center_id, name. */
  def requiringReview(subjects: DataFrame, localIds: DataFrame,
      centers: DataFrame): DataFrame =
    withSubjectFlags(subjects)
      .filter(col("flagged_for_review") || col("withdrawn"))
      .join(broadcast(centers.select(col("center_id"), col("name").as("center_name"))),
        Seq("center_id"), "left")
      .join(localIds.select("global_subject_id", "identifier_type", "local_subject_id"),
        Seq("global_subject_id"), "left")
      .groupBy("global_subject_id", "center_id", "center_name", "flagged_for_review",
        "review_notes", "withdrawn", "created_at")
      // size(collect_set) not countDistinct: TWO distinct columns would
      // plan Expand with a ×2 row blow-up before the shuffle; both sets
      // are bounded (identifier types, aliases per subject), so
      // collecting them in one pass is strictly cheaper.
      .agg(size(collect_set("identifier_type")).cast("long").as("num_identifier_types"),
        size(collect_set("local_subject_id")).cast("long").as("num_local_ids"))

  /** Step 3 of the reference (`identity_resolution.py:213-268`): link
    * every candidate identifier to its request's chosen GSID, with the
    * center-preference ladder against the existing registry row.
    * The reference's `LIMIT 1` (no ORDER BY) existing-row pick is made
    * deterministic here as min(center_id, gsid). Link lookup is
    * case-SENSITIVE like the reference (only matching is folded).
    */
  def links(candidates: DataFrame, resolutions: DataFrame, localIds: DataFrame,
      createdBy: String = "graft"): DataFrame = {
    val existing = localIds.groupBy("local_subject_id", "identifier_type")
      .agg(min(struct(col("center_id"), col("global_subject_id"))).as("_ex"))
      .select(col("local_subject_id"), col("identifier_type"),
        col("_ex.center_id").as("_ex_center"))
    val chosen = resolutions.select(col("request_id"), col("gsid"))

    candidates
      .join(chosen, "request_id")
      .join(existing, Seq("local_subject_id", "identifier_type"), "left")
      .withColumn("link_center_id",
        when(col("_ex_center").isNotNull && col("_ex_center") =!= 0 && col("center_id") === 0,
          col("_ex_center"))
          .otherwise(col("center_id")))
      .select(
        col("link_center_id").as("center_id"),
        col("local_subject_id"), col("identifier_type"),
        col("gsid").as("global_subject_id"),
        lit(createdBy).as("created_by"))
      .dropDuplicates("center_id", "local_subject_id", "identifier_type", "global_subject_id")
  }
}
