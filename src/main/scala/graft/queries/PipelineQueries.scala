package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{IdentityResolver, SchemaValidator}
import graft.pipeline.Pipelines
import graft.types.MappingConfig

/** End-to-end §3.1 validator pipeline driven over the testdata: a raw
  * "fragment" derived from customer, the synthetic supplier registry
  * from IdentityQueries, the full map→validate→resolve→conflict
  * lineage. Row ids inside the pipeline are nondeterministic
  * (monotonically_increasing_id), but every output value is derived
  * from data, so the projected columns are stable; rows-only check. */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef.rowsOnly("q_pipeline_validate") { (s, d) =>
      val mapping = MappingConfig.fromJson(
        """{"field_mapping": {"sample_id": "sample", "segment": "c_mktsegment"},
          | "static_fields": {"batch": "r1"},
          | "subject_id_candidates": {"subject_ref": "primary"},
          | "center_id_field": "c_nationkey", "default_center_id": 0}""".stripMargin)
      val nsupp = Tables.supplier(s, d).count()
      val raw = Tables.customer(s, d)
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === (col("c_custkey") % nsupp))
        .select(
          concat(lit("SAMP-"), col("c_custkey").cast("string")).as("sample"),
          col("c_mktsegment"),
          when(col("c_custkey") % 4 === 1, col("s_name"))
            .otherwise(concat(lit("A-"), col("c_custkey").cast("string"))).as("subject_ref"),
          col("c_nationkey"))
      val r = Pipelines.validate(s, raw, mapping,
        Seq(SchemaValidator.ColumnSpec("sample_id", required = true)),
        IdentityQueries.registry(s, d), "batch_r1")
      r.mapped.select("sample_id", "segment", "batch", "subject_ref", "global_subject_id")
        .orderBy("sample_id")
    },

    // §3.2 registry evolution across two batches: batch 1 mints
    // subjects for never-seen ids; after applyBatch, batch 2 presents
    // the same ids from different requests and must LINK, reproducing
    // the reference's sequential visibility at batch granularity.
    QueryDef.rowsOnly("q_identity_evolution") { (s, d) =>
      val reg0 = IdentityQueries.registry(s, d)
      val customers = Tables.customer(s, d)
      val batch1 = customers.filter(col("c_custkey") % 2 === 0).select(
        col("c_custkey").as("request_id"),
        col("c_nationkey").cast("int").as("center_id"),
        concat(lit("EV-"), col("c_custkey").cast("string")).as("local_subject_id"),
        lit("primary").as("identifier_type"))
      // a real pipeline publishes the snapshot between batches
      // (Sources.publishSnapshot); localCheckpoint is the in-job
      // equivalent — it truncates lineage, without which batch 2 pays
      // Catalyst re-analysis of the whole batch-1 DAG in every branch
      // (measured 33.8s → 0.6s for the second resolve at sf0.1)
      val res1 = IdentityResolver.resolve(batch1, reg0).localCheckpoint(true)
      val links1 = IdentityResolver.links(batch1, res1, reg0.localIds)
      val reg1raw = IdentityResolver.applyBatch(reg0, res1, links1,
        java.sql.Date.valueOf("2024-06-01"))
      val reg1 = IdentityResolver.Registry(
        reg1raw.subjects.localCheckpoint(true), reg1raw.localIds.localCheckpoint(true))

      val batch2 = customers.filter(col("c_custkey") % 2 === 1).select(
        col("c_custkey").as("request_id"),
        col("c_nationkey").cast("int").as("center_id"),
        concat(lit("EV-"), (col("c_custkey") - 1).cast("string")).as("local_subject_id"),
        lit("primary").as("identifier_type"))
      IdentityResolver.resolve(batch2, reg1)
        .select("request_id", "action", "gsid", "match_strategy")
        .orderBy("request_id")
    },

    // §2.9 step 5: the identity_resolutions audit log rows.
    QueryDef.rowsOnly("q_identity_log") { (s, d) =>
      val reg = IdentityQueries.registry(s, d)
      val cands = IdentityQueries.candidates(s, d)
      val res = IdentityResolver.resolve(cands, reg).localCheckpoint(true)
      IdentityResolver.resolutionLog(res, cands)
        .orderBy("local_subject_id", "identifier_type", "gsid")
    })
}
