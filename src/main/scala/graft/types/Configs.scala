package graft.types

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Config- and catalog-driven schema system (SURVEY.md §1.3).
  *
  * Mirrors the reference's JSON mapping configs
  * (`fragment-validator/config/lcl_mapping.json:1-13`, `bge_mapping.json`)
  * and table configs (`fragment-validator/config/table_configs.json:1-46`).
  * Maps preserve JSON insertion order (the reference iterates dicts in
  * insertion order and column order is observable in outputs).
  */
final case class MappingConfig(
    fieldMapping: Seq[(String, String)],          // target -> source
    staticFields: Seq[(String, String)],          // target -> constant
    subjectIdCandidates: Seq[(String, String)],   // column -> identifier_type
    centerIdField: Option[String],
    defaultCenterId: Int,
    excludeFromLoad: Seq[String])

object MappingConfig {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): MappingConfig = fromNode(mapper.readTree(json))

  def load(path: String): MappingConfig =
    fromNode(mapper.readTree(new java.io.File(path)))

  private def fields(n: JsonNode): Seq[(String, String)] =
    if (n == null) Seq.empty
    else n.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq

  private def fromNode(root: JsonNode): MappingConfig = {
    // subject_id_candidates: list form (type defaults to the column
    // name) or dict form {column: identifier_type}
    // (`field_mapper.py:53-60`, `lcl_mapping.json`).
    val cand = root.get("subject_id_candidates") match {
      case null => Seq.empty
      case n if n.isArray => n.elements().asScala.map(e => e.asText() -> e.asText()).toSeq
      case n => fields(n)
    }
    MappingConfig(
      fieldMapping = fields(root.get("field_mapping")),
      staticFields = fields(root.get("static_fields")),
      subjectIdCandidates = cand,
      centerIdField = Option(root.get("center_id_field")).filter(!_.isNull).map(_.asText()),
      defaultCenterId = Option(root.get("default_center_id")).filter(!_.isNull).map(_.asInt()).getOrElse(0),
      excludeFromLoad = Option(root.get("exclude_from_load")).filter(!_.isNull)
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty))
  }
}

/** Per-table upsert contract: natural key, immutable fields, strategy
  * (`table_configs.json:1-46`, `table-loader/services/loader.py:23-31`). */
final case class TableConfig(
    table: String,
    naturalKey: Seq[String],
    immutableFields: Seq[String],
    strategy: String = "upsert")

object TableConfig {
  /** The reference's built-in catalog (`update_detector.py:16-23`,
    * `loader.py:23-31`, FIXTURES.md §3). */
  val builtIn: Map[String, TableConfig] = Seq(
    TableConfig("lcl", Seq("global_subject_id", "niddk_no"), Seq("created_at")),
    TableConfig("olink", Seq("global_subject_id", "sample_id"), Seq("created_at", "created_by")),
    TableConfig("specimen", Seq("global_subject_id", "sample_id"), Seq("created_at")),
    TableConfig("enteroid", Seq("global_subject_id", "sample_id"), Seq("created_at", "created_by")),
    TableConfig("sequence", Seq("global_subject_id", "sample_id"), Seq("created_at", "created_by")),
    TableConfig("genotype", Seq("global_subject_id", "sample_id"), Seq("created_at", "created_by")),
    TableConfig("local_subject_ids", Seq("center_id", "local_subject_id", "identifier_type"), Seq("created_at")),
    TableConfig("subjects", Seq("global_subject_id"),
      Seq("global_subject_id", "created_at", "registration_year"), strategy = "update_only")
  ).map(t => t.table -> t).toMap

  /** System columns never loaded (`data_transformer.py:16-48`,
    * `load_strategies.py:30-32`). */
  val systemColumns: Set[String] = Set("Id", "id", "CreatedAt", "UpdatedAt", "created_at", "updated_at")
}
