package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The DATS entity model, re-architected for Spark (SURVEY.md §1.1).
  *
  * The reference materializes one big in-memory JSON-LD object graph
  * (`DatsObj` trees with a dedup cache and deliberate cycles,
  * ccmm/dats/datsobj.py:76-172). A DataFrame world wants the inverse
  * shape: NORMALIZED ENTITY TABLES with foreign-key columns, queried
  * relationally (the reference's own query half immediately re-derives
  * this shape from the graph — sparql/v0.7 scripts). Cycles (subject ↔
  * study group, dataset ↔ data acquisition) are plain FK pairs here and
  * only become `@id` references at serialization time
  * (graft.io.DatsJsonWriter).
  *
  * Entity-table schemas (all ids are deterministic content hashes — the
  * reference's throwaway uuid4 ids, datsobj.py:109-114, are replaced so
  * runs are byte-reproducible, SURVEY.md §1.4):
  *
  *  - datasets(dataset_id, parent_dataset_id, title, description, version,
  *    data_type, study_id)           — Dataset nodes; parent FK = hasPart⁻¹
  *  - identifiers(entity_id, identifier, identifier_source)
  *  - studies(study_id, name, dataset_id)
  *  - study_groups(group_id, study_id, name)
  *  - group_members(group_id, material_id)                — hasMember
  *  - materials(material_id, name, material_type, role, subject_id,
  *    derives_from, anatomy_id, description)
  *  - anatomical_parts(anatomy_id, name, uberon_id)
  *  - characteristics(material_id, var_acc, name, value)
  *  - dimensions(dim_id, owner_id, name, var_acc, description, value)
  *  - distributions(dataset_id, access_url, size, md5, doi, index_doi)
  *  - data_acquisitions(dataset_id, input_material_id)    — producedBy.input
  *  - diseases(material_id, name, disease_id, status)     — bearerOfDisease
  */
object Dats {

  /** The 37 DATS JSON-LD types of the reference's registry
    * (ccmm/dats/datsobj.py:33-70) — retained for the serializer's
    * `@type`/`@context` derivation. */
  val TypeRegistry: Seq[String] = Seq(
    "AlternateIdentifier", "Annotation", "AnatomicalPart", "Access", "Activity",
    "BiologicalEntity", "CategoryValuesPair", "DataAcquisition", "DataAnalysis",
    "DataRepository", "DataStandard", "DataType", "Dataset", "DatasetDistribution",
    "Date", "Dimension", "Disease", "Identifier", "IdentifierInfo", "License",
    "Material", "MolecularEntity", "Organization", "Person", "PhenotypicFeature",
    "Place", "Publication", "RelatedIdentifier", "Software", "Study", "StudyGroup",
    "Taxonomy", "Treatment", "TaxonomicInformation", "GenomeLocation", "Gene",
    "GenomeBuild")

  /** Schema basenames per DATS type (ccmm/dats/datsobj.py:33-70, the
    * `schema` field minus `_schema.json`) — the context filename is this
    * name + `_sdo_context.jsonld` / `_obo_context.jsonld`. Mostly the
    * CamelCase→snake_case conversion, with the registry's irregulars
    * spelled out. License is the one `has_context: False` type. */
  val SchemaNames: Map[String, String] = {
    def snake(t: String): String =
      t.replaceAll("([a-z\\d])([A-Z])", "$1_$2").toLowerCase
    val irregular = Map(
      "AlternateIdentifier" -> "alternate_identifier_info",
      "Date" -> "date_info",
      "Identifier" -> "identifier_info",
      "RelatedIdentifier" -> "related_identifier_info",
      "TaxonomicInformation" -> "taxonomic_info")
    TypeRegistry.map(t => t -> irregular.getOrElse(t, snake(t))).toMap
  }

  /** Types with `has_context: False` in the registry. */
  val NoContextTypes: Set[String] = Set("License")

  /** Deterministic entity id: stable hash of (type, natural key) —
    * replaces uuid4 so identical inputs give identical output documents.
    * sha1 keeps collisions out of reach at catalog scale. */
  def entityId(datsType: String, naturalKey: Column): Column =
    concat(lit(datsType.toLowerCase), lit("-"), sha1(concat_ws("|", lit(datsType), naturalKey)))

  /** SEX / DTHHRDY / tissue vocabularies used by the GTEx pipeline
    * (ccmm/gtex/parsers/portal_files.py:16-42). */
  object Vocab {
    val Sex: Map[Int, String] = Map(1 -> "male", 2 -> "female")
    val HardyScale: Map[Int, String] = Map(
      0 -> "Ventilator case", 1 -> "Violent and fast death",
      2 -> "Fast death of natural causes", 3 -> "Intermediate", 4 -> "Slow death")
    val AgeRanges: Seq[String] = Seq("20-29", "30-39", "40-49", "50-59", "60-69", "70-79")
    val SmAtsscr: Map[Int, String] = Map(0 -> "None", 1 -> "Mild", 2 -> "Moderate", 3 -> "Severe")
    val SmAfrze: Seq[String] = Seq("RNASEQ", "WGS", "WES", "OMNI", "EXCLUDE")
  }
}
