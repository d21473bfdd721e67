package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.GtexEtl.EntityGraph

/** The reference's seven canonical queries (SURVEY.md §2.9), re-expressed
  * as DataFrame programs over the normalized entity tables. Each replaces
  * 60-440 lines of rdflib triple navigation with a short join chain —
  * the hand-compiled scan order of the reference's rdflib_list_* scripts
  * is exactly what Catalyst derives from these declarative plans
  * (predicate pushdown on the parameters, broadcast joins on the small
  * dimension tables).
  *
  * Parameterized queries (Q2/Q3 `initBindings`) become function
  * arguments → filters, which Catalyst pushes below the joins.
  */
object DatsQueries {

  /** Q1 — list 2nd-level datasets
    * (sparql/v0.7/sparql_list_2nd_level_datasets.py:34-47): top dataset
    * by title → hasPart children → (identifier, title). */
  def listSecondLevelDatasets(g: EntityGraph, topTitles: Seq[String]): DataFrame = {
    val top = g.datasets.filter(col("title").isin(topTitles: _*))
      .select(col("dataset_id").as("top_id"))
    g.datasets.join(broadcast(top), col("parent_dataset_id") === col("top_id"))
      .join(g.identifiers, col("dataset_id") === col("entity_id"), "left")
      .select(coalesce(col("identifier"), col("title")).as("dataset_acc"), col("title"))
      .orderBy("dataset_acc")
  }

  /** Q2 — list dataset variables
    * (sparql_list_dataset_variables.py:42-58): dataset→identifier,
    * dataset→hasPart Dimension; optional study-accession parameter;
    * 2-key ORDER BY. */
  def listDatasetVariables(g: EntityGraph, studyAcc: Option[String] = None): DataFrame = {
    val dims = g.dimensions.filter(col("var_acc").isNotNull)
    val withIds = dims.join(g.identifiers, col("owner_id") === col("entity_id"))
      .select(col("identifier").as("study_acc"), col("var_acc"),
        col("name").as("var_name"), col("description"))
    studyAcc.map(a => withIds.filter(col("study_acc") === a)).getOrElse(withIds)
      .orderBy("study_acc", "var_acc")
  }

  /** Q3 — list study-group members
    * (sparql_list_study_group_members.py:47-64): dataset→producedBy
    * Study→hasPart StudyGroup (name param)→hasMember Material; 3-key
    * ORDER BY. */
  def listStudyGroupMembers(g: EntityGraph, datasetAcc: String, groupName: String): DataFrame = {
    val ds = g.identifiers.filter(col("identifier") === datasetAcc)
      .select(col("entity_id"))
    g.studies.select(col("study_id"), col("dataset_id"), col("name").as("study_name"))
      .join(broadcast(ds), col("dataset_id") === col("entity_id"))
      .join(g.studyGroups.filter(col("name") === groupName)
        .select(col("group_id"), col("study_id"), col("name").as("group_name")), "study_id")
      .join(g.groupMembers, "group_id")
      .join(g.materials.select(col("material_id"), col("name").as("member_name")), "material_id")
      .select(col("study_name"), col("group_name"), col("member_name"))
      .orderBy("study_name", "group_name", "member_name")
  }

  /** Q4 — list subject samples (sparql_list_subject_samples.py:41-60):
    * DISTINCT extract→derivesFrom sample→derivesFrom subject with role
    * FILTER ∈ {DNA extract, RNA extract}. */
  def listSubjectSamples(g: EntityGraph): DataFrame = {
    val extracts = g.materials.filter(col("role").isin("DNA extract", "RNA extract"))
      .select(col("material_id").as("extract_id"), col("role").as("extract_role"),
        col("derives_from").as("sample_fk"))
    val samples = g.materials.select(
      col("material_id").as("sample_id_"), col("name").as("sample_name"),
      col("derives_from").as("subject_fk"))
    val subjects = g.materials.select(
      col("material_id").as("subject_id_"), col("name").as("subject_name"))
    extracts
      .join(samples, col("sample_fk") === col("sample_id_"))
      .join(subjects, col("subject_fk") === col("subject_id_"))
      .select(col("subject_name"), col("sample_name"), col("extract_role"))
      .distinct()
      .orderBy("subject_name", "sample_name", "extract_role")
  }

  /** Q5 — list subject characteristics
    * (sparql_list_subject_characteristics.py:40-57): donor-role
    * materials → characteristics; DISTINCT; ordered. */
  def listSubjectCharacteristics(g: EntityGraph): DataFrame =
    characteristicsOfRole(g, "donor")

  /** Q6 — list sample characteristics (role "specimen",
    * sparql_list_sample_characteristics.py:33-50). */
  def listSampleCharacteristics(g: EntityGraph): DataFrame =
    characteristicsOfRole(g, "specimen")

  private def characteristicsOfRole(g: EntityGraph, role: String): DataFrame =
    g.materials.filter(col("role") === role)
      .select(col("material_id"), col("name").as("material_name"))
      .join(g.characteristics, "material_id")
      .select(col("material_name"), col("var_acc"), col("name").as("char_name"),
        col("value"))
      .distinct()
      .orderBy("material_name", "char_name", "value")

  /** Q7 — the denormalizing tabular dump
    * (rdflib_tabular_dump.py:12-418, ~410 LoC → one join+pivot program):
    * subjects × characteristics-pivot (R1) left-joined to their files via
    * the DataAcquisition.input → extract → sample → subject chain, with
    * per-file datatype (P6), MD5 (from dimensions), DOI (from
    * distributions); subjects without files still emitted; multi-level
    * sort (O6).
    *
    * Pivot values are declared (the subject phenotype variables), so no
    * extra distinct pass — and the pivot stays a single shuffle keyed on
    * the subject material. */
  def tabularDump(g: EntityGraph, charNames: Seq[String] = Seq("SEX", "AGE", "DTHHRDY")): DataFrame = {
    val subjects = g.materials.filter(col("role") === "donor")
      .select(col("material_id").as("subject_mid"), col("name").as("subject_name"))

    val charsPivot = g.characteristics
      .join(subjects, col("material_id") === col("subject_mid"))
      .groupBy(col("subject_mid"))
      .pivot("name", charNames)
      .agg(first(col("value")))

    // file chain: dataset ← acquisition ← extract ← sample ← subject
    val extracts = g.materials.select(col("material_id").as("extract_id"),
      col("derives_from").as("sample_fk"))
    val samples = g.materials.select(col("material_id").as("sample_mid"),
      col("name").as("sample_name"), col("derives_from").as("subject_fk"),
      col("anatomy_id"))
    val s3Dist = g.distributions.filter(col("access_url").startsWith("s3://"))
      .select(col("dataset_id"), col("access_url").as("s3_uri"), col("md5"), col("doi"))
    val files = g.dataAcquisitions
      .join(extracts, col("input_material_id") === col("extract_id"))
      .join(samples, col("sample_fk") === col("sample_mid"))
      .join(g.datasets.select(col("dataset_id"), col("data_type")), "dataset_id")
      .join(s3Dist, "dataset_id")
      .join(g.anatomicalParts.select(col("anatomy_id"), col("name").as("anatomical_part")), "anatomy_id")

    subjects
      .join(charsPivot, Seq("subject_mid"), "left")
      .join(files, col("subject_fk") === col("subject_mid"), "left")
      .select(Seq(col("subject_name")) ++ charNames.map(col) ++ Seq(
        col("sample_name"), col("anatomical_part"), col("data_type"),
        col("s3_uri"), col("md5"), col("doi")): _*)
      .orderBy(col("subject_name"), col("anatomical_part").asc_nulls_first,
        col("data_type").asc_nulls_first, col("s3_uri").asc_nulls_first)
  }
}
