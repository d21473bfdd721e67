package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Representative
import graft.sources.ValidatedTsv
import graft.sources.ValidatedTsv.{ColumnSpec, Regex}
import graft.sources.Readers

/** The TOPMed ETL path (reference bin/topmed_to_dats.py, SURVEY.md §3.2):
  * N studies, CRAM+VCF manifests, four GUID files merged under a global
  * filename-uniqueness assert (U2), restricted Subject⋈Subject_Phenotypes
  * merges (J5/J6), consent-group StudyGroups (A1/J9), and the
  * synthetic-subject path that picks representative values per variable
  * (A4) when only public metadata is available.
  */
object TopmedEtl {

  /** FIXTURES.md §7 — 12-col sample manifest. */
  val manifestSpec: Seq[ColumnSpec] = Seq(
    ColumnSpec("sample_id", Regex("^NWD\\d+$")),
    ColumnSpec("consent_abbrev", Regex("^(DS-CS-MDS-RD|DS-CS-RD|DS-LD|DS-LD-RD|HMB|HMB-MDS)$")),
    ColumnSpec("sex", Regex("^(male|female)$")),
    ColumnSpec("topmed_abbrev", Regex("^phs\\d+$")),
    ColumnSpec("s3_cram"), ColumnSpec("s3_crai"),
    ColumnSpec("s3_vcf", emptyOk = true), ColumnSpec("s3_csi", emptyOk = true),
    ColumnSpec("gs_cram"), ColumnSpec("gs_crai"),
    ColumnSpec("gs_vcf", emptyOk = true), ColumnSpec("gs_csi", emptyOk = true))

  val guidSpec: Seq[ColumnSpec] = Seq(
    ColumnSpec("File_Name", Regex("^NWD\\d+\\..*(\\.cram(\\.crai)?|\\.vcf\\.gz(\\.csi)?)$")),
    ColumnSpec("Google_URL"), ColumnSpec("AWS_URL"),
    ColumnSpec("Argon_GUID", emptyOk = true), ColumnSpec("Calcium_GUID", emptyOk = true),
    ColumnSpec("Helium_GUID", emptyOk = true), ColumnSpec("Xenon_GUID", emptyOk = true),
    ColumnSpec("DOS_URI", Regex("^dos://.*$")),
    ColumnSpec("md5sum", Regex("^[a-f\\d]{32}$")),
    ColumnSpec("File size"),
    ColumnSpec("Sodium_GUID", emptyOk = true))

  /** P10 — scientific-notation size cast (`1.23e9` → long). The reference
    * function has a missing-return bug (topmed/samples.py:335-339); the
    * declared semantic is implemented (SURVEY.md §7.4.3). */
  def sizeToLong(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("double").cast("long")

  /** U2 — merge the GUID files; duplicate File_Name across files is fatal
    * (bin/topmed_to_dats.py:326-335). */
  def mergeGuidFiles(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val merged = paths.map(p =>
        ValidatedTsv.readStrict(spark, p, guidSpec, "File_Name"))
      .reduce(_ unionByName _)
      .withColumn("file_size", sizeToLong(col("File size")))
    val dups = merged.groupBy("File_Name").agg(count(lit(1)).as("n")).filter(col("n") > 1)
    require(dups.isEmpty,
      s"duplicate File_Name across GUID files: ${dups.collect().map(_.getString(0)).mkString(",")}")
    merged
  }

  /** J5 — Subject ⋈ Subject_Phenotypes left outer on dbGaP_Subject_ID;
    * conflicting values in shared columns are fatal, missing phenotype
    * rows are kept (ccmm/topmed/subjects.py:186-241). */
  def mergeSubjectTables(subject: DataFrame, phenotypes: DataFrame,
                         key: String = "dbGaP_Subject_ID"): DataFrame = {
    val shared = subject.columns.toSet.intersect(phenotypes.columns.toSet) - key
    val p = shared.foldLeft(phenotypes) { (df, c) => df.withColumnRenamed(c, c + "_ph") }
    val joined = subject.join(p, Seq(key), "left")
    shared.foreach { c =>
      val conflicts = joined.filter(
        col(c).isNotNull && col(c + "_ph").isNotNull && col(c) =!= col(c + "_ph"))
      require(conflicts.isEmpty, s"conflicting values for shared column $c")
    }
    shared.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(c), col(c + "_ph"))).drop(c + "_ph")
    }
  }

  /** A1/J9 — consent-group StudyGroups: group subjects by CONSENT code,
    * join the code metadata (from the var_report enum), assert the
    * subject count against the code's declared count
    * (bin/topmed_to_dats.py:132-161). */
  def consentGroups(subjects: DataFrame, consentMeta: DataFrame): DataFrame = {
    val groups = subjects.groupBy(col("CONSENT"))
      .agg(count(lit(1)).as("n_subjects"),
        sort_array(collect_list(col("SUBJECT_ID"))).as("members"))
    val joined = groups.join(consentMeta, Seq("CONSENT"), "left")
    val mismatch = joined.filter(
      col("declared_count").isNotNull && col("declared_count") =!= col("n_subjects"))
    require(mismatch.isEmpty, "consent-group count mismatch vs var_report")
    joined.orderBy("CONSENT")
  }

  /** Synthetic-subject path (ccmm/topmed/subjects.py:157-184): with only
    * public metadata, one synthetic subject per study carries the
    * representative value of every variable — A4 pick per var. Input is
    * long-form (var_name, value) rows; SUBJECT_ID/SAMPLE_ID excluded
    * (dna_extracts.py:30-33). */
  def syntheticSubject(longForm: DataFrame): DataFrame =
    Representative.modeWithTiebreak(
      longForm.filter(!col("var_name").isin("SUBJECT_ID", "SAMPLE_ID")),
      Seq("var_name"), "value")
      .orderBy("var_name")

  /** J12 — keep only samples referenced as an input of some file dataset
    * (bin/topmed_to_dats.py:251-266). */
  def referencedSamples(samples: DataFrame, acquisitions: DataFrame,
                        sampleIdCol: String = "sample_id",
                        inputCol: String = "input_material_id"): DataFrame =
    samples.join(acquisitions.select(col(inputCol)),
      col(sampleIdCol) === col(inputCol), "left_semi")
}
