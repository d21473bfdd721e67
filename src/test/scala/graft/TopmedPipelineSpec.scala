package graft

import org.apache.spark.sql.functions._

import graft.etl.TopmedEtl
import graft.io.DatsJsonWriter
import graft.query.DatsQueries

class TopmedPipelineSpec extends SparkTestBase {

  private def res(name: String): String = getClass.getResource(s"/$name").getPath

  private lazy val graph = TopmedEtl.build(spark, TopmedEtl.Inputs(
    manifestPath = res("topmed/manifest.txt"),
    guidPaths = Seq(res("topmed/topmed-cram.tsv"), res("topmed/topmed-crai.tsv"),
      res("topmed/topmed-vcf.tsv"), res("topmed/topmed-vcfcsi.tsv")),
    subjectTsv = res("gtex/restricted_subject.txt"),
    phenotypesTsv = res("topmed/restricted_subject_phenotypes.txt")))

  test("TOPMed graph: subjects, consent groups, CRAM+VCF datasets, J12") {
    assert(graph.materials.filter(col("material_type") === "subject").count() === 3)
    // 3 CRAM datasets + 2 VCF (NWD100002 has no s3_vcf in the fixture)
    assert(graph.datasets.filter(col("data_type") === "WGS").count() === 3)
    assert(graph.datasets.filter(col("data_type") === "SNP/CNV").count() === 2)
    // J12: every emitted sample is referenced by a file dataset
    val samples = graph.materials.filter(col("material_type") === "sample")
    assert(samples.join(graph.dataAcquisitions,
      samples("material_id") === col("input_material_id"), "left_anti").count() === 0)
    // consent groups 1 and 2 plus all-subjects
    assert(graph.studyGroups.count() === 3)
  }

  test("TOPMed graph: GUID join carries md5/size/DOI onto distributions") {
    val withMd5 = graph.distributions.filter(col("md5").isNotNull)
    // NWD100001 cram (gs+s3) + NWD100002 cram (gs+s3) + NWD100001 vcf (gs+s3)
    assert(withMd5.count() === 6)
    val sci = graph.distributions
      .filter(col("access_url") === "s3://t/NWD100002.b38.irc.v1.cram").head
    assert(sci.getAs[Long]("size") === 12300000000L) // P10 sci-notation cast
  }

  test("P9: harmonized phenotypes and hypertension wired into the graph") {
    val su001 = graph.materials.filter(col("name") === "SU001")
      .select("material_id").head.getString(0)
    val harmonized = graph.characteristics
      .filter(col("material_id") === su001 && col("name").isin("Gender", "Age"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("value")).toMap
    // TOPMed gender is lower-cased only (subjects.py:36), so "1" stays
    assert(harmonized === Map("Gender" -> "1", "Age" -> "54"))
    val status = graph.diseases
      .join(graph.materials.select(col("material_id"), col("name").as("subj")), "material_id")
      .collect().map(r => r.getAs[String]("subj") -> r.getAs[String]("status")).toMap
    assert(status === Map("SU001" -> "yes", "SU003" -> "no")) // SU002 blank → absent
  }

  test("TOPMed queries + writer run end-to-end") {
    val members = DatsQueries.listStudyGroupMembers(
      graph, "phs000951.v2.p2", "consent group 1").collect()
    assert(members.map(_.getString(2)).toSeq === Seq("SU001", "SU003"))
    val json = DatsJsonWriter.render(graph)
    assert(json.contains("Trans-Omics for Precision Medicine (TOPMed)"))
    assert(json === DatsJsonWriter.render(graph)) // deterministic
  }
}
