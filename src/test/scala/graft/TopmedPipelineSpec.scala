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

  test("TOPMed queries + writer run end-to-end") {
    val members = DatsQueries.listStudyGroupMembers(
      graph, "phs000951.v2.p2", "consent group 1").collect()
    assert(members.map(_.getString(2)).toSeq === Seq("SU001", "SU003"))
    val json = DatsJsonWriter.render(graph)
    assert(json.contains("Trans-Omics for Precision Medicine (TOPMed)"))
    assert(json === DatsJsonWriter.render(graph)) // deterministic
  }
}
