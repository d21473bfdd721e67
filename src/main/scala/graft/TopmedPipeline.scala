package graft

import graft.etl.TopmedEtl
import graft.io.DatsJsonWriter
import graft.query.DatsQueries

/** End-to-end TOPMed pipeline main — the engine's equivalent of the
  * reference's `bin/topmed_to_dats.py` (SURVEY.md §3.2): restricted
  * ingest → consent groups → CRAM/VCF file datasets → entity graph →
  * DATS JSON-LD → canonical queries.
  *
  * Usage: runMain graft.TopmedPipeline <inputDir> <outJson>
  */
object TopmedPipeline {
  def main(args: Array[String]): Unit = {
    val inDir = args.lift(0).getOrElse("src/test/resources")
    val outJson = args.lift(1).getOrElse("/tmp/topmed_dats.json")
    val spark = Tables.session("topmed-pipeline")

    val graph = TopmedEtl.build(spark, TopmedEtl.Inputs(
      manifestPath = s"$inDir/topmed/manifest.txt",
      guidPaths = Seq(
        s"$inDir/topmed/topmed-cram.tsv", s"$inDir/topmed/topmed-crai.tsv",
        s"$inDir/topmed/topmed-vcf.tsv", s"$inDir/topmed/topmed-vcfcsi.tsv"),
      subjectTsv = s"$inDir/gtex/restricted_subject.txt",
      phenotypesTsv = s"$inDir/topmed/restricted_subject_phenotypes.txt",
      sampleTsv = Some(s"$inDir/topmed/restricted_sample.txt")
        .filter(p => new java.io.File(p).exists()),
      sampleAttributesTsv = Some(s"$inDir/topmed/restricted_sample_attributes.txt")
        .filter(p => new java.io.File(p).exists()),
      dbgapDataDictPaths = Seq(
        s"$inDir/topmed/phs000951.v2.pht003641.v2.p2.TOPMed_Subject.data_dict.xml")
        .filter(p => new java.io.File(p).exists())))

    DatsJsonWriter.write(graph, outJson)
    println(s"[pipeline] wrote TOPMed DATS JSON-LD to $outJson " +
      s"(${java.nio.file.Files.size(java.nio.file.Paths.get(outJson))} bytes)")

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"== $name (${df.count()} rows) ==")
      df.show(6, truncate = false)
    }
    show("Q1 second-level datasets", DatsQueries.listSecondLevelDatasets(
      graph, Seq("Trans-Omics for Precision Medicine (TOPMed)")))
    show("Q3 consent group 1 members", DatsQueries.listStudyGroupMembers(
      graph, "phs000951.v2.p2", "consent group 1"))
    show("Q4 subject samples", DatsQueries.listSubjectSamples(graph))
    show("Q5 subject characteristics", DatsQueries.listSubjectCharacteristics(graph))
    show("Q2 study variables", DatsQueries.listDatasetVariables(
      graph, Some("phs000951.v2.p2")))
    show("Q7 tabular dump", DatsQueries.tabularDump(graph))
    spark.stop()
  }
}
