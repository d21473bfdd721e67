package graft

import graft.etl.AgrMgdEtl
import graft.io.DatsJsonWriter
import graft.query.DatsQueries
import graft.sources.Readers

/** End-to-end AGR/MGD pipeline main — the engine's equivalent of
  * `bin/agr_to_dats.py` + `bin/mgd_to_dats.py`: gene ingest with
  * disease/phenotype/ortholog joins → entity graph → DATS JSON-LD →
  * queries, plus the MGD homolog coverage report.
  *
  * Usage: runMain graft.AgrPipeline <inputDir> <outJson>
  */
object AgrPipeline {
  def main(args: Array[String]): Unit = {
    val inDir = args.lift(0).getOrElse("src/test/resources")
    val outJson = args.lift(1).getOrElse("/tmp/agr_dats.json")
    val spark = Tables.session("agr-pipeline")

    val graph = AgrMgdEtl.build(spark, AgrMgdEtl.Inputs(
      bgiPath = s"$inDir/agr/MGI_BGI.json",
      diseasePath = s"$inDir/agr/MGI_disease.json",
      phenotypePath = s"$inDir/agr/MGI_phenotype.json",
      orthologyPath = s"$inDir/agr/orthology.tsv"))

    DatsJsonWriter.write(graph, outJson)
    println(s"[pipeline] wrote AGR DATS JSON-LD to $outJson " +
      s"(${java.nio.file.Files.size(java.nio.file.Paths.get(outJson))} bytes)")

    println("== all genes (Q3) ==")
    DatsQueries.listStudyGroupMembers(graph, "AGR-MGI", "all MGI genes").show(5, truncate = false)
    println("== gene characteristics (Q5-analog, role=gene) ==")
    graph.characteristics.orderBy("material_id", "name").show(10, truncate = false)

    // MGD homolog coverage report (A8)
    val rpt = Readers.homologReport(spark, s"$inDir/gtex/HOM_MouseHumanSequence.rpt")
    AgrMgdEtl.homologCoverage(AgrMgdEtl.mouseHumanHomologs(rpt)).show()
    spark.stop()
  }
}
