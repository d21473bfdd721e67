package graft

import org.apache.spark.sql.functions._

import graft.etl.GtexEtl
import graft.query.DatsQueries

class SinksSpec extends SparkTestBase {

  private def res(name: String): String = getClass.getResource(s"/gtex/$name").getPath

  private lazy val graph = GtexEtl.build(spark, GtexEtl.Inputs(
    subjectsPath = res("GTEx_v7_Annotations_SubjectPhenotypesDS.txt"),
    samplesPath = res("GTEx_v7_Annotations_SampleAttributesDS.txt"),
    wgsManifestPath = res("wgs_cram_manifest.txt"),
    rnaseqManifestPath = res("rnaseq_cram_manifest.txt"),
    doiPath = res("doi_manifest.txt")))

  test("K3: tabular dump writes a deterministic tab-delimited wide file") {
    val out = java.nio.file.Files.createTempDirectory("k3").toString + "/dump"
    DatsQueries.tabularDump(graph).coalesce(1)
      .write.option("sep", "\t").option("header", "true").csv(out)
    val file = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv")).head
    val lines = scala.io.Source.fromFile(file).getLines().toSeq
    assert(lines.head === "Project\tdbGaP_Study\tStudy_Group\tSubject_ID\tAGE" +
      "\tDTHHRDY\tSEX\tAnatomical_Part\tAnatomical_Part_ID\tDatatype" +
      "\tFile_Size\tMD5_Checksum\tAWS_URI\tGCP_URI\tDOI\tINDEX_DOI")
    assert(lines.length === 8) // header + 7 dump rows
    // golden spot-check: first data row is the sorted-first subject+file
    assert(lines(1).startsWith("Genotype-Tissue Expression Project (GTEx)" +
      "\tphs000424.v7.p2\tall subjects\tGTEX-1111\t60-69\t"))
  }

  test("K2: per-entity JSON files partitioned by material type") {
    val out = java.nio.file.Files.createTempDirectory("k2").toString + "/materials"
    graph.materials.write.partitionBy("material_type").json(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("material_type=extract", "material_type=sample", "material_type=subject"))
    val back = spark.read.json(out)
    assert(back.count() === graph.materials.count())
  }

  test("determinism: two Verify-style dumps of a query are byte-identical") {
    val q = SparkEntry.queries("rel_pricing_summary")
    def dumpHash(): String = {
      val dir = java.nio.file.Files.createTempDirectory("det").toString + "/q"
      q(spark, sf).coalesce(1).write.mode("overwrite").parquet(dir)
      val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
    }
    assert(dumpHash() === dumpHash())
  }
}
