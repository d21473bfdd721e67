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

  test("EntityStore.dropBucketed guards its recursive delete") {
    import graft.io.EntityStore
    // (a) a non-empty dir that is NOT a saveBucketed layout is refused —
    // a wrong or truncated argument must not delete arbitrary data
    val notLayout = java.nio.file.Files.createTempDirectory("dats_guard_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$notLayout/precious.txt"), "not ours\n")
    // ...and the refusal must be side-effect-free: catalog entries for
    // the dir (hashed table names) must survive a refused call — the
    // layout check runs BEFORE any catalog mutation
    val catName = EntityStore.tableName(notLayout, "materials")
    spark.sql(s"CREATE TABLE $catName (x INT) USING parquet")
    try {
      intercept[IllegalArgumentException](EntityStore.dropBucketed(spark, notLayout))
      assert(new java.io.File(s"$notLayout/precious.txt").exists(),
        "the refused delete must leave the dir untouched")
      assert(spark.catalog.tableExists(catName),
        "a refused dropBucketed must not have dropped the catalog entries")
    } finally spark.sql(s"DROP TABLE IF EXISTS $catName")
    // (b) an EMPTY dir is accepted — callers createTempDirectory before
    // materializing, so an early materialize failure leaves one and the
    // cleanup contract says it must not leak
    val empty = java.nio.file.Files.createTempDirectory("dats_guard_e_").toString
    EntityStore.dropBucketed(spark, empty)
    assert(!new java.io.File(empty).exists(), "an empty dir must be removed")
    // (c) a missing dir is a no-op, and a real layout is removed
    EntityStore.dropBucketed(spark, empty) // already gone — must not throw
    java.nio.file.Files.walk(java.nio.file.Paths.get(notLayout))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }
}
