package graft

import org.apache.spark.sql.functions._

import graft.query.DatsGen

/** The synthetic DATS entity graph (DatsGen) + the seven canonical queries
  * bound to it. The DuckDB twins (Oracles.datsQ1-7) are the value-level
  * equivalence proof; these specs pin the structural invariants that made
  * r14's first cut wrong — id uniqueness under the non-unique
  * (l_orderkey, l_linenumber) synthetic key — plus the Q7 contract
  * (column set/order, row grain, padding).
  */
class DatsGenSpec extends SparkTestBase {

  private lazy val g = DatsGen.graph(spark, sf)
  private lazy val lineitemCount = Tables.load(spark, sf, "lineitem").count()

  test("entity ids are unique: file datasets, extracts, acquisitions") {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
    // (sf0.001: 6000 rows / ~4600 distinct pairs) — the l_seq window must
    // still mint one id per ROW
    assert(g.dataAcquisitions.count() === lineitemCount)
    assert(g.dataAcquisitions.select("dataset_id").distinct().count() === lineitemCount)
    val extracts = g.materials.filter(col("role").endsWith("extract"))
    assert(extracts.count() === lineitemCount)
    assert(extracts.select("material_id").distinct().count() === lineitemCount)
    assert(g.distributions.count() === 2 * lineitemCount)
  }

  test("q1 lists exactly the study datasets under the ASIA/EUROPE roots") {
    val rows = DatsGen.q1(spark, sf).collect()
    assert(rows.length === 10) // 2 regions x 5 nations
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
    assert(rows.forall(_.getString(0).startsWith("phs")))
  }

  test("q2 returns the 5-variable dimension block of one study") {
    val rows = DatsGen.q2(spark, sf).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getString(0) == DatsGen.Q2StudyAcc))
    assert(rows.map(_.getString(1)).forall(_.startsWith("phv003")))
  }

  test("q3 members match the (nation, segment) customer set") {
    // nation 0 = Q3DatasetAcc "phs000000" (review r15: an expectation
    // filtered on nation 1 passed only because both nations had equal
    // AUTOMOBILE counts at sf0.001) — assert the exact member NAMES, not
    // just a count, so a wrong-nation derivation cannot coincide
    val expected = Tables.load(spark, sf, "customer")
      .filter(col("c_nationkey") === 0 && col("c_mktsegment") === DatsGen.Q3GroupName)
      .select(col("c_name")).collect().map(_.getString(0)).sorted.toSeq
    val got = DatsGen.q3(spark, sf).select(col("member_name"))
      .collect().map(_.getString(0)).toSeq
    assert(got === expected)
    assert(expected.nonEmpty, "q3 parameters must select a non-empty group")
  }

  test("q4 is the distinct (subject, sample, role) projection") {
    val q4 = DatsGen.q4(spark, sf)
    assert(q4.columns.toSeq === Seq("subject_name", "sample_name", "extract_role"))
    assert(q4.count() === q4.distinct().count())
    assert(q4.select("extract_role").distinct().count() === 2)
  }

  test("q7 grain: one row per file plus one padded row per file-less subject") {
    val q7 = DatsGen.q7(spark, sf)
    assert(q7.columns.toSeq === Seq("Project", "dbGaP_Study", "Study_Group",
      "Subject_ID", "Age_Range", "Gender", "Hypertension", "Market_Segment",
      "Anatomical_Part", "Anatomical_Part_ID", "Datatype", "File_Size",
      "MD5_Checksum", "AWS_URI", "GCP_URI", "DOI", "INDEX_DOI"))
    val customers = Tables.load(spark, sf, "customer")
    val withFiles = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey").distinct().count()
    val padded = customers.count() - withFiles
    assert(q7.count() === lineitemCount + padded)
    assert(q7.filter(col("AWS_URI").isNull).count() === padded)
    // every non-padded row carries both clouds' URIs and a 32-hex md5
    assert(q7.filter(col("AWS_URI").isNotNull &&
      (col("GCP_URI").isNull || !col("MD5_Checksum").rlike("^[0-9a-f]{32}$"))).count() === 0)
  }
}
