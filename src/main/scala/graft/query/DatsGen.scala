package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.GtexEtl.EntityGraph

/** Deterministic DATS entity graph over the synthetic star schema, plus
  * the seven canonical reference queries (SURVEY.md §2.9) bound to it.
  *
  * The reference runs its seven query scripts
  * (sparql/v0.7/sparql_list_*.py:34-64, rdflib_tabular_dump.py:12-418)
  * against a ~160 MB / ~663k-triple GTEx DATS instance. The driver's
  * correctness harness only provides the TPC-H-ish base tables, so this
  * object derives an entity graph of the same SHAPE from them with pure,
  * SQL-replayable column arithmetic — every mapping below is mirrored
  * line-for-line by the DuckDB twins in [[graft.Oracles.datsQ1]]–datsQ7,
  * which makes each green row an end-to-end equivalence proof for the
  * derivation AND the query plan.
  *
  * Mapping (one entity family per base table, so cardinalities scale with
  * sf exactly like the reference's graph scales with release size):
  *   - region   → top-level project Dataset  (`R<key>`)
  *   - nation   → 2nd-level study Dataset (`N<key>`) + Identifier
  *                (`phs<key zero-padded to 6>`) + Study (`ST<key>`)
  *                + 5 Dimensions per study (`phv<key:3><01..05>`)
  *   - customer → donor Material (`SUBJ<key>`), StudyGroup membership
  *                keyed (nation, mktsegment), 3 characteristics
  *                (Gender / Age_Range / Market_Segment) + 1 disease row
  *                (Hypertension status)
  *   - orders   → specimen Material (`SAMP<key>`, name `SM-<key>`)
  *                deriving from its customer's donor, 2 characteristics
  *                (Order_Priority / Order_Status)
  *   - lineitem → DNA/RNA extract Material (`EXT<okey>_<line>`, role by
  *                line parity) deriving from the specimen and carrying
  *                subject_id + anatomy directly (as GTEx extracts do),
  *                one file-level Dataset (`F<okey>_<line>`, WGS/RNA-Seq
  *                by the same parity), its DataAcquisition, and one
  *                s3:// + one gs:// Distribution (size/md5/DOIs derived
  *                from the row key).
  *
  * At sf0.1 this yields ~600k extracts + 600k file datasets + 1.2M
  * distributions + 150k samples — the same order of magnitude as the
  * reference's 663k-triple instance, which is what BENCH_r{N}'s
  * q1/q7 rows are compared against (BASELINE.md: Q1 ≤ 90 s, Q2 ≤ 5 s).
  *
  * Scale shape: every derivation is a projection or a key-equi-join of
  * base tables (lineitem⋈orders⋈customer for extract subject attribution);
  * nothing is collected to the driver. Catalyst prunes unused entity
  * tables per query — e.g. Q1 compiles to a nation⋈region scan only.
  */
object DatsGen {

  /** Q1 parameter — the reference queries its top dataset by title
    * (sparql_list_2nd_level_datasets.py:34-40); here two project roots. */
  val Q1TopTitles: Seq[String] = Seq("ASIA", "EUROPE")

  /** Q2 parameter — study accession (nation 3's identifier). */
  val Q2StudyAcc = "phs000003"

  /** Q3 parameters — dataset accession (nation 0) + study-group name
    * (a market segment, the group key). */
  val Q3DatasetAcc = "phs000000"
  val Q3GroupName = "AUTOMOBILE"

  private def s(c: org.apache.spark.sql.Column) = c.cast("string")
  private def nullStr = lit(null).cast("string")

  /** The full entity graph. Pure view composition over the base parquet —
    * building it per query costs nothing; only the branches a query
    * touches are scanned, with column pruning pushed to parquet. */
  def graph(spark: SparkSession, dir: String): EntityGraph = {
    val region = Tables.load(spark, dir, "region")
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    // the synthetic generator draws l_linenumber at random, so
    // (l_orderkey, l_linenumber) is NOT unique (sf0.01: 60k rows, 45.8k
    // distinct pairs) — entity ids minted from it would collide and fan
    // every downstream join. l_seq is a deterministic per-order line
    // sequence: the window is PARTITIONED by the order key (scales — no
    // global sort), and its ORDER BY covers every column the derived
    // entities read, so even a tie would swap ids between
    // output-identical rows (multiset-equal; at sf0.1 the key is in fact
    // tie-free). The DuckDB twins replay the same window.
    // (r21) ONE windowed pass over lineitem, cached NARROW: Catalyst does
    // not dedupe structurally-identical window subtrees, so Q7's five
    // fileBase consumers (file datasets, two distribution branches,
    // acquisitions, extracts) each re-shuffled and re-sorted lineitem to
    // recompute l_seq — measured at sf0.1 as four concurrent ~3 s
    // window stages per run. The r19 A/B that rejected caching fileBase
    // cached its nine DERIVED STRING columns (q7 15.5 → 32.5 s at sf1);
    // this caches only the five numeric columns the strings derive from
    // — string assembly stays codegen'd per consumer, and the repeated
    // exchange+sort collapses to one. The cache is LAZY, so queries
    // whose plans fold the file branch away (q1-q3) never materialize it.
    val lineitem = graft.Caches.cached(
      Tables.load(spark, dir, "lineitem").withColumn("l_seq",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("l_orderkey")
            .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")))
        .select(col("l_orderkey"), col("l_seq"), col("l_linenumber"),
          col("l_partkey"), col("l_extendedprice")))

    val fileId = concat(lit("F"), s(col("l_orderkey")), lit("_"), s(col("l_seq")))
    val extractId = concat(lit("EXT"), s(col("l_orderkey")), lit("_"), s(col("l_seq")))
    val fileType = when(col("l_linenumber") % 2 === 0, "WGS").otherwise("RNA-Seq")

    // The shared file-chain projection: a PURE windowed-lineitem view —
    // no orders/customer join, so the three views that need only
    // lineitem-derived columns (file datasets, acquisitions,
    // distributions) stay join-free; only the extracts view, which
    // semantically needs the subject attach, joins orders⋈customer.
    // Catalyst does not dedupe structurally-distinct subtrees, so Q7
    // recomputes the window once per view — MEASURED CHEAPER than
    // materializing: a Caches.cached fileBase was A/B'd at sf1 and LOST
    // (q7 15.5 s → 32.5 s; columnar-caching nine derived string columns
    // costs far more than re-running codegen'd window+concat), so the
    // views stay pure. At cluster scale the recompute disappears anyway:
    // the ETL materializes entity tables to parquet once (GtexEtl) and
    // queries read those, exactly like the reference's own pipeline.
    val fileBase = lineitem.select(
      col("l_orderkey"),
      fileId.as("file_id"),
      extractId.as("extract_id"),
      concat(lit("EX-"), s(col("l_orderkey")), lit("_"), s(col("l_seq"))).as("ex_name"),
      when(col("l_linenumber") % 2 === 0, "DNA extract")
        .otherwise("RNA extract").as("ex_role"),
      fileType.as("data_type"),
      concat(lit("A"), s(col("l_partkey") % 5)).as("anatomy_id"),
      floor(col("l_extendedprice")).cast("long").as("file_size"),
      concat(lit("SAMP"), s(col("l_orderkey"))).as("sample_id"))

    val datasets =
      region.select(concat(lit("R"), s(col("r_regionkey"))).as("dataset_id"),
          nullStr.as("parent_dataset_id"), col("r_name").as("title"),
          nullStr.as("data_type"))
        .unionByName(nation.select(
          concat(lit("N"), s(col("n_nationkey"))).as("dataset_id"),
          concat(lit("R"), s(col("n_regionkey"))).as("parent_dataset_id"),
          col("n_name").as("title"), nullStr.as("data_type")))
        // file-level datasets are untitled: no query reads a file title,
        // and a NULL literal lets Catalyst fold Q1's title filter (and any
        // IsNotNull(parent) join prefilter) to false on this branch — a
        // root-title lookup prunes to the region+nation scans instead of
        // scanning the corpus-sized file branch (measured: 4.1 s → ms at
        // sf1's 6M files)
        .unionByName(fileBase.select(col("file_id").as("dataset_id"),
          nullStr.as("parent_dataset_id"), nullStr.as("title"),
          col("data_type")))

    val identifiers = nation.select(
      concat(lit("N"), s(col("n_nationkey"))).as("entity_id"),
      concat(lit("phs"), lpad(s(col("n_nationkey")), 6, "0")).as("identifier"))

    val studies = nation.select(
      concat(lit("ST"), s(col("n_nationkey"))).as("study_id"),
      concat(lit("N"), s(col("n_nationkey"))).as("dataset_id"),
      concat(col("n_name"), lit(" study")).as("name"))

    val studyGroups = customer.select(col("c_nationkey"), col("c_mktsegment"))
      .distinct()
      .select(
        concat(lit("G"), s(col("c_nationkey")), lit("_"), col("c_mktsegment")).as("group_id"),
        concat(lit("ST"), s(col("c_nationkey"))).as("study_id"),
        col("c_mktsegment").as("name"))

    val groupMembers = customer.select(
      concat(lit("G"), s(col("c_nationkey")), lit("_"), col("c_mktsegment")).as("group_id"),
      concat(lit("SUBJ"), s(col("c_custkey"))).as("material_id"))

    // extracts attach to subjects by name (the file_subject_key Q7 joins
    // on) — the lineitem⋈orders⋈customer chain is the one real join in
    // the derivation, keyed and shuffle-partitioned on the order key,
    // and ONLY this view pays it (fileBase itself is deliberately
    // join-free). material_type is a LITERAL per union branch — like both
    // ETL graphs — so DatsQueries' typed-hop filters constant-fold the
    // corpus-sized extract chain out of subject/sample lookups entirely
    // (measured at sf10: Q3 19.7 s → 2.3 s, Q4 63.9 s → ~20 s). The
    // extract ROLE stays a single two-valued branch (splitting it into
    // two literal-role branches was A/B'd and rejected: Q7's inputs scan
    // then paid the window twice, 139.6 s → 177.8 s at sf10).
    val extracts = fileBase
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("extract_id").as("material_id"),
        col("ex_name").as("name"),
        lit("extract").as("material_type"), col("ex_role").as("role"),
        col("sample_id").as("derives_from"),
        col("c_name").as("subject_id"), col("anatomy_id"))

    val materials = customer.select(
        concat(lit("SUBJ"), s(col("c_custkey"))).as("material_id"),
        col("c_name").as("name"),
        lit("subject").as("material_type"), lit("donor").as("role"),
        nullStr.as("derives_from"), nullStr.as("subject_id"), nullStr.as("anatomy_id"))
      .unionByName(orders.select(
        concat(lit("SAMP"), s(col("o_orderkey"))).as("material_id"),
        concat(lit("SM-"), s(col("o_orderkey"))).as("name"),
        lit("sample").as("material_type"), lit("specimen").as("role"),
        concat(lit("SUBJ"), s(col("o_custkey"))).as("derives_from"),
        nullStr.as("subject_id"), nullStr.as("anatomy_id")))
      .unionByName(extracts)

    val anatomicalParts = {
      import spark.implicits._
      Seq(("A0", "Blood", "UBERON:0000178"), ("A1", "Brain", "UBERON:0000955"),
        ("A2", "Heart", "UBERON:0000948"), ("A3", "Liver", "UBERON:0002107"),
        ("A4", "Lung", "UBERON:0002048"))
        .toDF("anatomy_id", "name", "uberon_id")
    }

    val subjMid = concat(lit("SUBJ"), s(col("c_custkey")))
    val sampMid = concat(lit("SAMP"), s(col("o_orderkey")))
    val characteristics = customer.select(subjMid.as("material_id"),
        lit("phv00001").as("var_acc"), lit("Gender").as("name"),
        when(col("c_custkey") % 2 === 0, "female").otherwise("male").as("value"))
      .unionByName(customer.select(subjMid.as("material_id"),
        lit("phv00002").as("var_acc"), lit("Age_Range").as("name"),
        concat(s(lit(20) + (col("c_custkey") % 6) * 10), lit("-"),
          s(lit(29) + (col("c_custkey") % 6) * 10)).as("value")))
      .unionByName(customer.select(subjMid.as("material_id"),
        lit("phv00003").as("var_acc"), lit("Market_Segment").as("name"),
        col("c_mktsegment").as("value")))
      .unionByName(orders.select(sampMid.as("material_id"),
        lit("phv00004").as("var_acc"), lit("Order_Priority").as("name"),
        col("o_orderpriority").as("value")))
      .unionByName(orders.select(sampMid.as("material_id"),
        lit("phv00005").as("var_acc"), lit("Order_Status").as("name"),
        col("o_orderstatus").as("value")))

    val dimensions = {
      import spark.implicits._
      val vars = Seq(("01", "Gender", "Subject gender"),
        ("02", "Age_Range", "Subject age range"),
        ("03", "Market_Segment", "Customer market segment"),
        ("04", "Order_Priority", "Sample order priority"),
        ("05", "Order_Status", "Sample order status"))
        .toDF("v_suffix", "v_name", "v_description")
      nation.crossJoin(broadcast(vars)).select(
        concat(lit("N"), s(col("n_nationkey"))).as("owner_id"),
        concat(lit("phv"), lpad(s(col("n_nationkey")), 3, "0"), col("v_suffix")).as("var_acc"),
        col("v_name").as("name"), col("v_description").as("description"))
    }

    val distributions = fileBase.select(col("file_id").as("dataset_id"),
        concat(lit("s3://graft-bucket/"), col("file_id"), lit(".cram")).as("access_url"),
        col("file_size").as("size"),
        md5(col("file_id")).as("md5"),
        concat(lit("10.0000/"), col("file_id")).as("doi"),
        concat(lit("10.0000/idx."), col("file_id")).as("index_doi"))
      .unionByName(fileBase.select(col("file_id").as("dataset_id"),
        concat(lit("gs://graft-bucket/"), col("file_id"), lit(".cram")).as("access_url"),
        lit(null).cast("long").as("size"), nullStr.as("md5"),
        nullStr.as("doi"), nullStr.as("index_doi")))

    val dataAcquisitions = fileBase.select(
      col("extract_id").as("input_material_id"), col("file_id").as("dataset_id"))

    val diseases = customer.select(subjMid.as("material_id"),
      lit("Hypertension").as("name"), lit("DOID:10763").as("disease_id"),
      when(col("c_custkey") % 3 === 0, "positive")
        .when(col("c_custkey") % 3 === 1, "negative")
        .otherwise("unknown").as("status"))

    EntityGraph(datasets, identifiers, studies, studyGroups, groupMembers,
      materials, anatomicalParts, characteristics, dimensions, distributions,
      dataAcquisitions, diseases)
  }

  def q1(spark: SparkSession, dir: String): DataFrame = queryOver(1, graph(spark, dir))
  def q2(spark: SparkSession, dir: String): DataFrame = queryOver(2, graph(spark, dir))
  def q3(spark: SparkSession, dir: String): DataFrame = queryOver(3, graph(spark, dir))
  def q4(spark: SparkSession, dir: String): DataFrame = queryOver(4, graph(spark, dir))
  def q5(spark: SparkSession, dir: String): DataFrame = queryOver(5, graph(spark, dir))
  def q6(spark: SparkSession, dir: String): DataFrame = queryOver(6, graph(spark, dir))
  def q7(spark: SparkSession, dir: String): DataFrame = queryOver(7, graph(spark, dir))

  /** The derivation's fixed subject-level pivot header (3 subject
    * characteristics + 1 disease name), sorted. */
  val Q7CharNames: Seq[String] =
    Seq("Age_Range", "Gender", "Hypertension", "Market_Segment")

  /** Canonical query `n` (1-7) bound to this derivation's parameters,
    * over any of its graphs (direct views or re-read parquet).
    *
    * Q3 runs over a member-restricted materials view: hasMember is
    * untyped in the generic query (AGR groups hold genes), but THIS
    * graph's members are all subjects, so the graph supplies the
    * knowledge. On direct views the literal type filter folds the
    * corpus-sized extract chain out of the member name attach (sf10:
    * 19.7 s → 2.3 s); on materialized tables the same filter becomes
    * PARTITION PRUNING — only the `material_type=subject` directory is
    * listed.
    *
    * Q7 passes the pivot header explicitly — the derivation fixes the
    * subject-level characteristic∪disease name set, so the distinct
    * discovery pass (bounded but still a job) is skipped. */
  def queryOver(n: Int, g: EntityGraph): DataFrame = n match {
    case 1 => DatsQueries.listSecondLevelDatasets(g, Q1TopTitles)
    case 2 => DatsQueries.listDatasetVariables(g, Some(Q2StudyAcc))
    case 3 => DatsQueries.listStudyGroupMembers(
      g.copy(materials = g.materials.filter(col("material_type") === "subject")),
      Q3DatasetAcc, Q3GroupName)
    case 4 => DatsQueries.listSubjectSamples(g)
    case 5 => DatsQueries.listSubjectCharacteristics(g)
    case 6 => DatsQueries.listSampleCharacteristics(g)
    case 7 => DatsQueries.tabularDump(g, Some(Q7CharNames))
    case other => sys.error(s"no canonical query $other")
  }

  /** Write the entity views to parquet under `out` — the deployment
    * step of the materialize-then-query shape ([[graft.io.EntityStore]];
    * the reference writes its instance once and every query re-reads
    * it). Each view is one distributed write; `materials` lands
    * partitioned by `material_type`, and the corpus-sized tables are
    * BUCKETED on their join/pivot key (r17) so the queries ride the
    * layout instead of re-shuffling per run. */
  def materialize(spark: SparkSession, dir: String, out: String): Unit =
    graft.io.EntityStore.saveBucketed(graph(spark, dir), out)

  private val matDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  // the cache dirs live for the process (queries hold scans over them),
  // so reclaim them at JVM exit — without this every Bench/Verify
  // process left a full entity-table copy under /tmp
  locally {
    sys.addShutdownHook(matDirs.values.foreach(d =>
      try graft.BenchKit.deleteTree(java.nio.file.Paths.get(d))
      catch { case _: Throwable => () }))
  }

  /** The entity tables for `dir`, materialized ONCE per process into a
    * fresh temp directory and re-read from parquet thereafter. The
    * `qNMat` suite entries run over this, so their oracle rows prove
    * materialized ≡ direct query-for-query, and their bench rows price
    * the deployment shape (query-only cost — the write is paid once, on
    * the first call, exactly like the reference's own ETL-once /
    * query-many split). */
  def materializedGraph(spark: SparkSession, dir: String): EntityGraph = {
    val out = matDirs.getOrElseUpdate(dir, {
      val d = java.nio.file.Files.createTempDirectory("graft_dats_mat_").toString
      materialize(spark, dir, d)
      d
    })
    graft.io.EntityStore.loadBucketed(spark, out)
  }

  /** Canonical query `n` (1-7) over the materialized tables — the same
    * [[queryOver]] programs with parquet inputs. */
  def matQuery(n: Int)(spark: SparkSession, dir: String): DataFrame =
    queryOver(n, materializedGraph(spark, dir))
}
