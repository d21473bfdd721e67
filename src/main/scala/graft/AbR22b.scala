package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-JVM adjacent A/B (AbBench discipline — one JVM, both orders,
  * order-cancelled geomean) for the r22 shuffle-dedup candidates that
  * QueryProbe surfaced:
  *
  *  1. `ngram_base` / `ngram_dedup` — dedup_ngram_jaccard as shipped vs
  *     a variant where (a) the df-capped shingle relation is
  *     localCheckpoint'ed PRE-PARTITIONED on the shingle hash so the
  *     self-join's two sides arrive co-partitioned (the shipped cache
  *     reports unknown partitioning, so BOTH sides re-exchange — probe
  *     jobs 30/31, ~0.7 s each of identical work), and (b) the per-doc
  *     set-size aggregate is cached instead of recomputed per attach.
  *  2. `q7_base` / `q7_hashpivot` — q7_tabular_dump as shipped vs the
  *     pivot expressed as first(when(name = n, value) ignoring nulls)
  *     per header column: PivotFirst's buffer forces a SortAggregate
  *     pair, the when-projection form runs as a map-side-combining
  *     HashAggregate. Equal because every (subject, name) pair is
  *     unique in this graph (3 characteristic names + 1 disease per
  *     subject), so "first matching row's value" and "the unique
  *     non-null value" coincide.
  *
  * Outputs are asserted identical before anything is timed.
  *
  * Usage: runMain graft.AbR22b [sfDir] [outJsonl] [reps]
  */
object AbR22b {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get(args.lift(1).getOrElse("ab_r22b.jsonl"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Tables.session("ab-r22b",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def record(name: String, secs: Double): Unit = BenchKit.record(out, name, secs, dir)
    BenchKit.sentinel(spark, out, "start", dir)

    // ---- variant 1: ngramJaccardPairs with a pre-partitioned checkpoint
    // for the self-join and a cached counts relation
    def ngramDedup(): DataFrame = {
      val raw = Caches.cached(graft.operators.DedupOps.shingleTable(spark, dir))
      val hot = raw.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > 64).select("h")
      val sh = raw.join(hot.hint("shuffle_hash"), Seq("h"), "left_anti")
        .localCheckpoint()
      val counts = Caches.cached(sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh")))
      val inter = sh.as("x").join(sh.as("y").hint("shuffle_hash"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
          .hint("shuffle_hash"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
          .hint("shuffle_hash"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    }
    def ngramBase(): DataFrame = graft.operators.DedupOps.ngramJaccard(spark, dir)

    // initial-plan shuffle count (pre-AQE) — the claim the A/B is about
    def exCount(df: DataFrame): Int = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

    {
      val a = ngramBase().collect().toSeq
      val b = ngramDedup().collect().toSeq
      require(a == b, s"ngram variants diverge: base=${a.size} dedup=${b.size}")
      println(s"[ab-r22b] ngram variants identical (${a.size} rows); " +
        s"exchanges base=${exCount(ngramBase())} dedup=${exCount(ngramDedup())}")
      Caches.release(); spark.catalog.clearCache()
    }

    // ---- variant 2: tabularDump with the pivot as first(when) columns
    def q7HashPivot(): DataFrame = {
      val g = graft.query.DatsGen.graph(spark, dir)
      val names = graft.query.DatsGen.Q7CharNames.sorted
      val subjects = g.materials
        .filter(col("material_type") === "subject" && col("role") === "donor")
        .select(col("material_id").as("subject_mid"), col("name").as("subject_name"))
      val charRows = g.characteristics
        .select(col("material_id"), col("name"), col("value"))
      val diseaseRows = g.diseases
        .select(col("material_id"), col("name"), col("status").as("value"))
      val unionPivot = charRows.unionByName(diseaseRows)
        .join(subjects.select(col("subject_mid")),
          col("material_id") === col("subject_mid"))
        .groupBy(col("subject_mid"))
        .agg(first(when(col("name") === names.head, col("value")), ignoreNulls = true)
              .as("__a0"),
          names.tail.zipWithIndex.map { case (n, i) =>
            first(when(col("name") === n, col("value")), ignoreNulls = true)
              .as(s"__a${i + 1}") }: _*)
      val pivotCols = names.indices.map(i => col(s"__a$i").as(names(i)))
      val studyDatasets = g.studies.select(col("study_id"), col("dataset_id"))
        .join(g.datasets.select(col("dataset_id"), col("parent_dataset_id")), "dataset_id")
        .join(g.identifiers.select(col("entity_id"), col("identifier").as("dbgap_study")),
          col("dataset_id") === col("entity_id"), "left")
        .join(g.datasets.select(col("dataset_id").as("parent_id"), col("title").as("project")),
          col("parent_dataset_id") === col("parent_id"), "left")
        .select(col("study_id"), col("project"), col("dbgap_study"))
      val scaffold = studyDatasets
        .join(g.studyGroups.select(col("group_id"), col("study_id"),
          col("name").as("study_group")), "study_id")
        .join(g.groupMembers, "group_id")
        .join(subjects, col("material_id") === col("subject_mid"))
      val inputs = g.materials.filter(col("material_type") === "extract")
        .select(col("material_id").as("input_id"),
          col("subject_id").as("file_subject_key"), col("anatomy_id"))
      val aws = g.distributions.filter(col("access_url").startsWith("s3://"))
        .select(col("dataset_id"), col("access_url").as("aws_uri"),
          col("size").as("file_size"), col("md5"), col("doi"), col("index_doi"))
      val gcp = g.distributions.filter(col("access_url").startsWith("gs://"))
        .select(col("dataset_id"), col("access_url").as("gcp_uri"))
      val files = g.dataAcquisitions
        .join(g.datasets.select(col("dataset_id"), col("data_type")), "dataset_id")
        .join(aws, Seq("dataset_id"), "left")
        .join(gcp, Seq("dataset_id"), "left")
        .join(inputs, col("input_material_id") === col("input_id"))
        .join(g.anatomicalParts.select(col("anatomy_id"),
          col("name").as("anatomical_part"),
          col("uberon_id").as("anatomical_part_id")), Seq("anatomy_id"), "left")
        .filter(col("file_subject_key").isNotNull)
      scaffold.join(unionPivot, Seq("subject_mid"), "left")
        .join(files, col("file_subject_key") === col("subject_name"), "left")
        .select(Seq(col("project").as("Project"),
          col("dbgap_study").as("dbGaP_Study"),
          col("study_group").as("Study_Group"),
          col("subject_name").as("Subject_ID")) ++ pivotCols ++ Seq(
          col("anatomical_part").as("Anatomical_Part"),
          col("anatomical_part_id").as("Anatomical_Part_ID"),
          col("data_type").as("Datatype"),
          col("file_size").as("File_Size"),
          col("md5").as("MD5_Checksum"),
          col("aws_uri").as("AWS_URI"), col("gcp_uri").as("GCP_URI"),
          col("doi").as("DOI"), col("index_doi").as("INDEX_DOI")): _*)
        .orderBy(col("dbGaP_Study"), col("Study_Group"), col("Subject_ID"),
          col("Anatomical_Part").asc_nulls_first,
          col("Datatype").asc_nulls_first, col("AWS_URI").asc_nulls_first)
    }
    def q7Base(): DataFrame = graft.query.DatsGen.q7(spark, dir)

    {
      val a = q7Base().collect().toSeq
      val b = q7HashPivot().collect().toSeq
      require(a == b, s"q7 variants diverge: base=${a.size} hashpivot=${b.size}")
      println(s"[ab-r22b] q7 variants identical (${a.size} rows); " +
        s"exchanges base=${exCount(q7Base())} hashpivot=${exCount(q7HashPivot())}")
      Caches.release(); spark.catalog.clearCache()
    }

    def cycle(tag: String, run: () => Unit): Unit = {
      Caches.release(); spark.catalog.clearCache(); System.gc()
      record(tag, BenchKit.timed(run()))
    }
    def nb(): Unit = { ngramBase().count(); () }
    def nd(): Unit = { ngramDedup().count(); () }
    def qb(): Unit = { q7Base().count(); () }
    def qh(): Unit = { q7HashPivot().count(); () }
    nb(); nd()
    (1 to reps).foreach { _ =>
      cycle("ngram_base", () => nb()); cycle("ngram_dedup", () => nd())
      cycle("ngram_dedup", () => nd()); cycle("ngram_base", () => nb())
    }
    qb(); qh()
    (1 to reps).foreach { _ =>
      cycle("q7_base", () => qb()); cycle("q7_hashpivot", () => qh())
      cycle("q7_hashpivot", () => qh()); cycle("q7_base", () => qb())
    }
    BenchKit.sentinel(spark, out, "end", dir)
    spark.stop()
  }
}
