package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Readers

/** AGR (gene/disease/phenotype/ortholog) and MGD (reference genome +
  * human homolog) pipelines (reference ccmm/agr/genes.py and
  * ccmm/mgd/ref_genome_dataset.py, SURVEY.md §2.4 J7/J8).
  *
  * The reference's J7 is a nested-loop `search_dict` — a linear scan per
  * gene, O(n·m). Here it is a broadcast hash join + `collect_set`
  * nesting: the single biggest algorithmic upgrade the Spark rebuild
  * delivers (SURVEY.md §2.4 J7). At 100 TB the gene dimension stays
  * broadcast-sized while annotations stream through the join.
  */
object AgrMgdEtl {

  /** P13 — SO term code→name lookup (agr/genes.py:16-41, 25 entries in
    * the reference; representative subset — missing key is fatal). */
  val SoTerms: Map[String, String] = Map(
    "SO:0001217" -> "protein_coding_gene",
    "SO:0000336" -> "pseudogene",
    "SO:0001263" -> "ncRNA_gene",
    "SO:0001637" -> "rRNA_gene",
    "SO:0001272" -> "tRNA_gene")

  /** P13 — strand symbol → name (mgd/ref_genome_dataset.py:44-48). */
  val StrandNames: Map[String, String] = Map("+" -> "forward", "-" -> "reverse")

  private def mapCol(m: Map[String, String]) =
    map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** S9 — AGR BGI genes: project required+optional fields, default "NA",
    * first genomeLocation, SO-term lookup with fatal on unknown code
    * (agr/genes.py:64-124). */
  def bgiGenes(spark: SparkSession, path: String): DataFrame = {
    val raw = Readers.agrJson(spark, path)
    val genes = raw.select(
      col("primaryId").as("gene_id"),
      col("symbol"),
      col("soTermId"),
      coalesce(element_at(mapCol(SoTerms), col("soTermId")), lit(null)).as("so_name"),
      col("taxonId"),
      coalesce(col("geneSynopsis"), lit("NA")).as("synopsis"),
      col("genomeLocations").getItem(0).getField("assembly").as("assembly"),
      col("genomeLocations").getItem(0).getField("chromosome").as("chromosome"),
      col("genomeLocations").getItem(0).getField("startPosition").as("start_pos"),
      col("genomeLocations").getItem(0).getField("endPosition").as("end_pos"),
      coalesce(element_at(mapCol(StrandNames),
        col("genomeLocations").getItem(0).getField("strand")), lit("NA")).as("strand"),
      coalesce(col("crossReferenceIds"), array()).as("cross_refs"))
    val unknownSo = genes.filter(col("so_name").isNull)
    require(unknownSo.isEmpty,
      s"unknown SO terms: ${unknownSo.select("soTermId").distinct().collect().mkString(",")}")
    // taxon whitelist (agr/genes.py:84-90: mouse 10090 / rat 10116)
    genes.filter(col("taxonId").contains("10090") || col("taxonId").contains("10116"))
  }

  /** J7 + A7 — gene → diseases: broadcast join then per-gene distinct
    * DOid collapse (agr/genes.py:61-62, 268-273). */
  def geneDiseases(genes: DataFrame, diseases: DataFrame): DataFrame =
    genes.select(col("gene_id"), col("symbol"))
      .join(diseases.select(col("objectId"), col("DOid")),
        col("gene_id") === col("objectId"), "left")
      .groupBy("gene_id", "symbol")
      .agg(sort_array(collect_set(col("DOid"))).as("do_ids"))
      .withColumn("n_diseases", size(col("do_ids")))

  /** J7 + A7 — gene → phenotype term ids (agr/genes.py:329-335). */
  def genePhenotypes(genes: DataFrame, phenotypes: DataFrame): DataFrame = {
    val terms = phenotypes.select(col("objectId"),
      explode(col("phenotypeTermIdentifiers")).as("t"))
      .select(col("objectId"), col("t").getField("termId").as("term_id"))
    genes.select(col("gene_id"), col("symbol"))
      .join(terms, col("gene_id") === col("objectId"), "left")
      .groupBy("gene_id", "symbol")
      .agg(sort_array(collect_set(col("term_id"))).as("phenotype_terms"))
  }

  /** S10 + J7 — orthology TSV (positional columns 1,2,3,5,7 after a
    * 14-line preamble; ortho taxon must contain 9606,
    * agr/genes.py:203-223): per MOD gene, the sorted list of human
    * ortholog gene ids. */
  def geneOrthologs(spark: SparkSession, genes: DataFrame, orthoPath: String): DataFrame = {
    val raw = Readers.skipPreambleTsv(spark, orthoPath, 14)
    val cols = raw.columns
    val ortho = raw.select(
        col(cols(0)).as("ortho_gene_id"), col(cols(1)).as("ortho_symbol"),
        col(cols(2)).as("ortho_taxon"), col(cols(4)).as("mod_gene_id"),
        col(cols(6)).as("mod_taxon"))
      .filter(col("ortho_taxon").contains("9606"))
    genes.select(col("gene_id"), col("symbol"))
      .join(ortho, col("gene_id") === col("mod_gene_id"), "left")
      .groupBy("gene_id", "symbol")
      .agg(sort_array(collect_set(col("ortho_gene_id"))).as("human_orthologs"))
      .withColumn("has_ortholog", (size(col("human_orthologs")) > 0).cast("int"))
  }

  /** P14 — Dbxref split: `NCBI_Gene:497097,ENSEMBL:ENSMUSG...` →
    * (source, id) rows (mgd/ref_genome_dataset.py:262-268). */
  def dbxrefs(features: DataFrame): DataFrame =
    features.select(col("feature_id"),
        explode(split(col("attr")("Dbxref"), ",")).as("xref"))
      .select(col("feature_id"),
        substring_index(col("xref"), ":", 1).as("xref_source"),
        substring_index(col("xref"), ":", -1).as("xref_id"))

  /** J8 — mouse gene → HomoloGene cluster → human EntrezGene ids
    * (two chained joins + collect_list; mgd/human_homologs.py:60-88),
    * plus the A8 coverage tallies (ref_genome_dataset.py:296-301). */
  def mouseHumanHomologs(homologReport: DataFrame): DataFrame = {
    val mouse = homologReport.filter(col("species") === "mouse")
      .select(col("HomoloGene ID").as("cluster"), col("Mouse MGI ID").as("mgi_id"),
        col("Symbol").as("mouse_symbol"))
    val human = homologReport.filter(col("species") === "human")
      .select(col("HomoloGene ID").as("h_cluster"), col("EntrezGene ID").as("entrez_id"))
    mouse.join(human, col("cluster") === col("h_cluster"), "left")
      .groupBy("mgi_id", "mouse_symbol")
      .agg(sort_array(collect_set(col("entrez_id"))).as("human_entrez_ids"))
      .withColumn("n_human", size(col("human_entrez_ids")))
  }

  /** A8 — homolog coverage counts. */
  def homologCoverage(homologs: DataFrame): DataFrame =
    homologs.agg(
      count(lit(1)).as("n_mouse_genes"),
      sum(when(col("n_human") > 0, 1L).otherwise(0L)).as("with_human_homolog"),
      sum(when(col("n_human") === 0, 1L).otherwise(0L)).as("without_human_homolog"))
}
