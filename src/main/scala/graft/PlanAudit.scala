package graft

/** Prints formatted physical plans for the flagship queries — the
  * explain-audit harness used to keep plans shuffle-lean (broadcasts on
  * dimension tables, pushed filters, wide codegen stages).
  *
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = Tables.session("plan-audit")
    Seq(
      "rel_pricing_summary", "rel_revenue_by_nation",
      "dedup_minhash_lsh", "sim_brute_topk",
      "text_stratified_sample", "text_pack_sequences",
      "dedup_embedding_auto").foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    // machine checks on the properties the audit exists for: column
    // pruning reaches the parquet scan, and the sampling op is
    // shuffle-free (pure scan → project → filter)
    val sample = SparkEntry.queries("text_stratified_sample")(spark, dir)
    val samplePlan = sample.queryExecution.executedPlan.toString
    // the keep-decision is a pure projection: the only allowed Exchange
    // is the rangepartitioning of the final presentation sort
    assert(!samplePlan.contains("hashpartitioning"),
      "stratified sample must not hash-shuffle")
    assert(samplePlan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "stratified sample must prune to doc_id+lang at the scan")
    val pack = SparkEntry.queries("text_pack_sequences")(spark, dir)
    val packPlan = pack.queryExecution.executedPlan.toString
    assert(packPlan.contains("hashpartitioning(lang"),
      "packing window must partition by lang, never be partition-less")
    println("\n[plan-audit] machine checks passed")
    spark.stop()
  }
}
