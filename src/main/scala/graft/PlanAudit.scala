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
    val frames = Seq(
      "rel_pricing_summary", "rel_revenue_by_nation",
      "dedup_minhash_lsh", "sim_brute_topk",
      "text_stratified_sample", "text_pack_sequences",
      "dedup_embedding_cosine", "dedup_embedding_auto").map { name =>
      println(s"\n===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
      name -> df
    }.toMap
    // machine checks on the properties the audit exists for: column
    // pruning reaches the parquet scan, and the sampling op is
    // shuffle-free (pure scan → project → filter)
    val samplePlan = frames("text_stratified_sample")
      .queryExecution.executedPlan.toString
    // the keep-decision is a pure projection: the only allowed Exchange
    // is the rangepartitioning of the final presentation sort
    assert(!samplePlan.contains("hashpartitioning"),
      "stratified sample must not hash-shuffle")
    // pruned scan: the documents FileScan reads doc_id and lang and no
    // other field (order/type tolerant — exact-string schemas are brittle)
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(samplePlan).map(_.group(1)).getOrElse("")
    val readCols = readSchema.split(",").map(_.split(":")(0).trim).toSet
    assert(readCols == Set("doc_id", "lang"),
      s"stratified sample must prune to doc_id+lang at the scan, read: $readCols")
    val packPlan = frames("text_pack_sequences")
      .queryExecution.executedPlan.toString
    assert(packPlan.contains("hashpartitioning(lang"),
      "packing window must partition by lang, never be partition-less")
    // the embedding near-dup pair joins must CO-SHUFFLE on the block key
    // — a corpus-sized broadcast build side is an OOM at cluster scale.
    // dedup_embedding_cosine has no legitimate broadcast at all; the
    // auto variant's only broadcast is the nlist-row seed frame inside
    // its cached coarse assignment, never a BroadcastHashJoin pair join.
    val cosPlan = frames("dedup_embedding_cosine").queryExecution.executedPlan.toString
    assert(cosPlan.contains("ShuffledHashJoin"),
      "embedding near-dup pair join must be a shuffled hash join")
    assert(!cosPlan.contains("BroadcastExchange"),
      "embedding near-dup must not broadcast the corpus")
    val autoPlan = frames("dedup_embedding_auto").queryExecution.executedPlan.toString
    assert(autoPlan.contains("ShuffledHashJoin"),
      "embedding auto near-dup pair join must be a shuffled hash join")
    assert(!autoPlan.contains("BroadcastHashJoin"),
      "embedding auto near-dup must not broadcast-join the corpus")
    println("\n[plan-audit] machine checks passed")
    spark.stop()
  }
}
