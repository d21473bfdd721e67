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
      "dedup_minhash_lsh", "sim_brute_topk").foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
