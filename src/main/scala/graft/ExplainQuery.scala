package graft

/** Formatted-plan dump for any suite query — the ad-hoc companion to the
  * asserted [[PlanAudit]] harness.
  *
  * Usage: runMain graft.ExplainQuery <queryName> [sfDir]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: ExplainQuery <name> [sfDir]; names: " +
      SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    // Tables.session, not a bare builder: the suite's timestamp queries
    // need the UTC/nanosAsLong session configs, and the plans should be
    // produced under the same extensions PlanAudit and the driver use
    val spark = Tables.session("explain-query")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
