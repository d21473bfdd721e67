package graft

/** Formatted-plan dump for any suite query — the ad-hoc companion to the
  * asserted [[PlanAudit]] harness.
  *
  * Usage: runMain graft.ExplainQuery <queryName> [sfDir]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    def usage = "usage: ExplainQuery <name> [sfDir]; names: " +
      SparkEntry.queries.keys.toSeq.sorted.mkString(", ")
    require(args.nonEmpty, usage)
    // resolve the name BEFORE starting a session so a typo gets the
    // sorted name listing instead of a bare NoSuchElementException
    val fn = SparkEntry.queries.getOrElse(args(0),
      sys.error(s"unknown query '${args(0)}'; $usage"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    // Tables.session, not a bare builder: the suite's timestamp queries
    // need the UTC/nanosAsLong session configs, and the plans should be
    // produced under the same extensions PlanAudit and the driver use
    val spark = Tables.session("explain-query")
    spark.sparkContext.setLogLevel("ERROR")
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
