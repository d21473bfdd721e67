package graft

import org.apache.spark.sql.SparkSession

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
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
