package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkTestBase {

  test("saltedJoin preserves inner-join semantics") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, "o_custkey").count()
    val salted = ScaleOps.saltedJoin(orders, customer, "o_custkey", salt = 8).count()
    assert(salted === plain)
  }

  test("bucketed join plans without a shuffle exchange on either side") {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val (joined, plan) = ScaleOps.bucketedJoinDemo(spark, sf, wh)
    // the aggregate exchanges once; the JOIN itself must not:
    // bucket-co-partitioned scans feed the sort-merge join directly
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || plan.contains("SortMergeJoin"),
      s"expected SMJ in plan:\n$plan")
    val exchangesBelowJoin = plan.linesIterator
      .dropWhile(!_.contains("SortMergeJoin"))
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchangesBelowJoin === 0,
      s"expected no shuffle below the bucketed join:\n$plan")
    assert(joined.agg(sum("n")).head.getLong(0) ===
      Tables.load(spark, sf, "lineitem").count())
  }
}
