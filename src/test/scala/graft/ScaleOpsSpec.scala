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

  test("saltedCountSum equals the plain aggregation") {
    val orders = Tables.load(spark, sf, "orders")
    val plain = orders.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = graft.operators.ScaleOps
      .saltedCountSum(orders, "o_orderstatus", "o_totalprice", 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted === plain)
  }

  test("ProfileAggregator matches the built-in column profile") {
    import spark.implicits._
    import graft.operators.ProfileAggregator
    val qty = Tables.load(spark, sf, "lineitem")
      .select(col("l_quantity")).as[java.lang.Double]
    val p = qty.select(ProfileAggregator.of.toColumn).head
    val ref = graft.operators.Representative.columnProfile(spark, sf)
      .agg(sum("n"), min("min_q"), max("max_q")).head
    assert(p.n === ref.getLong(0))
    assert(p.min === ref.getDouble(1) && p.max === ref.getDouble(2))
    assert(p.nulls === 0L)
    assert(math.abs(p.mean - 25.5) < 1.0) // sanity: TPC-H qty is uniform 1..50
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
