package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path utilities: the techniques the 100 TB deployment leans on,
  * demonstrated and spec-tested at local scale.
  */
object ScaleOps {

  /** Salted equi-join for skewed keys: explode the build side into
    * `salt` replicas and scatter the probe side across them, so one hot
    * key spreads over `salt` tasks instead of one straggler. Semantics
    * are identical to `big.join(small, keys)` (inner). AQE's skew-join
    * handles sort-merge cases adaptively; explicit salting remains the
    * tool for hash-partitioned aggregations and stateful streaming keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    // deterministic scatter: derive from a stable row hash, not rand()
    val scattered = big
      .withColumn("_salt", pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", col("_salt").cast("bigint"))
    scattered.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for skewed group keys: scatter each
    * group across `salt` sub-keys for the first (heavy) partial
    * aggregation, then combine the sub-aggregates — the groupBy analogue
    * of [[saltedJoin]]. Only algebraic aggregates (sum/count/min/max)
    * compose this way; the wrapper takes the sums and counts it needs. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, salt: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.withColumn("_salt", pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salt)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol).cast(DecimalType(18, 4))).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).cast("double").as("total"))
  }

  /** Write two tables bucketed on the join key, read them back, and
    * join: with matching bucket counts Spark plans a sort-merge join
    * with NO shuffle exchange on either side — the plan that makes the
    * orderkey join survive 100 TB. Returns (joined, physicalPlan). */
  def bucketedJoinDemo(spark: SparkSession, dir: String, warehouse: String,
                       buckets: Int = 8): (DataFrame, String) = {
    val orders = graft.Tables.load(spark, dir, "orders")
    val lineitem = graft.Tables.load(spark, dir, "lineitem")
    spark.sql(s"DROP TABLE IF EXISTS b_orders")
    spark.sql(s"DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$warehouse/b_orders").mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$warehouse/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")
    // disable auto-broadcast while planning: at demo scale Spark would
    // broadcast (also shuffle-free); the point is the bucketed SMJ path
    // a 100 TB orders⋈lineitem takes
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      (joined, joined.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
