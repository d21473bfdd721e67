package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operator inventory (SURVEY.md §2.4-§2.8), expressed as
  * pure DataFrame programs over the synthetic star schema.
  *
  * Numeric discipline: money columns arrive as doubles; every aggregation
  * first casts to an exact `DecimalType` so partial-aggregation order (which
  * Spark does not guarantee across partitions) cannot perturb the result.
  * This is what makes results hash-stable against a DuckDB oracle AND
  * deterministic across cluster re-runs — a requirement the reference
  * satisfies trivially by being single-threaded (SURVEY §7.4.2); a
  * distributed engine has to design for it.
  *
  * Scale notes are attached per operator: which side broadcasts, where the
  * shuffles are, and why the plan survives 100 TB.
  */
object Relational {

  /** Exact money representation: 2-decimal inputs cast losslessly. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Pricing summary (reference A1/A2/A5 analog — groupBy + multi-agg;
    * cf. ccmm/dbgap/public_metadata.py:43-58 consumed stats).
    * Map-side partial aggregation on (returnflag, linestatus) — 6 groups —
    * means the shuffle moves O(groups × partitions) rows, not O(data).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).as("d_sum_qty"),
        sum(dec(col("l_extendedprice"))).as("d_sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount")))).as("d_sum_disc_price"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("d_sum_qty").cast("double").as("sum_qty"),
        col("d_sum_base_price").cast("double").as("sum_base_price"),
        col("d_sum_disc_price").cast("double").as("sum_disc_price"),
        (col("d_sum_qty").cast("double") / col("count_order")).as("avg_qty"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Multi-hop equi-join chain (reference J13 — the SPARQL query shape:
    * dataset→study→group→member chains, sparql/v0.7 scripts).
    * region/nation are tiny → broadcast; orders⋈lineitem co-shuffles on
    * orderkey (at 100 TB this is the one real shuffle; bucketing both on
    * orderkey would remove it); final groupBy on nation is 25 groups.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount")))).as("d_revenue"),
        count(lit(1)).as("n_items"))
      .select(col("r_name"), col("n_name"),
        col("d_revenue").cast("double").as("revenue"), col("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Two-level histogram (reference A3 — samples-per-subject histogram,
    * ccmm/gtex/rna_extracts.py:13-46). Two shuffles but the second input is
    * already |customers| rows and the third |distinct counts| — shrinks
    * monotonically, safe at any scale.
    */
  def ordersPerCustomerHistogram(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    orders.groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      .groupBy("n_orders").agg(count(lit(1)).as("n_customers"))
      .orderBy("n_orders")
  }

  /** Top-1 per group via window (reference O3/A4 — representative-value
    * pick, ccmm/gtex/dna_extracts.py:49-53). The window shuffles on
    * custkey once; rank pruning happens before any further join.
    */
  def topOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** Anti-join (reference J2 — manifest↔portal reconciliation,
    * bin/gtex_v7_to_dats.py:42-94). Customer side is the small build side;
    * at scale the orders projection is a single column pre-aggregated by
    * the semi/anti hash — no wide rows move.
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-01-01"))
    customer.join(orders.select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Distinct-collapse per group (reference A7 — `list(set(do_ids))`,
    * ccmm/agr/genes.py:272-273). Emitted as a sorted joined string so the
    * result is engine-portable; `collect_set` is a map-side partial agg.
    */
  def prioritiesByStatus(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    orders.groupBy("o_orderstatus")
      .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** Union + distinct (reference U1/U5 — WGS ∪ RNA-Seq datasets,
    * bin/gtex_v7_to_dats.py:385-397). Distinct pushes partials map-side.
    */
  def nationsWithPresence(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    val custNations = customer.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), lit("customer").as("presence"))
    val suppNations = supplier.join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), lit("supplier").as("presence"))
    custNations.unionByName(suppNations).distinct().orderBy("n_name", "presence")
  }

  /** Long→wide pivot (reference R1 — characteristics pivot,
    * rdflib_tabular_dump.py:334-369). Pivot values are declared, so Spark
    * skips the extra distinct-values job — mandatory at scale.
    */
  def statusByPriorityPivot(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    orders.groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("F", "O", "P"))
      .select(col("o_orderpriority"), col("F").as("status_f"),
        col("O").as("status_o"), col("P").as("status_p"))
      .orderBy("o_orderpriority")
  }

  /** Left join + null-tolerant merge (reference J5/J6 — Subject ⋈
    * Subject_Phenotypes left-outer with missing-row warn,
    * ccmm/topmed/subjects.py:186-241). Count of unmatched rows doubles as
    * the reconciliation tally (A6).
    */
  def customerOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val perCust = orders.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(dec(col("o_totalprice"))).as("d_total"))
    customer.join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("d_total").cast("double"), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** Semi-join (reference J12 — referenced-sample semi-join,
    * bin/topmed_to_dats.py:251-266). */
  def partsEverOrdered(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    val lineitem = Tables.load(spark, dir, "lineitem")
    part.join(lineitem.select("l_partkey"),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy("p_partkey")
  }

  /** Conditional-tally aggregation (reference A6/A8 — found / not-found
    * reconciliation counts, bin/gtex_v7_to_dats.py:43-94). One scan, one
    * tiny shuffle. */
  def orderReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    customer.join(orders.select("o_custkey").distinct(),
        col("c_custkey") === col("o_custkey"), "left")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("n_with_orders"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_without_orders"))
  }
}
