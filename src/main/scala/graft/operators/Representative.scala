package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** A4/A5 — representative-value pick and the var_report-style column
  * profile (SURVEY.md §2.5).
  *
  * A4 is the subtlest operator in the reference
  * (ccmm/gtex/dna_extracts.py:22-57): the comment claims
  * mode-with-alphanumeric-tiebreak, but the code sorts by count
  * descending and then RE-SORTS the whole list by name (Python's stable
  * sort), so the actual pick is the lexicographically smallest name —
  * count order only breaks exact-name ties (SURVEY.md §7.4.4). Both
  * semantics are provided; both are exposed in one query so the
  * divergence is visible and tested.
  */
object Representative {

  /** Declared-behavior pick: lexicographically smallest value. */
  def pickByBehavior(valueCol: String): Column = min(col(valueCol))

  /** Declared-intent pick (mode with name tiebreak) as a window program. */
  def modeWithTiebreak(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val counts = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("cnt").desc, col(valueCol).asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select((groupCols :+ valueCol).map(col): _*)
  }

  /** One query exposing both A4 semantics plus the numeric median per
    * group (the reference takes the median from var_report stats; here
    * it is computed from the data). */
  def representativeValues(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val modes = modeWithTiebreak(orders, Seq("o_orderpriority"), "o_orderstatus")
      .withColumnRenamed("o_orderstatus", "mode_status")
    orders.groupBy("o_orderpriority")
      .agg(
        pickByBehavior("o_orderstatus").as("min_status"),
        median(col("o_totalprice")).as("median_price"),
        count(lit(1)).as("n"))
      .join(modes, "o_orderpriority")
      .select(col("o_orderpriority"), col("min_status"), col("mode_status"),
        col("median_price"), col("n"))
      .orderBy("o_orderpriority")
  }

  /** A5 — the var_report statistical profile computed from data
    * (ccmm/dbgap/public_metadata.py:43-58 consumes these: n, nulls,
    * mean, median, min, max, sd, distinct). The mean and stddev are
    * derived from EXACT decimal power sums (Σx, Σx²) so the result is
    * partition-order independent; only the final sqrt/divide run in
    * floating point, on identical operands in any engine. This is the
    * single-pass profile a 100 TB column scan wants — no second pass,
    * no sort except the median's internal one. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val x = col("l_quantity").cast(DecimalType(18, 4))
    l.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("nulls"),
        sum(x).as("d_sum"),
        sum(x * x).as("d_sumsq"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"),
        median(col("l_quantity")).as("median_q"),
        countDistinct(col("l_quantity")).as("distinct_q"))
      .select(
        col("l_returnflag"), col("n"), col("nulls"),
        (col("d_sum").cast("double") / col("n")).as("mean_q"),
        sqrt((col("d_sumsq").cast("double") * col("n") - col("d_sum").cast("double") * col("d_sum").cast("double")) /
          (col("n").cast("double") * (col("n") - lit(1)))).as("sd_q"),
        col("min_q"), col("max_q"), col("median_q"), col("distinct_q"))
      .orderBy("l_returnflag")
  }
}
