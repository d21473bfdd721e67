package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.streaming.EventStream.AsofInput

/** The third streaming twin pair: the as-of join as a changelog. A late
  * order inside the watermark is the true as-of match of an already-emitted
  * event, so the operator must retract the stale enrichment and re-emit —
  * summed deltas converge to the batch join for any admissible arrival
  * order. */
class StreamingAsofSpec extends SparkTestBase {

  private val T0 = 1000L * EventStream.WeekMs
  private def order(user: Long, okey: Long, ms: Long, price: Double) =
    AsofInput(user, 0, -1L, ms, okey, price, new Timestamp(ms))
  private def event(user: Long, eid: Long, ms: Long) =
    AsofInput(user, 1, eid, ms, -1L, 0.0, new Timestamp(ms))

  private def rollupMap(deltas: org.apache.spark.sql.DataFrame) =
    EventStream.asofRollup(deltas).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap

  test("streaming as-of changelog equals the batch as-of join on the bounded fixture") {
    val deltas = EventStream.runToMemory(
      EventStream.asofDeltas(EventStream.readTaggedAsof(spark, sf)).toDF(),
      "asof_deltas_bounded")
    val streamed = rollupMap(deltas)
    val batch = EventOps.asofJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("a late order retracts and repairs already-emitted enrichments") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsofInput]
    val q = EventStream.asofDeltas(input.toDS()).toDF()
      .writeStream.format("memory").queryName("asof_deltas_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-asof-late").toString)
      .start()
    // batch 1: order 10 then an event 10 min later → enriched with order 10;
    // event 2 has no order at all yet → null enrichment
    input.addData(
      order(1, 10, T0, 100.0), event(1, 1, T0 + 600000L),
      event(2, 2, T0 + 600000L))
    q.processAllAvailable()
    // batch 2: order 20 lands LATE at T0+5min (inside the 2 h watermark) —
    // it out-dates order 10 for event 1, which must be retracted and
    // re-emitted; user 2's late order repairs a null enrichment too
    input.addData(
      order(1, 20, T0 + 300000L, 200.0),
      order(2, 30, T0 + 60000L, 300.0))
    q.processAllAvailable()
    q.stop()
    val deltas = spark.table("asof_deltas_late")
    // retractions actually happened (not a quiet recompute)
    assert(deltas.filter(col("delta") < 0).count() === 2)
    val streamed = rollupMap(deltas)
    // batch truth over ALL rows, any arrival order
    val batch = EventOps.asofJoinFrom(
      Seq((1L, 1L, T0 + 600000L), (2L, 2L, T0 + 600000L))
        .toDF("event_id", "user_id", "ms"),
      Seq((10L, 1L, T0, 100.0), (20L, 1L, T0 + 300000L, 200.0),
        (30L, 2L, T0 + 60000L, 300.0))
        .toDF("o_orderkey", "o_custkey", "o_ms", "o_totalprice")
        .withColumn("o_orderdate", timestamp_millis(col("o_ms"))))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(streamed === Map(
      1L -> (Some(20L), Some(200.0)), 2L -> (Some(30L), Some(300.0))))
    assert(streamed === batch)
  }

  test("orders at exactly the event time are visible; ties go to the larger orderkey") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsofInput]
    val q = EventStream.asofDeltas(input.toDS()).toDF()
      .writeStream.format("memory").queryName("asof_deltas_tie")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-asof-tie").toString)
      .start()
    input.addData(
      order(1, 7, T0, 70.0), order(1, 9, T0, 90.0), // same ms: key 9 wins
      event(1, 1, T0))                              // order AT event time visible
    q.processAllAvailable()
    q.stop()
    val streamed = rollupMap(spark.table("asof_deltas_tie"))
    assert(streamed === Map(1L -> (Some(9L), Some(90.0))))
  }
}
