package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** The seventh streaming twin pair: the hourly volume monitor as a
  * changelog. Counts only ever ADD, so a late-but-admissible event emits
  * one more positive delta for its hour — no retraction — and the exact
  * z/flag arithmetic is recomputed at rollup over the summed counts,
  * converging to the batch monitor for any admissible arrival order. */
class StreamingAnomalySpec extends SparkTestBase {

  private val T0 = 1000L * EventStream.WeekMs
  private val H0 = T0 / 3600000L

  private def asRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet

  test("streaming anomaly changelog equals the batch monitor on the bounded fixture") {
    val deltas = EventStream.runToMemory(
      EventStream.anomalyDeltas(EventStream.readAnomalyEvents(spark, sf)).toDF(),
      "anomaly_deltas_bounded")
    val streamed = asRows(EventStream.anomalyRollup(deltas))
    val batch = asRows(EventOps.anomaly(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("a late event inside the watermark adds a delta instead of recomputing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, tpe: String, ms: Long) =
      Event(id, id, tpe, 1.0, new Timestamp(ms))
    val input = MemoryStream[Event]
    val q = EventStream.anomalyDeltas(input.toDS()).toDF()
      .writeStream.format("memory").queryName("anomaly_deltas_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-anomaly-late").toString)
      .start()
    // batch 1: two views and a click across hours H0 / H0+1; the max
    // event time (T0+90min) puts the watermark at T0-30min
    input.addData(
      ev(1, "view", T0 + 5 * 60000L),
      ev(2, "view", T0 + 90 * 60000L),
      ev(3, "click", T0 + 10 * 60000L))
    q.processAllAvailable()
    // batch 2: a LATE view lands back in hour H0 (T0+20min — above the
    // watermark, so admissible): one more +1 delta, nothing retracted
    input.addData(ev(4, "view", T0 + 20 * 60000L))
    q.processAllAvailable()
    q.stop()
    val deltas = spark.table("anomaly_deltas_late")
    assert(deltas.filter(col("delta") < 0).count() === 0L)
    // the late hour accumulated TWO separate positive deltas — the
    // incremental signature (a recompute would have emitted one row)
    assert(deltas.filter(col("event_type") === "view" && col("hour") === H0)
      .count() === 2L)
    // summed deltas + shared z tail converge to the batch monitor over
    // ALL rows regardless of arrival order
    val streamed = asRows(EventStream.anomalyRollup(deltas))
    val batch = asRows(EventOps.anomalyFrom(
      Seq((1L, "view", T0 + 5 * 60000L), (2L, "view", T0 + 90 * 60000L),
        (3L, "click", T0 + 10 * 60000L), (4L, "view", T0 + 20 * 60000L))
        .map { case (id, t, ms) => (id, t, ms * 1000000L) }
        .toDF("event_id", "event_type", "ts")))
    assert(streamed === batch)
  }
}
