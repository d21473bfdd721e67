package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.streaming.EventStream.FunnelEvent

/** The fourth streaming twin pair: the ordered conversion funnel as a
  * changelog. Every stage anchor is a min over user history, so a late
  * view can cascade through the whole funnel — the operator must retract
  * the stale row and re-emit; summed deltas converge to the batch funnel
  * for any admissible arrival order. */
class StreamingFunnelSpec extends SparkTestBase {

  private val T0 = 1000L * EventStream.WeekMs
  private def ev(user: Long, typ: String, ms: Long) =
    FunnelEvent(user, typ, ms, new Timestamp(ms))

  private def rollupMap(deltas: org.apache.spark.sql.DataFrame) =
    EventStream.funnelRollup(deltas).collect().map { r =>
      r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4))
    }.toMap

  private def batchMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4))
    }.toMap

  test("streaming funnel changelog equals the batch funnel on the bounded fixture") {
    val deltas = EventStream.runToMemory(
      EventStream.funnelDeltas(EventStream.readFunnelEvents(spark, sf)).toDF(),
      "funnel_deltas_bounded")
    val streamed = rollupMap(deltas)
    val batch = batchMap(EventOps.funnel(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("a late view retracts the funnel row and cascades through all stages") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = EventStream.funnelDeltas(input.toDS()).toDF()
      .writeStream.format("memory").queryName("funnel_deltas_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-funnel-late").toString)
      .start()
    // batch 1: click at T0+50s sits BEFORE the first view (T0+100s) — not
    // admissible; purchase needs an admissible click first. Row = depth 1.
    input.addData(
      ev(1, "view", T0 + 100000L),
      ev(1, "click", T0 + 50000L),
      ev(1, "purchase", T0 + 200000L))
    q.processAllAvailable()
    // batch 2: a LATE view at T0+40s (inside the 2 h watermark) moves
    // view_ms earlier, activates the retained click, which activates the
    // purchase — one retraction, full-depth re-emit
    input.addData(ev(1, "view", T0 + 40000L))
    q.processAllAvailable()
    q.stop()
    val deltas = spark.table("funnel_deltas_late")
    assert(deltas.filter(col("delta") < 0).count() === 1)
    val streamed = rollupMap(deltas)
    assert(streamed === Map(
      1L -> (T0 + 40000L, Some(T0 + 50000L), Some(T0 + 200000L), 3L)))
    // batch truth over ALL rows, any arrival order
    val batch = batchMap(EventOps.funnelFrom(Seq(
      (1L, "view", T0 + 100000L), (1L, "click", T0 + 50000L),
      (1L, "purchase", T0 + 200000L), (1L, "view", T0 + 40000L))
      .toDF("user_id", "event_type", "ms")))
    assert(streamed === batch)
  }

  test("stage anchors are strict: same-ms click does not follow its view") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = EventStream.funnelDeltas(input.toDS()).toDF()
      .writeStream.format("memory").queryName("funnel_deltas_strict")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-funnel-strict").toString)
      .start()
    input.addData(
      ev(1, "view", T0), ev(1, "click", T0), // same ms: NOT after the view
      ev(1, "click", T0 + 1000L),
      ev(2, "click", T0)) // click with no view at all: no row
    q.processAllAvailable()
    q.stop()
    val streamed = rollupMap(spark.table("funnel_deltas_strict"))
    assert(streamed === Map(1L -> (T0, Some(T0 + 1000L), None, 2L)))
  }
}
