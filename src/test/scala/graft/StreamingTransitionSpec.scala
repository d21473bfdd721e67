package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.streaming.EventStream.TypedEvent

/** The sixth streaming twin pair: the event-type transition matrix as a
  * changelog. The out-of-order hazard is mid-sequence INSERTION — a late
  * event between two already-seen neighbors splits their transition, so
  * the operator must retract the split edge and emit the two new ones. */
class StreamingTransitionSpec extends SparkTestBase {

  private val T0 = 1000L * EventStream.WeekMs
  private def ev(user: Long, eid: Long, typ: String, ms: Long) =
    TypedEvent(user, eid, typ, ms, new Timestamp(ms))

  private def rollupMap(deltas: org.apache.spark.sql.DataFrame) =
    EventStream.transitionRollup(deltas).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  private def batchMap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("streaming transition changelog equals the batch matrix on the bounded fixture") {
    val deltas = EventStream.runToMemory(
      EventStream.transitionDeltas(EventStream.readTypedEvents(spark, sf)).toDF(),
      "transition_deltas_bounded")
    val streamed = rollupMap(deltas)
    val batch = batchMap(EventOps.transitionMatrix(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("a late mid-sequence event splits the transition: retract + two new edges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStream.transitionDeltas(input.toDS()).toDF()
      .writeStream.format("memory").queryName("transition_deltas_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-transition-late").toString)
      .start()
    // batch 1: view @t0, purchase @t0+20min → one transition view→purchase
    input.addData(
      ev(1, 1, "view", T0),
      ev(1, 3, "purchase", T0 + 1200000L))
    q.processAllAvailable()
    // batch 2: click @t0+10min lands LATE between them (inside the 2 h
    // watermark) → retract view→purchase, emit view→click, click→purchase
    input.addData(ev(1, 2, "click", T0 + 600000L))
    q.processAllAvailable()
    q.stop()
    val deltas = spark.table("transition_deltas_late")
    assert(deltas.filter(col("delta") < 0).count() === 1)
    val streamed = rollupMap(deltas)
    assert(streamed.keySet === Set(("view", "click"), ("click", "purchase")))
    assert(streamed(("view", "click"))._1 === 1L)
    assert(streamed(("click", "purchase"))._1 === 1L)
  }

  test("same-ms ties insert by event_id, matching the batch lag ordering") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStream.transitionDeltas(input.toDS()).toDF()
      .writeStream.format("memory").queryName("transition_deltas_tie")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-transition-tie").toString)
      .start()
    // event_id 5 then 2 at the same ms, delivered out of id order: the
    // sequence must order by event_id → error(2) → click(5) → view(later)
    input.addData(ev(1, 5, "click", T0))
    q.processAllAvailable()
    input.addData(ev(1, 2, "error", T0), ev(1, 9, "view", T0 + 1000L))
    q.processAllAvailable()
    q.stop()
    val streamed = rollupMap(spark.table("transition_deltas_tie"))
    // independent batch truth over the same three rows (the batch
    // operator's exact lag program on an inline frame)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ms").asc, col("event_id").asc)
    val t = Seq((1L, 5L, "click", T0), (1L, 2L, "error", T0), (1L, 9L, "view", T0 + 1000L))
      .toDF("user_id", "event_id", "event_type", "ms")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = t.groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
    val batch = batchMap(counts
      .withColumn("row_total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("prev_type")))
      .select(col("prev_type"), col("event_type").as("next_type"),
        col("n"), col("row_total"),
        (col("n").cast("double") / col("row_total")).as("p")))
    assert(streamed === batch)
    assert(streamed.keySet === Set(("error", "click"), ("click", "view")))
  }
}
