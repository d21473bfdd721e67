package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** The second streaming twin pair: weekly retention as a changelog under
  * out-of-order arrival (retractions on retroactive cohort shifts), and the
  * hourly rollup absorbing late-but-within-watermark rows across
  * micro-batches. */
class StreamingRetentionSpec extends SparkTestBase {

  private val WeekMs = EventStream.WeekMs
  // anchor event times well past epoch so watermark arithmetic never goes
  // negative; week w, minute m within the week
  private def at(w: Long, m: Long) = new Timestamp(1000 * WeekMs + w * WeekMs + m * 60000L)

  private def startQuery(df: org.apache.spark.sql.DataFrame, name: String) =
    df.writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ckpt-$name").toString)
      .start()

  test("streaming retention changelog equals the batch operator on the bounded fixture") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("event_time"))
      .as[Event]
    val deltas = EventStream.runToMemory(
      EventStream.retentionDeltas(events).toDF(), "ret_deltas_bounded")
    val streamed = EventStream.retentionRollup(deltas).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val batch = EventOps.retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("late events shift cohorts retroactively; summed deltas converge to the batch answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = startQuery(EventStream.retentionDeltas(input.toDS()).toDF(), "ret_deltas_late")
    // user 1 first appears in week 2; user 2 in week 2
    input.addData(
      Event(1, 1, "a", 1.0, at(2, 10)), Event(2, 1, "a", 1.0, at(3, 10)),
      Event(3, 2, "a", 1.0, at(2, 20)))
    q.processAllAvailable()
    // LATE batch: user 1's true first week was 0 (within the 4-week
    // watermark) — the operator must retract its week-2 cohort and re-emit
    // under cohort 0; user 2 stays put and adds week 3
    input.addData(Event(4, 1, "a", 1.0, at(0, 30)), Event(5, 2, "a", 1.0, at(3, 30)))
    q.processAllAvailable()
    q.stop()
    val deltas = spark.table("ret_deltas_late")
    // retraction actually happened (not just a quiet recompute)
    assert(deltas.filter(col("delta") < 0).count() > 0)
    val streamed = EventStream.retentionRollup(deltas).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // batch truth over ALL five events, any arrival order
    val batch = EventOps.retentionFrom(
      Seq((1L, at(2, 10)), (1L, at(3, 10)), (2L, at(2, 20)), (1L, at(0, 30)), (2L, at(3, 30)))
        .toDF("user_id", "t").withColumn("ms", expr("unix_millis(t)")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(streamed === batch)
    assert(streamed.keySet.map(_._1) === batch.keySet.map(_._1))
  }

  test("hourly rollup absorbs out-of-order rows within the watermark across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def hr(h: Long, m: Long) = new Timestamp(1000 * WeekMs + h * 3600000L + m * 60000L)
    val input = MemoryStream[Event]
    val q = startQuery(EventStream.hourlyRollup(input.toDS().toDF()), "rollup_late")
    input.addData(
      Event(1, 1, "a", 1.0, hr(0, 10)), Event(2, 2, "b", 2.0, hr(1, 20)),
      Event(3, 1, "a", 3.0, hr(2, 30)))                   // watermark → 0:30
    q.processAllAvailable()
    input.addData(
      Event(4, 1, "a", 4.0, hr(1, 40)), Event(5, 2, "b", 5.0, hr(0, 50)), // late, admitted
      Event(6, 1, "a", 6.0, hr(4, 50)))                   // watermark → 2:50
    q.processAllAvailable()
    input.addData(Event(7, 2, "b", 7.0, hr(7, 0)))        // watermark → 5:00
    q.processAllAvailable()
    // sentinel batch: emission is evaluated against the PREVIOUS batch's
    // watermark, so hours 2-4 need one more real batch to flush (racing the
    // optional no-data micro-batch would make this flaky)
    input.addData(Event(8, 2, "b", 8.0, hr(7, 30)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rollup_late")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val hourStr = (h: Long) => java.time.Instant.ofEpochMilli(1000 * WeekMs + h * 3600000L)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH"))
    // hours 0-4 are closed by the final watermark; the late rows (events 4
    // and 5) are merged into windows that were already open in batch 1.
    // Hour 7 stays open (unemitted) — append mode only emits closed windows.
    assert(got === Map(
      (hourStr(0), "a") -> (1L, 1.0), (hourStr(0), "b") -> (1L, 5.0),
      (hourStr(1), "b") -> (1L, 2.0), (hourStr(1), "a") -> (1L, 4.0),
      (hourStr(2), "a") -> (1L, 3.0), (hourStr(4), "a") -> (1L, 6.0)))
  }
}
