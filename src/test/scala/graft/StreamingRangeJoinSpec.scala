package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** The tenth streaming twin pair — and the one that uses Spark's NATIVE
  * stream-stream interval join instead of a hand-rolled
  * flatMapGroupsWithState changelog: an inner interval join emits each
  * point/purchase match exactly once, so the match relation is an
  * append-only changelog by construction and the rollup converges to the
  * batch range join for any admissible arrival order. */
class StreamingRangeJoinSpec extends SparkTestBase {

  private def asRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("streaming interval join equals the batch range join on the bounded fixture") {
    val (points, purchases) = EventStream.readRangeSides(spark, sf)
    val matches = EventStream.runToMemory(
      EventStream.rangeMatches(points, purchases), "range_matches_bounded")
    val streamed = asRows(EventStream.rangeRollup(matches))
    val batch = asRows(EventOps.rangeJoin(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("a late point inside the watermark still matches a buffered purchase") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val T0 = 1000L * EventStream.WeekMs
    def ev(id: Long, tpe: String, ms: Long) =
      Event(id, 1L, tpe, 2.5, new Timestamp(ms))
    val pIn = MemoryStream[Event]
    val iIn = MemoryStream[Event]
    val points = pIn.toDF().select(
      col("user_id").as("p_user"), unix_millis(col("event_time")).as("pms"),
      col("value"), col("event_time").as("p_time"))
    val purchases = iIn.toDF().select(
      col("user_id").as("i_user"), col("event_id").as("purchase_id"),
      unix_millis(col("event_time")).as("ims"), col("event_time").as("i_time"))
    val q = EventStream.rangeMatches(points, purchases)
      .writeStream.format("memory").queryName("range_matches_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-range-late").toString)
      .start()
    // batch 1: the purchase and one in-window point (T0-10min); also a
    // point a full 2h earlier — outside the 1h window, must not match
    iIn.addData(ev(100, "purchase", T0))
    pIn.addData(ev(1, "view", T0 - 10 * 60000L), ev(2, "click", T0 - 2 * 3600000L))
    q.processAllAvailable()
    // batch 2: a LATE point lands at T0-5min — above the watermark
    // (T0 - 2h), so the buffered purchase state must still match it
    pIn.addData(ev(3, "view", T0 - 5 * 60000L))
    q.processAllAvailable()
    q.stop()
    val matches = spark.table("range_matches_late")
    assert(matches.count() === 2L)
    val rolled = asRows(EventStream.rangeRollup(matches))
    assert(rolled === Set((100L, 1L, 2L, 5.0)))
  }
}
