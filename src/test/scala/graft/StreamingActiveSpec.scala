package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.streaming.EventStream.DayEvent

/** The fifth streaming twin pair: per-day DAU / trailing-7-day WAU as a
  * changelog. Both counters are sizes of sets that only grow, so this
  * changelog needs no retractions — the spec pins exactly that: late
  * same-day re-activity adds nothing, a new day adds only the window-end
  * days not already covered. */
class StreamingActiveSpec extends SparkTestBase {

  private val DayMs = 86400000L
  private def ev(user: Long, day: Long) =
    DayEvent(user, day, new Timestamp(day * DayMs + 3600000L))

  private def rollupMap(deltas: org.apache.spark.sql.DataFrame) =
    EventStream.activeRollup(deltas).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("streaming active-user changelog equals the batch stickiness on the bounded fixture") {
    val deltas = EventStream.runToMemory(
      EventStream.activeDeltas(EventStream.readDayEvents(spark, sf)).toDF(),
      "active_deltas_bounded")
    val streamed = rollupMap(deltas)
    val batch = EventOps.stickiness(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("re-activity is deduplicated and coverage extends monotonically, no retractions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DayEvent]
    val q = EventStream.activeDeltas(input.toDS()).toDF()
      .writeStream.format("memory").queryName("active_deltas_mono")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-active-mono").toString)
      .start()
    // batch 1: user 1 active on day 100 twice (one DAU, 7 WAU credits)
    input.addData(ev(1, 100), ev(1, 100))
    q.processAllAvailable()
    // batch 2: same user, day 101 — one more DAU; WAU credit ONLY for the
    // newly covered window-end day 107; user 2 appears on day 100
    input.addData(ev(1, 101), ev(2, 100))
    q.processAllAvailable()
    q.stop()
    val deltas = spark.table("active_deltas_mono")
    assert(deltas.filter(col("delta") < 0).count() === 0) // changelog is monotone
    // user 1 credited days 100..106 in batch 1, then exactly {107} in batch 2
    assert(deltas.filter(col("kind") === 1).count() === 7 + 1 + 7)
    val streamed = rollupMap(deltas)
    assert(streamed(100L) === ((2L, 2L))) // both users active day 100
    assert(streamed(101L) === ((1L, 2L))) // day 101: user 1 DAU; WAU covers both
    val batch = EventOps.stickinessFrom(
      Seq((1L, 100L), (1L, 100L), (1L, 101L), (2L, 100L)).toDF("user_id", "day"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed === batch)
  }
}
