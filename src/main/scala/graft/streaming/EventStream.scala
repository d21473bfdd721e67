package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming pipelines over the events table — the streaming
  * twins of graft.operators.EventOps (the reference has no streaming;
  * this is north-star surface, BASELINE.json).
  *
  * Source: the parquet file stream (at scale: Kafka/queue sources with
  * the same downstream plan). Event time is derived from the nanosecond
  * `ts` column; watermarks bound state. The windowed rollup is a
  * streaming-native groupBy — partial aggregation per micro-batch, state
  * keyed by (window, event_type). Sessionization uses
  * flatMapGroupsWithState keyed on user_id with event-time timeout: state
  * is one open session per user, flushed on gap or watermark expiry.
  */
object EventStream {

  final case class Event(event_id: Long, user_id: Long, event_type: String,
                         value: Double, event_time: java.sql.Timestamp)
  final case class SessionState(startMs: Long, lastMs: Long, nEvents: Long, totalValue: BigDecimal)
  final case class Session(user_id: Long, session_start_ms: Long, duration_ms: Long,
                           n_events: Long, total_value: Double)

  val GapMs: Long = 30 * 60 * 1000L

  /** Events file-stream with event-time column. The `ts` epoch extraction
    * dispatches on the resolved parquet dtype (graft.Tables.epochUs) so the
    * stream reads NANOS-as-long and MICROS/MILLIS files alike. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file-stream source wants a directory; filter to the events file
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("event_time", timestamp_micros(graft.Tables.epochUs(schema)))
  }

  /** Streaming hourly rollup with watermarked tumbling windows. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).as("d_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n_events"),
        col("d_value").cast("double").as("total_value"))

  /** Streaming sessionization: one open session per user in state; a gap
    * > 30 min (or event-time timeout past the watermark) closes it.
    * Within a micro-batch events are sorted by time, so replaying a
    * bounded input through Trigger.AvailableNow reproduces the batch
    * sessionization exactly — the property the spec asserts. */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, s.startMs, s.lastMs - s.startMs, s.nEvents,
                s.totalValue.setScale(4).toDouble)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.event_time.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val ms = e.event_time.getTime
              cur match {
                case Some(s) if ms - s.lastMs <= GapMs =>
                  cur = Some(SessionState(s.startMs, ms, s.nEvents + 1,
                    s.totalValue + BigDecimal(e.value).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
                case Some(s) =>
                  closed ::= Session(userId, s.startMs, s.lastMs - s.startMs, s.nEvents,
                    s.totalValue.setScale(4).toDouble)
                  cur = Some(SessionState(ms, ms, 1L,
                    BigDecimal(e.value).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
                case None =>
                  cur = Some(SessionState(ms, ms, 1L,
                    BigDecimal(e.value).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + GapMs)
            }
            closed.reverse.iterator
          }
      }
  }

  final case class RetentionDelta(cohort: Long, k: Long, delta: Long)
  /** Per-user retention state: the user's current cohort week and the
    * distinct in-horizon weeks (cohort ≤ wk ≤ cohort+3) already emitted. At
    * most 4 longs per user — O(users) state with constant-size records. */
  final case class RetentionState(cohort: Long, weeks: List[Long])

  val WeekMs: Long = 7 * 24 * 3600 * 1000L

  /** Streaming weekly-retention twin of
    * [[graft.operators.EventOps.retentionFrom]], as a CHANGELOG: emits
    * (cohort, k, ±1) increments whose running sum per (cohort, k) equals the
    * batch `n_retained`. A changelog is the only append-mode shape that can
    * be exact under out-of-order data, because retention's cohort is
    * min(week) over a user's whole history — a late event can retroactively
    * move a user's cohort EARLIER, invalidating every previously emitted
    * contribution for that user. When that happens the operator retracts
    * them (delta −1 under the old cohort key) and re-emits under the new
    * cohort, so consumers that sum deltas converge to the batch answer for
    * any arrival order the watermark admits ([[retentionRollup]] is that
    * consumer). State is evicted by event-time timeout 8 weeks past the
    * cohort — beyond the k ≤ 3 horizon, so eviction never loses output; a
    * user returning after eviction would start a spurious new cohort, the
    * standard bounded-state trade (at 100 TB: O(users) × 4 longs, far
    * smaller than the event stream). */
  def retentionDeltas(events: Dataset[Event]): Dataset[RetentionDelta] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "4 weeks")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionDelta](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[Event], state: GroupState[RetentionState]) =>
          if (it.isEmpty && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var out = List.empty[RetentionDelta]
            // floorDiv, matching the batch operator's FLOOR-division week
            val wks = it.map(e => Math.floorDiv(e.event_time.getTime, WeekMs))
              .toSeq.distinct.sorted
            var st = state.getOption
            wks.foreach { w =>
              st match {
                case None =>
                  st = Some(RetentionState(w, List(w)))
                  out ::= RetentionDelta(w, 0L, 1L)
                case Some(RetentionState(c, seen)) if w >= c =>
                  if (w - c <= 3 && !seen.contains(w)) {
                    st = Some(RetentionState(c, w :: seen))
                    out ::= RetentionDelta(c, w - c, 1L)
                  } // beyond the horizon (k never shrinks: cohorts only move
                    // earlier) or a duplicate week: contributes nothing
                case Some(RetentionState(c, seen)) =>
                  // late event with w < c: retract everything emitted under
                  // cohort c, re-key the still-in-horizon weeks to cohort w
                  out = seen.map(v => RetentionDelta(c, v - c, -1L)) ::: out
                  val kept = seen.filter(v => v - w <= 3)
                  out = kept.map(v => RetentionDelta(w, v - w, 1L)) ::: out
                  out ::= RetentionDelta(w, 0L, 1L)
                  st = Some(RetentionState(w, w :: kept))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.cohort + 8) * WeekMs)
            }
            out.reverse.iterator
          }
      }
  }

  /** Materialize a retention-delta changelog into the batch operator's
    * output shape (cohort, k, n_cohort, n_retained, retention). Batch
    * aggregation over the collected stream — the "read side" of the
    * changelog pattern; at scale this is the delta-compaction query a sink
    * table would run. */
  def retentionRollup(deltas: DataFrame): DataFrame = {
    // cohort size = the k=0 count, pulled across the cohort's rows with a
    // window rather than a self-join (one shuffle, and no conflicting-
    // reference hazard on a memory-sink view)
    val byCohort = org.apache.spark.sql.expressions.Window.partitionBy("cohort")
    deltas.groupBy("cohort", "k")
      .agg(sum(col("delta")).as("n_retained"))
      .filter(col("n_retained") > 0)
      .withColumn("n_cohort",
        max(when(col("k") === 0, col("n_retained"))).over(byCohort))
      .select(col("cohort"), col("k"), col("n_cohort"), col("n_retained"),
        (col("n_retained").cast("double") / col("n_cohort")).as("retention"))
      .orderBy("cohort", "k")
  }

  /** Tagged-union input row for the streaming as-of join: side 0 = order,
    * side 1 = event (the same tagging as the batch operator's union;
    * EventOps.asofJoinFrom). `event_time` carries ms for the watermark. */
  final case class AsofInput(user_id: Long, side: Int, event_id: Long, ms: Long,
                             o_orderkey: Long, o_totalprice: Double,
                             event_time: java.sql.Timestamp)
  /** Changelog row: ±1 increments of the enrichment relation. Summing
    * deltas per event converges to the batch as-of answer. */
  final case class AsofDelta(event_id: Long, user_id: Long, ms: Long,
                             o_orderkey: Option[Long], o_totalprice: Option[Double],
                             delta: Long)
  /** Per-key as-of state: orders seen (compacted below the watermark) and
    * the events already emitted with their current match — the match keeps
    * its (time, orderkey, price) triple so a late order can be compared
    * against it. */
  final case class AsofState(orders: List[(Long, Long, Double)],
                             events: List[(Long, Long, Option[(Long, Long, Double)])])

  /** Streaming twin of [[graft.operators.EventOps.asofJoin]], as a
    * CHANGELOG (same shape as [[retentionDeltas]]): each event is enriched
    * with the most recent same-key order at or before its time — ties on
    * time to the larger o_orderkey — and emitted as a +1 delta. A changelog
    * is the only append-mode form that can be exact under out-of-order
    * arrival: an order arriving LATE (but inside the watermark) can be the
    * true as-of match of an event already emitted, so the operator retracts
    * the stale enrichment (−1 under the old match) and re-emits under the
    * new one; consumers that sum deltas converge to the batch join for any
    * admissible arrival order ([[asofRollup]] is that consumer).
    *
    * State per key is watermark-bounded on both sides: events below the
    * watermark are evicted (no admissible future order can out-date their
    * match — late rows beyond the watermark are dropped before the
    * operator); orders below the watermark compact to the single best
    * (time, orderkey) entry, which is all any future event can match below
    * that point. A user idle for 4 weeks of EVENT TIME is evicted whole —
    * including the compacted order floor — so an event arriving after
    * that horizon enriches as null where the batch join would match
    * arbitrarily far back: the same bounded-state trade the funnel /
    * active / transition twins document, with the same horizon. At 100 TB
    * this is the same cost class as the batch twin: one shuffle of each
    * side on the join key, state O(in-horizon rows per key). */
  def asofDeltas(tagged: Dataset[AsofInput]): Dataset[AsofDelta] = {
    import tagged.sparkSession.implicits._
    // match preference: lexicographic (time, orderkey) max among orders
    // with time <= the event's time — exactly the batch window's
    // last-row-wins under (t asc, side asc, o_orderkey asc)
    def better(a: (Long, Long, Double), b: (Long, Long, Double)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)
    tagged
      .withWatermark("event_time", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofDelta](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[AsofInput], state: GroupState[AsofState]) =>
          if (it.isEmpty && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(AsofState(Nil, Nil))
            var out = List.empty[AsofDelta]
            def delta(eid: Long, ems: Long, m: Option[(Long, Long, Double)], d: Long) =
              AsofDelta(eid, userId, ems, m.map(_._2), m.map(_._3), d)
            // orders before events at the same ms (side 0 < 1), as in batch
            val rows = it.toSeq.sortBy(r => (r.ms, r.side, r.o_orderkey))
            rows.foreach { r =>
              if (r.side == 0) {
                val o = (r.ms, r.o_orderkey, r.o_totalprice)
                st = st.copy(orders = o :: st.orders)
                // retroactive repair: retract + re-emit every retained
                // event whose true as-of match this order now is
                st = st.copy(events = st.events.map { case (eid, ems, cur) =>
                  if (o._1 <= ems && cur.forall(better(o, _))) {
                    out ::= delta(eid, ems, cur, -1L)
                    out ::= delta(eid, ems, Some(o), 1L)
                    (eid, ems, Some(o))
                  } else (eid, ems, cur)
                })
              } else {
                val m = st.orders.filter(_._1 <= r.ms)
                  .reduceOption((a, b) => if (better(a, b)) a else b)
                out ::= delta(r.event_id, r.ms, m, 1L)
                st = st.copy(events = (r.event_id, r.ms, m) :: st.events)
              }
            }
            // watermark-bounded eviction: events below the watermark can
            // never be repaired again (later-arriving orders are at or
            // above it); orders below it compact to the single best entry
            val wm = state.getCurrentWatermarkMs()
            if (wm > 0) {
              val (oldO, newO) = st.orders.partition(_._1 < wm)
              val floor = oldO.reduceOption((a, b) => if (better(a, b)) a else b)
              st = AsofState(
                newO ++ floor.toList,
                st.events.filter(_._2 >= wm))
            }
            state.update(st)
            // idle-eviction horizon matches the sibling twins (4 weeks of
            // event time past the last row, never below the watermark):
            // the compacted order floor stays alive as long as the user
            // can still emit admissible events. maxMs guard: an empty
            // non-timeout invocation must not underflow an empty .max
            val maxMs = rows.foldLeft(Long.MinValue)((m, r) => m.max(r.ms))
            val anchor = if (maxMs == Long.MinValue) wm else maxMs
            state.setTimeoutTimestamp((anchor + 4 * WeekMs).max(wm + 1))
            out.reverse.iterator
          }
      }
  }

  /** Materialize an as-of changelog into the batch join's output shape —
    * the delta-compaction query of the [[asofDeltas]] changelog: rows whose
    * summed delta is +1 are the current enrichment. */
  def asofRollup(deltas: DataFrame): DataFrame =
    deltas.groupBy("event_id", "user_id", "ms", "o_orderkey", "o_totalprice")
      .agg(sum(col("delta")).as("d"))
      .filter(col("d") > 0)
      .select(col("event_id"), col("user_id"), col("ms"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("event_id")

  /** Bounded tagged-union source for [[asofDeltas]]: the events and orders
    * parquet files of a testdata dir as one tagged file-stream (the
    * streaming face of EventOps.asofJoinFrom's union). */
  def readTaggedAsof(spark: SparkSession, dir: String): Dataset[AsofInput] = {
    import spark.implicits._
    val eSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val oSchema = spark.read.parquet(s"$dir/orders.parquet").schema
    val e = spark.readStream.schema(eSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      // symmetric with the orders branch below: a probe with no
      // timestamp has no as-of position (and would NPE AsofInput.ms)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), lit(1).as("side"), col("event_id"),
        graft.Tables.epochMs(eSchema).as("ms"),
        lit(-1L).as("o_orderkey"), lit(0.0).as("o_totalprice"))
    val o = spark.readStream.schema(oSchema)
      .option("pathGlobFilter", "orders.parquet").parquet(dir)
      // twin parity with the batch side's r20 pin: an undated order has
      // no position on the as-of timeline (and a null ms would NPE the
      // non-nullable AsofInput.ms encoder)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey").as("user_id"), lit(0).as("side"),
        lit(-1L).as("event_id"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_orderkey"), col("o_totalprice"))
    e.unionByName(o)
      .withColumn("event_time", timestamp_millis(col("ms")))
      .as[AsofInput]
  }

  final case class FunnelEvent(user_id: Long, event_type: String, ms: Long,
                               event_time: java.sql.Timestamp)
  /** Changelog row: ±1 increments of the per-user funnel relation.
    * Summing deltas per user converges to the batch funnel answer. */
  final case class FunnelDelta(user_id: Long, view_ms: Long,
                               click_ms: Option[Long], purchase_ms: Option[Long],
                               depth: Long, delta: Long)
  /** Per-user funnel state: the running min view time, the retained
    * click/purchase candidates (compacted below the watermark, see
    * [[funnelDeltas]]), and the currently-emitted row for retraction. */
  final case class FunnelState(viewMs: Long, clicks: List[Long],
                               purchases: List[Long],
                               emitted: Option[(Long, Option[Long], Option[Long])])

  /** Streaming twin of [[graft.operators.EventOps.funnelFrom]], as a
    * CHANGELOG (the fourth twin pair, same shape as [[retentionDeltas]] /
    * [[asofDeltas]]): per user, the first view, first click strictly after
    * it, first purchase strictly after that. Append mode cannot be exact
    * here without retraction because every stage anchor is a MIN over the
    * user's history: a late view (inside the watermark) can move `view_ms`
    * earlier, which can make an already-seen click admissible and cascade
    * through the whole funnel — so the operator retracts the stale row
    * (−1) and re-emits (+1); consumers summing deltas converge to the
    * batch funnel for any admissible arrival order ([[funnelRollup]]).
    *
    * State is compacted with a monotonicity argument: `view_ms` only
    * decreases, so each stage's admissible candidate set only GROWS and
    * its min only decreases — an admissible candidate above the current
    * stage anchor can never become the anchor and is dropped; an
    * inadmissible candidate can only activate via a future late event,
    * which the watermark bounds below by `wm`, so inadmissible candidates
    * at or below the watermark are dropped too. What survives per user:
    * one long per stage anchor plus the in-horizon inadmissible
    * candidates — O(users) state with watermark-bounded records (the
    * same trade as [[retentionDeltas]]: a user evicted by the idle
    * timeout and returning later starts a fresh funnel row). */
  def funnelDeltas(events: Dataset[FunnelEvent]): Dataset[FunnelDelta] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelDelta](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (it.isEmpty && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(
              FunnelState(Long.MaxValue, Nil, Nil, None))
            var maxMs = Long.MinValue
            it.foreach { e =>
              maxMs = maxMs.max(e.ms)
              e.event_type match {
                case "view" => if (e.ms < st.viewMs) st = st.copy(viewMs = e.ms)
                case "click" => st = st.copy(clicks = e.ms :: st.clicks)
                case "purchase" => st = st.copy(purchases = e.ms :: st.purchases)
                case _ => () // other event types don't participate
              }
            }
            val v = if (st.viewMs == Long.MaxValue) None else Some(st.viewMs)
            val c = v.flatMap(vm => st.clicks.filter(_ > vm).minOption)
            val p = c.flatMap(cm => st.purchases.filter(_ > cm).minOption)
            val cur = v.map(vm => (vm, c, p))
            var out = List.empty[FunnelDelta]
            if (cur != st.emitted) {
              st.emitted.foreach { case (ov, oc, op) =>
                out ::= FunnelDelta(userId, ov, oc, op, 1L + oc.size + op.size, -1L)
              }
              cur.foreach { case (nv, nc, np) =>
                out ::= FunnelDelta(userId, nv, nc, np, 1L + nc.size + np.size, 1L)
              }
              st = st.copy(emitted = cur)
            }
            // compaction (see Scaladoc): keep each stage's current anchor
            // plus in-horizon inadmissible candidates only
            val wm = state.getCurrentWatermarkMs()
            st = st.copy(
              clicks = st.clicks.distinct.filter(x =>
                c.contains(x) || (v.forall(x <= _) && x > wm)),
              purchases = st.purchases.distinct.filter(x =>
                p.contains(x) || (c.forall(x <= _) && x > wm)))
            state.update(st)
            // idle eviction 4 weeks past the batch's newest event — the
            // bounded-state trade documented above (maxMs guard: an
            // empty non-timeout invocation must not underflow)
            val anchor = if (maxMs == Long.MinValue) wm else maxMs
            state.setTimeoutTimestamp((anchor + 4 * WeekMs).max(wm + 1))
            out.reverse.iterator
          }
      }
  }

  /** Materialize a funnel changelog into the batch operator's output
    * shape — rows whose summed delta is +1 are the current funnel. */
  def funnelRollup(deltas: DataFrame): DataFrame =
    deltas.groupBy("user_id", "view_ms", "click_ms", "purchase_ms", "depth")
      .agg(sum(col("delta")).as("d"))
      .filter(col("d") > 0)
      .select(col("user_id"), col("view_ms"), col("click_ms"),
        col("purchase_ms"), col("depth"))
      .orderBy("user_id")

  /** Bounded funnel-event source: the events parquet of a testdata dir as
    * a typed file stream for [[funnelDeltas]]. */
  def readFunnelEvents(spark: SparkSession, dir: String): Dataset[FunnelEvent] = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(col("user_id"), col("event_type"),
        graft.Tables.epochMs(schema).as("ms"))
      .withColumn("event_time", timestamp_millis(col("ms")))
      .as[FunnelEvent]
  }

  final case class DayEvent(user_id: Long, day: Long,
                            event_time: java.sql.Timestamp)
  /** Changelog row: +1 increments of the per-day active-user counters.
    * kind 0 = DAU (the user's first event that day), kind 1 = WAU (the
    * day newly enters the user's trailing-7-day coverage). */
  final case class ActiveDelta(kind: Int, day: Long, delta: Long)
  /** Per-user state: the in-horizon distinct active days (compaction in
    * [[activeDeltas]]) and the window-end days already credited to WAU. */
  final case class ActiveState(days: List[Long], covered: List[Long])

  /** Streaming twin of [[graft.operators.EventOps.stickinessFrom]]'s
    * inputs, as a CHANGELOG (the fifth twin pair): per-day DAU and
    * trailing-7-day WAU as +1 increments. Unlike the funnel/retention/
    * as-of changelogs this one needs NO retractions: both counters are
    * distinct-set SIZES and the underlying sets only GROW — a late event
    * (inside the watermark) can only add a (user, day) or extend a
    * user's window coverage, never invalidate an emitted contribution.
    * The per-user dedup state is what a distinct count costs in
    * streaming form; it is watermark-compacted: an active day below
    * wm − 6 can no longer overlap any admissible new day's 7-day window,
    * so only days ≥ wm − 6 are retained (covered window-ends likewise
    * ≥ wm) — O(users) state with ≤ 7-long, horizon-bounded lists.
    * [[activeRollup]] sums the deltas into the batch operator's
    * (day, dau, wau, stickiness) shape. */
  def activeDeltas(events: Dataset[DayEvent]): Dataset[ActiveDelta] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ActiveState, ActiveDelta](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[DayEvent], state: GroupState[ActiveState]) =>
          if (it.isEmpty && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(ActiveState(Nil, Nil))
            var out = List.empty[ActiveDelta]
            var maxMs = Long.MinValue
            it.foreach { e =>
              maxMs = maxMs.max(e.event_time.getTime)
              if (!st.days.contains(e.day)) {
                st = st.copy(days = e.day :: st.days)
                out ::= ActiveDelta(0, e.day, 1L)
                val fresh = (e.day to e.day + 6).filterNot(st.covered.contains)
                out = fresh.toList.map(w => ActiveDelta(1, w, 1L)) ::: out
                st = st.copy(covered = fresh.toList ::: st.covered)
              }
            }
            // watermark compaction: only days whose 7-day window can still
            // overlap an admissible future day matter for dedup
            val wm = state.getCurrentWatermarkMs()
            val wmDay = Math.floorDiv(wm, 86400000L)
            st = ActiveState(
              st.days.filter(_ >= wmDay - 6),
              st.covered.filter(_ >= wmDay))
            state.update(st)
            val anchor = if (maxMs == Long.MinValue) wm else maxMs
            state.setTimeoutTimestamp((anchor + 4 * WeekMs).max(wm + 1))
            out.reverse.iterator
          }
      }
  }

  /** Materialize an active-user changelog into the batch stickiness
    * shape: days with both a DAU and a WAU row (a day nobody was active
    * on has no DAU row — and no dashboard row, as in batch). */
  def activeRollup(deltas: DataFrame): DataFrame = {
    val dau = deltas.filter(col("kind") === 0)
      .groupBy("day").agg(sum(col("delta")).as("dau"))
    val wau = deltas.filter(col("kind") === 1)
      .groupBy(col("day").as("wday")).agg(sum(col("delta")).as("wau"))
    dau.join(wau, col("day") === col("wday"))
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau")).as("stickiness"))
      .orderBy("day")
  }

  /** Bounded day-event source for [[activeDeltas]]: the events parquet
    * of a testdata dir as a typed file stream. */
  def readDayEvents(spark: SparkSession, dir: String): Dataset[DayEvent] = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ms", graft.Tables.epochMs(schema))
      .select(col("user_id"),
        expr("ms div 86400000").as("day"),
        timestamp_millis(col("ms")).as("event_time"))
      .as[DayEvent]
  }

  final case class TypedEvent(user_id: Long, event_id: Long, event_type: String,
                              ms: Long, event_time: java.sql.Timestamp)
  /** Changelog row: ±1 increments of the (prev → next) transition counts. */
  final case class TransitionDelta(prev_type: String, next_type: String, delta: Long)
  /** Per-user timeline state: the in-horizon events ascending by
    * (ms, event_id), plus the last below-watermark event (`floor`) — the
    * one compacted link a first in-horizon event still chains from. */
  final case class TransitionState(events: List[(Long, Long, String)],
                                   floor: Option[(Long, Long, String)])

  /** Streaming twin of [[graft.operators.EventOps.transitionMatrix]], as
    * a CHANGELOG (the sixth twin pair): ±1 increments of the per-user
    * consecutive (prev → next) event-type counts. The out-of-order
    * hazard here is unique in the family: a late event INSERTS INTO THE
    * MIDDLE of a user's timeline — an admitted event x landing between
    * already-seen neighbors a and b SPLITS the transition (a→b) into
    * (a→x) and (x→b), so the operator retracts the split edge and emits
    * the two new ones; consumers summing deltas converge to the batch
    * matrix for any admissible arrival order ([[transitionRollup]]).
    * Sequence order is (ms, event_id), identical to the batch lag
    * window.
    *
    * State is watermark-compacted: a late arrival carries
    * event_time ≥ wm, so no future event can insert strictly below the
    * watermark — every below-wm event except the LAST (the boundary
    * link the first in-horizon event chains from) is dropped. What
    * survives per user: the in-horizon timeline plus one floor entry —
    * O(users) state with horizon-bounded records, the same trade as the
    * other five twins. */
  def transitionDeltas(events: Dataset[TypedEvent]): Dataset[TransitionDelta] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransitionState, TransitionDelta](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[TypedEvent], state: GroupState[TransitionState]) =>
          if (it.isEmpty && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(TransitionState(Nil, None))
            var out = List.empty[TransitionDelta]
            var maxMs = Long.MinValue
            def leq(a: (Long, Long, String), b: (Long, Long, String)): Boolean =
              a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)
            it.toSeq.sortBy(e => (e.ms, e.event_id)).foreach { e =>
              maxMs = maxMs.max(e.ms)
              val x = (e.ms, e.event_id, e.event_type)
              // insertion point: after every entry with key ≤ x's
              val (before, after) = st.events.span(a => leq(a, x))
              val left = before.lastOption.orElse(st.floor)
              val right = after.headOption
              (left, right) match {
                case (Some(a), Some(b)) => // mid-sequence insert: split a→b
                  out ::= TransitionDelta(a._3, b._3, -1L)
                  out ::= TransitionDelta(a._3, x._3, 1L)
                  out ::= TransitionDelta(x._3, b._3, 1L)
                case (Some(a), None) => out ::= TransitionDelta(a._3, x._3, 1L)
                case (None, Some(b)) => out ::= TransitionDelta(x._3, b._3, 1L)
                case (None, None) => ()
              }
              st = st.copy(events = before ::: x :: after)
            }
            // watermark compaction: keep in-horizon events + one floor link
            val wm = state.getCurrentWatermarkMs()
            val (below, inHorizon) = st.events.partition(_._1 < wm)
            st = TransitionState(inHorizon, below.lastOption.orElse(st.floor))
            state.update(st)
            val anchor = if (maxMs == Long.MinValue) wm else maxMs
            state.setTimeoutTimestamp((anchor + 4 * WeekMs).max(wm + 1))
            out.reverse.iterator
          }
      }
  }

  /** Materialize a transition changelog into the batch matrix shape
    * (prev_type, next_type, n, row_total, p). */
  def transitionRollup(deltas: DataFrame): DataFrame = {
    val byPrev = org.apache.spark.sql.expressions.Window.partitionBy("prev_type")
    deltas.groupBy("prev_type", "next_type")
      .agg(sum(col("delta")).as("n"))
      .filter(col("n") > 0)
      .withColumn("row_total", sum(col("n")).over(byPrev))
      .select(col("prev_type"), col("next_type"), col("n"), col("row_total"),
        (col("n").cast("double") / col("row_total")).as("p"))
      .orderBy("prev_type", "next_type")
  }

  /** Bounded typed-event source for [[transitionDeltas]]. */
  def readTypedEvents(spark: SparkSession, dir: String): Dataset[TypedEvent] = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.Tables.epochMs(schema).as("ms"))
      .withColumn("event_time", timestamp_millis(col("ms")))
      .as[TypedEvent]
  }

  /** Point/interval sides of the range join as watermarked streams —
    * the streaming face of graft.operators.EventOps.rangeJoin's inputs.
    * Join times are MILLISECOND-truncated timestamps so the interval
    * condition is bit-equivalent to the batch operator's integer-ms
    * comparison (micros-precision times would admit sub-ms orderings
    * the batch join excludes). */
  def readRangeSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def side() = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ms", graft.Tables.epochMs(schema))
    val points = side().filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("p_user"), col("ms").as("pms"), col("value"),
        timestamp_millis(col("ms")).as("p_time"))
    val purchases = side().filter(col("event_type") === "purchase")
      .select(col("user_id").as("i_user"), col("event_id").as("purchase_id"),
        col("ms").as("ims"), timestamp_millis(col("ms")).as("i_time"))
    (points, purchases)
  }

  /** Streaming range join — the tenth streaming face, and deliberately
    * NOT another flatMapGroupsWithState changelog: Spark's NATIVE
    * stream-stream interval join is exactly this operator, so the twin
    * uses it. The time bound is two-sided (point ∈ [purchase − 1 h,
    * purchase) ⟺ purchase ∈ (point, point + 1 h]), so with both sides
    * watermarked the state store evicts rows that can no longer match —
    * bounded state without any hand-rolled GroupState. An inner interval
    * join emits each match exactly once (append-only +1 deltas; nothing
    * to retract), and [[rangeRollup]] materializes the batch operator's
    * per-purchase aggregate from the match relation. At 100 TB: the join
    * co-shuffles both streams on user_id per micro-batch and state holds
    * only the 1-hour in-flight horizon per side. */
  def rangeMatches(points: DataFrame, purchases: DataFrame): DataFrame =
    points.withWatermark("p_time", "2 hours")
      .join(purchases.withWatermark("i_time", "2 hours"),
        expr("p_user = i_user AND " +
          "p_time >= i_time - INTERVAL 1 HOUR AND p_time < i_time"))
      .select(col("purchase_id"), col("i_user").as("user_id"),
        col("pms"), col("value"))

  /** Materialize a range-join match relation into the batch operator's
    * output shape (same DECIMAL(18,4) sum, same final double cast). */
  def rangeRollup(matches: DataFrame): DataFrame =
    matches.groupBy("purchase_id", "user_id")
      .agg(count(lit(1)).as("n_hits"),
        sum(col("value").cast(DecimalType(18, 4))).as("d"))
      .select(col("purchase_id"), col("user_id"), col("n_hits"),
        col("d").cast("double").as("sum_value"))
      .orderBy("purchase_id")

  final case class HourCountDelta(event_type: String, hour: Long, delta: Long)

  /** Streaming hourly-count changelog for the volume monitor — the
    * anomaly family's streaming face ([[anomalyRollup]] materializes it
    * into graft.operators.EventOps.anomaly's output). Counts are PURE
    * ADDITION: an admissible late event emits another +n delta for its
    * hour and the z statistic is recomputed at rollup over the summed
    * exact counts, so — unlike the order-sensitive twins — nothing is
    * ever over-claimed and NO retraction (and no per-key state at all)
    * is needed; the group invocation collapses each micro-batch's rows
    * to one delta per (type, hour) and leaves the state store empty.
    * Events later than the 2 h watermark are dropped before the
    * operator — the family's documented admissibility bound. At 100 TB:
    * one shuffle per micro-batch on the (type, hour) key space (bounded
    * per batch by types × in-flight hours), state O(0). */
  def anomalyDeltas(events: Dataset[Event]): Dataset[HourCountDelta] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "2 hours")
      .groupByKey(e => (e.event_type, Math.floorDiv(e.event_time.getTime, 3600000L)))
      .flatMapGroupsWithState[Long, HourCountDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((tpe, hour), it, _) =>
          val n = it.size.toLong
          if (n == 0) Iterator.empty else Iterator.single(HourCountDelta(tpe, hour, n))
      }
  }

  /** Materialize an hourly-count changelog into the batch anomaly shape:
    * summed deltas are the exact per-(type, hour) counts, and the
    * z/flag tail is LITERALLY the batch operator's expressions
    * (EventOps.zFlagged — same DECIMAL(38,0) moments, same integer flag
    * inequality), so the rollup converges to the batch output for any
    * admissible arrival order. */
  def anomalyRollup(deltas: DataFrame): DataFrame =
    graft.operators.EventOps.zFlagged(
      deltas.groupBy("event_type", "hour")
        .agg(sum(col("delta")).as("n"))
        .filter(col("n") > 0))

  /** Bounded typed-event source for [[anomalyDeltas]]. */
  def readAnomalyEvents(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    readEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("event_time"))
      .as[Event]
  }

  final case class CentsDelta(event_type: String, cents: Long, delta: Long)

  /** Streaming cents-histogram changelog for the value-quantile
    * dashboard — the eleventh twin, and the second PURE-ADDITION member
    * after [[anomalyDeltas]]: a (type, cents) count only ever grows, so
    * an admissible late event is just another +n delta (no retraction,
    * no per-key state), and the exact quantile selection is recomputed
    * at rollup over the summed histogram. Each micro-batch collapses to
    * one delta per observed (type, cents) — bounded by the value
    * domain, not the batch size. */
  def quantilesDeltas(events: Dataset[Event]): Dataset[CentsDelta] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "2 hours")
      // same cents quantization as the batch SQL round(value*100):
      // HALF_UP over the shortest decimal representation of the double
      .groupByKey(e => (e.event_type,
        BigDecimal(e.value * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .flatMapGroupsWithState[Long, CentsDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((tpe, cents), it, _) =>
          val n = it.size.toLong
          if (n == 0) Iterator.empty else Iterator.single(CentsDelta(tpe, cents, n))
      }
  }

  /** Materialize a cents-histogram changelog into the batch quantile
    * shape: summed deltas are the exact per-(type, cents) counts and
    * the selection tail is LITERALLY the batch operator's expressions
    * (EventOps.quantileTail). */
  def quantilesRollup(deltas: DataFrame): DataFrame =
    graft.operators.EventOps.quantileTail(
      deltas.groupBy("event_type", "cents")
        .agg(sum(col("delta")).as("n"))
        .filter(col("n") > 0))

  /** Streaming exact dedup (the dedup family's streaming face): drop
    * re-deliveries of the same event_id within the watermark horizon.
    * State holds one key per event inside the horizon and is evicted by
    * the watermark — the bounded-state form of
    * graft.operators.DedupOps.exact for at-least-once sources. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a bounded stream to completion (AvailableNow) into a memory
    * table; returns the collected result. Used by specs and the demo. */
  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ckpt-$name").toString)
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
