package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming extension — beyond-reference surface: the
  * reference offloads no Spark streaming operators at all (SURVEY.md
  * §2.12), so this module is pure added capability, staged per §7 step 9.
  *
  * Shapes provided over an `events`-schema stream
  * (event_id, ts timestamp, user_id, event_type, value, props):
  *  - watermarked tumbling/sliding-window aggregation,
  *  - watermark-bounded stream deduplication,
  *  - stream-static enrichment join,
  *  - custom session windows via flatMapGroupsWithState.
  *
  * Scale notes: all operators are keyed-state friendly — state is
  * bounded by the watermark (windows, dedup) or an explicit processing
  * timeout (sessions); nothing accumulates unboundedly on a 1000-executor
  * cluster.
  */
object StreamingOps {

  /** tumbling 1-hour windowed counts/revenue per event type, 2h watermark */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("total_value"))

  /** sliding 30-min windows advancing by 10 min */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** drop duplicate event_ids arriving within the watermark horizon */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id", "ts")

  /** native session_window on a STREAM: per-user sessions closed by a
    * 30-minute gap. Unlike the batch `ev_session_window_native` query
    * this exercises the merging-sessions state-store path (late rows
    * merge adjacent sessions; watermark finalizes + evicts closed
    * sessions, so state is bounded by the open-session count) */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n"), col("total_value"))

  /** watermark-bounded dedup on the key ALONE (no event-time column in
    * the key): duplicates may carry different timestamps — the state
    * entry expires one watermark-delay after first sight, so state stays
    * bounded while late re-sends inside the horizon are suppressed */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("event_id")

  /** enrich a stream against a static dimension (broadcast join) */
  def enrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left_outer")

  // ---- custom sessionization state machine ----------------------------

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int, total: Double)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int, total_value: Double)

  /** session windows with a 30-min inactivity gap, emitted on timeout.
    * (Custom-state analog of the batch ev_sessionize query.) */
  def sessionize(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.lastTs, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= 30 * 60 * 1000L =>
                  cur = Some(s.copy(lastTs = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.start, s.lastTs, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration("30 minutes")
            }
            closed.reverseIterator
          }
      }
  }

  // ---- transformWithState (the arbitrary-state v2 operator) -----------

  final case class ValueIn(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class RunningOut(user_id: Long, value: Double,
    running_max: Double, n_seen: Long)

  /** per-key running max + count through the Spark-4 StatefulProcessor
    * API (typed ValueState handles, RocksDB-backed): the v2 replacement
    * for mapGroupsWithState. State is two scalars per key — bounded. */
  class RunningMaxProcessor extends StatefulProcessor[Long, ValueIn, RunningOut] {
    @transient private var maxState: ValueState[Double] = _
    @transient private var seenState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      maxState = getHandle.getValueState[Double]("max", Encoders.scalaDouble, TTLConfig.NONE)
      seenState = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[ValueIn],
        timers: TimerValues): Iterator[RunningOut] = {
      var mx = if (maxState.exists()) maxState.get() else Double.NegativeInfinity
      var n = if (seenState.exists()) seenState.get() else 0L
      val out = rows.toSeq.sortBy(_.ts.getTime).map { r =>
        mx = math.max(mx, r.value); n += 1
        RunningOut(key, r.value, mx, n)
      }
      maxState.update(mx)
      seenState.update(n)
      out.iterator
    }
  }

  def runningMax(events: Dataset[ValueIn]): Dataset[RunningOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningMaxProcessor, TimeMode.None(), OutputMode.Append())
  }

  final case class SessionSum(user_id: Long, n: Long, max_value: Double,
    closed_at_ms: Long)

  /** event-time session closing via TIMERS + ListState — the remaining
    * state-v2 API surface (RunningMaxProcessor covers ValueState):
    * buffered per-key values in a ListState, one armed event-time timer
    * per key re-set to lastSeen+gap on every input, and the session
    * summary emitted from handleExpiredTimer when the WATERMARK crosses
    * the gap — i.e. closure is driven by stream progress, not by the
    * arrival of the next event for that key (the property the
    * flatMapGroupsWithState sessionizer cannot give in event-time). */
  class TimerSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, ValueIn, SessionSum] {
    @transient private var values: ListState[Double] = _
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      values = getHandle.getListState[Double]("values", Encoders.scalaDouble, TTLConfig.NONE)
      lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[ValueIn],
        timers: TimerValues): Iterator[SessionSum] = {
      var mx = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      var seenAny = false
      rows.foreach { r =>
        values.appendValue(r.value)
        mx = math.max(mx, r.ts.getTime)
        seenAny = true
      }
      if (seenAny) {
        // one live timer per key: re-arm at the new last-seen + gap
        if (lastSeen.exists()) getHandle.deleteTimer(lastSeen.get() + gapMs)
        lastSeen.update(mx)
        getHandle.registerTimer(mx + gapMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSum] = {
      val vs = values.get().toSeq
      val out = SessionSum(key, vs.size.toLong,
        if (vs.isEmpty) 0.0 else vs.max, expiredTimerInfo.getExpiryTimeInMs())
      values.clear(); lastSeen.clear()
      Iterator.single(out)
    }
  }

  final case class TypedEvent(user_id: Long, event_type: String)
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** per-key event-type counters in a MapState — the remaining state-v2
    * handle type (ValueState/ListState/timers covered above). MapState
    * gives point lookups and per-entry updates against the RocksDB
    * store, i.e. a counter map that does NOT rewrite the whole
    * collection per batch the way a ValueState[Map] would. Emits the
    * updated (key, type, n) rows each batch. */
  class TypeCounterProcessor extends StatefulProcessor[Long, TypedEvent, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timers: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { r =>
        val cur = if (counts.containsKey(r.event_type)) counts.getValue(r.event_type) else 0L
        counts.updateValue(r.event_type, cur + 1L)
        touched += r.event_type
      }
      touched.iterator.map(t => TypeCount(key, t, counts.getValue(t)))
    }
  }

  def typeCounts(events: Dataset[TypedEvent]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCounterProcessor, TimeMode.None(), OutputMode.Append())
  }

  def timerSessions(events: Dataset[ValueIn], gapMs: Long = 60000L): Dataset[SessionSum] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** per-key running count whose state carries a processing-time TTL —
    * the knob that keeps a 100 TB stream's keyed state BOUNDED: an idle
    * key's state is evicted by the store after `ttlMs` instead of
    * accumulating forever (the unbounded-key-cardinality failure mode of
    * TTL-less running aggregates). After eviction the key restarts from
    * zero — observable, so a spec can pin the eviction semantics. */
  class TtlCounterProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, ValueIn, RunningOut] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(key: Long, rows: Iterator[ValueIn],
        timers: TimerValues): Iterator[RunningOut] = {
      var n = if (seen.exists()) seen.get() else 0L
      var lastV = 0.0
      rows.foreach { r => n += 1; lastV = r.value }
      seen.update(n)
      Iterator.single(RunningOut(key, lastV, lastV, n))
    }
  }

  def ttlCounts(events: Dataset[ValueIn], ttlMs: Long): Dataset[RunningOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TtlCounterProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
