package graft

import java.sql.Timestamp

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{SessionEvent, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  test("watermarked tumbling window aggregation over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, ts(5), 1, "click", 1.0, "{}"),
      Ev(2, ts(20), 1, "click", 2.0, "{}"),
      Ev(3, ts(70), 2, "view", 3.0, "{}"))
    val q = StreamingOps.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 01:00:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stream deduplication drops watermark-horizon duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(1), 1, "click", 1.0, "{}"),
      Ev(2, ts(2), 1, "view", 2.0, "{}"))
    val q = StreamingOps.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("native session_window stream merges gap-bounded sessions and finalizes on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    // user 1: two rows 10 min apart (one session), then a row 40 min
    // later (new session); user 2: single row
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0, "{}"),
      Ev(2, ts(10), 1, "click", 2.0, "{}"),
      Ev(3, ts(80), 1, "view", 4.0, "{}"),
      Ev(4, ts(5), 2, "view", 8.0, "{}"))
    val q = StreamingOps.sessionWindowCounts(in.toDF())
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      // a late row inside user 1's first gap MERGES the two rows' sessions
      in.addData(Ev(5, ts(7), 1, "click", 0.5, "{}"))
      q.processAllAvailable()
      val rows = spark.table("sess_win").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3), r.getDouble(4)))
        .toSet
      assert(rows == Set(
        (1L, "2024-01-01 00:00:00.0", 3L, 3.5),  // merged session: rows at 0,7,10
        (1L, "2024-01-01 01:20:00.0", 1L, 4.0),
        (2L, "2024-01-01 00:05:00.0", 1L, 8.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    // two sessions for user 1 separated by a >30min gap
    in.addData(
      SessionEvent(1, ts(0), 1.0),
      SessionEvent(1, ts(10), 2.0),
      SessionEvent(1, ts(60), 5.0))
    // AvailableNow: process the backlog and stop — ProcessingTimeTimeout
    // otherwise keeps scheduling timeout-check batches and
    // processAllAvailable never settles.
    val q = StreamingOps.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(120000)
      val closed = spark.table("sessions").as[SessionOut].collect()
      assert(closed.length == 1)
      assert(closed.head.n_events == 2 && closed.head.total_value == 3.0)
    } finally q.stop()
  }

  test("watermarked stream-stream join with time-bound condition") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(Ev(1, ts(5), 1, "click", 1.0, "{}"), Ev(2, ts(50), 1, "click", 2.0, "{}"))
    purchases.addData(Ev(10, ts(12), 1, "purchase", 9.0, "{}"))
    val c = clicks.toDF()
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases.toDF()
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = p.join(c,
      col("p_user") === col("c_user") && col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 10 minutes"))
      .select(col("purchase_id"), col("click_id"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((10L, 1L)), s"got $rows") // only the click 7min before qualifies
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits the null-padded row only after the watermark expires it") {
    // the semantics that distinguish outer stream-stream joins from
    // inner: an unmatched left row CANNOT be emitted when it arrives (a
    // match may still come) — it is held in state and emitted
    // null-padded only once the watermark proves no match can arrive.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDF()
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "5 minutes")
    val p = purchases.toDF()
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "5 minutes")
    val joined = c.join(p,
      col("p_user") === col("c_user") && col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 10 minutes"),
      "leftOuter")
      .select(col("click_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("ss_left_join")
      .outputMode(OutputMode.Append()).start()
    try {
      // click 1 will be matched; click 2 never matches
      clicks.addData(Ev(1, ts(5), 1, "click", 1.0, "{}"), Ev(2, ts(6), 2, "click", 1.0, "{}"))
      purchases.addData(Ev(10, ts(12), 1, "purchase", 9.0, "{}"))
      q.processAllAvailable()
      val matched = spark.table("ss_left_join").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      // the unmatched click is NOT yet emitted — state still open
      assert(matched == Set((1L, Some(10L))), s"got $matched")
      // advance both watermarks far past click 2's join window
      clicks.addData(Ev(3, ts(120), 9, "click", 1.0, "{}"))
      purchases.addData(Ev(11, ts(120), 9, "purchase", 1.0, "{}"))
      q.processAllAvailable()
      val after = spark.table("ss_left_join").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(after.contains((2L, None)),
        s"expired unmatched click should emit null-padded; got $after")
    } finally q.stop()
  }

  test("parquet sink with checkpoint: dedup state survives a query restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream")
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val in = MemoryStream[Ev]
    def run(): Unit = {
      val q = StreamingOps.dedupStream(in.toDF())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    in.addData(Ev(1, ts(1), 1, "click", 1.0, "{}"), Ev(2, ts(2), 1, "view", 2.0, "{}"))
    run()
    // second run from the same checkpoint re-sends event 2 (duplicate
    // across restarts) plus a new event — state recovery must drop the dup
    in.addData(Ev(2, ts(2), 1, "view", 2.0, "{}"), Ev(3, ts(3), 2, "click", 3.0, "{}"))
    run()
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"exactly-once sink expected, got $ids")
  }

  test("stream-static enrichment joins without shuffling the stream side") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Ev]
    in.addData(Ev(1, ts(1), 1, "click", 1.0, "{}"), Ev(2, ts(2), 3, "view", 2.0, "{}"))
    val q = StreamingOps.enrich(in.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("enriched").select("event_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, Some("gold")), (2L, None)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses same-key rows with differing timestamps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    // same event_id re-sent 5 minutes later with a different ts — plain
    // dropDuplicates(key, ts) would keep both; within-watermark dedup must not
    in.addData(
      Ev(1, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(6), 1, "click", 1.0, "{}"),
      Ev(2, ts(7), 1, "view", 2.0, "{}"))
    val q = StreamingOps.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L), ids.toString)
    } finally q.stop()
  }

  test("transformWithState event-time timers close sessions as the watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.ValueIn]
      val q = StreamingOps.timerSessions(in.toDS(), gapMs = 60000L)
        .writeStream.format("memory").queryName("timer_sessions")
        .outputMode(OutputMode.Append()).start()
      try {
        // user 1's session: events at minute 1 and 2 (gap timer arms at 3)
        in.addData(
          StreamingOps.ValueIn(1, ts(1), 5.0),
          StreamingOps.ValueIn(1, ts(2), 3.0))
        q.processAllAvailable()
        // watermark only reaches minute 2 after this batch; timer not due
        in.addData(StreamingOps.ValueIn(2, ts(10), 1.0))
        q.processAllAvailable()
        // this batch runs with watermark = minute 10 > minute 3 → user 1's
        // timer fires even though user 1 itself sends nothing
        in.addData(StreamingOps.ValueIn(2, ts(20), 2.0))
        q.processAllAvailable()
        val rows = spark.table("timer_sessions")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(rows.contains((1L, 2L, 5.0)),
          s"user 1 session (n=2, max=5.0) not closed by timer: $rows")
        assert(!rows.exists(_._1 == 2L),
          s"user 2 session closed early (watermark never passed its gap): $rows")
        // closure timestamp is exactly lastSeen + gap
        val closedAt = spark.table("timer_sessions")
          .filter(col("user_id") === 1L).collect().head.getLong(3)
        assert(closedAt == ts(2).getTime + 60000L, closedAt.toString)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState keeps per-entry counters across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.TypedEvent]
      val q = StreamingOps.typeCounts(in.toDS())
        .writeStream.format("memory").queryName("type_counts")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(
          StreamingOps.TypedEvent(1, "view"), StreamingOps.TypedEvent(1, "view"),
          StreamingOps.TypedEvent(1, "click"), StreamingOps.TypedEvent(2, "view"))
        q.processAllAvailable()
        in.addData( // per-entry updates must build on batch-1 state
          StreamingOps.TypedEvent(1, "view"), StreamingOps.TypedEvent(2, "purchase"))
        q.processAllAvailable()
        val rows = spark.table("type_counts")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(rows == Set(
          (1L, "view", 2L), (1L, "click", 1L), (2L, "view", 1L),   // batch 1
          (1L, "view", 3L), (2L, "purchase", 1L)),                 // batch 2
          rows.toString)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState keeps typed per-key state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the v2 stateful operator requires the RocksDB state store
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.ValueIn]
      val q = StreamingOps.runningMax(in.toDS())
        .writeStream.format("memory").queryName("running_max")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(
          StreamingOps.ValueIn(1, ts(1), 5.0),
          StreamingOps.ValueIn(1, ts(2), 3.0),
          StreamingOps.ValueIn(2, ts(3), 1.0))
        q.processAllAvailable()
        in.addData( // state must survive into the next micro-batch
          StreamingOps.ValueIn(1, ts(4), 9.0),
          StreamingOps.ValueIn(2, ts(5), 0.5))
        q.processAllAvailable()
        val rows = spark.table("running_max")
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
        assert(rows == Set(
          (1L, 5.0, 5.0, 1L), (1L, 3.0, 5.0, 2L), (1L, 9.0, 9.0, 3L),
          (2L, 1.0, 1.0, 1L), (2L, 0.5, 1.0, 2L)), rows.toString)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state TTL evicts an idle key's counter (bounded keyed state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.ValueIn]
      def ev(u: Long, v: Double) = StreamingOps.ValueIn(u, ts(0), v)
      // paced trigger + no-data batches OFF: ProcessingTime TimeMode with
      // the default 0 ms trigger runs a CONTINUOUS no-data micro-batch
      // loop (each committing RocksDB state) — a busy-loop, not a test.
      // TTL itself is enforced lazily at state access, so eviction is
      // still observable without no-data batches.
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val q = StreamingOps.ttlCounts(in.toDS(), ttlMs = 8000L)
        .writeStream.format("memory").queryName("ttl_counts")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(ev(1, 1.0), ev(1, 2.0))
        q.processAllAvailable()
        in.addData(ev(1, 3.0)) // within TTL: builds on state, n -> 3
        q.processAllAvailable()
        Thread.sleep(10000) // > TTL: the key sits idle past expiry
        in.addData(ev(1, 4.0))
        q.processAllAvailable()
        val ns = spark.table("ttl_counts").orderBy("n_seen")
          .collect().map(_.getLong(3)).toSeq
        // batch1 n=2, batch2 n=3 (state survived), batch3 n=1 (evicted)
        assert(ns == Seq(1L, 2L, 3L),
          s"expected TTL eviction to reset the counter: $ns")
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
