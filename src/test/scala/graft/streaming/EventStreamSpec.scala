package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStream.{Event, SessionUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Drives the streaming jobs through MemoryStream with explicit event-time
  * progression: late data within the watermark counts, windows close when
  * the watermark passes, sessions split on the inactivity gap.
  */
class EventStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, ts(t), user, typ, v)

  test("hourlyCounts: windows aggregate and close under the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:40:00", 2, "click", 2.0),
        ev(3, "2024-01-01 11:10:00", 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough (> 11:00 + 2h) to close hour 10 + 11
      input.addData(ev(4, "2024-01-01 14:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("hourly").as[(Timestamp, String, Long, String)]
        .collect().map(r => (r._1, r._2, r._3, r._4)).toSet
      assert(out.contains((ts("2024-01-01 10:00:00"), "click", 2L, "3.00")))
      assert(out.contains((ts("2024-01-01 11:00:00"), "view", 1L, "3.00")))
    } finally q.stop()
  }

  test("dedupByKey: repeated keys dropped across batches within watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.dedupByKey(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        // same key, RE-STAMPED ts (producer retry) — must still drop
        ev(1, "2024-01-01 10:00:01", 1, "click", 1.0),
        ev(2, "2024-01-01 10:01:00", 1, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("deduped").count() === 2)
    } finally q.stop()
  }

  test("slidingCounts: each event lands in exactly two windows, both close") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:20:00", 2, "click", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 14:00:00", 1, "view", 1.0)) // advance watermark
      q.processAllAvailable()
      val out = spark.table("sliding").as[(Timestamp, String, Long, String)]
        .collect().map(r => (r._1, r._2, r._3, r._4)).toSet
      // 10:05 → windows [09:45,10:15) and [10:00,10:30); 10:20 → [10:00,10:30) and [10:15,10:45)
      assert(out.contains((ts("2024-01-01 09:45:00"), "click", 1L, "1.00")))
      assert(out.contains((ts("2024-01-01 10:00:00"), "click", 2L, "3.00")))
      assert(out.contains((ts("2024-01-01 10:15:00"), "click", 1L, "2.00")))
    } finally q.stop()
  }

  test("sessionWindowCounts: native session merge, emit once watermark passes") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionWindowCounts(input.toDF())
      .writeStream.format("memory").queryName("swin")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 7, "click", 1.0),
        ev(2, "2024-01-01 10:10:00", 7, "click", 2.0),
        ev(3, "2024-01-01 11:30:00", 7, "click", 4.0)) // >30m gap → 2nd session
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 15:00:00", 8, "view", 1.0)) // advance watermark
      q.processAllAvailable()
      val out = spark.table("swin")
        .as[(Long, Timestamp, Timestamp, Long, String)].collect()
        .filter(_._1 == 7L).map(r => (r._2, r._3, r._4, r._5)).toSet
      // session 1: [10:00, 10:10+gap), 2 events; session 2: single event
      assert(out.contains((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2L, "3.00")))
      assert(out.contains((ts("2024-01-01 11:30:00"), ts("2024-01-01 12:00:00"), 1L, "4.00")))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, state closes on timeout") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 7, "click", 1.0),
        ev(2, "2024-01-01 10:10:00", 7, "click", 1.0))
      q.processAllAvailable()
      // out-of-order event in a LATER batch, earlier than the session
      // start but within the gap — must lower the start
      input.addData(ev(4, "2024-01-01 09:50:00", 7, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        // > 30 min gap → closes the first session, opens a second
        ev(3, "2024-01-01 11:00:00", 7, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions").as[SessionUpdate].collect()
      val closed = out.filter(_.closed)
      assert(closed.exists(u =>
        u.user_id == 7 && u.n_events == 3 &&
          u.start == ts("2024-01-01 09:50:00") && u.end == ts("2024-01-01 10:10:00")))
    } finally q.stop()
  }

  test("sessionize: a late event farther than the gap BEFORE the session splits") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_split")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev(1, "2024-01-01 12:00:00", 7, "click", 1.0),
        ev(2, "2024-01-01 12:05:00", 7, "click", 1.0))
      q.processAllAvailable()
      // 45 min before the session start (within the 1 h watermark): the
      // batch sessionizer puts it in its OWN session — the old
      // `t − end ≤ gap` test fused it into the held session
      input.addData(ev(3, "2024-01-01 11:15:00", 7, "click", 1.0))
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 14:00:00", 7, "click", 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_split").as[SessionUpdate]
        .collect().filter(_.closed)
      assert(closed.exists(u => u.n_events == 1 &&
        u.start == ts("2024-01-01 11:15:00") && u.end == ts("2024-01-01 11:15:00")))
      assert(closed.exists(u => u.n_events == 2 &&
        u.start == ts("2024-01-01 12:00:00") && u.end == ts("2024-01-01 12:05:00")))
    } finally q.stop()
  }

  test("clickAttribution: stream-stream interval join within the time bound") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStream.clickAttribution(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        ev(10, "2024-01-01 10:02:00", 1, "click", 0.0), //  8 min before: match
        ev(11, "2024-01-01 09:55:00", 1, "click", 0.0), // 15 min before: too old
        ev(12, "2024-01-01 10:05:00", 2, "click", 0.0)) //  other user
      purchases.addData(ev(1, "2024-01-01 10:10:00", 1, "purchase", 9.0))
      q.processAllAvailable()
      // late-but-in-window click arrives in a LATER batch: the stream-
      // stream state store must still match it to the buffered purchase
      clicks.addData(ev(13, "2024-01-01 10:08:00", 1, "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("attrib")
        .select($"p_eid", $"c_eid").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 10L), (1L, 13L)))
    } finally q.stop()
  }

  test("clickAttributionOuter: unmatched purchases emit nulls after watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStream.clickAttributionOuter(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        ev(10, "2024-01-01 10:02:00", 1, "click", 0.0)) // matches user 1
      purchases.addData(
        ev(1, "2024-01-01 10:10:00", 1, "purchase", 9.0), // matched
        ev(2, "2024-01-01 10:12:00", 2, "purchase", 5.0)) // no click at all
      q.processAllAvailable()
      // the unmatched purchase must NOT emit yet: a 10:0x click for user 2
      // could still arrive inside the watermark
      val early = spark.table("attrib_outer").collect()
      assert(early.forall(_.getAs[Long]("p_eid") == 1L))
      // advance both watermarks far past purchase 2's window: the outer
      // row with null click columns must now flush exactly once
      clicks.addData(ev(11, "2024-01-01 12:00:00", 9, "click", 0.0))
      purchases.addData(ev(3, "2024-01-01 12:00:00", 9, "purchase", 1.0))
      q.processAllAvailable()
      val out = spark.table("attrib_outer")
        .select($"p_eid", $"c_eid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(out.contains((1L, 10L)) && out.contains((2L, -1L)))
    } finally q.stop()
  }

  test("enrichNation: stream-static broadcast join is stateless per batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val nation = Seq((0, "NATION_0"), (1, "NATION_1"), (26 % 25, "DUP_IGNORED"))
      .toDF("n_nationkey", "n_name").filter($"n_name" =!= "DUP_IGNORED")
    val input = MemoryStream[Event]
    val q = EventStream.enrichNation(input.toDF(), nation)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 25, "click", 1.0), // 25 % 25 = 0
        ev(2, "2024-01-01 10:01:00", 26, "view", 2.0), //  26 % 25 = 1
        ev(3, "2024-01-01 10:02:00", 7, "view", 3.0)) //    7 % 25 = 7: no dim row
      q.processAllAvailable()
      // second batch re-probes the same static dim — no state carryover
      input.addData(ev(4, "2024-01-01 10:03:00", 50, "click", 4.0))
      q.processAllAvailable()
      val out = spark.table("enriched")
        .select($"event_id", $"n_name").as[(Long, String)].collect().toSet
      assert(out == Set((1L, "NATION_0"), (2L, "NATION_1"), (4L, "NATION_0")))
    } finally q.stop()
  }

  test("upsertSink: the parquet dimension tracks latest-per-user across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val (dim, ckpt) = (s"$base/dim", s"$base/ckpt")
    val input = MemoryStream[Event]
    val q = EventStream.upsertSink(input.toDF(), dim, ckpt)
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:05:00", 1, "view", 1.0),
        ev(3, "2024-01-01 10:02:00", 2, "click", 1.0))
      q.processAllAvailable()
      val snap1 = spark.read.parquet(dim)
        .select($"user_id", $"event_type").as[(Long, String)].collect().toSet
      assert(snap1 === Set((1L, "view"), (2L, "click")))
      // wave 2: user 1 updated, user 3 inserted, user 2 untouched
      input.addData(
        ev(4, "2024-01-01 11:00:00", 1, "buy", 1.0),
        ev(5, "2024-01-01 11:01:00", 3, "view", 1.0))
      q.processAllAvailable()
      val snap2 = spark.read.parquet(dim)
        .select($"user_id", $"event_type", $"last_us")
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(snap2(1L)._1 === "buy" && snap2(2L)._1 === "click" &&
        snap2(3L)._1 === "view")
      // carried-over row keeps its original event time
      assert(snap2(2L)._2 === ts("2024-01-01 10:02:00").getTime * 1000)
      // wave 3: a LATE batch carrying an out-of-order event for user 1
      // (10:30, older than the 11:00 snapshot row) plus a genuinely newer
      // event for user 3 — the merge must keep user 1's newer snapshot
      // (the round-4 coalesce(u, b) bug regressed it) and advance user 3
      input.addData(
        ev(6, "2024-01-01 10:30:00", 1, "stale", 1.0),
        ev(7, "2024-01-01 11:30:00", 3, "buy", 1.0))
      q.processAllAvailable()
      val snap3 = spark.read.parquet(dim)
        .select($"user_id", $"event_type", $"last_us")
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(snap3(1L)._1 === "buy" && snap3(1L)._2 ===
        ts("2024-01-01 11:00:00").getTime * 1000,
        s"late event regressed the user-1 snapshot: ${snap3(1L)}")
      assert(snap3(3L)._1 === "buy")
    } finally q.stop()
  }

  test("quantileSketchSink: merged store equals the direct batch sketch and replays are idempotent") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-qsketch").toString
    val (store, ckpt) = (s"$base/store", s"$base/ckpt")
    val input = MemoryStream[Event]
    val q = EventStream.quantileSketchSink(input.toDF(), store, ckpt)
    val wave1 = (1 to 40).map(i => ev(i.toLong, "2024-01-01 10:00:00", 1L,
      "m", i * 1.25))
    val wave2 = (41 to 90).map(i => ev(i.toLong, "2024-01-01 11:00:00", 1L,
      "m", i * 7.5))
    try {
      input.addData(wave1: _*)
      q.processAllAvailable()
      input.addData(wave2: _*)
      q.processAllAvailable()
      def merged() = EventStream
        .readQuantileSketch(spark, store)
        .as[(Long, Long)].collect().toMap
      // direct batch sketch over the union, same shared bucket expression
      val direct = (wave1 ++ wave2).toDF()
        .filter($"value".isNotNull && $"value" > 0)
        .select(round($"value" * 100).cast("long").as("centi"))
        .withColumn("b",
          expr(graft.analytics.StatsQueries.hdrBucketSql("centi")))
        .groupBy($"b").agg(count(lit(1)).as("c"))
        .as[(Long, Long)].collect().toMap
      val afterStream = merged()
      assert(afterStream === direct)
      assert(afterStream.values.sum === 90L)
      // replay: rewriting batch 0's partition (as a restarted query would)
      // must leave the merged sketch unchanged — partition overwrite, not
      // append, is what makes the additive sink idempotent
      wave1.toDF()
        .select(round($"value" * 100).cast("long").as("centi"))
        .withColumn("b",
          expr(graft.analytics.StatsQueries.hdrBucketSql("centi")))
        .groupBy($"b").agg(count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(s"$store/batch_id=0")
      assert(merged() === direct)
    } finally q.stop()
  }

  test("timerSessions: gap closes inline, watermark timer closes the rest") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def tus(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000
    val input = MemoryStream[Event]
    val q = EventStream.timerSessions(input.toDS())
      .writeStream.format("memory").queryName("timer_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // wave 1: two users open sessions; nothing can emit yet
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "view", 1.00),
        ev(2, "2024-01-01 10:05:00", 1, "view", 2.00),
        ev(3, "2024-01-01 10:02:00", 2, "view", 5.00))
      q.processAllAvailable()
      // wave 2: u1's 11:30 event is 85 min past its last — closes the
      // old session INLINE ("gap"); u9's 12:00 event pushes the
      // watermark to 11:50, which (next batch) expires u2's 10:32 timer
      input.addData(
        ev(4, "2024-01-01 11:30:00", 1, "view", 0.50),
        ev(5, "2024-01-01 12:00:00", 9, "view", 0.00))
      q.processAllAvailable()
      // wave 3: u9's 13:00 event gap-closes its own 12:00 session; the
      // watermark advances to 12:50 for the NEXT batch
      input.addData(ev(6, "2024-01-01 13:00:00", 9, "view", 0.00))
      q.processAllAvailable()
      // wave 4: unrelated user. processAllAvailable runs the data batch
      // (watermark 12:50 — expires u1's 12:00 timer if wave 3 hadn't)
      // plus the watermark-advance batch at 13:50, which also expires
      // u9's 13:30 timer. Only u8's session stays open.
      input.addData(ev(7, "2024-01-01 14:00:00", 8, "view", 0.00))
      q.processAllAvailable()
      val got = spark.table("timer_sessions")
        .as[(Long, Long, Long, Long, Long, String)].collect().toSet
      assert(got === Set(
        (1L, tus("2024-01-01 10:00:00"), tus("2024-01-01 10:05:00"),
          2L, 300L, "gap"),
        (2L, tus("2024-01-01 10:02:00"), tus("2024-01-01 10:02:00"),
          1L, 500L, "timer"),
        (9L, tus("2024-01-01 12:00:00"), tus("2024-01-01 12:00:00"),
          1L, 0L, "gap"),
        (9L, tus("2024-01-01 13:00:00"), tus("2024-01-01 13:00:00"),
          1L, 0L, "timer"),
        (1L, tus("2024-01-01 11:30:00"), tus("2024-01-01 11:30:00"),
          1L, 50L, "timer")), got)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("timerSessions: an out-of-order merge lowers the session start") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def tus(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000
    val input = MemoryStream[Event]
    val q = EventStream.timerSessions(input.toDS())
      .writeStream.format("memory").queryName("timer_sessions_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, "2024-01-01 12:10:00", 1, "view", 1.00))
      q.processAllAvailable()
      // watermark is now 12:00; a 12:05 event is admitted, precedes the
      // held session's start, and must LOWER start on merge (the old
      // merge kept start at 12:10 while counting the event)
      input.addData(ev(2, "2024-01-01 12:05:00", 1, "view", 1.00))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 13:30:00", 1, "view", 0.00))
      q.processAllAvailable()
      val got = spark.table("timer_sessions_ooo")
        .as[(Long, Long, Long, Long, Long, String)].collect()
        .filter(_._6 == "gap").toSet
      assert(got === Set((1L, tus("2024-01-01 12:05:00"),
        tus("2024-01-01 12:10:00"), 2L, 200L, "gap")), got)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("runningTotals (transformWithState): state persists across batches and equals batch cumsum") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    // transformWithState requires the RocksDB state store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStream.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Append).start()
    try {
      // wave 1: interleaved users, deliberately out of order within the
      // batch — the processor must apply them in (ts, event_id) order
      input.addData(
        ev(3, "2024-01-01 10:02:00", 1, "view", 2.50),
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.25),
        ev(2, "2024-01-01 10:01:00", 2, "click", 10.00))
      q.processAllAvailable()
      // wave 2: totals must CONTINUE from wave-1 state
      input.addData(
        ev(4, "2024-01-01 10:03:00", 1, "buy", 0.25),
        ev(5, "2024-01-01 10:04:00", 2, "view", 0.01))
      q.processAllAvailable()
      val got = spark.table("running")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === Set(
        (1L, 1L, 1L, 125L), (1L, 3L, 2L, 375L), (1L, 4L, 3L, 400L),
        (2L, 2L, 1L, 1000L), (2L, 5L, 2L, 1001L)))
      // batch twin: the same events through a window cumsum give the
      // same running counts and centi-sums
      val batch = Seq(
        (1L, 1L, 125L), (3L, 1L, 250L), (2L, 2L, 1000L),
        (4L, 1L, 25L), (5L, 2L, 1L))
        .toDF("event_id", "user_id", "centi")
      import org.apache.spark.sql.functions.{count, lit, sum}
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"event_id")
      val twin = batch
        .withColumn("n_so_far", count(lit(1)).over(w))
        .withColumn("sum_so_far", sum($"centi").over(w))
        .select($"user_id", $"event_id", $"n_so_far", $"sum_so_far")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(twin === got)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
