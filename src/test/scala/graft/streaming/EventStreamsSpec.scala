package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyRollup over a file stream matches the batch rollup") {
    val sf = Sf0001
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.hourlyRollup(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_out").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("rollup_out")
        .select(col("hour").cast("timestamp_ntz").as("hour"), col("event_type"),
                col("n_events"))
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = graft.queries.Extensions.q30EventsHourly(spark, sf)
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(streaming == batch)
    } finally q.stop()
  }

  test("hoppingRollup over a file stream matches the batch q183") {
    val sf = Sf0001
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.hoppingRollup(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hopping_out").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("hopping_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val batch = graft.queries.Series.q183HoppingRollup(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streaming == batch)
      assert(streaming.nonEmpty)
    } finally q.stop()
  }

  test("dedupStream drops duplicate event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      val e = EventStreams.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0)
      input.addData(e, e.copy(value = 2.0)) // same event_id twice in one batch
      q.processAllAvailable()
      input.addData(e.copy(value = 3.0),    // same id again, next batch
        EventStreams.Event(2, ts("2024-01-01 10:01:00"), 1, "view", 4.0))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionize emits closed sessions on gap and watermark progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(spark, input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap event
      input.addData(
        EventStreams.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        EventStreams.Event(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(3, ts("2024-01-01 12:30:00"), 1, "click", 3.0))
      q.processAllAvailable()
      // push watermark far forward so the last session times out and closes
      input.addData(EventStreams.Event(9, ts("2024-01-01 20:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(10, ts("2024-01-02 09:00:00"), 99, "click", 0.0))
      q.processAllAvailable()

      val out = spark.table("sessions_out")
        .filter(col("user_id") === 1).orderBy("session_start").collect()
      assert(out.length == 2, s"expected 2 closed sessions, got ${out.length}")
      assert(out(0).getAs[Long]("n_events") == 2)
      assert(out(0).getAs[Double]("total_value") == 3.0)
      assert(out(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
      assert(out(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("trailingWindowJoinStream rejects non-positive windows at call time") {
    import spark.implicits._
    val p = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val b = Seq((2L, 1L, ts("2024-01-01 09:00:00"))).toDF("p_event_id", "user_id", "p_ts")
    intercept[IllegalArgumentException] {
      EventStreams.trailingWindowJoinStream(p, b, "user_id", "ts", "p_ts",
        window = "-30 minutes", watermark = "1 hour")
    }
    intercept[IllegalArgumentException] {
      EventStreams.trailingWindowJoinStream(p, b, "user_id", "ts", "p_ts",
        window = "0 seconds", watermark = "1 hour")
    }
  }

  test("trailingWindowJoinStream matches the batch RangeJoin on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[EventStreams.Event]
    val buysIn = MemoryStream[EventStreams.Event]
    val clicks = clicksIn.toDF().select($"event_id", $"user_id", $"ts")
    val buys = buysIn.toDF().select($"user_id",
      $"event_id".as("p_event_id"), $"ts".as("p_ts"))
    val joined = EventStreams.trailingWindowJoinStream(clicks, buys,
      "user_id", "ts", "p_ts", window = "30 minutes", watermark = "1 hour")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("range_out").start()
    try {
      def click(id: Long, u: Long, t: String) =
        EventStreams.Event(id, ts(t), u, "click", 0.0)
      def buy(id: Long, u: Long, t: String) =
        EventStreams.Event(id, ts(t), u, "purchase", 1.0)
      val allClicks = Seq(
        click(1, 1, "2024-01-01 10:00:00"),  // matches buys 101 (boundary in) + 102
        click(2, 1, "2024-01-01 11:00:00"),  // buy 103 at == ts is excluded
        click(3, 2, "2024-01-01 10:10:00"))  // wrong-user buys -> no match
      val allBuys = Seq(
        buy(101, 1, "2024-01-01 09:30:00"),  // exactly t-W -> included
        buy(102, 1, "2024-01-01 09:59:59"),
        buy(103, 1, "2024-01-01 11:00:00"),  // == click 2's ts -> excluded for 2...
        buy(104, 9, "2024-01-01 10:05:00"))
      clicksIn.addData(allClicks: _*)
      buysIn.addData(allBuys: _*)
      q.processAllAvailable()
      // advance both watermarks so all pairs are emitted
      clicksIn.addData(click(99, 50, "2024-01-01 23:00:00"))
      buysIn.addData(buy(199, 50, "2024-01-01 23:00:00"))
      q.processAllAvailable()
      val streaming = spark.table("range_out")
        .select("event_id", "p_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // buy 103 lands in [10:30, 11:00) of a later click only if one exists:
      // click 2 at 11:00 excludes it (strict upper bound) -> expected set
      val batchProbe = allClicks.toDF().select($"event_id", $"user_id", $"ts")
      val batchBuild = allBuys.toDF().select($"user_id",
        $"event_id".as("p_event_id"), $"ts".as("p_ts"))
      val batch = graft.operators.RangeJoin.trailingWindowJoin(
          batchProbe, batchBuild, "user_id", "ts", "p_ts", 1800L * 1000000)
        .select("event_id", "p_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streaming == batch)
      assert(batch == Set((1L, 101L), (1L, 102L)))
    } finally q.stop()
  }
  test("funnelStream final stages match batch q83 on the fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = Sf0001
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStream(spark, input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out").start()
    try {
      val events = graft.Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event].collect()
      input.addData(events.toSeq)
      q.processAllAvailable()
      val streaming = spark.table("funnel_out")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = graft.queries.Signals.q83Funnel(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streaming == batch)
    } finally q.stop()
  }

  test("funnelStream with retention evicts idle users; returning users restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStream(spark, input.toDS(), retention = Some("30 days"))
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_evict").start()
    try {
      // user 7 reaches stage 2 in January
      input.addData(
        EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 7L, "signup", 0.0),
        EventStreams.Event(2L, ts("2024-01-02 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      // a mid-January event moves the watermark to Dec 21 — PAST the
      // epoch-based timeout a bug arming off the batch-1 watermark
      // (0 + 30 d = Feb 1970) would have set, but BEFORE the correct
      // last-event + retention horizon (Jan 2 + 30 d = Feb 1): user 7
      // must not be evicted yet
      input.addData(EventStreams.Event(3L, ts("2024-01-20 10:00:00"), 8L, "view", 0.0))
      q.processAllAvailable()
      assert(spark.table("funnel_evict").collect().count(_.getLong(0) == 7L) == 1,
        "user must not be evicted before last-event + retention")
      // an April event pushes the watermark past Feb 1; the timeout fires
      // and drops the state
      input.addData(EventStreams.Event(4L, ts("2024-04-02 10:00:00"), 8L, "view", 0.0))
      q.processAllAvailable()
      // user 7 returns with a view only: with retained state this would
      // still read stage 2 — post-eviction it restarts at 0 (no signup)
      input.addData(EventStreams.Event(5L, ts("2024-04-03 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      val emissions = spark.table("funnel_evict").collect()
        .filter(_.getLong(0) == 7L).map(_.getInt(1)).toSeq
      assert(emissions.contains(2), s"pre-eviction stage reached 2: $emissions")
      // a 0 emission is only possible from a fresh state (the retained
      // state would still hold January's signup+view → stage 2)
      assert(emissions.contains(0), s"returning user must restart at 0: $emissions")
    } finally q.stop()
  }

  test("funnelStream: a late straggler must not shrink the eviction horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStream(spark, input.toDS(), retention = Some("30 days"))
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_straggler").start()
    try {
      // user 7's true latest activity is Feb 15 (stage 2)
      input.addData(
        EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 7L, "signup", 0.0),
        EventStreams.Event(2L, ts("2024-02-15 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      // an admissible straggler (Jan 20 >= watermark Jan 16). A timeout
      // re-armed from only THIS batch's max event time would shrink the
      // horizon to Jan 20 + 30 d = Feb 19; the correct horizon stays at
      // last-activity + retention = Feb 15 + 30 d = Mar 16
      input.addData(EventStreams.Event(3L, ts("2024-01-20 10:00:00"), 7L, "click", 0.0))
      q.processAllAvailable()
      // push the watermark to Feb 23 — past the buggy Feb 19 horizon,
      // before the correct Mar 16 one: user 7 must survive
      input.addData(EventStreams.Event(4L, ts("2024-03-25 10:00:00"), 8L, "view", 0.0))
      q.processAllAvailable()
      // the returning view must merge into RETAINED state (stage 2);
      // post-eviction it would read a fresh state's stage 0
      input.addData(EventStreams.Event(5L, ts("2024-03-26 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      val emissions = spark.table("funnel_straggler").collect()
        .filter(_.getLong(0) == 7L).map(_.getInt(1)).toSeq
      assert(!emissions.contains(0),
        s"straggler shrank the horizon — user was evicted early: $emissions")
      assert(emissions.last == 2, s"retained state must still read stage 2: $emissions")
    } finally q.stop()
  }

  test("month-denominated retention is rejected up front") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val e1 = intercept[IllegalArgumentException](
      EventStreams.funnelStream(spark, input.toDS(), retention = Some("1 month")))
    assert(e1.getMessage.contains("month"))
    val e2 = intercept[IllegalArgumentException](
      EventStreams.islandsStream(spark, input.toDS(), retention = "2 months"))
    assert(e2.getMessage.contains("month"))
    // day/hour forms still pass validation (construction only)
    EventStreams.islandsStream(spark, input.toDS(), retention = "36 hours")
    EventStreams.funnelStream(spark, input.toDS(), retention = Some("45 days"))
  }

  test("islandsStream final islands match batch q89, fed out of order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = Sf0001
    val input = MemoryStream[EventStreams.Event]
    // retention wider than the fixture's 30-day span: the deliberately
    // out-of-order halves must not be dropped as beyond-horizon late rows
    val q = EventStreams.islandsStream(spark, input.toDS(), retention = "90 days")
      .writeStream.outputMode("update")
      .format("memory").queryName("islands_out").start()
    try {
      val events = graft.Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event].collect()
      // second half first: every batch-1 user receives late batch-2 events
      val (a, b) = events.partition(_.event_id % 2 == 0)
      input.addData(b.toSeq); q.processAllAvailable()
      input.addData(a.toSeq); q.processAllAvailable()
      // latest emission per (user, island), trimmed by the island counter
      val rows = spark.table("islands_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), r.getTimestamp(4), r.getTimestamp(5),
            r.getLong(6)))).toMap
      val counts = rows.collect { case ((u, 1L), (_, _, _, _, total)) => u -> total }
      val streaming = rows.collect {
        case ((u, i), (t, n, s0, s1, _)) if i <= counts(u) =>
          (u, i, t, n, s0.toLocalDateTime, s1.toLocalDateTime)
      }.toSet
      val batch = graft.queries.Signals.q89TypeIslands(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getAs[java.time.LocalDateTime](4), r.getAs[java.time.LocalDateTime](5))).toSet
      assert(streaming == batch)
    } finally q.stop()
  }

  test("islandsStream: a late middle event splits a run and renumbers islands") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.islandsStream(spark, input.toDS(), retention = "30 days")
      .writeStream.outputMode("update")
      .format("memory").queryName("islands_late").start()
    try {
      input.addData(
        EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 5L, "view", 0.0),
        EventStreams.Event(3L, ts("2024-01-01 10:10:00"), 5L, "view", 0.0))
      q.processAllAvailable()
      val first = spark.table("islands_late").collect()
      assert(first.map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSet ==
        Set((1L, "view", 2L)), "one 2-event island before the late arrival")
      // a CLICK lands between the two views -> three islands
      input.addData(EventStreams.Event(2L, ts("2024-01-01 10:05:00"), 5L, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("islands_late").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), r.getLong(6)))).toMap
      val total = rows((5L, 1L))._3
      assert(total == 3L)
      assert((1L to 3L).map(i => rows((5L, i))._1) == Seq("view", "click", "view"))
    } finally q.stop()
  }

  test("islandsStream compaction equals the full-history fold on random batched streams") {
    // adversarial equivalence check for the finalization/carry index
    // arithmetic: random events over several users and batches, each batch
    // one retention-window ahead of the last (so finalization fires
    // between batches and nothing is dropped as late), must reproduce
    // exactly the runs a single fold over the complete history yields.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(20260813L)
    val types = Array("view", "click", "buy")
    val nBatches = 4
    val batches: Seq[Seq[EventStreams.Event]] = (0 until nBatches).map { b =>
      // batch b lives in [b*2h, b*2h+1h): next batch's min (b+1)*2h is
      // always >= this batch's max - 1h retention, so no admitted event is
      // ever behind the watermark when it arrives
      val base = ts("2024-01-01 00:00:00").getTime + b.toLong * 2 * 3600 * 1000
      (0 until 60).map { i =>
        val t = new Timestamp(base + rnd.nextInt(3600 * 1000).toLong)
        EventStreams.Event(b.toLong * 1000 + i, t, rnd.nextInt(4).toLong,
          types(rnd.nextInt(types.length)), 0.0)
      }
    }
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.islandsStream(spark, input.toDS(), retention = "1 hour")
      .writeStream.outputMode("update")
      .format("memory").queryName("islands_rand").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // expected: one fold over the COMPLETE sorted history per user
      val expected = batches.flatten.groupBy(_.user_id).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
        val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
        sorted.foreach { e =>
          runs.lastOption match {
            case Some((t, n, s0, _)) if t == e.event_type =>
              runs(runs.length - 1) = (t, n + 1L, s0, e.ts.getTime)
            case _ => runs += ((e.event_type, 1L, e.ts.getTime, e.ts.getTime))
          }
        }
        runs.zipWithIndex.map { case ((t, n, s0, s1), i) =>
          (u, i + 1L) -> ((t, n, s0, s1))
        }
      }
      // streamed: per (user, island) the max emission (n_events monotone)
      val got = spark.table("islands_rand").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), r.getTimestamp(4).getTime,
            r.getTimestamp(5).getTime)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).maxBy(_._2) }
      assert(got.keySet == expected.keySet,
        s"island keys: missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
      expected.foreach { case (k, e) =>
        assert(got(k) == e, s"island $k: got ${got(k)}, expected $e")
      }
    } finally q.stop()
  }

  test("islandsStream finalizes runs behind the watermark and keeps O(retention) state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.islandsStream(spark, input.toDS(), retention = "30 days")
      .writeStream.outputMode("update")
      .format("memory").queryName("islands_compact").start()
    try {
      // two islands in January, then a view in April that pushes the
      // watermark (Apr 1 - 30 d = Mar 2) past both January runs
      input.addData(
        EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0),
        EventStreams.Event(2L, ts("2024-01-01 10:05:00"), 7L, "view", 0.0),
        EventStreams.Event(3L, ts("2024-01-01 10:20:00"), 7L, "click", 0.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(4L, ts("2024-04-01 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      // watermark applies on the NEXT batch: an unrelated user's event
      // triggers it, and user 7 compacts via its event-time timeout
      input.addData(EventStreams.Event(9L, ts("2024-04-02 09:00:00"), 8L, "view", 0.0))
      q.processAllAvailable()
      // post-compaction continuation: island numbering and the carry run
      // must survive the dropped history
      input.addData(
        EventStreams.Event(5L, ts("2024-04-01 10:07:00"), 7L, "view", 0.0),
        EventStreams.Event(6L, ts("2024-04-01 10:30:00"), 7L, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("islands_compact").collect()
        .filter(_.getLong(0) == 7L)
        .map(r => (r.getLong(1), (r.getString(2), r.getLong(3), r.getLong(6))))
        // per-island n_events and totals are monotone (events only ever
        // added), so the island's final state is its max emission
        .groupBy(_._1).map { case (i, v) => i -> v.map(_._2).maxBy(t => (t._2, t._3)) }
      assert(rows.keySet == Set(1L, 2L, 3L, 4L))
      assert(rows(1L)._1 == "view" && rows(1L)._2 == 2L)
      assert(rows(2L)._1 == "click" && rows(2L)._2 == 1L)
      assert(rows(3L)._1 == "view" && rows(3L)._2 == 2L, s"carry continuation: ${rows(3L)}")
      assert(rows(4L)._1 == "purchase" && rows(4L)._2 == 1L)
      assert(rows(4L)._3 == 4L, "final total island count")
    } finally q.stop()
  }

  test("gapFillStream converges to batch q90 under out-of-order arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = Sf0001
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.gapFillStream(spark, input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("gapfill_out").start()
    try {
      val events = graft.Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event].collect()
      val (a, b) = events.partition(_.event_id % 2 == 0)
      input.addData(b.toSeq); q.processAllAvailable()
      input.addData(a.toSeq); q.processAllAvailable()
      // gap fill never retracts: latest (user, day) row is the answer
      val streaming = spark.table("gapfill_out").collect()
        .map(r => (r.getLong(0), r.getDate(1).toLocalDate) ->
          ((Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3),
            r.getBoolean(4)))).toMap
      val batch = graft.queries.Signals.q90GapFill(spark, sf).collect()
        .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate) ->
          ((Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3),
            r.getBoolean(4)))).toMap
      assert(streaming == batch)
    } finally q.stop()
  }

  test("funnelStream refines the stage when earlier events arrive late") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStream(spark, input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_late").start()
    try {
      // view first: no signup seen yet -> stage 0
      input.addData(EventStreams.Event(2L, ts("2024-01-01 10:05:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      assert(spark.table("funnel_late").collect().map(r => r.getInt(1)).last == 0)
      // the signup that PRECEDED it arrives late -> signup < view -> stage 2
      input.addData(EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 7L, "signup", 0.0))
      q.processAllAvailable()
      val stages = spark.table("funnel_late").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(stages.contains((7L, 2)), s"expected refined stage 2, got ${stages.toSeq}")
    } finally q.stop()
  }

}
