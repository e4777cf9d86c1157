package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming over the events table shape (SURVEY.md §7.4): the
  * streaming twins of the batch queries q30/q31. The reference has no
  * streaming at all (SURVEY §2.9); this is the 100 TB extension — the same
  * event-time semantics expressed incrementally:
  *
  *  - `hourlyRollup`: watermarked tumbling-window aggregate. State is bounded
  *    by the watermark; at scale this runs with
  *    spark.sql.streaming.statestore providers and shuffle-partition-count
  *    state shards, exactly like the batch groupBy shuffles.
  *  - `sessionize`: explicit keyed state via flatMapGroupsWithState — the
  *    generalization Spark's built-in session_window can't express when
  *    session logic needs custom emission (we emit one row per CLOSED
  *    session, on event-time timeout).
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(start: Long, last: Long, n: Long, sumValue: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, total_value: Double)

  /** Tumbling 1-hour event-time windows per event_type, 2-hour watermark. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Gap-based sessionization with explicit keyed state. A session closes
    * when no event arrives within `gapMinutes` (event time, enforced via
    * watermark + EventTimeTimeout).
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    sumValue = s.sumValue + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.sumValue)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  final case class FunnelState(tSignup: Long, tView: Long, tClick: Long,
                               tPurchase: Long) // Long.MaxValue = unseen

  final case class FunnelRow(user_id: Long, funnel_stage: Int)

  /** Streaming funnel — the incremental twin of batch q83: per user, track
    * the FIRST event time of each funnel stage in keyed state (4 longs)
    * and emit the user's current strictly-ordered stage each time it may
    * have changed (Update mode). min() over first-times is
    * arrival-order-independent, so late events can only refine the stage
    * to the same value the batch query computes — after all input is
    * processed the last emission per user equals q83 exactly
    * (EventStreamsSpec proves it against the fixture).
    *
    * State is user-cardinality-bounded (32 bytes of times per user), not
    * volume-bounded — the right shape for a funnel, which must remember
    * users forever by definition; evicting abandoned users after a
    * retention horizon is one `GroupStateTimeout.EventTimeTimeout` away
    * (the sessionize pattern) and changes the product definition, so it is
    * a caller decision, not a default.
    */
  def funnelStream(spark: SparkSession, events: Dataset[Event]): Dataset[FunnelRow] = {
    import spark.implicits._
    val unseen = Long.MaxValue
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelRow](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(unseen, unseen, unseen, unseen))
          rows.foreach { e =>
            // exact event-time micros (getTime alone truncates to ms and
            // could flip a <=-comparison between events in the same ms)
            val t = math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
            e.event_type match {
              case "signup"   => s = s.copy(tSignup = math.min(s.tSignup, t))
              case "view"     => s = s.copy(tView = math.min(s.tView, t))
              case "click"    => s = s.copy(tClick = math.min(s.tClick, t))
              case "purchase" => s = s.copy(tPurchase = math.min(s.tPurchase, t))
              case _          => ()
            }
          }
          state.update(s)
          // q83's strict-ordering chain over first-occurrence times
          val stage =
            if (s.tSignup == unseen) 0
            else if (s.tView == unseen || s.tView <= s.tSignup) 1
            else if (s.tClick == unseen || s.tClick <= s.tView) 2
            else if (s.tPurchase == unseen || s.tPurchase <= s.tClick) 3
            else 4
          FunnelRow(userId, stage)
      }
  }

  final case class IslandEvent(tsUs: Long, eventId: Long, eventType: String)
  final case class IslandBuf(events: List[IslandEvent])
  final case class IslandRow(user_id: Long, island: Long, event_type: String,
                             n_events: Long, t_start: Timestamp, t_end: Timestamp,
                             n_islands: Long)

  private def eventMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming gaps-and-islands — the incremental twin of batch q89:
    * contiguous same-type runs per user, re-derived each time the user
    * receives events and emitted in Update mode (later emissions
    * supersede earlier ones per (user_id, island) — funnelStream's
    * refinement contract). State is the user's compact event history
    * ((ts, id, type) triples): the SAME per-key-volume bound as the batch
    * query's user-partitioned window sort, because islands are
    * non-associative under late data — an out-of-order event can split or
    * merge runs arbitrarily far from the stream head, so nothing smaller
    * reproduces batch semantics. A late MERGE shrinks the user's island
    * count; emissions carry n_islands so an upserting consumer trims
    * islands > n_islands (retraction-by-counter). Retention for dead
    * users is one EventTimeTimeout away (sessionize's pattern) and is a
    * product decision, not a default.
    */
  def islandsStream(spark: SparkSession, events: Dataset[Event]): Dataset[IslandRow] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[IslandBuf, IslandRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[IslandBuf]) =>
          val add = rows.map(e =>
            IslandEvent(eventMicros(e.ts), e.event_id, e.event_type)).toList
          val all = (state.getOption.map(_.events).getOrElse(Nil) ++ add)
            .sortBy(e => (e.tsUs, e.eventId))
          state.update(IslandBuf(all))
          // fold the sorted history into runs — the imperative mirror of
          // the batch lag-change-flag + running-sum window
          val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
          all.foreach { e =>
            runs.lastOption match {
              case Some((t, n, s0, _)) if t == e.eventType =>
                runs(runs.length - 1) = (t, n + 1L, s0, e.tsUs)
              case _ => runs += ((e.eventType, 1L, e.tsUs, e.tsUs))
            }
          }
          val total = runs.length.toLong
          runs.iterator.zipWithIndex.map { case ((t, n, s0, s1), i) =>
            IslandRow(userId, i + 1L, t, n, microsTs(s0), microsTs(s1), total)
          }
      }
  }

  final case class GapState(days: Map[Int, Long]) // epochDay -> micro-sum
  final case class GapRow(user_id: Long, d: java.sql.Date, day_value: Option[Double],
                          filled: Double, is_gap: Boolean)

  /** Streaming date-spine gap fill + LOCF — the incremental twin of batch
    * q90: per-user daily totals, densified from the user's first to last
    * active day, gaps carried forward. State per user is the day->total
    * map (span-bounded, the batch spine's own bound); each update emits
    * the user's FULL refreshed spine in Update mode. Unlike islands, gap
    * fill never retracts: late events only extend the spine or fill a
    * day in place, so (user_id, d) upserts converge to the batch result
    * with no counter protocol.
    *
    * Day totals accumulate as scale-6 fixed-point longs — bit-identical
    * to the batch dsum's decimal sum (double->decimal(_,6) is
    * HALF_UP-rounded in both places), so the doubles LOCF copies are the
    * same bits at any arrival order.
    */
  def gapFillStream(spark: SparkSession, events: Dataset[Event]): Dataset[GapRow] = {
    import spark.implicits._
    val usPerDay = 86400000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, GapRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[GapState]) =>
          var days = state.getOption.map(_.days).getOrElse(Map.empty[Int, Long])
          rows.foreach { e =>
            val d = math.floorDiv(eventMicros(e.ts), usPerDay).toInt
            val m = java.math.BigDecimal.valueOf(e.value)
              .setScale(6, java.math.RoundingMode.HALF_UP)
              .unscaledValue().longValueExact()
            days = days.updated(d, days.getOrElse(d, 0L) + m)
          }
          state.update(GapState(days))
          val d0 = days.keys.min
          val d1 = days.keys.max
          var lastFilled = 0.0
          (d0 to d1).iterator.map { d =>
            val v = days.get(d).map(m =>
              new java.math.BigDecimal(java.math.BigInteger.valueOf(m), 6).doubleValue())
            v.foreach(lastFilled = _)
            GapRow(userId, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)),
              v, lastFilled, v.isEmpty)
          }
      }
  }

  /** Streaming exact dedup on event_id bounded by the watermark — the
    * incremental twin of Dedup.exact: state holds only ids newer than the
    * watermark, so memory is bounded at any corpus size.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream trailing-window join — the incremental twin of
    * operators.RangeJoin (batch q65): each probe-side row pairs with the
    * build-side rows of the same key whose time falls in
    * [probeTs - window, probeTs).
    *
    * Unlike batch (where the inequality predicate needs the bin-explode
    * rewrite to avoid a nested loop), the PLAIN formulation is already the
    * scalable streaming shape: StreamingSymmetricHashJoin partitions both
    * sides on the equi key and uses the range condition + the two
    * watermarks to prune state — build rows older than
    * (probe watermark - window) and probe rows older than the build
    * watermark are evicted, so state is bounded at any stream volume.
    */
  def trailingWindowJoinStream(probe: DataFrame, build: DataFrame,
                               key: String, probeTs: String, buildTs: String,
                               window: String, watermark: String): DataFrame = {
    val overlap = build.columns.toSet.intersect(probe.columns.toSet) - key
    require(overlap.isEmpty,
      s"build columns must not shadow probe columns (rename: $overlap)")
    // fail at call time on a zero/negative window (the batch twin's
    // windowUs > 0 require): a negative interval would make the range
    // condition unsatisfiable and the stream silently emit nothing forever
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(window))
    require(iv != null && iv.months >= 0 && iv.days >= 0 && iv.microseconds >= 0 &&
        (iv.months > 0 || iv.days > 0 || iv.microseconds > 0),
      s"window must be a positive interval, got '$window'")
    val p = probe.withWatermark(probeTs, watermark)
    val b = build.withWatermark(buildTs, watermark)
    p.join(b,
        p.col(key) === b.col(key) &&
        col(buildTs) >= col(probeTs) - expr(s"interval $window") &&
        col(buildTs) < col(probeTs))
      .drop(b.col(key))
  }

  /** File-source entry: stream the events parquet with the raw on-disk
    * schema (nanos ride as Long under nanosAsLong), then apply the same
    * ns -> us conversion the batch Tables.events performs.
    */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val path = s"$sfDir/events.parquet"
    val rawSchema = spark.read.parquet(path).schema
    // FileStreamSource wants a directory basePath; glob-filter to the
    // events file within the fixture dir.
    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    rawSchema("ts").dataType match {
      case LongType => stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => stream
    }
  }
}
