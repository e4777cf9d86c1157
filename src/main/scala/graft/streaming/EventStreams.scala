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

  /** HOPPING 6h/3h event-time windows per event_type — each event lands in
    * exactly two overlapping windows (the smoothed-rate/hysteresis shape).
    * Works on a static OR streaming frame: the same map-side 2-window
    * expand + partial agg; in streaming, state is one row per
    * (window, type) bounded by the watermark. Batch q183 and the
    * EventStreamsSpec stream==batch equality both run through here.
    */
  def hoppingRollup(events: DataFrame): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "2 hours")
              else events
    src
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.dsum(col("value"), 6).as("total_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n_events"), col("total_value"))
  }

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

  /** NOTE on checkpoint compatibility: `lastSeen` was ADDED in round 9
    * (straggler-proof retention arming). mapGroupsWithState state rows
    * written by the earlier 4-field encoder cannot be decoded by this one
    * — a funnelStream restarted on an old checkpoint fails Spark's state
    * schema check and must start from a fresh checkpoint (replaying the
    * source gives the exact same final stages; the operator is
    * deterministic in event time).
    */
  final case class FunnelState(tSignup: Long, tView: Long, tClick: Long,
                               tPurchase: Long, // Long.MaxValue = unseen
                               lastSeen: Long)  // max event-time ms ever seen

  final case class FunnelRow(user_id: Long, funnel_stage: Int)

  /** Retention interval → eviction-horizon milliseconds, shared by the
    * stateful operators. Month-bearing intervals are REJECTED rather than
    * approximated: `withWatermark` applies true calendar months to the
    * late-row admission cutoff while any fixed horizon must pick a month
    * length (≈30 d), so the two boundaries would diverge by up to
    * ~1.5 d/month — a window where an event is still admitted for a user
    * whose state already timed out (silent stage-0 restart). Day/hour
    * units keep both boundaries on the same fixed arithmetic.
    */
  private[streaming] def retentionHorizonMs(r: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(r))
    require(iv != null && iv.months >= 0 && iv.days >= 0 && iv.microseconds >= 0 &&
        (iv.months > 0 || iv.days > 0 || iv.microseconds > 0),
      s"retention must be a positive interval, got '$r'")
    require(iv.months == 0,
      s"month-denominated retention ('$r') is ambiguous: the watermark " +
        "counts calendar months while the eviction horizon must fix a " +
        "month length — express retention in days/hours instead")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

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
    * users forever by definition. Passing `retention` OPTS IN to evicting
    * users idle beyond that event-time horizon (EventTimeTimeout — the
    * sessionize pattern): their state is dropped after one final stage
    * emission, and a user who returns later restarts from stage 0. That
    * CHANGES the metric's definition (a funnel with amnesia), which is
    * why it is a caller decision, never a default.
    */
  def funnelStream(spark: SparkSession, events: Dataset[Event],
                   retention: Option[String] = None): Dataset[FunnelRow] = {
    import spark.implicits._
    val unseen = Long.MaxValue
    val retentionMs = retention.map(retentionHorizonMs)
    val src = retention.fold(events)(events.withWatermark("ts", _))
    val timeoutConf = if (retention.isDefined) GroupStateTimeout.EventTimeTimeout
                      else GroupStateTimeout.NoTimeout
    def stageOf(s: FunnelState): Int =
      // q83's strict-ordering chain over first-occurrence times
      if (s.tSignup == unseen) 0
      else if (s.tView == unseen || s.tView <= s.tSignup) 1
      else if (s.tClick == unseen || s.tClick <= s.tView) 2
      else if (s.tPurchase == unseen || s.tPurchase <= s.tClick) 3
      else 4
    src
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelRow](timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // idle beyond the horizon: final stage emission, then forget
            val s = state.get
            state.remove()
            FunnelRow(userId, stageOf(s))
          } else {
            var s = state.getOption.getOrElse(
              FunnelState(unseen, unseen, unseen, unseen, Long.MinValue))
            rows.foreach { e =>
              // exact event-time micros (getTime alone truncates to ms and
              // could flip a <=-comparison between events in the same ms)
              val t = math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
              s = s.copy(lastSeen = math.max(s.lastSeen, e.ts.getTime))
              e.event_type match {
                case "signup"   => s = s.copy(tSignup = math.min(s.tSignup, t))
                case "view"     => s = s.copy(tView = math.min(s.tView, t))
                case "click"    => s = s.copy(tClick = math.min(s.tClick, t))
                case "purchase" => s = s.copy(tPurchase = math.min(s.tPurchase, t))
                case _          => ()
              }
            }
            state.update(s)
            // arm the timeout off the user's latest event time EVER SEEN
            // (state.lastSeen, a monotone max across batches) — a
            // late-but-admissible straggler batch must not SHRINK the
            // horizon to straggler-ts + retention and evict a still-active
            // user early. Not the bare watermark either: during the first
            // micro-batch the watermark is still 0, and 0 + retention is in
            // 1970 — the very next batch would evict every batch-1 user
            // "immediately". max() with the watermark keeps the timestamp
            // legal for barely-admitted late events (setTimeoutTimestamp
            // requires a value > watermark).
            retentionMs.foreach(ms =>
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs(), s.lastSeen) + ms))
            FunnelRow(userId, stageOf(s))
          }
      }
  }

  final case class IslandEvent(tsUs: Long, eventId: Long, eventType: String)
  final case class IslandRun(eventType: String, n: Long, startUs: Long, endUs: Long)
  final case class IslandCompact(nFinal: Long, carry: Option[IslandRun],
                                 events: List[IslandEvent], cutUs: Long)
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
    * refinement contract).
    *
    * State is BOUNDED by the retention watermark, not the stream length:
    * events are only ever ADDED to a user's sorted history, so a run can
    * be split or extended by late data but two existing runs can never
    * merge (the separating events never go away) — island count per user
    * is monotone non-decreasing and no emission is ever retracted. A run
    * is immutable ("final") once the NEXT run's first event is older than
    * the watermark: any still-admissible event (ts ≥ watermark) sorts
    * after that successor's start and so can no longer touch it. Each
    * batch finalizes the maximal such prefix, emits those islands one
    * last time, and drops their events from state; what remains is
    *
    *   - `nFinal`   — how many islands are already final (numbering base);
    *   - `carry`    — O(1) summary (type, n, start, end) of the oldest
    *     NON-final run's sub-watermark portion, still extendable;
    *   - `events`   — only events newer than the cutoff, i.e. at most
    *     `retention` worth of stream per user — the bound.
    *
    * An EventTimeTimeout at watermark + retention compacts users that go
    * idle (their kept events finalize into `carry` and are released), so
    * a dead user's state settles at O(1) — the funnelStream tail, not the
    * full history. Events arriving later than `retention` are dropped
    * (the standard watermark trade; pick the horizon to match the
    * source's real out-of-orderness). `retention` is deliberately
    * REQUIRED — it bounds state by dropping too-late events, a semantic
    * trade the caller must own, never a silent default.
    */
  def islandsStream(spark: SparkSession, events: Dataset[Event],
                    retention: String): Dataset[IslandRow] = {
    import spark.implicits._
    val retentionMs = retentionHorizonMs(retention)
    events
      .withWatermark("ts", retention)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[IslandCompact, IslandRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[IslandCompact]) =>
          val st = state.getOption.getOrElse(IslandCompact(0L, None, Nil, Long.MinValue))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val cutoffUs = math.max(st.cutUs, wmUs)
          // guard against any late row the engine let through: an event
          // older than the previous cutoff would re-order history that
          // finalized islands already depend on
          val add = rows.map(e =>
            IslandEvent(eventMicros(e.ts), e.event_id, e.event_type))
            .filter(_.tsUs >= st.cutUs).toList
          val evs = (st.events ++ add).sortBy(e => (e.tsUs, e.eventId)).toVector
          // fold the sorted kept history into runs — the imperative mirror
          // of the batch lag-change-flag + running-sum window; run 0 starts
          // as the carry summary and extends when the types line up (every
          // kept event is >= the carry's end by construction). firstIdx
          // tracks each run's first event index into evs (-1 = pure carry).
          val runs = scala.collection.mutable.ArrayBuffer.empty[IslandRun]
          val firstIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
          st.carry.foreach { c => runs += c; firstIdx += -1 }
          evs.zipWithIndex.foreach { case (e, i) =>
            runs.lastOption match {
              case Some(r) if r.eventType == e.eventType =>
                runs(runs.length - 1) =
                  r.copy(n = r.n + 1L, endUs = math.max(r.endUs, e.tsUs))
                if (firstIdx(runs.length - 1) < 0) firstIdx(runs.length - 1) = i
              case _ =>
                runs += IslandRun(e.eventType, 1L, e.tsUs, e.tsUs)
                firstIdx += i
            }
          }
          // maximal final prefix: run i is immutable iff run i+1 starts
          // below the cutoff (runs 0..m-1 are final; m is the first open)
          var m = 0
          while (m + 1 < runs.length && runs(m + 1).startUs < cutoffUs) m += 1
          val nFinal = st.nFinal + m
          // K: first kept index — everything before it leaves state. All
          // dropped events belong to runs 0..m (run m+1 starts >= cutoff),
          // and run m's dropped slice is contiguous from its firstIdx.
          val kIdx = {
            val i = evs.indexWhere(_.tsUs >= cutoffUs); if (i < 0) evs.length else i
          }
          val keptEvs = evs.drop(kIdx)
          // the first open run's sub-cutoff portion becomes the new carry
          val carry = (if (runs.isEmpty) None else Some(runs(m))).flatMap { r =>
            if (r.startUs >= cutoffUs) None
            else {
              val aM = firstIdx(m)
              val dropped = if (aM >= 0) math.max(0, kIdx - aM).toLong else 0L
              val oldCarryN = if (m == 0) st.carry.map(_.n).getOrElse(0L) else 0L
              val end =
                if (dropped > 0) evs(kIdx - 1).tsUs
                else st.carry.map(_.endUs).getOrElse(r.startUs) // pure carry (m == 0)
              Some(IslandRun(r.eventType, oldCarryN + dropped, r.startUs, end))
            }
          }
          state.update(IslandCompact(nFinal, carry, keptEvs.toList, cutoffUs))
          // arm off the newest kept EVENT (when the watermark passes it, all
          // kept events are finalizable) — not the bare watermark, which is
          // 0 during the first micro-batch and would fire a useless (if
          // harmless) compaction immediately
          if (keptEvs.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(),
                keptEvs.last.tsUs / 1000L) + retentionMs)
          val total = st.nFinal + runs.length.toLong
          runs.iterator.zipWithIndex.map { case (r, i) =>
            IslandRow(userId, st.nFinal + i + 1L, r.eventType, r.n,
              microsTs(r.startUs), microsTs(r.endUs), total)
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

  final case class EwmaState(n: Long, e: Long)
  final case class EwmaRow(user_id: Long, n_events: Long, ewma_q: Long)

  /** Per-user integer EWMA as explicit keyed state — the Structured
    * Streaming twin of queries.Series.q174Ewma (α = 1/8 recurrence over
    * xq = ⌊value·2²⁰⌋, nonnegative inputs). State per user is two longs
    * — O(users), not O(events) — which is the whole point of the
    * streaming form: the batch query holds each user's full history in
    * one task, the stream folds it away as it arrives.
    *
    * Order contract (the admission-stream device): WITHIN a micro-batch
    * events sort by exact (micros, event_id) before folding; ACROSS
    * micro-batches the source must deliver ts-ordered batches (replay in
    * event-time order — equal-ts events must share a batch). SeriesSpec
    * proves MemoryStream replay == the batch q174 answer.
    */
  def ewmaStream(spark: SparkSession, events: Dataset[Event]): Dataset[EwmaRow] = {
    import spark.implicits._
    events
      .filter(_.value >= 0)
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaRow](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[EwmaState]) =>
          var s = state.getOption.getOrElse(EwmaState(0L, 0L))
          rows.toSeq
            .sortBy(e => (eventMicros(e.ts), e.event_id))
            .foreach { e =>
              val xq = math.floor(e.value * 1048576.0).toLong
              s = EwmaState(s.n + 1,
                if (s.n == 0) xq else (xq + 7 * s.e) >> 3)
            }
          state.update(s)
          EwmaRow(userId, s.n, s.e)
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
    * schema (Long nanos under nanosAsLong, or TIMESTAMP_NTZ for naive-µs
    * fixtures), then apply the same ts normalization the batch
    * Tables.events performs so `withWatermark("ts", ...)` always sees a
    * plain TIMESTAMP.
    */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val rawSchema = spark.read.parquet(path).schema
    // FileStreamSource wants a directory basePath; glob-filter to the
    // events file within the fixture dir.
    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    graft.Tables.normalizeTs(stream)
  }
}
