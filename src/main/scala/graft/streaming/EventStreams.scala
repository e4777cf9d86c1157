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
