package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequential time-series recurrences — the family window frames can't
  * express (q35 covers frame aggregates; an EWMA value depends on the
  * PREVIOUS OUTPUT, not a frame of inputs). Engine parity comes from the
  * integer fixed-point device (operators.Graph scaladoc): quantize once
  * by an exact power-of-two scale, then keep the whole recurrence in
  * BIGINT arithmetic both engines replay bit-for-bit.
  */
object Series {

  /** q174: per-user exponentially-weighted moving average over the event
    * stream, α = 1/8 — the smoothed-load signal behind per-entity rate
    * limiting and drift monitors. Contract (nonnegative inputs pinned by
    * the filter, mirrored in the oracle):
    *
    *   xq_i = floor(value_i · 2²⁰)                 (exact: 2²⁰ scaling is
    *                                                lossless in binary FP)
    *   e_1  = xq_1
    *   e_i  = (xq_i + 7·e_{i-1}) >> 3              (= DIV 8 on nonneg)
    *
    * Events order by (ts, event_id) — event_id is unique, so the
    * trajectory is total-order deterministic. The oracle replays the
    * recurrence as a recursive CTE keyed on the per-user row number.
    *
    * Scale shape: ONE shuffle (groupBy user) then a per-group
    * sort+fold via array_sort ∘ aggregate — higher-order functions, not
    * UDFs. The per-user event list is held in one task, the
    * sessionization contract (EventStreams): per-entity history is
    * bounded by construction; for unbounded keys use the streaming
    * stateful form instead. aggregate() is a CodegenFallback expression
    * — acceptable here because the fold is O(events) integer ops, far
    * off the scan-heavy hot path.
    */
  def q174Ewma(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull && col("value") >= 0)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          floor(col("value") * lit(1048576.0)).cast("long").as("xq")).as("rec"))
    def f(c: Column, n: String): Column = c.getField(n)
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        aggregate(
          array_sort(collect_list(col("rec"))),
          struct(lit(0L).as("i"), lit(0L).as("e")),
          (acc, x) => struct(
            (f(acc, "i") + 1).as("i"),
            when(f(acc, "i") === 0, f(x, "xq"))
              .otherwise(shiftright(f(x, "xq") + lit(7L) * f(acc, "e"), 3))
              .as("e")))
          .getField("e").as("ewma_q"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q174_ewma" -> (q174Ewma _))

  val oracles: Map[String, String] = Map(
    "q174_ewma" ->
      """WITH RECURSIVE x AS (
        |  SELECT user_id, CAST(floor(value * 1048576.0) AS BIGINT) AS xq,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL AND value >= 0),
        |r(user_id, rn, e) AS (
        |  SELECT user_id, rn, xq FROM x WHERE rn = 1
        |  UNION ALL
        |  SELECT x.user_id, x.rn, (x.xq + 7 * r.e) // 8
        |  FROM r JOIN x ON x.user_id = r.user_id AND x.rn = r.rn + 1),
        |n AS (SELECT user_id, MAX(rn) AS n_events FROM x GROUP BY user_id)
        |SELECT n.user_id, n.n_events, r.e AS ewma_q
        |FROM n JOIN r ON r.user_id = n.user_id AND r.rn = n.n_events
        |ORDER BY n.user_id""".stripMargin)
}
