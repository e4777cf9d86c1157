package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOfJoin

/** Second tranche of relational operator coverage: as-of join, rollup,
  * analytic window frames, semi/anti joins. (Beyond the reference's own
  * surface — SURVEY.md §2.9 notes it has none of these — but table stakes
  * for a complete engine; each carries a DuckDB oracle.)
  */
object Relational2 {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int) =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, scale))).cast("double")

  /** As-of join inside the event stream: every non-purchase event picks up
    * the same user's most recent purchase at-or-before its time. One
    * shuffle + sort (union-and-carry-forward), never a range probe.
    */
  def q33AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val probes = ev.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    AsOfJoin(probes, purchases, keyCol = "user_id",
        leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("user_id"),
        col("asof_purchase_id").as("purchase_id"),
        col("asof_purchase_value").as("purchase_value"))
  }

  /** Rollup: subtotals per (status, priority), per status, and grand total. */
  def q34Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total"))

  /** Analytic window frames over each customer's order timeline: running
    * total (decimal-exact, so frame-accumulation order cannot drift vs the
    * oracle), previous order price, 3-order moving average.
    */
  def q35WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val dec = col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val running = w.rowsBetween(Window.unboundedPreceding, 0)
    val moving = w.rowsBetween(-2, 0)
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      sum(dec).over(running).cast("double").as("running_total"),
      lag("o_totalprice", 1).over(w).as("prev_price"),
      (sum(dec).over(moving).cast("double") / count(lit(1)).over(moving)).as("moving_avg3"))
  }

  /** Left-semi join (EXISTS): customers with at least one 300k+ order. */
  def q36SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0)
    Tables.customer(s, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Left-anti join (NOT EXISTS): customers with no order after 2000-06-01. */
  def q37AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_asof_join"        -> (q33AsofJoin _),
    "q34_rollup"           -> (q34Rollup _),
    "q35_window_analytics" -> (q35WindowAnalytics _),
    "q36_semi_join"        -> (q36SemiJoin _),
    "q37_anti_join"        -> (q37AntiJoin _))

  val oracles: Map[String, String] = Map(
    "q33_asof_join" ->
      """SELECT l.event_id, l.user_id,
        |  r.event_id AS purchase_id, r.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin,
    "q34_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    "q35_window_analytics" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_run AS DOUBLE)
        |    AS running_total,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_mov AS DOUBLE)
        |    / COUNT(*) OVER w_mov AS moving_avg3
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q36_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |GROUP BY c_mktsegment""".stripMargin,
    "q37_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-06-01')
        |GROUP BY c_mktsegment""".stripMargin)
}
