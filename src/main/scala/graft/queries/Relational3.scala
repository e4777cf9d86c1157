package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Third tranche: set operators, cube, exact median, ordered string
  * aggregation, and moment statistics. The float-heavy ones (median, corr,
  * stddev) are formulated from decimal-exact component sums with the SAME
  * final double formula on both engines, because the built-in streaming
  * implementations (Welford / co-moment merges) are partition-order
  * dependent and engine-specific.
  */
object Relational3 {


  /** INTERSECT: customers who placed both an 'F' and an 'O' order. */
  def q46Intersect(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
  }

  /** EXCEPT: customers with 'F' orders but no 'P' orders. */
  def q47Except(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
  }

  /** Exact per-group median via positional selection — avg of the two
    * middle elements, deterministic on both engines.
    */
  def q48Median(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
      // explicit floor on both engines: Spark int division yields double,
      // DuckDB CAST would round-to-nearest — both would silently pick the
      // wrong middle rows for odd group sizes
      .filter(col("rn") === floor((col("n") + 1) / 2.0) ||
              col("rn") === floor((col("n") + 2) / 2.0))
      .groupBy("o_orderpriority")
      .agg((sum("o_totalprice") / count(lit(1))).as("median_price"))
  }

  /** Ordered string aggregation: distinct statuses per priority, sorted. */
  def q49StringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
        .as("statuses"))

  /** Moment statistics from decimal-exact component sums: sample stddev and
    * Pearson correlation per return flag.
    */
  def q50Stats(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity")
    val p = col("l_extendedprice")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(q, 2).as("sq"), dsum(p, 2).as("sp"),
        dsum(q * q, 4).as("sqq"), dsum(p * p, 4).as("spp"),
        dsum(q * p, 4).as("sqp"))
      .select(
        col("l_returnflag"), col("n"),
        // round(12): DuckDB's expression engine may contract x*y - z*w into
        // an FMA, which rounds once where the JVM rounds twice — a 1-ulp
        // divergence observed at sf0.001. 12 decimals is far above ulp and
        // far below any data signal.
        round(sqrt((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1)), 12)
          .as("stddev_qty"),
        round((col("n") * col("sqp") - col("sq") * col("sp")) /
          (sqrt(col("n") * col("sqq") - col("sq") * col("sq")) *
           sqrt(col("n") * col("spp") - col("sp") * col("sp"))), 12)
          .as("corr_qty_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_intersect"  -> (q46Intersect _),
    "q47_except"     -> (q47Except _),
    "q48_median"     -> (q48Median _),
    "q49_string_agg" -> (q49StringAgg _),
    "q50_stats"      -> (q50Stats _))

  val oracles: Map[String, String] = Map(
    "q46_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "q47_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin,
    "q48_median" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  SUM(o_totalprice) / COUNT(*) AS median_price
        |FROM ranked
        |WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
        |   OR rn = CAST(FLOOR((n + 2) / 2.0) AS BIGINT)
        |GROUP BY o_orderpriority""".stripMargin,
    "q49_string_agg" ->
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q50_stats" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sq,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sp,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sqq,
        |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS spp,
        |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sqp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND(sqrt((sqq - sq * sq / n) / (n - 1)), 12) AS stddev_qty,
        |  ROUND((n * sqp - sq * sp) /
        |    (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 12) AS corr_qty_price
        |FROM c""".stripMargin)
}
