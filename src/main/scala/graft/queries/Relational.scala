package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator inventory over the TPC-H-ish fixtures, one query
  * per operator family of SURVEY.md §2 (mapping per FIXTURES.md §B).
  *
  * Determinism contract with the DuckDB oracle (the driver hash-compares
  * values): floating-point SUMs are order-dependent in IEEE double, so every
  * aggregated double is first cast to DECIMAL (exact, order-independent sum)
  * and the final result cast back to double — both engines then produce
  * bit-identical values. Pure per-row double arithmetic (no reductions) is
  * already deterministic. Counts stay BIGINT on both sides (never SUM over
  * INTEGER in DuckDB — that widens to HUGEINT and breaks the schema match).
  */
object Relational {


  // ---------------------------------------------------------------- queries

  /** A1/A2/A4/A5: grouped multi-aggregate (TPC-H Q1 shape) — partial+final
    * hash aggregation, single shuffle on the two grouping keys.
    */
  def q01GroupbyAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
        (dsum(col("l_quantity"), 2) / count(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** P1/P4/P5 + A5: selective filter + global aggregate (TPC-H Q6 shape).
    * The shipdate/discount/quantity predicates all push down to the parquet
    * scan (verified via explain: PushedFilters).
    */
  def q02FilterAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(
        dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** J3-ish inner equi-join fact⋈fact + grouped agg: orders x lineitem. */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))

  /** J1: full-outer join with an intentionally partial right side (only
    * high-value orders), then null-aware aggregation — mirrors the
    * reference's outer 3-way suburb merge (main.py:176-179).
    */
  def q04OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 300000.0)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    Tables.customer(s, dir)
      .select("c_custkey", "c_mktsegment")
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "full_outer")
      .groupBy("c_mktsegment")
      .agg(
        count(col("o_orderkey")).as("n_big_orders"),
        count(lit(1)).as("n_rows"),
        dsum(coalesce(col("o_totalprice"), lit(0.0)), 2).as("big_total"))
  }

  /** J2/J3: five-table star join, dims broadcast (TPC-H Q5 shape). The three
    * dimension sides (customer, nation, region at 100 TB are still tiny
    * relative to facts) broadcast; only lineitem⋈orders shuffles.
    */
  def q05StarJoin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))

  /** P6/A3: conditional aggregation — COUNT over a CASE filter, exactly the
    * Spark rewrite of the reference's per-group BEV/PHEV counts
    * (main.py:72-73). COUNT (not SUM) keeps both engines at BIGINT.
    */
  def q06CondAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
        count(lit(1)).as("n_total"))

  /** A6/A7: exact distinct counting + distinct-values listing. */
  def q07Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"),
        count(lit(1)).as("n_rows"))

  /** F16/A8: min-max normalization to [0,100] per segment with the
    * constant-column→50 fallback (app.py:350-359,392-393). Implemented as
    * agg + equi-join back (scales: the 5-row agg broadcasts) rather than a
    * partition-wide window, which would funnel each segment through one task.
    */
  def q08MinmaxNorm(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val stats = c.groupBy("c_mktsegment")
      .agg(min("c_acctbal").as("mn"), max("c_acctbal").as("mx"))
    c.join(broadcast(stats), Seq("c_mktsegment"))
      .select(
        col("c_custkey"), col("c_mktsegment"),
        graft.functions.Cleaning.minMaxNorm(col("c_acctbal"), col("mn"), col("mx"))
          .as("acctbal_norm"))
  }

  /** R1: unpivot/melt wide numeric columns to long (the reference's NO2 melt,
    * main.py:121-127). Spark `unpivot` ≡ ANSI UNION ALL of per-column selects.
    */
  def q09Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
              col("p_retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("p_size"), col("p_retailprice")),
               "metric", "value")

  /** R2: pivot long→wide with an explicit value list (deterministic plan,
    * SURVEY §7.3.6) — the reference's NO2 year pivot (main.py:155-162).
    * COUNT-pivot cells for absent combos are NULL in Spark but 0 in a
    * CASE-count oracle; coalesce to 0 on our side to match.
    */
  def q10Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("cnt_f"),
        coalesce(col("O"), lit(0L)).as("cnt_o"),
        coalesce(col("P"), lit(0L)).as("cnt_p"))

  /** R3: vertical concat (unionByName) of two disjoint filtered subsets —
    * the reference's 2023+2022 fact concat (main.py:343).
    */
  def q11Union(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val recent = o.filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_totalprice"), lit("recent").as("bucket"))
    val bigOld = o.filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp") &&
                          col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_totalprice"), lit("big_old").as("bucket"))
    recent.unionByName(bigOld)
  }

  /** F1-F6: string kernel — trim, regexp_extract, literal translate, split +
    * first token, title-casing. All codegen'd `functions._`, no UDFs.
    */
  def q12StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        trim(col("p_name")).as("name_trim"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        translate(col("p_type"), "AEIOU", "").as("type_novowel"),
        // coalesce to '': a single-word p_name gives NULL from getItem(1)
        // but '' from the oracle's SPLIT_PART — align to the '' convention
        concat(
          upper(substring(coalesce(split(col("p_name"), " ").getItem(1), lit("")), 1, 1)),
          lower(substring(coalesce(split(col("p_name"), " ").getItem(1), lit("")), 2, 100)))
          .as("second_title"),
        length(col("p_name")).as("name_len"))

  /** F8/F9: date parts + truncation on the order timeline. */
  def q13Dates(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("total"))

  /** F10-F14: per-row arithmetic with null-safe division (`x/0 -> NULL ->
    * fill 0`, the reference's safe_ev_per_energy semantics, main.py:304-331)
    * plus clamp. Pure per-row IEEE ops — deterministic without decimal help.
    */
  def q14SafeArith(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("l_extendedprice") / nullif(col("l_quantity"), lit(0.0)), lit(0.0))
          .as("unit_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("charged"),
        least(greatest(col("l_discount") * 100.0, lit(1.0)), lit(9.0)).as("disc_clamped"),
        floor(col("l_quantity") / 10.0).cast("long").as("qty_bucket"))

  /** K1: dense surrogate keys via row_number over a deterministic total
    * order. Scale note: the global sort is applied AFTER a top-k limit, so
    * the single-partition window only ever sees k rows (SURVEY §2.7).
    */
  def q15SurrogateKeys(s: SparkSession, dir: String): DataFrame = {
    val top = Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
    top.withColumn("surrogate_id",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .select("surrogate_id", "o_orderkey", "o_totalprice")
  }

  /** O1/O2 + windows: per-group top-k by rank with deterministic tiebreak. */
  def q16TopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
  }

  /** A8/O1: global KPI aggregates + ratio (app.py:158-175 KPI tiles). */
  def q17Kpis(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("gross"),
        (count(when(col("o_orderstatus") === "F", 1)).cast("double") / count(lit(1)))
          .as("fulfilled_ratio"))

  // ---------------------------------------------------------------- oracle

  private val decSumQty   = "CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_groupby_agg"   -> (q01GroupbyAgg _),
    "q02_filter_agg"    -> (q02FilterAgg _),
    "q03_join_agg"      -> (q03JoinAgg _),
    "q04_outer_join"    -> (q04OuterJoin _),
    "q05_star_join"     -> (q05StarJoin _),
    "q06_cond_agg"      -> (q06CondAgg _),
    "q07_distinct"      -> (q07Distinct _),
    "q08_minmax_norm"   -> (q08MinmaxNorm _),
    "q09_unpivot"       -> (q09Unpivot _),
    "q10_pivot"         -> (q10Pivot _),
    "q11_union"         -> (q11Union _),
    "q12_string_funcs"  -> (q12StringFuncs _),
    "q13_dates"         -> (q13Dates _),
    "q14_safe_arith"    -> (q14SafeArith _),
    "q15_surrogate_keys" -> (q15SurrogateKeys _),
    "q16_topk_per_group" -> (q16TopkPerGroup _),
    "q17_kpis"          -> (q17Kpis _))

  val oracles: Map[String, String] = Map(
    "q01_groupby_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $decSumQty AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
         |  $decSumQty / COUNT(l_quantity) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_agg" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_join_agg" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin,
    "q04_outer_join" ->
      """SELECT c_mktsegment,
        |  COUNT(o_orderkey) AS n_big_orders,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(28,2))) AS DOUBLE) AS big_total
        |FROM customer
        |FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice
        |                 FROM orders WHERE o_totalprice > 300000.0) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q05_star_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q06_cond_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
        |  COUNT(*) AS n_total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q07_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
        |  COUNT(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q08_minmax_norm" ->
      """SELECT c.c_custkey, c.c_mktsegment,
        |  CASE WHEN s.mx = s.mn THEN 50.0
        |       ELSE (c.c_acctbal - s.mn) / (s.mx - s.mn) * 100.0 END AS acctbal_norm
        |FROM customer c
        |JOIN (SELECT c_mktsegment, MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx
        |      FROM customer GROUP BY c_mktsegment) s
        |  USING (c_mktsegment)""".stripMargin,
    "q09_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part""".stripMargin,
    "q10_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q11_union" ->
      """SELECT o_orderkey, o_totalprice, 'recent' AS bucket
        |FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'big_old' AS bucket
        |FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01' AND o_totalprice > 400000.0""".stripMargin,
    "q12_string_funcs" ->
      """SELECT p_partkey,
        |  TRIM(p_name) AS name_trim,
        |  SPLIT_PART(p_name, ' ', 1) AS first_word,
        |  REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
        |  REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(p_type,'A',''),'E',''),'I',''),'O',''),'U','') AS type_novowel,
        |  UPPER(SUBSTR(SPLIT_PART(p_name, ' ', 2), 1, 1)) ||
        |    LOWER(SUBSTR(SPLIT_PART(p_name, ' ', 2), 2, 100)) AS second_title,
        |  CAST(LENGTH(p_name) AS INTEGER) AS name_len
        |FROM part""".stripMargin,
    "q13_dates" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(QUARTER(o_orderdate) AS INTEGER) AS o_quarter,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q14_safe_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(l_extendedprice / NULLIF(l_quantity, 0.0), 0.0) AS unit_price,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged,
        |  LEAST(GREATEST(l_discount * 100.0, 1.0), 9.0) AS disc_clamped,
        |  CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS qty_bucket
        |FROM lineitem""".stripMargin,
    "q15_surrogate_keys" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER)
        |    AS surrogate_id,
        |  o_orderkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q16_topk_per_group" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        |  FROM orders) t
        |WHERE rk <= 3""".stripMargin,
    "q17_kpis" ->
      """SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS gross,
        |  CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE) / COUNT(*)
        |    AS fulfilled_ratio
        |FROM orders""".stripMargin)
}
