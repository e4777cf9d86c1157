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


  /** As-of join inside the event stream: every non-purchase event picks up
    * the same user's most recent purchase at-or-before its time. One
    * shuffle + sort (union-and-carry-forward), never a range probe.
    */
  def q33AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val probes = ev.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts")
    // Dedupe purchases to one row per (user, us-timestamp), keeping the max
    // event_id: ns->us truncation can create exact-time ties where each
    // engine's as-of pick among tied right rows is otherwise unspecified.
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("purchase_id"),
           max_by(col("value"), col("event_id")).as("purchase_value"))
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

  /** q117: cube with grouping_id — q34's rollup completes only the
    * prefix lattice; CUBE adds the (priority-only) stratum, and gid
    * (bit i set = column i aggregated away) tells a subtotal row from a
    * genuinely-NULL group value. One pass, Expand-based like rollup:
    * partial aggregation still applies, so the shuffle carries
    * strata × groups rows, not input rows.
    */
  def q117Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total"))

  /** Analytic window frames over each customer's order timeline: running
    * total (decimal-exact, so frame-accumulation order cannot drift vs the
    * oracle), previous order price, 3-order moving average.
    */
  def q35WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val dec = col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(28, 2))
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

  /** The SQL passthrough surface (SURVEY §2.9 E3) under the gate: ONE ANSI
    * SQL text executed by Catalyst here and by DuckDB as its own oracle —
    * parse/analyze/optimize exercised end-to-end, zero translation.
    */
  val SqlSurfaceText: String =
    """SELECT n_name,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderstatus = 'O'
      |GROUP BY n_name""".stripMargin

  def q40SqlSurface(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(SqlSurfaceText)
  }

  /** q146-q148 (round-9 verdict stretch ask): three more ANSI texts in
    * TPC-H shapes — Q1 (pricing summary), Q6 (forecast revenue change),
    * Q18 (large-volume customer with a HAVING subquery) — each ONE string
    * executed verbatim by Catalyst here and by DuckDB as its own oracle.
    * Float discipline as everywhere on the SQL surface: sums through
    * DECIMAL(28,s) then rendered double (order-independent), averages as
    * double-sum / count (identical double ops once the sums agree).
    */
  val TpchQ1Text: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val TpchQ6Text: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.04
      |  AND l_quantity < 24""".stripMargin

  val TpchQ18Text: String =
    """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) > 200.0)
      |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q14 (promo revenue share) adapted to the fixture's plain
    * `p_type` values ('PROMO', not 'PROMO BURNISHED ...') and shipdate
    * range. Same engine-parity contract as Q1/Q6: both conditional and
    * total revenue accumulate as DECIMAL(28,6) (order-invariant), the
    * percentage is one final double expression.
    */
  val TpchQ14Text: String =
    """SELECT (100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |    AS DECIMAL(28,6))) AS DOUBLE))
      |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS promo_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  /** TPC-H Q4 shape adapted to the fixture's columns (no
    * l_commitdate/l_receiptdate — "late" is a returned line shipped
    * after the order date): order-priority census over orders with a
    * correlated EXISTS. Exercises the decorrelation path (Catalyst
    * rewrites the EXISTS to a left-semi join) on both engines from ONE
    * shared text. Integer-only output — no float discipline needed.
    */
  val TpchQ4Text: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-07-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      |      AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q12 shape adapted to the fixture (l_returnflag standing in
    * for the absent l_shipmode): two-way conditional counts of high- vs
    * low-priority lines per flag. SUMs of 0/1 CASEs cast BIGINT so both
    * engines agree on the column type (DuckDB widens SUM(int) to
    * HUGEINT).
    */
  val TpchQ12Text: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q180: Pearson correlation matrix over lineitem's numeric measures —
    * the describe-stage statistic behind feature selection and drift
    * checks. Engine parity without banding: every MOMENT (Σx, Σx², Σxy)
    * accumulates through DECIMAL (order-invariant — the dsum discipline),
    * and the corr formula is a fixed tree of double ops rounded to 12
    * decimals — the n·Σxy − Σx·Σy numerator cancels catastrophically, so
    * engine-level FMA contraction shows up in the last ulp (observed at
    * sf0.1); ROUND(…, 12) absorbs it while keeping 12 significant-digit
    * fidelity, far beyond any feature-selection consumer's resolution. ONE pass over
    * the fact table computes all nine moments (no per-pair rescans); the
    * three correlations are scalar arithmetic on the 1-row frame.
    */
  val CorrMatrixText: String =
    """WITH m AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sq,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS se,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sd,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sqq,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS see,
      |    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,8))) AS DOUBLE) AS sdd,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sqe,
      |    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sqd,
      |    CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sed
      |  FROM lineitem)
      |SELECT
      |  ROUND(((n * sqe) - (sq * se))
      |    / (sqrt((n * sqq) - (sq * sq)) * sqrt((n * see) - (se * se))), 12)
      |    AS corr_qty_price,
      |  ROUND(((n * sqd) - (sq * sd))
      |    / (sqrt((n * sqq) - (sq * sq)) * sqrt((n * sdd) - (sd * sd))), 12)
      |    AS corr_qty_disc,
      |  ROUND(((n * sed) - (se * sd))
      |    / (sqrt((n * see) - (se * se)) * sqrt((n * sdd) - (sd * sd))), 12)
      |    AS corr_price_disc
      |FROM m""".stripMargin

  def q180CorrMatrix(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(CorrMatrixText)
  }

  /** TPC-H Q5 (local-supplier volume): the six-table join with the
    * customer-nation == supplier-nation correlation — the widest join
    * tree on the SQL surface; revenue decimal-summed, ties on n_name.
    */
  val TpchQ5Text: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))
      |    AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q10 (returned-item revenue): top-20 customers by revenue lost
    * to returns in a quarter. Deterministic top-k: ties on c_custkey.
    */
  val TpchQ10Text: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))
      |    AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** q201: analytic-function breadth on the shared-text surface — NTILE /
    * PERCENT_RANK / CUME_DIST over a total order (ties broken on the key,
    * so every engine computes identical ranks), then aggregated per
    * (priority, quartile) so the gate hashes a bounded frame.
    * PERCENT_RANK/CUME_DIST are the same double formulas on identical
    * integer ranks — no float divergence surface.
    */
  val WindowFuncsText: String =
    """WITH w AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile,
      |    PERCENT_RANK() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey) AS pr,
      |    CUME_DIST() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey) AS cd
      |  FROM orders)
      |SELECT o_orderpriority, quartile, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total,
      |  MIN(pr) AS min_pr, MAX(cd) AS max_cd
      |FROM w GROUP BY o_orderpriority, quartile
      |ORDER BY o_orderpriority, quartile""".stripMargin

  /** q202: GROUPING SETS — the lattice shape rollup/cube can't pick
    * freely (two independent single-column strata plus the grand total),
    * with GROUPING() disambiguating genuine NULLs from subtotal rows.
    */
  val GroupingSetsText: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
      |    AS INTEGER) AS gid,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  /** q208: correlated SCALAR subquery — parts priced above their own
    * brand's average (the decorrelation shape Catalyst rewrites to an
    * aggregate + join). The inner average follows the decimal-sum /
    * count discipline so both engines compare against identical doubles.
    */
  val ScalarSubqueryText: String =
    """SELECT p_brand, COUNT(*) AS n_above
      |FROM part p
      |WHERE p_retailprice > (
      |  SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(28,2))) AS DOUBLE)
      |           / COUNT(*)
      |  FROM part p2 WHERE p2.p_brand = p.p_brand)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** q209: INTERSECT / EXCEPT set operations under one text — big-order
    * customers vs the BUILDING segment, both directions plus the
    * intersection, reported as counts.
    */
  val SetOpsText: String =
    """WITH b AS (SELECT c_custkey AS k FROM customer
      |           WHERE c_mktsegment = 'BUILDING'),
      |o AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000.0)
      |SELECT 'building_and_big' AS op, COUNT(*) AS n
      |  FROM (SELECT k FROM b INTERSECT SELECT k FROM o) t
      |UNION ALL
      |SELECT 'building_not_big', COUNT(*)
      |  FROM (SELECT k FROM b EXCEPT SELECT k FROM o) t
      |UNION ALL
      |SELECT 'big_not_building', COUNT(*)
      |  FROM (SELECT k FROM o EXCEPT SELECT k FROM b) t
      |ORDER BY op""".stripMargin

  /** q210: RECURSIVE CTE on the Catalyst surface — the last SQL-surface
    * family whose oracle was previously DuckDB-only (the CC/BFS gates
    * q58/q77/q173 state recursive CTEs the Spark side answers with
    * iterative plans). One ANSI text, executed verbatim by both engines:
    * a per-customer order-chain walk — each recursion step joins the
    * working set to its unique successor row (rn + 1), so UNION ALL
    * growth is LINEAR in total orders. That linearity is load-bearing:
    * Spark 4.1 rejects UNION (distinct) recursion
    * ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]), and a graph-shaped UNION
    * ALL recursion would enumerate paths, not nodes. Depth is capped at
    * 8 steps (each customer's first 8 orders): every recursion step is
    * one sequential Catalyst job that RE-EXECUTES the seq subtree (Spark
    * does not materialize non-recursive CTEs the recursion references —
    * ~0.2 s/step at sf0.1), so depth is pure wall-clock while batch
    * width is free — the cap keeps the surface demonstration honest
    * without paying 25 sequential scans, and the /*+ BROADCAST(w) */ hint
    * (a plain comment to DuckDB, a join hint to Catalyst) broadcasts the
    * tiny working relation so each step skips the shuffle-sort pair;
    * running totals stay DECIMAL(28,2) inside the recursion — the
    * accumulation is exact, so the final double render is
    * order-independent and hash-stable.
    */
  val RecursiveCteText: String =
    """WITH RECURSIVE seq AS (
      |  SELECT o_custkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders WHERE o_custkey <= 750
      |),
      |walk(o_custkey, rn, running) AS (
      |  SELECT o_custkey, rn, CAST(o_totalprice AS DECIMAL(28,2))
      |  FROM seq WHERE rn = 1
      |  UNION ALL
      |  SELECT /*+ BROADCAST(w) */ s.o_custkey, s.rn,
      |    CAST(w.running + CAST(s.o_totalprice AS DECIMAL(28,2)) AS DECIMAL(28,2))
      |  FROM walk w JOIN seq s
      |    ON s.o_custkey = w.o_custkey AND s.rn = w.rn + 1
      |  WHERE w.rn < 8
      |)
      |SELECT o_custkey, CAST(MAX(rn) AS BIGINT) AS n_orders,
      |  CAST(MAX(running) AS DOUBLE) AS lifetime_spend
      |FROM walk GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  def q210RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(RecursiveCteText)
  }

  def q208ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(ScalarSubqueryText)
  }

  def q209SetOps(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(SetOpsText)
  }

  def q201WindowFuncs(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(WindowFuncsText)
  }

  def q202GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(GroupingSetsText)
  }

  def q198TpchQ5(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(TpchQ5Text)
  }

  def q199TpchQ10(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(TpchQ10Text)
  }

  def q175TpchQ4(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(TpchQ4Text)
  }

  def q176TpchQ12(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(TpchQ12Text)
  }

  def q146TpchQ1(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(TpchQ1Text)
  }

  def q168TpchQ14(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(TpchQ14Text)
  }

  def q147TpchQ6(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(TpchQ6Text)
  }

  def q148TpchQ18(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(TpchQ18Text)
  }

  /** TPC-H Q3 shape: selective join + grouped revenue + deterministic
    * top-10 (ties broken on the group key).
    */
  def q41ShippingPriority(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING" &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
              col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_asof_join"        -> (q33AsofJoin _),
    "q34_rollup"           -> (q34Rollup _),
    "q117_cube"            -> (q117Cube _),
    "q35_window_analytics" -> (q35WindowAnalytics _),
    "q36_semi_join"        -> (q36SemiJoin _),
    "q37_anti_join"        -> (q37AntiJoin _),
    "q40_sql_surface"      -> (q40SqlSurface _),
    "q41_shipping_priority" -> (q41ShippingPriority _),
    "q146_tpch_q1"         -> (q146TpchQ1 _),
    "q147_tpch_q6"         -> (q147TpchQ6 _),
    "q148_tpch_q18"        -> (q148TpchQ18 _),
    "q168_tpch_q14"        -> (q168TpchQ14 _),
    "q175_tpch_q4"         -> (q175TpchQ4 _),
    "q176_tpch_q12"        -> (q176TpchQ12 _),
    "q180_corr_matrix"     -> (q180CorrMatrix _),
    "q198_tpch_q5"         -> (q198TpchQ5 _),
    "q199_tpch_q10"        -> (q199TpchQ10 _),
    "q201_window_funcs"    -> (q201WindowFuncs _),
    "q202_grouping_sets"   -> (q202GroupingSets _),
    "q208_scalar_subquery" -> (q208ScalarSubquery _),
    "q209_set_ops"         -> (q209SetOps _),
    "q210_recursive_cte"   -> (q210RecursiveCte _))

  val oracles: Map[String, String] = Map(
    "q40_sql_surface" -> SqlSurfaceText,
    "q146_tpch_q1"    -> TpchQ1Text,
    "q147_tpch_q6"    -> TpchQ6Text,
    "q148_tpch_q18"   -> TpchQ18Text,
    "q168_tpch_q14"   -> TpchQ14Text,
    "q175_tpch_q4"    -> TpchQ4Text,
    "q176_tpch_q12"   -> TpchQ12Text,
    "q180_corr_matrix" -> CorrMatrixText,
    "q198_tpch_q5"     -> TpchQ5Text,
    "q199_tpch_q10"    -> TpchQ10Text,
    "q201_window_funcs" -> WindowFuncsText,
    "q202_grouping_sets" -> GroupingSetsText,
    "q208_scalar_subquery" -> ScalarSubqueryText,
    "q209_set_ops" -> SetOpsText,
    "q210_recursive_cte" -> RecursiveCteText,
    "q41_shipping_priority" ->
      """SELECT l_orderkey, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q33_asof_join" ->
      """SELECT l.event_id, l.user_id,
        |  r.purchase_id, r.purchase_value
        |FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, MAX(event_id) AS purchase_id,
        |    arg_max(value, event_id) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin,
    "q34_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    // GROUPING() bit order (first listed column = high bit) matches
    // Spark's grouping_id() convention
    "q117_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q35_window_analytics" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER w_run AS DOUBLE)
        |    AS running_total,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER w_mov AS DOUBLE)
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
