package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface breadth V — the remaining classic TPC-H shapes expressible
  * on the fixture's seven-table subset (no partsupp, no
  * commit/receipt-date columns, no p_container — Q2/Q9/Q11/Q16/Q20/Q21
  * are out of reach; Q19's container predicate adapts to size bands and
  * Q22's country code to `c_nationkey % 10`). Each is ONE ANSI text
  * executed verbatim by Catalyst here and by DuckDB as its own oracle —
  * the E3 contract (Relational2.SqlSurfaceText) extended to the
  * decorrelation-heavy tail of the benchmark:
  *
  *  - Q7  two-nation shipping volume (symmetric disjunctive join filter)
  *  - Q8  market share (conditional-over-total aggregate ratio)
  *  - Q13 customer order-count distribution (LEFT JOIN with an ON-clause
  *         filter feeding a second aggregation level)
  *  - Q17 small-quantity revenue (correlated scalar subquery on the
  *         probe's own join key)
  *  - Q19 disjunctive brand/size/quantity bands (OR-of-ANDs the planner
  *         must not collapse into a cross product)
  *  - Q22 dormant rich customers (NOT EXISTS anti-join + a scalar
  *         average subquery gate)
  *
  * Float discipline as everywhere on the SQL surface: sums through
  * DECIMAL(28,s) rendered double; the Q8 ratio and Q17/Q22 thresholds
  * divide/compare EXACT quantities (integral l_quantity sums, decimal
  * balance sums), so the doubles agree bit-for-bit across engines.
  */
object TpchMore {

  val TpchQ7Text: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
      |      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
      |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
      |                       AND TIMESTAMP '1997-12-31'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  val TpchQ8Text: String =
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN nation = 'NATION_3'
      |                THEN CAST(volume AS DECIMAL(28,6))
      |                ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume,
      |    n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA'
      |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
      |                        AND TIMESTAMP '1997-12-31'
      |    AND p_type = 'PROMO'
      |) all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  val TpchQ13Text: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  val TpchQ17Text: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
      |         / 7.0 AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
      |  AND l_quantity < (
      |    SELECT 0.2 * (CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  val TpchQ19Text: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |                     AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE
      |   (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity >= 5 AND l_quantity <= 15)
      |OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25
      |    AND l_quantity >= 10 AND l_quantity <= 20)
      |OR (p_brand = 'Brand#24' AND p_size BETWEEN 20 AND 40
      |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  val TpchQ22Text: String =
    """SELECT cntrycode, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode, c_acctbal
      |  FROM customer
      |  WHERE c_acctbal > (
      |      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
      |               / COUNT(*)
      |      FROM customer c2 WHERE c2.c_acctbal > 0.0)
      |    AND NOT EXISTS (
      |      SELECT 1 FROM orders
      |      WHERE o_custkey = c_custkey
      |        AND o_orderdate >= TIMESTAMP '2000-01-01')
      |) custsale
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  /** Q3 shipping priority, adapted: the fixture's orders table carries
    * o_orderpriority (no o_shippriority column), and the top-10 is
    * tie-broken on (o_orderdate, l_orderkey) so LIMIT is deterministic.
    * Timestamps in the OUTPUT ride the q179-certified timestamp hop.
    */
  val TpchQ3Text: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  /** Q15 top supplier: the revenue CTE stands in for the view, and the
    * WHERE total_revenue = (SELECT MAX(...)) equality compares doubles
    * both engines derived from the SAME exact decimal sum — bit-equal by
    * construction, so the filter cannot flake.
    */
  val TpchQ15Text: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
      |    AND l_shipdate < TIMESTAMP '1999-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  private def run(text: String)(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q212_tpch_q7"  -> run(TpchQ7Text) _,
    "q213_tpch_q8"  -> run(TpchQ8Text) _,
    "q214_tpch_q13" -> run(TpchQ13Text) _,
    "q215_tpch_q17" -> run(TpchQ17Text) _,
    "q216_tpch_q19" -> run(TpchQ19Text) _,
    "q217_tpch_q22" -> run(TpchQ22Text) _,
    "q226_tpch_q3"  -> run(TpchQ3Text) _,
    "q227_tpch_q15" -> run(TpchQ15Text) _)

  val oracles: Map[String, String] = Map(
    "q212_tpch_q7"  -> TpchQ7Text,
    "q213_tpch_q8"  -> TpchQ8Text,
    "q214_tpch_q13" -> TpchQ13Text,
    "q215_tpch_q17" -> TpchQ17Text,
    "q216_tpch_q19" -> TpchQ19Text,
    "q217_tpch_q22" -> TpchQ22Text,
    "q226_tpch_q3"  -> TpchQ3Text,
    "q227_tpch_q15" -> TpchQ15Text)
}
