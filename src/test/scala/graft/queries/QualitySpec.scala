package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class QualitySpec extends SparkSpecBase {
  import spark.implicits._

  test("q93 reports zero orphans and zero null keys on the healthy fixture") {
    val rows = Quality.q93RefIntegrity(spark, Sf001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("lineitem->orders", "orders->customer",
      "customer->nation", "supplier->nation"))
    rows.foreach { case (edge, (n, nulls, orphans)) =>
      assert(n > 0, s"$edge total")
      assert(nulls == 0L && orphans == 0L, s"$edge must be clean, got $nulls/$orphans")
    }
  }

  test("planted orphans and null keys are counted exactly") {
    // reuse the operator's edge shape via a scratch dir with broken data
    val dir = "/tmp/graft_refint_fixture"
    val parents = Seq((1L, 1L), (2L, 1L)).toDF("o_orderkey", "o_custkey")
    val children = Seq(
      (10L, Some(1L)), (11L, Some(2L)), (12L, Some(2L)),
      (13L, Some(99L)), (14L, Some(98L)), // orphans
      (15L, None) // null key
    ).toDF("l_linenumber", "l_orderkey")
    parents.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    children.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // q93 audits all four edges; give the remaining tables a clean shape
    Seq((1L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "n")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val row = Quality.q93RefIntegrity(spark, dir)
      .filter(col("fk_edge") === "lineitem->orders").collect()(0)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((6L, 1L, 2L)))
  }

  test("q94 fences match the per-group window brute force") {
    val orders = graft.Tables.orders(spark, Sf001)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked = orders.select(
        col("o_orderpriority"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("o_orderpriority")).as("n"))
    val expect = ranked
      .filter(col("rn") === expr("(n + 3) DIV 4") ||
              col("rn") === expr("(3 * n + 3) DIV 4"))
      .groupBy("o_orderpriority")
      .agg(min(when(col("rn") === expr("(n + 3) DIV 4"), col("o_totalprice"))).as("q1"),
           min(when(col("rn") === expr("(3 * n + 3) DIV 4"), col("o_totalprice"))).as("q3"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val got = Quality.q94IqrOutliers(spark, Sf001)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (p, (q1, q3, outliers, n)) =>
      assert((q1, q3) == expect(p), s"$p quartiles")
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      val brute = orders.filter(col("o_orderpriority") === p &&
        (col("o_totalprice") < lo || col("o_totalprice") > hi)).count()
      assert(outliers == brute, s"$p outlier count")
      assert(n == orders.filter(col("o_orderpriority") === p).count())
    }
  }
}
