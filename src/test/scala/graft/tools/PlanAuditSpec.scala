package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The BNLJ build-side fence (round-14 verdict ask #4): the audit must
  * PASS the verified-benign class (1-row-aggregate crossJoins, tiny
  * VALUES frames) and FAIL a real broadcast nested-loop join — so "the
  * bnlj rows are fine" is asserted by code on the measured broadcast
  * output, not adjudicated from the plan string.
  */
class PlanAuditSpec extends SparkSpecBase {
  import spark.implicits._

  test("benign class passes: 1-row-aggregate crossJoin under the cap") {
    val li = graft.Tables.lineitem(spark, Sf0001)
    val tot = li.agg(sum("l_quantity").as("tot"))
    val df = li.crossJoin(broadcast(tot))
      .select((col("l_quantity") / col("tot")).as("share"))
    val a = PlanAudit.audit(df)
    assert(a.bnljBuildRows.nonEmpty, "expected the crossJoin to plan as BNLJ")
    assert(a.bnljBuildRows.forall(r => r >= 0 && r <= PlanAudit.MaxBnljBuildRows),
      s"1-row aggregate build side must be measured under the cap: $a")
    assert(a.cartesian == 0)
    PlanAudit.requireClean("benign", a) // must not throw
  }

  test("a real nested-loop join fails the fence loudly") {
    // 50 rows: above the 32-row cap (the largest measured INTENTIONAL
    // class — the brute-force ANN query batches)
    val a = Seq.tabulate(50)(i => (i.toLong, i * 2.0)).toDF("id", "x")
    val b = Seq.tabulate(50)(i => (i.toLong, i * 3.0)).toDF("id2", "y")
    // non-equi condition forces nested-loop; explicit broadcast makes it
    // a BroadcastNestedLoopJoin with a 50-row build side
    val df = a.join(broadcast(b), col("x") < col("y"))
      .agg(count(lit(1)).as("n"))
    val audit = PlanAudit.audit(df)
    assert(audit.bnljBuildRows.exists(_ > PlanAudit.MaxBnljBuildRows),
      s"expected a >cap build side, got $audit")
    val e = intercept[IllegalArgumentException] {
      PlanAudit.requireClean("real_bnl", audit)
    }
    assert(e.getMessage.contains("build side produced"))
  }

  test("cartesian products fail the fence") {
    val a = Seq.tabulate(10)(i => i.toLong).toDF("id")
    val b = Seq.tabulate(10)(i => i.toLong).toDF("id2")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // no broadcast → the join planner's last resort is CartesianProduct
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = a.crossJoin(b).agg(count(lit(1)).as("n"))
      val audit = PlanAudit.audit(df)
      assert(audit.cartesian > 0, s"expected a CartesianProduct, got $audit")
      intercept[IllegalArgumentException] {
        PlanAudit.requireClean("cartesian", audit)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
