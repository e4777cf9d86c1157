package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.queries.{Relational, Scaled}

class BoundedTopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted groups: best-first order, heap eviction, asc/desc mix") {
    // group a: 5 rows, keep top-3 by (score desc, id asc); the two score=2
    // rows force the tiebreak at the cut. group b: fewer rows than k.
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 2.0), ("a", 3L, 2.0), ("a", 4L, 1.0),
      ("a", 5L, 9.0),
      ("b", 6L, 3.0)
    ).toDF("g", "id", "score")
    val got = df.repartition(4).groupBy("g")
      .agg(BoundedTopK.topK(struct(col("score"), col("id")), 3,
        Seq(true, false)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col.id"), col("col.score"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("a", 1, 5L, 9.0), ("a", 2, 1L, 5.0), ("a", 3, 2L, 2.0),
      ("b", 1, 6L, 3.0)))
  }

  test("q115 equals q16 row-for-row and is partition-count invariant") {
    val win = Relational.q16TopkPerGroup(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    val heap = Scaled.q115TopkHeap(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    assert(heap == win)
    // same result when the input arrives in many small partitions (the
    // map-side partial-merge path must be exercised and exact)
    val repart = graft.Tables.orders(spark, Sf0001).repartition(13)
      .groupBy("o_orderpriority")
      .agg(BoundedTopK.topK(struct(col("o_totalprice"), col("o_orderkey")), 3,
        Seq(true, false)).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("int").as("rk"),
        col("col.o_orderkey"), col("col.o_totalprice"))
      .collect().map(_.toSeq).toSet
    assert(repart == win)
  }

  test("q119 ANN heap equals the window-based q27 row-for-row, window-free plan") {
    val emb = graft.Tables.embeddings(spark, Sf0001)
    val win = graft.operators.Similarity.bruteForceTopK(emb, 10, 8)
      .collect().map(_.toSeq).toSet
    val heapDf = graft.operators.Similarity.bruteForceTopKHeap(emb, 10, 8)
    assert(heapDf.collect().map(_.toSeq).toSet == win)
    val plan = heapDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"heap twin must not plan a window:\n$plan")
  }

  test("q115 plan: bounded aggregate, no rank window, partial merge map-side") {
    val plan = Scaled.q115TopkHeap(spark, Sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scale twin must not plan a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan:\n$plan")
    assert(plan.contains("partial_"), s"expected map-side partial aggregation:\n$plan")
  }
}
