package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.queries.Signals

class MisraGriesSpec extends SparkSpecBase {
  import spark.implicits._

  test("summary: superset of heavy items, estimates never exceed truth") {
    // planted Zipf-ish stream: 'a'x500, 'b'x200, 'c'x50, 100 singletons
    val toks = Seq.fill(500)("a") ++ Seq.fill(200)("b") ++ Seq.fill(50)("c") ++
      (1 to 100).map(i => s"noise$i")
    val n = toks.length // 850
    val df = scala.util.Random.shuffle(toks).toDF("t").repartition(7)
    val got = df.agg(MisraGries.sketch(col("t"), 16).as("mg"))
      .select(explode(col("mg")))
      .select(col("col.term"), col("col.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // any item with true count > n/(capacity+1) = 50 must survive
    assert(got.contains("a") && got.contains("b"))
    // estimates are lower bounds on truth
    got.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t: est $est > true ${truth(t)}")
    }
    assert(got.size <= 16)
  }

  test("q116 equals the exact groupBy answer and is partition-count invariant") {
    val docs = graft.Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
    val terms = docs.select(explode(TextFunctions.tokens(col("text"))).as("term"))
    val n = terms.count()
    val exact = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 2000L >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(exact.nonEmpty, "fixture should carry at least one heavy token")
    val got = Signals.q116HeavyTokens(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got == exact)
    val repart = Signals.heavyTokens(docs.repartition(13), 8192, 2000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(repart == exact)
  }

  test("mergeSummaries keeps the mergeable-summaries bounds under repeated folds") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val cap = 4 + rnd.nextInt(12)
      // chunked stream over a small vocabulary with a heavy head
      val chunks = (1 to 3 + rnd.nextInt(4)).map { _ =>
        (1 to 50 + rnd.nextInt(200)).map { _ =>
          val r = rnd.nextInt(100)
          if (r < 40) "hot" else if (r < 60) "warm" else s"t${rnd.nextInt(30)}"
        }
      }
      val truth = chunks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = chunks.map(_.size).sum.toLong
      // exact per-chunk counts are valid MG summaries; fold them through
      // the trim and check the merged invariants
      val folded = chunks.map(c =>
          c.groupBy(identity).view.mapValues(_.size.toLong).toSeq)
        .foldLeft(Seq.empty[(String, Long)])(
          (st, ch) => MisraGries.mergeSummaries(st, ch, cap))
      val m = folded.toMap
      assert(m.size <= cap)
      m.foreach { case (t, est) =>
        assert(est <= truth(t), s"$t overestimated: $est > ${truth(t)}") }
      truth.foreach { case (t, c) =>
        if (!m.contains(t))
          assert(c * (cap + 1) <= n,
            s"$t (count $c) missing from a cap-$cap summary over n=$n") }
    }
  }

  test("capacity below the certification bar is refused, empty input yields empty") {
    intercept[IllegalArgumentException] {
      Signals.heavyTokens(
        graft.Tables.documents(spark, Sf0001), capacity = 100, denom = 2000L)
    }
    val empty = graft.Tables.documents(spark, Sf0001)
      .filter(col("text").isNull && col("text").isNotNull)
    assert(Signals.heavyTokens(empty, 8192, 2000L).count() == 0)
  }

  test("q116 plan: bounded aggregate prescreen, broadcast recount, no full-vocab shuffle of non-candidates") {
    val plan = Signals.q116HeavyTokens(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"recount must prescreen through a broadcast join:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }
}
