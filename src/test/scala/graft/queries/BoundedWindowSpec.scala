package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** Pins the boundedness of every GLOBAL window in the declared surface
  * (round-10 verdict ask #7): `WindowExec` with an empty partition spec
  * funnels its whole input through one task — fine over dim-sized,
  * top-k, and calendar-axis frames (surrogate keys, candidate reranks,
  * chunk offsets, weekly curves), a cliff over data. Spark warns
  * (`No Partition Defined`) on every such window, bounded or not, so the
  * warning alone cannot distinguish a deliberate bounded window from a
  * scale bug; this spec can, by the criterion that actually matters:
  * SF-INDEPENDENCE. It sweeps every declared query at sf0.001, finds
  * each partition-free WindowExec and its processed row count, then
  * re-runs the window-bearing queries at sf0.01 (10x the data) and
  * requires every global window's row count to stay flat (plus an
  * absolute ceiling). A data-sized frame grows ~10x and fails; a
  * bounded frame (dims, k, weeks-of-fixture-span) does not move.
  *
  * WindowExec itself exposes only spillSize, so the row count reads from
  * the first descendant carrying one (the single-partition shuffle's
  * records-written, usually) — every node between (Sort, Project) is
  * 1:1, so the count is the window's input.
  */
class BoundedWindowSpec extends SparkSpecBase {

  private val AbsoluteCap = 5000L // rows through one task at sf0.01 — generous
  private val GrowthSlack = 60L   // small-count noise (0-row windows at sf0.001)

  private def expand(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case r: ReusedExchangeExec => expand(r.child)
      case other => Seq(other)
    }
    here ++ p.children.flatMap(expand) ++ p.subqueries.flatMap(expand)
  }

  /** Row counts of every partition-free window in `name`'s executed plan
    * at `dir`, in deterministic preorder.
    */
  private def globalWindowRows(name: String, dir: String): Seq[Long] = {
    spark.sharedState.cacheManager.clearCache()
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // full evaluation: count() could prune the window away
    def inputRows(p: SparkPlan): Long =
      expand(p).iterator.flatMap { n =>
        n.metrics.get("numOutputRows").map(_.value)
          .orElse(n.metrics.get("shuffleRecordsWritten").map(_.value))
      }.nextOption().getOrElse(-1L)
    expand(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => inputRows(w.child)
    }
  }

  test("every global (partition-free) window in the declared surface is sf-independent") {
    val atSmall: Seq[(String, Seq[Long])] = SparkEntry.queries.keys.toSeq.sorted
      .map(name => name -> globalWindowRows(name, Sf0001))
      .filter(_._2.nonEmpty)
    info(s"queries with global windows: ${atSmall.size} " +
      s"(${atSmall.map(_._2.size).sum} windows)")
    atSmall.foreach { case (n, rs) => info(f"$n%-28s ${rs.mkString(",")}") }

    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    atSmall.foreach { case (name, small) =>
      val big = globalWindowRows(name, Sf001)
      if (big.size != small.size)
        offenders += s"$name: window count changed across SFs (${small.size} -> ${big.size})"
      else big.zip(small).zipWithIndex.foreach { case ((b, a), i) =>
        if (b > AbsoluteCap)
          offenders += s"$name window#$i: $b rows through one task at sf0.01 (> $AbsoluteCap)"
        else if (b > 2 * a + GrowthSlack)
          offenders += s"$name window#$i: grew $a -> $b across a 10x SF step (data-sized, not bounded)"
      }
    }
    assert(offenders.isEmpty,
      s"unbounded global windows:\n${offenders.mkString("\n")}")
  }
}
