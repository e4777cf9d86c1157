package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The scale-safe stratified-selection contract: chunked two-level prefix
  * sums must equal the per-stratum window formulation EXACTLY, and the
  * plan must never sort a whole stratum in one task.
  */
class StratifiedSelectSpec extends SparkSpecBase {
  import spark.implicits._

  test("chunkedPrefix equals the per-stratum window formulation") {
    // strata of very different sizes, heavy primary-order ties (forcing
    // tie-break correctness across chunk boundaries), values > 0
    val rows = (0 until 500).map { i =>
      val stratum = if (i % 11 == 0) "tiny" else if (i % 3 == 0) "mid" else "big"
      (i.toLong, stratum, (i * 37 % 13).toDouble, (i % 5 + 1).toLong)
    }
    val df = rows.toDF("id", "s", "score", "v")
    for (desc <- Seq(true, false); nChunks <- Seq(2, 8, 64)) {
      val out = StratifiedSelect.chunkedPrefix(df, "s", "score", desc,
          Seq(col("id")), col("v"), nChunks)
        .select("id", "cum_before", "rn", "n_stratum").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val ord = if (desc) Seq(col("score").desc, col("id")) else Seq(col("score").asc, col("id"))
      val w = Window.partitionBy("s").orderBy(ord: _*)
      val expect = df
        .withColumn("cum_before", coalesce(
          sum("v").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_stratum", count(lit(1)).over(Window.partitionBy("s")))
        .select("id", "cum_before", "rn", "n_stratum").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(out == expect, s"desc=$desc nChunks=$nChunks")
    }
  }

  test("stratumRanks returns exactly the rows the full ranking puts at the target ranks") {
    val rows = (0 until 500).map { i =>
      val stratum = if (i % 11 == 0) "tiny" else if (i % 3 == 0) "mid" else "big"
      (i.toLong, stratum, (i * 37 % 13).toDouble)
    }
    val df = rows.toDF("id", "s", "score")
    // median pair + p40/p60 band — the q54/q79/q101 target family
    val targets: Long => Seq[Long] =
      n => Seq((n + 1) / 2, (n + 2) / 2, (2 * n + 4) / 5, (3 * n + 4) / 5)
    for (desc <- Seq(true, false); nChunks <- Seq(2, 8, 64)) {
      val got = StratifiedSelect.stratumRanks(df, "s", "score", desc,
          Seq(col("id")), targets, nChunks)
        .select("id", "rn", "n_stratum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ord = if (desc) Seq(col("score").desc, col("id")) else Seq(col("score").asc, col("id"))
      val w = Window.partitionBy("s").orderBy(ord: _*)
      val expect = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_stratum", count(lit(1)).over(Window.partitionBy("s")))
        .filter(col("rn") === expr("(n_stratum + 1) DIV 2") ||
          col("rn") === expr("(n_stratum + 2) DIV 2") ||
          col("rn") === expr("(2 * n_stratum + 4) DIV 5") ||
          col("rn") === expr("(3 * n_stratum + 4) DIV 5"))
        .select("id", "rn", "n_stratum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"desc=$desc nChunks=$nChunks")
    }
  }

  test("stratumRanks keeps a NULL-valued stratum's rows (round-11 advice)") {
    val df = ((1 to 20).map(i => (i.toLong, Option("a"), i.toDouble)) ++
      (21 to 29).map(i => (i.toLong, None: Option[String], i.toDouble)))
      .toDF("id", "s", "score")
    val got = StratifiedSelect.stratumRanks(df, "s", "score", desc = false,
        Seq(col("id")), n => Seq((n + 1) / 2), 4)
      .select("id", "rn", "n_stratum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // median of a=1..20 is rank 10 (id 10, n=20); of null=21..29 rank 5 (id 25, n=9)
    assert(got == Set((10L, 10L, 20L), (25L, 5L, 9L)))
  }

  test("stratumRanks ignores out-of-range targets and handles a single chunk") {
    val df = (1 to 10).map(i => (i.toLong, "only", i.toDouble)).toDF("id", "s", "score")
    val got = StratifiedSelect.stratumRanks(df, "s", "score", desc = false,
        Seq(col("id")), n => Seq(-3L, 0L, 1L, n, n + 5), 4)
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (10L, 10L)))
    val none = StratifiedSelect.stratumRanks(df, "s", "score", desc = false,
        Seq(col("id")), _ => Seq(99L), 4)
    assert(none.count() == 0 && none.columns.contains("n_stratum"))
  }

  test("chunkedPrefix rejects reserved column names") {
    val df = Seq((1L, "a", 1.0, 1L)).toDF("id", "s", "score", "rn")
    intercept[IllegalArgumentException] {
      StratifiedSelect.chunkedPrefix(df, "s", "score", desc = false,
        Seq(col("id")), col("id"), 4)
    }
  }

  /** Windows that partition by the stratum ALONE and run over raw data —
    * the single-task-per-stratum sort. Tiny offset windows (above an
    * Aggregate) are the design; a window whose subtree has no aggregate
    * is the cliff.
    */
  private def stratumSortCliffs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: logical.Window
          if !w.partitionSpec.exists(_.references.exists(_.name == "__pid")) &&
            w.child.collectFirst { case _: logical.Aggregate => () }.isEmpty => w
    }.size

  test("scaled twins plan no single-task-per-stratum sort; exact twins do") {
    val scaled = Seq(
      graft.queries.Scaled.q72TokenBudgetScaled(spark, Sf0001),
      graft.queries.Scaled.q73QuantileFilterScaled(spark, Sf0001),
      graft.queries.Scaled.q74SequencePackScaled(spark, Sf0001),
      graft.queries.Scaled.q79MedianScaled(spark, Sf0001),
      // q101's exact median/band ranks ride chunkedPrefix too (r8): the
      // former Window.partitionBy(o_orderpriority) was 5 single-task sorts
      graft.queries.Scaled.q101MedianBanded(spark, Sf0001))
    scaled.foreach(df => assert(stratumSortCliffs(df) == 0, df.columns.mkString(",")))
    // the global-ranking degeneration (constant stratum) must not smuggle
    // a whole-table single-task sort back in either
    assert(stratumSortCliffs(graft.queries.Scaled.q91EquidepthHist(spark, Sf0001)) == 0)
    // control: the exact formulations DO carry the stratum window over the
    // scan — proving the predicate detects what the twins eliminated
    val exact = Seq(
      graft.queries.Extensions.q61TokenBudget(spark, Sf0001),
      graft.queries.Curation.q66QuantileFilter(spark, Sf0001),
      graft.queries.Curation.q71SequencePack(spark, Sf0001),
      graft.queries.Relational3.q48Median(spark, Sf0001))
    exact.foreach(df => assert(stratumSortCliffs(df) > 0))
  }

  test("scaled twins equal their exact counterparts at both fixture sfs") {
    val twins: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame,
                    (org.apache.spark.sql.SparkSession, String) => DataFrame)] = Seq(
      ("q61/q72", graft.queries.Extensions.q61TokenBudget _,
        graft.queries.Scaled.q72TokenBudgetScaled _),
      ("q66/q73", graft.queries.Curation.q66QuantileFilter _,
        graft.queries.Scaled.q73QuantileFilterScaled _),
      ("q71/q74", graft.queries.Curation.q71SequencePack _,
        graft.queries.Scaled.q74SequencePackScaled _),
      ("q48/q79", graft.queries.Relational3.q48Median _,
        graft.queries.Scaled.q79MedianScaled _))
    for ((name, exact, scaled) <- twins; sf <- Seq(Sf0001, Sf001)) {
      val e = exact(spark, sf)
      val s = scaled(spark, sf)
      assert(e.dtypes.toSeq == s.dtypes.toSeq, s"$name schema at $sf")
      assert(e.collect().map(_.toSeq).toSet == s.collect().map(_.toSeq).toSet,
        s"$name rows at $sf")
    }
  }

  test("bucketed join (q75) equals q03 with no shuffle beneath the join") {
    val df = graft.queries.Scaled.q75BucketedJoin(spark, Sf0001)
    val rows = df.collect().map(_.toSeq).toSet
    val q03 = graft.queries.Relational.q03JoinAgg(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    assert(rows == q03)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // plain collect stops at AQE stage boundaries (QueryStageExec is a
    // leaf); descend into materialized stage plans explicitly
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(allNodes) ++ (p match {
        case q: QueryStageExec => allNodes(q.plan)
        case _ => Seq.empty
      }))
    val smjs = allNodes(plan).collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge join in:\n$plan")
    val shuffles = smjs.flatMap(j => allNodes(j).collect { case e: ShuffleExchangeLike => e })
    assert(shuffles.isEmpty,
      s"bucketed join still shuffles: ${shuffles.mkString(", ")}")
  }
  test("q91 deciles are balanced and cover the full price range in order") {
    val out = graft.queries.Scaled.q91EquidepthHist(spark, Sf0001)
      .orderBy("decile").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val n = graft.Tables.orders(spark, Sf0001).count()
    assert(out.map(_._1).toSeq == (1 to 10))
    assert(out.map(_._2).sum == n)
    // equi-depth: each decile holds floor(n/10) or ceil(n/10) rows
    out.foreach { case (d, c, _, _) =>
      assert(c == n / 10 || c == n / 10 + 1, s"decile $d has $c of $n rows")
    }
    // contiguous, ordered value ranges
    out.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
  }

}
