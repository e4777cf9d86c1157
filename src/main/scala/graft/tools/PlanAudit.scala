package graft.tools

/** Dev harness: print join-strategy red flags (CartesianProduct /
  * BroadcastNestedLoopJoin occurrences) in the executed plan of named
  * SparkEntry queries, plus the formatted plan when `-v`. Usage:
  *   runMain graft.tools.PlanAudit <sfDir> <query> [query...] [-v]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanAudit <sfDir> <query> [query...] [-v]")
    val sfDir = args.head
    val verbose = args.contains("-v")
    val names = args.tail.filterNot(_ == "-v").toSeq
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      // df.count() would build a SEPARATE QueryExecution and leave THIS
      // one's AdaptiveSparkPlan unexecuted (isFinalPlan=false, runtime
      // join-strategy changes invisible); executing df's own physical
      // RDD finalizes the plan the audit then reads (round-13 advice)
      df.queryExecution.toRdd.count()
      val p = df.queryExecution.executedPlan.toString
      val cart = p.linesIterator.count(_.contains("CartesianProduct"))
      val bnl = p.linesIterator.count(_.contains("BroadcastNestedLoop"))
      println(s"[plan] $name cartesian=$cart bnlj=$bnl")
      if (verbose) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
