package graft.tools

/** Prints formatted physical plans for the headline queries so plan
  * regressions (lost pushdown, lost broadcast, codegen breaks) are visible.
  *
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = graft.GraftSession.get()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        println(s"\n=================== $name ===================")
        // capped: iterative queries (q58's label propagation) unfold every
        // round into one giant lineage tree — the audit value is in the
        // per-round shape, which the first ~400 lines always contain
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val lines = plan.split("\n")
        println(lines.take(400).mkString("\n"))
        if (lines.length > 400)
          println(s"... [${lines.length - 400} more lines elided: iterative lineage repeats the audited round shape]")
      }
    spark.stop()
  }
}
