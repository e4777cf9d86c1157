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
    // Iterative queries EXECUTE at construction time (driver-side
    // convergence loop over localCheckpoint'ed rounds), and their final
    // plan is a trivial scan of the checkpointed result — nothing to
    // audit. Their per-round join/aggregate shape is the q24-style pair
    // plan plus one Exchange per round; see Dedup.connectedComponents.
    val iterative = Set("q58_dedup_resolve", "q77_dedup_resolve_star")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        println(s"\n=================== $name ===================")
        if (iterative(name)) {
          println("[iterative query: executes at construction; final plan is a " +
            "checkpoint scan — per-round shape documented in Dedup.connectedComponents]")
        } else {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val lines = plan.split("\n")
          println(lines.take(400).mkString("\n"))
          if (lines.length > 400)
            println(s"... [${lines.length - 400} more lines elided; cap keeps the audit readable]")
        }
      }
    spark.stop()
  }
}
