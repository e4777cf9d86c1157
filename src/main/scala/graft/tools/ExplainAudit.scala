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
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
