package graft.tools

/** Prints a declared query's full result at each scale factor — the
  * eyeball-the-booleans loop for the banded sketch gates (q25/q44/q54/q76
  * family), where the failure mode is a FALSE in a gate column at one sf
  * only.
  *
  * Usage: runMain graft.tools.ShowOne q25_minhash_lsh [more...]
  *        (SPARK_GRAFT_SF_DIRS=dir1,dir2 overrides the default three)
  */
object ShowOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass one or more query names from SparkEntry.queries")
    val sfDirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS",
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").toSeq
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- sfDirs; name <- args) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      spark.sharedState.cacheManager.clearCache()
      println(s"== $name @ $dir")
      fn(spark, dir).show(60, false)
    }
    spark.stop()
  }
}
