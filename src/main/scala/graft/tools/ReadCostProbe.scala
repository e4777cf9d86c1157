package graft.tools

/** Driver-side cost of constructing s.read.parquet frames repeatedly —
  * is per-construction file-index/footer work worth memoizing?
  */
object ReadCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def t(l: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[readcost] $l: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm FS
    graft.Tables.lineitem(spark, sfDir).schema
    t("100x read.parquet(lineitem).schema") {
      (1 to 100).foreach(_ => graft.Tables.lineitem(spark, sfDir).schema)
    }
    t("100x read.parquet(documents).schema") {
      (1 to 100).foreach(_ => graft.Tables.documents(spark, sfDir).schema)
    }
    t("100x events (normalizeTs)") {
      (1 to 100).foreach(_ => graft.Tables.events(spark, sfDir).schema)
    }
    t("30x registerAll (memoized)") {
      (1 to 30).foreach(_ => graft.Tables.registerAll(spark, sfDir))
    }
    spark.stop()
  }
}
