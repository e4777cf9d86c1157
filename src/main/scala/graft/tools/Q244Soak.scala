package graft.tools

/** Dev harness for the round-16 sf1 capstone soak (verdict ask #8): run
  * q243 + q244 end-to-end on a given fixture dir while a sampler thread
  * tracks PEAK storage-memory use (the composed persists) — the number
  * the round-15 verdict asked to see at 10×, alongside wall and the
  * fence counters GraftSession's metrics listener logs.
  *
  * Usage: runMain graft.tools.Q244Soak <dir>
  */
object Q244Soak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.attachMetricsLogger(spark)
    @volatile var run = true
    @volatile var peakUsed = 0L
    val sampler = new Thread(() => {
      while (run) {
        val st = spark.sparkContext.getExecutorMemoryStatus.values
        val used = st.map { case (max, rem) => max - rem }.sum
        if (used > peakUsed) peakUsed = used
        Thread.sleep(200)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q244-soak] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        f" rows=$n peak_storage=${peakUsed / (1 << 20)} MiB")
    }
    t("q243_perplexity_filter")(
      graft.queries.Quality.q243PerplexityFilter(spark, dir).count())
    t("q244_web_pipeline")(
      graft.queries.Curation2.q244WebPipeline(spark, dir).count())
    run = false
    spark.stop()
  }
}
