package graft.streaming

/** CLI entry: run the watermarked hourly rollup as a real streaming query
  * over the events fixture (file source -> memory sink), print the top rows.
  *
  * Usage: runMain graft.streaming.RunStream [sfDir]
  */
object RunStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.get()
    val q = EventStreams.hourlyRollup(EventStreams.readEventStream(spark, sfDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup").start()
    q.processAllAvailable()
    val out = spark.table("rollup").orderBy("hour", "event_type")
    println(s"rows: ${out.count()}")
    out.show(12, truncate = false)
    q.stop()
    spark.stop()
  }
}
